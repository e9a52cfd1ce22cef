"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

Mirrors the SURVEY.md §4 plan — multi-chip sharding tests run against a fake
8-device CPU backend (`xla_force_host_platform_device_count`), the TPU
analogue of a fake backend. Must run before any `import jax` in the tests.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
