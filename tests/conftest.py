"""Test harness: force an 8-device virtual CPU mesh.

Mirrors the SURVEY.md §4 plan — multi-chip sharding tests run against a fake
8-device CPU backend, the TPU analogue of a fake backend.

Note: the environment may pre-import jax (sitecustomize) with a hardware
platform already selected via JAX_PLATFORMS, so setting env vars here is too
late — we must go through jax.config.update, which works post-import.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses spawned by tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
