"""Multi-host input feeding (SURVEY.md §2.7 item 4).

The production path is `data.pipeline.device_put_batch`: with
`jax.process_count() > 1` each process feeds its local slice and the global
jax.Array is assembled via `jax.make_array_from_process_local_data`. Tests:

1. single-process degenerate path — the global-assembly helper must produce
   arrays identical (values + sharding) to a plain sharded device_put;
2. a REAL 2-process jax.distributed CPU run (subprocesses with a gRPC
   coordinator): each process feeds a different local half, and the global
   batch seen by a jitted psum matches the concatenation.
"""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miccai2021_cataract_semantic_segmentation_tpu.data.pipeline import (
    device_put_batch, global_batch_from_process_local)


def test_single_process_degenerate_path_identical():
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (8, 16, 24, 3), dtype=np.uint8),
             rng.integers(0, 17, (8, 16, 24), dtype=np.uint8),
             np.arange(8, dtype=np.int32))
    via_global = global_batch_from_process_local(batch, sh)
    via_put = jax.tree.map(lambda a: jax.device_put(a, sh), batch)
    for g, p in zip(via_global, via_put):
        assert g.sharding == p.sharding
        np.testing.assert_array_equal(np.asarray(g), np.asarray(p))
    # device_put_batch routes single-process through plain device_put
    routed = device_put_batch(batch, sh)
    for r, p in zip(routed, via_put):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(p))


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
sys.path.insert(0, %(repo)r)
from miccai2021_cataract_semantic_segmentation_tpu.data.pipeline import (
    device_put_batch)

assert jax.process_count() == 2, jax.process_count()
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
sh = NamedSharding(mesh, P("data"))
pid = jax.process_index()
# global batch: rows 0..7 each filled with their global row index; this
# process contributes rows [4*pid, 4*pid+4)
local = np.stack([np.full((6, 10), 4 * pid + r, np.float32) for r in range(4)])
g = device_put_batch(local, sh)
assert g.shape == (8, 6, 10), g.shape

row_means = jax.jit(lambda x: x.mean(axis=(1, 2)),
                    out_shardings=NamedSharding(mesh, P()))
out = np.asarray(row_means(g))
np.testing.assert_allclose(out, np.arange(8, dtype=np.float32))
print("OK process", pid)
"""


def test_two_process_distributed_feeding(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": repo})
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK process {i}" in out
