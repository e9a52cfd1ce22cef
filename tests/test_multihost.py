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


def _run_two_process(tmp_path, worker_src, fmt: dict, timeout=240):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(worker_src % {"repo": repo, **fmt})
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
    return outs


def test_two_process_distributed_feeding(tmp_path):
    outs = _run_two_process(tmp_path, _WORKER, {})
    for i, out in enumerate(outs):
        assert f"OK process {i}" in out


_TRAIN_WORKER = r"""
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
from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
    DeviceAugmentSpec)
from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
from miccai2021_cataract_semantic_segmentation_tpu.train import checkpoint as ckpt
from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
    make_schedule)
from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
    create_train_state)
from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
    make_train_step)

assert jax.process_count() == 2
pid = jax.process_index()
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
sh = NamedSharding(mesh, P("data"))

task = 1
model = build_model({"model": "FCN", "width": 0.125}, task)
loss_fn = build_loss({"name": "CrossEntropyLoss"}, task)
spec = DeviceAugmentSpec(pad=False, flip=True)
schedule = make_schedule({"epochs": 2, "learning_rate": 1e-3}, 4)
with mesh:
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 64, 3)), {}, schedule)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_train_step(loss_fn, spec, task, donate=False, mesh=mesh)
    # 4 real optimiser steps; each process feeds ITS half of every global
    # batch (global batch = concat of the two process-local halves)
    for s in range(4):
        rng = np.random.default_rng(1000 + s)            # same on both procs
        g_imgs = rng.integers(0, 255, (8, 32, 64, 3), dtype=np.uint8)
        g_lbls = rng.integers(0, 8, (8, 32, 64), dtype=np.uint8)
        local = (g_imgs[4 * pid:4 * pid + 4], g_lbls[4 * pid:4 * pid + 4])
        images, labels = device_put_batch(local, sh)
        state, metrics = step(state, images, labels, jax.random.PRNGKey(7), 0)
    jax.block_until_ready(state.params)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # digest of the (replicated) final params: must match across processes
    digest = float(sum(float(jnp.sum(jnp.abs(x)))
                       for x in jax.tree.leaves(state.params)))
    print("DIGEST %%.10e" %% digest)

    # orbax checkpoint: the collective save contract (every process calls
    # save; orbax elects the primary writer), then a restore round-trip
    cdir = %(ckpt_dir)r
    ckpt.save_checkpoint(cdir, "best", state, 3, 0.5, loss, blocking=True)
    restored, meta = ckpt.restore_checkpoint(cdir, "best", state)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(meta["epoch"]) == 3
    print("OK train process", pid)
"""


def test_two_process_distributed_train_loop(tmp_path):
    """Multi-host TRAINING (not just feeding): 4 real train steps under
    jax.distributed with per-process input halves; final params must be
    identical across processes (GSPMD gradient all-reduce over DCN) and an
    orbax checkpoint saved collectively must restore (SURVEY.md §2.7
    items 1-2; VERDICT r3 item 5)."""
    cdir = tmp_path / "chkpts"
    cdir.mkdir()
    outs = _run_two_process(tmp_path, _TRAIN_WORKER,
                            {"ckpt_dir": str(cdir)}, timeout=360)
    digests = []
    for i, out in enumerate(outs):
        assert f"OK train process {i}" in out, out
        digests += [ln for ln in out.splitlines() if ln.startswith("DIGEST")]
    assert len(digests) == 2
    assert digests[0] == digests[1], digests   # bit-identical across hosts
    assert (cdir / "chkpt_best").exists()
