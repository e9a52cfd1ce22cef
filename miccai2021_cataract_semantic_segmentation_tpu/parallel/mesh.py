"""Mesh + sharding runtime — the framework's parallelism layer.

The reference is single-GPU (SURVEY.md §2.7: no DP/TP/PP anywhere); here
parallelism is a first-class component:

  * `make_mesh(('data',))` lays all local devices on a data axis (ICI).
  * Batches are sharded over 'data' via NamedSharding; the jitted train
    step runs SPMD and XLA inserts the gradient all-reduce (psum) and the
    CxC confusion-matrix reduction automatically from the shardings.
  * A second 'model' axis is supported for spatial sharding of the conv
    graph (HRNet-scale activations at 540x960 can exceed per-chip HBM at
    large batch): shard the H dimension of activations; XLA SPMD emits the
    halo exchanges for convolutions.
  * Multi-host: call `jax.distributed.initialize()` before `make_mesh`; the
    mesh then spans all processes and each process's input pipeline feeds
    its local shard — `data.pipeline.device_put_batch` assembles the global
    batch via `jax.make_array_from_process_local_data` whenever
    `jax.process_count() > 1` (exercised in tests/test_multihost.py).
  * BatchNorm under data parallelism is SYNC-BN by construction (SURVEY.md
    §7 "hard parts"): the whole train step is one GSPMD program, so flax
    BN's mean/var over the batch-sharded (N, H, W) axes are the exact
    GLOBAL batch statistics — XLA inserts the cross-shard reductions.
    This matches the single-device reference semantics bit-for-bit at 1
    device and is the mathematically consistent extension at N (per-
    replica BN would silently change the effective batch-stat size with
    the mesh shape).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """NHWC activations sharded along H over the model axis (spatial TP)."""
    return NamedSharding(mesh, P(None, axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh | None, axis: str = "data"):
    """Device-put a (possibly nested) host batch with batch-dim sharding.

    Multi-host: routes through data.pipeline.device_put_batch, which
    assembles the global array from each process's local slice via
    `jax.make_array_from_process_local_data`."""
    if mesh is None:
        return jax.device_put(batch)
    from miccai2021_cataract_semantic_segmentation_tpu.data.pipeline import (
        device_put_batch)
    return device_put_batch(batch, batch_sharding(mesh, axis))
