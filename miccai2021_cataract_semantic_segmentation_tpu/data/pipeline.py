"""Batch pipeline: sampler -> host transforms -> pinned numpy batch ->
sharded device arrays, with background-thread prefetch.

TPU-first replacement for the reference's DataLoader-worker model
(BaseManager.py:286-405): the host assembles raw uint8 batches (cheap), all
photometric augmentation runs fused on device (ops/augment.py), and a small
prefetch queue overlaps host assembly + H2D transfer with the device step.
Epochs are padded (wrapping) or trimmed to a static number of steps so the
jitted train step sees a fixed batch count — repeat-factor epochs have
stochastic length (SURVEY.md §7 hard-parts).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np


def pad_or_trim_batches(batches: np.ndarray, steps: int | None) -> np.ndarray:
    """(n, B) index batches -> exactly `steps` batches by wrap-around."""
    if steps is None or len(batches) == steps:
        return batches
    if len(batches) > steps:
        return batches[:steps]
    reps = -(-steps // max(len(batches), 1))
    return np.concatenate([batches] * reps)[:steps]


def assemble_batch(dataset, indices, pipeline=None, rng=None, pool=None):
    """Stack dataset items into (images u8 NHWC, labels u8 NHW, idx i32 N).

    When the dataset exposes `load_batch` (SegDataset's C++ thread-pool
    decode+remap) and no host-side geometric transforms are active, the
    whole batch decodes in parallel in native code. Otherwise, a
    ThreadPoolExecutor `pool` parallelises the per-sample Python path —
    cv2 decode/warp release the GIL, so threads scale here. Per-sample RNG
    streams are derived from `rng` up front so results are deterministic
    regardless of thread scheduling (the jax-key analogue of the
    reference's worker_init_fn reseeding, utils/utils.py:625-626)."""
    host_tf = pipeline is not None and pipeline.host_train
    if not host_tf and hasattr(dataset, "load_batch"):
        native = dataset.load_batch(indices)
        if native is not None:
            imgs, lbls = native
            return (imgs, lbls.astype(np.int32),
                    np.asarray(indices, dtype=np.int32))

    if host_tf:
        seeds = rng.integers(0, 2**63 - 1, size=len(indices)) if rng is not None \
            else np.arange(len(indices))

    def load_one(k: int):
        img, lbl, _meta = dataset[int(indices[k])]
        if host_tf:
            img, lbl = pipeline.apply_host(img, lbl,
                                           np.random.default_rng(seeds[k]))
        return img, lbl

    if pool is not None:
        items = list(pool.map(load_one, range(len(indices))))
    else:
        items = [load_one(k) for k in range(len(indices))]
    imgs = [it[0] for it in items]
    lbls = [it[1] for it in items]
    return (np.stack(imgs), np.stack(lbls).astype(np.int32),
            np.asarray(indices, dtype=np.int32))


def device_put_batch(batch, sharding=None):
    """Host batch -> device arrays, optionally sharded.

    Multi-host (jax.process_count() > 1): each process feeds its LOCAL
    shard of the global batch and the pieces are assembled into one global
    jax.Array via `jax.make_array_from_process_local_data` (SURVEY.md §2.7
    item 4). Single-process: plain device_put with the same sharding — the
    degenerate path produces identical arrays (tested in
    tests/test_multihost.py)."""
    if sharding is None:
        return jax.device_put(batch)
    if jax.process_count() > 1:
        return global_batch_from_process_local(batch, sharding)
    return jax.device_put(batch, sharding)


def global_batch_from_process_local(batch, sharding):
    """Per-process local batch -> global sharded jax.Array tree.

    `batch` holds each process's slice of the global batch (global batch =
    process batch x process_count along the leading axis); the result is a
    global array sharded per `sharding` whose addressable shards come from
    this process's data."""
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(a)), batch)


def eval_batches(n: int, bs: int) -> tuple[np.ndarray, int]:
    """Index batches covering ALL n records at batch size bs.

    The reference evaluates at bs=1 (BaseManager.py:663-669) so it never
    drops anything; a TPU-first framework wants batched eval (the eval step
    is ~68% MFU at bs 8) WITHOUT losing the n % bs tail. The tail batch is
    padded by repeating the last record; returns (batches, n_pad) so the
    caller can mask the padded rows out of the confusion matrix (set their
    labels to 255 — out of range for the one-hot, contributing nothing)."""
    n_full = (n // bs) * bs
    batches = np.arange(n_full).reshape(-1, bs)
    n_pad = 0
    if n_full < n:
        n_pad = bs - (n - n_full)
        tail = np.concatenate([np.arange(n_full, n),
                               np.full((n_pad,), n - 1, dtype=np.int64)])
        batches = np.concatenate([batches, tail[None]], axis=0)
    return batches, n_pad


class Prefetcher:
    """Runs batch assembly + device_put on a worker thread, keeping up to
    `depth` device batches in flight (double-buffering by default)."""

    def __init__(self, batch_iter: Iterator, depth: int = 2, sharding=None):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.sharding = sharding
        self._err = None

        def work():
            try:
                for b in batch_iter:
                    self.q.put(device_put_batch(b, self.sharding))
            except Exception as e:  # surface worker errors at the consumer
                self._err = e
            finally:
                self.q.put(None)

        self.thread = threading.Thread(target=work, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item


def epoch_iterator(dataset, batches: np.ndarray, pipeline=None, seed: int = 0,
                   sharding=None, prefetch: int = 2, num_workers: int = 0):
    """Yield device-resident (images, labels, indices) batches for one epoch.

    `num_workers` > 0 decodes/transforms the samples of each batch on a
    thread pool (the reference's DataLoader num_workers analogue,
    BaseManager.py:298-305)."""
    rng = np.random.default_rng(seed)
    pool = None
    if num_workers and num_workers > 0:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=int(num_workers))

    def gen():
        try:
            for idx in batches:
                yield assemble_batch(dataset, idx, pipeline, rng, pool)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    if prefetch > 0:
        yield from Prefetcher(gen(), depth=prefetch, sharding=sharding)
    else:
        for b in gen():
            yield device_put_batch(b, sharding)
