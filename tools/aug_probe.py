"""Augmentation cost breakdown at the bench workload shape (bs 8, 540x960).

Times augment_batch under each cumulative spec subset so the ~7 ms/step
augmentation line in PERF.md §2 is attributable to specific ops.

Timing pattern: each iteration feeds the previous iteration's output back
in (u8 round-trip), so the dispatch chain is data-dependent end-to-end —
on the axon tunnel, independent dispatches can be acknowledged at enqueue
and read 100-1000x too fast (see PERF.md methodology note); a dependent
chain cannot.

    python tools/aug_probe.py [--steps 50]
"""
from __future__ import annotations

import argparse
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
        DeviceAugmentSpec)
    from miccai2021_cataract_semantic_segmentation_tpu.ops.augment import (
        augment_batch)

    bs, h, w = 8, 540, 960
    rng = np.random.default_rng(0)
    images0 = jnp.asarray(rng.integers(0, 255, (bs, h, w, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 18, (bs, h, w), dtype=np.uint8))
    n = args.steps

    variants = [
        ("cast only", DeviceAugmentSpec()),
        ("+pad", DeviceAugmentSpec(pad=True)),
        ("+flip", DeviceAugmentSpec(pad=True, flip=True)),
        ("+blur gate", DeviceAugmentSpec(pad=True, flip=True, blur=True)),
        ("+colorjitter (full recipe)",
         DeviceAugmentSpec(pad=True, flip=True, blur=True, colorjitter=True)),
        ("jitter only", DeviceAugmentSpec(colorjitter=True)),
    ]
    for name, spec in variants:
        def step(k, im, lb, s=spec):
            # dependent chain: output folds back into the next input
            x, _ = augment_batch(k, im, lb, s, True)
            x = x[:, :h]  # drop pad rows to keep the shape static
            nxt = (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            k2 = jax.random.fold_in(k, 1)
            return k2, nxt

        fn = jax.jit(step)
        key = jax.random.PRNGKey(1)
        key, im = fn(key, images0, labels)
        jax.block_until_ready(im)
        t0 = time.perf_counter()
        for _ in range(n):
            key, im = fn(key, im, labels)
        jax.block_until_ready(im)
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"{name:<28s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
