"""A/B check of the v4 (in-kernel upsample) fused bucket-Lovász vs the v3
(full-res grids) path on the real TPU: value agreement, gradient agreement,
cosine vs the f32 sort oracle, and fwd / fwd+bwd timings at the bench shape.

Usage: python tools/check_fused_v4.py [quick]
"""
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu.losses import fused_lovasz as fl
from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
    fused_two_scale_lovasz)
from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear


def _loss_fn(v3: bool, n_buckets: int):
    def f(li, lf, lbl):
        old = fl._USE_V3
        fl._USE_V3 = v3
        try:
            return fl.fused_two_scale_bucket_lovasz_s8(
                li, lf, lbl, 0.4, 1.0, classes_to_ignore=17,
                n_buckets=n_buckets)
        finally:
            fl._USE_V3 = old
    return f


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    rng = np.random.default_rng(0)
    n, hs, ws, c = (2, 68, 120, 18)
    H, W = 544, 960
    li = jnp.asarray(rng.normal(size=(n, hs, ws, c)).astype(np.float32)) * 2
    lf = jnp.asarray(rng.normal(size=(n, hs, ws, c)).astype(np.float32)) * 2
    lbl = jnp.asarray(rng.integers(0, 18, (n, H, W)).astype(np.int32))

    B = 1024
    f3 = jax.jit(_loss_fn(True, B))
    f4 = jax.jit(_loss_fn(False, B))
    v3 = float(f3(li, lf, lbl))
    v4 = float(f4(li, lf, lbl))
    print(f"value: v3 {v3:.6f}  v4 {v4:.6f}  |diff| {abs(v3 - v4):.2e}")

    g3 = jax.jit(jax.grad(_loss_fn(True, B), argnums=(0, 1)))(li, lf, lbl)
    g4 = jax.jit(jax.grad(_loss_fn(False, B), argnums=(0, 1)))(li, lf, lbl)

    def sort_loss(a, b):
        return fused_two_scale_lovasz(
            resize_bilinear(a, (H, W), True), resize_bilinear(b, (H, W), True),
            lbl, 0.4, 1.0, classes_to_ignore=17, impl="sort")

    gs = jax.jit(jax.grad(sort_loss, argnums=(0, 1)))(li, lf)
    for name, (a, b) in (("v3 vs v4", (g3, g4)), ("v4 vs sort", (g4, gs)),
                         ("v3 vs sort", (g3, gs))):
        for scale, (x, y) in enumerate(zip(a, b)):
            x, y = np.asarray(x).ravel(), np.asarray(y).ravel()
            cos = x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-30)
            rel = np.linalg.norm(x - y) / (np.linalg.norm(y) + 1e-30)
            print(f"grad {name} scale{scale}: cos {cos:.6f} relL2 {rel:.3e}")
    if quick:
        return

    # timings at the bench batch
    n8 = 8
    li8 = jnp.asarray(rng.normal(size=(n8, hs, ws, c)).astype(np.float32))
    lf8 = jnp.asarray(rng.normal(size=(n8, hs, ws, c)).astype(np.float32))
    lbl8 = jnp.asarray(rng.integers(0, 18, (n8, H, W)).astype(np.int32))

    def timeit(f, *args, reps=20):
        o = f(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / reps * 1e3

    for tag, v3flag in (("v3", True), ("v4", False)):
        fv = jax.jit(_loss_fn(v3flag, B))
        fg = jax.jit(jax.value_and_grad(_loss_fn(v3flag, B), argnums=(0, 1)))
        t_f = timeit(fv, li8, lf8, lbl8)
        t_fb = timeit(fg, li8, lf8, lbl8)
        print(f"{tag}: fwd {t_f:.2f} ms   fwd+bwd {t_fb:.2f} ms  (bs8)")


if __name__ == "__main__":
    main()
