"""Chained-dependency timing of the fused two-scale bucket Lovász at the
bench shape, across bucket counts — tests whether histogram cost is
MXU-pass-count-bound (B-independent below the pairing threshold) or
column-bound (proportional to B).

Each iteration perturbs the logits with the previous gradients, so the
dispatch chain is data-dependent (enqueue-ack-proof on the axon tunnel).

    python tools/loss_probe.py [--steps 20]
"""
from __future__ import annotations

import argparse
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--buckets", type=int, nargs="*",
                    default=[2048, 1024, 512, 256])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
        fused_two_scale_bucket_lovasz_s8)

    bs, h, w, c = 8, 544, 960, 17
    rng = np.random.default_rng(0)
    li = jnp.asarray(rng.normal(0, 2, (bs, h // 8, w // 8, c)), jnp.float32)
    lf = jnp.asarray(rng.normal(0, 2, (bs, h // 8, w // 8, c)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, 18, (bs, h, w)), jnp.int32)
    n = args.steps

    for nb in args.buckets:
        def fwd_only(a, b, nb=nb):
            v = fused_two_scale_bucket_lovasz_s8(a, b, lbl, 0.4, 1.0,
                                                 classes_to_ignore=17,
                                                 n_buckets=nb)
            return a + 1e-9 * v, b - 1e-9 * v  # dependency for the chain

        def fwd_bwd(a, b, nb=nb):
            v, (ga, gb) = jax.value_and_grad(
                lambda x, y: fused_two_scale_bucket_lovasz_s8(
                    x, y, lbl, 0.4, 1.0, classes_to_ignore=17, n_buckets=nb),
                argnums=(0, 1))(a, b)
            return a - 1e-9 * ga, b - 1e-9 * gb

        for tag, fn in (("fwd", jax.jit(fwd_only)), ("fwd+bwd", jax.jit(fwd_bwd))):
            a, b = fn(li, lf)
            jax.block_until_ready(b)
            t0 = time.perf_counter()
            for _ in range(n):
                a, b = fn(a, b)
            jax.block_until_ready(b)
            ms = (time.perf_counter() - t0) / n * 1000
            print(f"B={nb:<5d} {tag:<8s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
