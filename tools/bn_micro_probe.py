"""Micro-timings for the conv+BN-stats fusions the step trace flags.

Times, as chained jits at the os8 bench shapes: dense/dilated 3x3 and 1x1
convs alone; the same convs with train-mode BN statistics consumed after;
and the stats reduce alone. Separates "dilated convs are slow" from "the
reduce epilogue un-MXUs the conv" from "reduces are slow, period".

    python tools/bn_micro_probe.py [--steps 20]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.default_rng(0)
    n, h, w = 8, 68, 120
    x512 = jnp.asarray(rng.normal(0, 1, (n, h, w, 512)), jnp.bfloat16)
    x2048 = jnp.asarray(rng.normal(0, 1, (n, h, w, 2048)), jnp.bfloat16)
    k33 = jnp.asarray(rng.normal(0, 0.01, (3, 3, 512, 512)), jnp.bfloat16)
    k33d = jnp.asarray(rng.normal(0, 0.01, (3, 3, 2048, 512)), jnp.bfloat16)
    k11 = jnp.asarray(rng.normal(0, 0.01, (1, 1, 512, 2048)), jnp.bfloat16)

    dn = lax.conv_dimension_numbers((n, h, w, 512), (3, 3, 512, 512),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, k, d=1):
        p = d  # 'same' for 3x3 at dilation d
        kh = k.shape[0]
        pad = ((p, p), (p, p)) if kh == 3 else ((0, 0), (0, 0))
        return lax.conv_general_dilated(
            x, k, (1, 1), pad, rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def stats(y):
        m = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2)) - m * m
        return m, v

    def run(name, fn, x0):
        f = jax.jit(fn)
        s = f(x0)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s = f(s)
        jax.block_until_ready(s)
        ms = (time.perf_counter() - t0) / args.steps * 1000
        print(f"{name:<34s} {ms:7.2f} ms", flush=True)

    # 512->512 keeps shape; chain output back as input
    run("conv3x3 d1 512->512", lambda x: conv(x, k33, 1), x512)
    run("conv3x3 d2 512->512", lambda x: conv(x, k33, 2), x512)
    run("conv3x3 d4 512->512", lambda x: conv(x, k33, 4), x512)

    def conv_stats(x):
        y = conv(x, k33, 1)
        m, v = stats(y)
        return y + (m + v).astype(y.dtype)  # consume stats, keep shape

    run("conv3x3 d1 +stats", conv_stats, x512)

    def conv_stats_d4(x):
        y = conv(x, k33, 4)
        m, v = stats(y)
        return y + (m + v).astype(y.dtype)

    run("conv3x3 d4 +stats", conv_stats_d4, x512)

    def conv_bn_apply_d4(x):
        y = conv(x, k33, 4)
        m, v = stats(y)
        return (y.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)

    run("conv3x3 d4 +stats+normalize", lambda x: conv_bn_apply_d4(x).astype(jnp.bfloat16), x512)

    def big_up(x):  # 512 -> 2048
        return conv(x, k11)

    def big_up_stats(x):
        y = conv(x, k11)
        m, v = stats(y)
        return y + (m + v).astype(y.dtype)

    run("conv1x1 512->2048", lambda x: big_up(x)[..., :512], x512)
    run("conv1x1 512->2048 +stats", lambda x: big_up_stats(x)[..., :512], x512)

    def stats_only(x):
        m, v = stats(x)
        return x + (m + v).astype(x.dtype)

    run("stats alone 2048ch", stats_only, x2048)

    def ocr_conv(x):
        y = conv(x, k33d, 4)           # 2048 -> 512
        return jnp.concatenate([y, y, y, y], axis=-1)

    run("conv3x3 d4 2048->512", ocr_conv, x2048)


if __name__ == "__main__":
    main()
