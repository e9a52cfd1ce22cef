"""Chained-dependency timing of the model forward / forward+backward at
the bench shape, isolating the conv graph from the loss (PERF.md §2 rows).

Each iteration perturbs the input with the previous output so the chain is
data-dependent (enqueue-ack-proof on the axon tunnel; see PERF.md
methodology note).

    python tools/fwd_probe.py [--steps 20]
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

    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
        make_schedule)
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
        create_train_state)

    task, bs, h, w = 2, 8, 544, 960
    model = build_model({"model": "OCRNet", "backbone": "resnet50",
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    schedule = make_schedule({"epochs": 50, "learning_rate": 1e-4}, 100)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((bs, h, w, 3)), {}, schedule)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((bs, h, w, 3)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, 18, (bs, h, w)), jnp.int32)
    ce = build_loss({"name": "CrossEntropyLoss"}, task)
    n = args.steps

    def fwd_train(x):
        out, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, True, mutable=["batch_stats"])
        # s8 head only (the s8-metrics train step never materialises the
        # full-res logits)
        return x + 1e-9 * jnp.mean(out["logits_s8"]).astype(x.dtype)

    def fwd_eval(x):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, False)
        return x + 1e-9 * jnp.mean(out["logits"]).astype(x.dtype)

    def fwd_bwd_ce(x):
        def lf(params):
            out, _ = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, True, mutable=["batch_stats"])
            total, _ = ce(out, lbl, epoch=0)
            return total
        v, g = jax.value_and_grad(lf)(state.params)
        gsum = sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                   for t in jax.tree.leaves(g))
        return x + 1e-12 * gsum.astype(x.dtype)

    for name, fn in (("fwd only (train mode, s8 head)", fwd_train),
                     ("fwd only (eval mode, full res)", fwd_eval),
                     ("fwd+bwd with plain CE (conv graph)", fwd_bwd_ce)):
        f = jax.jit(fn)
        x = f(x0)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(n):
            x = f(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"{name:<36s} {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
