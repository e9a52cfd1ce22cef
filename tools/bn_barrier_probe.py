"""A/B the train step with BatchNorm statistics un-fused from the convs.

The profiler trace (PERF.md section 2, round 3) shows XLA fusing each
conv with the following BatchNorm's mean/var reduce epilogue
(convert_reduce_fusion ops) and running those fused convs at 11-25% MFU
-- 48.8 ms/step total. This probe patches flax's _compute_stats to put
an optimization_barrier on its input, forcing the stats reduce into its
own (memory-bound) pass while leaving the conv on the fast MXU path.

    python tools/bn_barrier_probe.py [--steps 12] [--barrier 0|1]
"""
from __future__ import annotations

import argparse
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def timed_steps(n, copts=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
        DeviceAugmentSpec)
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
        make_schedule)
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
        create_train_state)
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
        make_train_step)

    task, bs, h, w = 2, 8, 540, 960
    model = build_model({"model": "OCRNet", "backbone": "resnet50",
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    loss_fn = build_loss({
        "name": "TwoScaleLoss", "lovasz_impl": "bucket",
        "lovasz_buckets": 1024,
        "interm": {"name": "LovaszSoftmax", "weight": 0.4},
        "final": {"name": "LovaszSoftmax", "weight": 1.0}}, task)
    spec = DeviceAugmentSpec(pad=True, flip=True, blur=True, colorjitter=True)
    schedule = make_schedule({"epochs": 50, "learning_rate": 1e-4}, 100)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((bs, h + 4, w, 3)), {}, schedule)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, h, w, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 18, (bs, h, w), dtype=np.uint8))
    step = make_train_step(loss_fn, spec, task, train_metrics="s8")
    key = jax.random.PRNGKey(1)

    if copts:
        step = step.lower(state, images, labels, key, 0).compile(
            compiler_options=copts)

    state, m = step(state, images, labels, key, 0)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, images, labels, key, 0)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--barrier", type=int, default=0)
    ap.add_argument("--copt", action="append", default=[],
                    help="key=value XLA compiler option (repeatable)")
    args = ap.parse_args()

    if args.barrier:
        import jax
        import flax.linen.normalization as fnorm
        orig = fnorm._compute_stats

        def barriered(x, *a, **k):
            return orig(jax.lax.optimization_barrier(x), *a, **k)

        fnorm._compute_stats = barriered

    copts = dict(c.split("=", 1) for c in args.copt) or None
    ms = timed_steps(args.steps, copts)
    print(f"barrier={args.barrier} copts={copts}  {ms:7.1f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
