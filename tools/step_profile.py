"""Capture a jax.profiler trace of the flagship train step and print the
top ops by self time (parsed via tensorboard_plugin_profile), so the step
breakdown in PERF.md is measured per-op rather than inferred.

    python tools/step_profile.py [--steps 5]
"""
from __future__ import annotations

import argparse
import glob
import sys
import tempfile

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--buckets", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import DeviceAugmentSpec
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import make_schedule
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import create_train_state
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import make_train_step

    task, bs, h, w = 2, 8, 540, 960
    model = build_model({"model": "OCRNet", "backbone": "resnet50",
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    loss_fn = build_loss({
        "name": "TwoScaleLoss", "lovasz_impl": "bucket",
        "lovasz_buckets": args.buckets,
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

    state, m = step(state, images, labels, key, 0)  # compile + warmup
    jax.block_until_ready(m["loss"])

    tmpdir = tempfile.mkdtemp(prefix="cadis_prof_")
    with jax.profiler.trace(tmpdir):
        for _ in range(args.steps):
            state, m = step(state, images, labels, key, 0)
        jax.block_until_ready(m["loss"])

    # parse the xplane protobuf directly (the tensorboard-plugin converter
    # is broken in this image — PERF.md section 2)
    from tools.eval_profile import parse_xplane
    for name, total, span, rows, n_ev in parse_xplane(tmpdir, top=60):
        print(f"== plane {name}: op-total {total / args.steps:.2f} ms/step, "
              f"span {span / args.steps:.2f} ms/step (over {args.steps} steps)")
        for op, ms in rows:
            print(f"  {ms / args.steps:8.3f} ms  x{n_ev[op]:<4d} {op}")


if __name__ == "__main__":
    main()
