"""Benchmark: CaDIS 540x960 frames/sec/chip, train + inference, flagship
OCRNet-ResNet50-os8 (paper recipe: bs 8, TwoScale Lovasz, repeat-factor-
style batches) on synthetic CaDIS-shaped data.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
`value` is the TRAIN frames/sec/chip (the binding number) and
`vs_baseline` is value / A100_TRAIN_BASELINE_FPS.

A100 baseline: the reference publishes no throughput (BASELINE.md). The
60 fps estimate is a roofline derivation (PERF.md section 5): the measured
19.2 TFLOP step on an A100 (312 TFLOP/s bf16) at eager PyTorch's typical
40-50% MFU gives 52-65 fps. The stderr line also prints the achieved MFU
against the v5e bf16 peak so the number is interpretable without the
baseline (full analysis: PERF.md).
"""
from __future__ import annotations

import json
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

A100_TRAIN_BASELINE_FPS = 60.0
A100_INFER_BASELINE_FPS = 160.0

# measured workload size (PERF.md section 1) and v5e bf16 peak, for MFU
TRAIN_STEP_TFLOP = 19.2   # 15.46 T XLA-counted + 3.7 T Pallas histograms
EVAL_STEP_TFLOP = 5.12
V5E_PEAK_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import DeviceAugmentSpec
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import make_schedule
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import create_train_state
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
        make_eval_step, make_train_step)

    task = 2
    bs = 8
    h, w = 540, 960  # padded to 544 on device
    model = build_model({"model": "OCRNet", "backbone": "resnet50",
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    # lovasz_impl "bucket" = the flagship config's recipe (sort-free Pallas
    # histogram Lovász, O(1/2048) deviation from the exact sort path)
    loss_fn = build_loss({
        "name": "TwoScaleLoss",
        "lovasz_impl": "bucket",
        "lovasz_buckets": 1024,   # paired-row kernel (PERF.md section 4)
        "interm": {"name": "LovaszSoftmax", "weight": 0.4},
        "final": {"name": "LovaszSoftmax", "weight": 1.0},
    }, task)
    spec = DeviceAugmentSpec(pad=True, flip=True, blur=True, colorjitter=True)

    schedule = make_schedule({"epochs": 50, "learning_rate": 1e-4}, 100)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((bs, h + 4, w, 3)), {}, schedule)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, h, w, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 18, (bs, h, w), dtype=np.uint8))

    train_step = make_train_step(loss_fn, spec, task)
    key = jax.random.PRNGKey(1)

    # compile + warmup
    state, m = train_step(state, images, labels, key, 0)
    jax.block_until_ready(m["loss"])
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = train_step(state, images, labels, key, 0)
    jax.block_until_ready(m["loss"])
    train_dt = (time.perf_counter() - t0) / n_steps
    train_fps = bs / train_dt

    eval_step = make_eval_step(spec, 17)
    logits, _, cm = eval_step(state, images, labels)
    jax.block_until_ready(cm)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        logits, _, cm = eval_step(state, images, labels)
    jax.block_until_ready(cm)
    infer_dt = (time.perf_counter() - t0) / n_steps
    infer_fps = bs / infer_dt

    train_mfu = TRAIN_STEP_TFLOP / train_dt / V5E_PEAK_TFLOPS
    infer_mfu = EVAL_STEP_TFLOP / infer_dt / V5E_PEAK_TFLOPS
    print(f"# train: {train_dt * 1000:.1f} ms/step ({train_fps:.1f} fps, "
          f"{train_mfu:.0%} MFU) | "
          f"infer: {infer_dt * 1000:.1f} ms/step ({infer_fps:.1f} fps, "
          f"{infer_mfu:.0%} MFU) | "
          f"infer_vs_baseline {infer_fps / A100_INFER_BASELINE_FPS:.2f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "CaDIS 540x960 OCRNet-R50-os8 bs8 train frames/sec/chip "
                  f"(infer: {infer_fps:.1f})",
        "value": round(train_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(train_fps / A100_TRAIN_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
