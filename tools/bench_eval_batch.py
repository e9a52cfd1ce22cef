"""Infer-side headroom probes (VERDICT r4 next #7).

On one v5e chip the eval step (OCRNet-R50-os8 @544x960, bs 8) runs at 69%
MFU / 213 fps — already above the A100 estimate. This tool measures the
remaining levers:

1. eval batch size 8/16/32 (HBM allows larger batches at eval; bigger
   batches amortise the per-step fixed costs);
2. a bf16-upsample serving variant: the final bilinear upsample + argmax
   computed in bf16 from the stride-8 logits instead of f32 — halves the
   dominant HBM traffic of the eval tail (the 544x960xC logit grid).
   Reported WITH its accuracy cost: fraction of argmax pixels that differ
   from the f32 path and the confusion-matrix delta, on both a random-init
   model and a briefly-trained one (decisive predictions tie less).

Usage: python tools/bench_eval_batch.py [--steps 20] [--train-steps 30]
                                        [--out PATH]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--train-steps", type=int, default=30)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
        DeviceAugmentSpec)
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.ops.metrics import (
        confusion_matrix)
    from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import (
        resize_bilinear)
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
        make_schedule)
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
        create_train_state)
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
        eval_preprocess, make_eval_step, make_train_step)
    from trajectory_twins import make_learnable_frames

    task = 2
    h, w, n_cls = 540, 960, 17
    model = build_model({"model": "OCRNet", "backbone": "resnet50",
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    spec = DeviceAugmentSpec(pad=True, flip=True, blur=True, colorjitter=True)
    schedule = make_schedule({"epochs": 50, "learning_rate": 1e-4}, 100)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, h + 4, w, 3)), {}, schedule)
    rng = np.random.default_rng(0)
    res = {"devices": [str(d) for d in jax.devices()]}

    # -- 1. eval batch-size sweep ---------------------------------------
    # End every timed window with an actual device->host FETCH (not just
    # block_until_ready): on this setup the tunnel can acknowledge enqueue
    # rather than completion when the dispatch queue is idle (PERF.md
    # methodology note), and the sweep starts from a cold queue.
    res["eval_batch_sweep"] = {}
    for bs in (8, 16, 32):
        images = jnp.asarray(rng.integers(0, 255, (bs, h, w, 3), np.uint8))
        labels = jnp.asarray(rng.integers(0, 18, (bs, h, w), np.uint8))
        step = make_eval_step(spec, n_cls)
        compiled = step.lower(state, images, labels).compile()
        logits, _, cm = compiled(state, images, labels)
        float(jnp.sum(cm))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logits, _, cm = compiled(state, images, labels)
        float(jnp.sum(cm))
        dt = (time.perf_counter() - t0) / args.steps
        fps = bs / dt
        res["eval_batch_sweep"][bs] = {"ms_step": round(dt * 1e3, 2),
                                       "fps": round(fps, 1)}
        print(f"eval bs={bs}: {dt * 1e3:.1f} ms/step  {fps:.1f} fps",
              file=sys.stderr)

    # -- 2. bf16-upsample argmax serving path ---------------------------
    # briefly train so predictions are decisive (ties are the bf16 hazard)
    loss_fn = build_loss({
        "name": "TwoScaleLoss", "lovasz_impl": "bucket",
        "lovasz_buckets": 1024,
        "interm": {"name": "LovaszSoftmax", "weight": 0.4},
        "final": {"name": "LovaszSoftmax", "weight": 1.0}}, task)
    # donate=False: the random-init `state` is reused afterwards for the
    # worst-case (ties-heavy) argmax comparison — donation would delete it
    tstep = make_train_step(loss_fn, spec, task, train_metrics="s8",
                            donate=False)
    pool_i, pool_l = make_learnable_frames(rng, 16, h, w, 17)
    key = jax.random.PRNGKey(1)
    tstate = state
    for i in range(args.train_steps):
        bi = (i * 8) % 16
        tstate, m = tstep(tstate, jnp.asarray(pool_i[bi:bi + 8]),
                          jnp.asarray(pool_l[bi:bi + 8]), key, 0)
    jax.block_until_ready(tstate.params)
    print(f"# trained {args.train_steps} steps, loss {float(m['loss']):.3f}",
          file=sys.stderr)

    def serve_pred(state, images_u8, up_dtype):
        x = eval_preprocess(images_u8, spec)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, False)
        s8 = out["logits_s8"].astype(up_dtype)
        lg = resize_bilinear(s8, (h + 4, w), align_corners=True)
        return jnp.argmax(lg, -1).astype(jnp.uint8)

    res["bf16_upsample_argmax"] = {}
    for tag, st in (("random_init", state), ("trained", tstate)):
        images = jnp.asarray(rng.integers(0, 255, (8, h, w, 3), np.uint8)) \
            if tag == "random_init" else jnp.asarray(pool_i[:8])
        labels = jnp.asarray(rng.integers(0, 18, (8, h, w), np.uint8)) \
            if tag == "random_init" else jnp.asarray(pool_l[:8])
        p32 = jax.jit(lambda s, im: serve_pred(s, im, jnp.float32))
        p16 = jax.jit(lambda s, im: serve_pred(s, im, jnp.bfloat16))
        a32 = np.asarray(p32(st, images))
        a16 = np.asarray(p16(st, images))
        disagree = float((a32 != a16).mean())
        lblp = jnp.pad(labels.astype(jnp.int32), ((0, 0), (2, 2), (0, 0)),
                       mode="reflect")
        cm32 = np.asarray(confusion_matrix(
            jax.nn.one_hot(a32, n_cls + 1), lblp), np.int64)
        cm16 = np.asarray(confusion_matrix(
            jax.nn.one_hot(a16, n_cls + 1), lblp), np.int64)
        cm_delta = int(np.abs(cm32 - cm16).sum())
        res["bf16_upsample_argmax"][tag] = {
            "pixel_disagreement": disagree,
            "cm_abs_delta_pixels": cm_delta,
            "n_pixels": int(a32.size)}
        print(f"bf16 vs f32 upsample+argmax [{tag}]: "
              f"{disagree:.2e} pixels differ, cm |delta| {cm_delta}",
              file=sys.stderr)

    # timing of the two serving variants at bs 8
    images = jnp.asarray(pool_i[:8])
    for tag, f in (("f32", jax.jit(lambda s, im: serve_pred(s, im, jnp.float32))),
                   ("bf16", jax.jit(lambda s, im: serve_pred(s, im, jnp.bfloat16)))):
        o = f(tstate, images)
        float(jnp.sum(o))          # real fetch — see the sweep comment
        t0 = time.perf_counter()
        for _ in range(args.steps):
            o = f(tstate, images)
        float(jnp.sum(o))
        dt = (time.perf_counter() - t0) / args.steps
        res[f"serve_argmax_{tag}_ms"] = round(dt * 1e3, 2)
        res[f"serve_argmax_{tag}_fps"] = round(8 / dt, 1)
        print(f"serve argmax [{tag}]: {dt * 1e3:.1f} ms/batch8 "
              f"({8 / dt:.1f} fps)", file=sys.stderr)

    out = json.dumps(res)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
