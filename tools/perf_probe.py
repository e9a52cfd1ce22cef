"""Per-component timing breakdown of the flagship train step.

Times each piece of the OCRNet-R50-os8 bs8 544x960 step in isolation
(forward, forward+loss, full step, loss on synthetic logits, logit resize,
confusion matrix, augmentation, adam update) so optimisation work targets
the real bottleneck instead of guesses. Run on the TPU:

    python tools/perf_probe.py [--steps 10]
"""
from __future__ import annotations

import argparse
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import DeviceAugmentSpec
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
        lovasz_softmax, fused_two_scale_lovasz)
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.ops.augment import augment_batch
    from miccai2021_cataract_semantic_segmentation_tpu.ops.metrics import confusion_matrix
    from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import make_schedule
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import create_train_state
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import make_train_step

    task, bs, h, w = 2, 8, 540, 960
    n = args.steps
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model({"model": "OCRNet", "backbone": "resnet50",
                         "out_stride": 8}, task, dtype=dtype)
    loss_cfg = {"name": "TwoScaleLoss", "lovasz_impl": "bucket",
                "interm": {"name": "LovaszSoftmax", "weight": 0.4},
                "final": {"name": "LovaszSoftmax", "weight": 1.0}}
    loss_fn = build_loss(loss_cfg, task)
    spec = DeviceAugmentSpec(pad=True, flip=True, blur=True, colorjitter=True)
    schedule = make_schedule({"epochs": 50, "learning_rate": 1e-4}, 100)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((bs, h + 4, w, 3)), {}, schedule)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, h, w, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 18, (bs, h, w), dtype=np.uint8))
    key = jax.random.PRNGKey(1)

    rows = []

    def probe(name, fn, *a, **kw):
        try:
            ms = timeit(fn, *a, n=n, **kw)
            rows.append((name, ms))
            print(f"{name:<42s} {ms:9.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<42s} FAILED: {e}", flush=True)

    # --- full step
    train_step = make_train_step(loss_fn, spec, task, donate=False)
    probe("full train step", train_step, state, images, labels, key, 0)

    # --- augmentation alone
    aug = jax.jit(lambda k, im, lb: augment_batch(k, im, lb, spec, True))
    probe("augment_batch", aug, key, images, labels)

    x_aug, lbl_aug = aug(key, images, labels)

    # --- forward only (train mode, with batch stats)
    def fwd(params, stats, x):
        out, _ = state.apply_fn({"params": params, "batch_stats": stats},
                                x, True, mutable=["batch_stats"])
        return out["logits"]
    fwd_j = jax.jit(fwd)
    probe("forward only (train mode)", fwd_j, state.params, state.batch_stats, x_aug)

    # --- forward (eval mode)
    fwd_e = jax.jit(lambda p, s, x: state.apply_fn(
        {"params": p, "batch_stats": s}, x, False)["logits"])
    probe("forward only (eval mode)", fwd_e, state.params, state.batch_stats, x_aug)

    # --- forward + loss + grad (no optimiser, no metrics)
    def fwd_loss_grad(params, stats, x, lbl):
        def lf(p):
            out, _ = state.apply_fn({"params": p, "batch_stats": stats},
                                    x, True, mutable=["batch_stats"])
            total, _ = loss_fn(out, lbl, epoch=0)
            return total
        return jax.value_and_grad(lf)(params)
    probe("fwd+loss+grad", jax.jit(fwd_loss_grad),
          state.params, state.batch_stats, x_aug, lbl_aug)

    # --- fwd + grad with plain CE loss (isolates lovasz cost inside the step)
    ce_loss = build_loss({"name": "CrossEntropyLoss"}, task)

    def fwd_ce_grad(params, stats, x, lbl):
        def lf(p):
            out, _ = state.apply_fn({"params": p, "batch_stats": stats},
                                    x, True, mutable=["batch_stats"])
            total, _ = ce_loss(out, lbl, epoch=0)
            return total
        return jax.value_and_grad(lf)(params)
    probe("fwd+CEloss+grad", jax.jit(fwd_ce_grad),
          state.params, state.batch_stats, x_aug, lbl_aug)

    # --- loss alone on synthetic logits (full res, both scales)
    hp, wp = h + 4, w
    lg8 = jax.random.normal(key, (bs, hp, wp, 17), jnp.float32)
    lg8i = jax.random.normal(key, (bs, hp, wp, 17), jnp.float32)
    lblp = jnp.asarray(rng.integers(0, 18, (bs, hp, wp), dtype=np.uint8)).astype(jnp.int32)

    def loss_only(i, f, l):
        return fused_two_scale_lovasz(i, f, l, 0.4, 1.0, impl="bucket")
    probe("fused two-scale bucket lovasz (fwd)", jax.jit(loss_only), lg8i, lg8, lblp)

    def loss_grad(i, f, l):
        return jax.value_and_grad(lambda a, b: loss_only(a, b, l), argnums=(0, 1))(i, f)
    probe("fused two-scale bucket lovasz (fwd+bwd)", jax.jit(loss_grad), lg8i, lg8, lblp)

    def sort_loss(i, f, l):
        return fused_two_scale_lovasz(i, f, l, 0.4, 1.0, impl="sort")
    probe("fused two-scale sort lovasz (fwd)", jax.jit(sort_loss), lg8i, lg8, lblp)

    # --- logit upsample (stride-8 -> full res) fwd and vjp
    small = jax.random.normal(key, (bs, hp // 8, wp // 8, 17), dtype)
    up = jax.jit(lambda s: resize_bilinear(s.astype(jnp.float32), (hp, wp),
                                           align_corners=True))
    probe("logit upsample 68x120->544x960 (f32 fwd)", up, small)

    def up_vjp(s):
        y, vjp = jax.vjp(lambda t: resize_bilinear(
            t.astype(jnp.float32), (hp, wp), align_corners=True), s)
        return vjp(y)
    probe("logit upsample (fwd+vjp)", jax.jit(up_vjp), small)

    # --- confusion matrix
    probe("confusion_matrix (full res)", jax.jit(confusion_matrix), lg8, lblp)

    # --- optimiser update alone
    def adam_update(st, grads):
        return st.apply_gradients(grads, st.batch_stats)
    grads = jax.tree.map(jnp.zeros_like, state.params)
    probe("optimiser apply_gradients", jax.jit(adam_update), state, grads)

    print("\nSummary (ms):")
    for name, ms in rows:
        print(f"  {name:<42s} {ms:9.2f}")


if __name__ == "__main__":
    main()
