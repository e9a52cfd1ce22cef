"""On-hardware verification battery: drives the public API on the real TPU.

The CPU test suite (tests/, interpret-mode Pallas) cannot catch TPU-only
hazards — Mosaic block-shape limits, VMEM overflows, layout constraints
(round 3 found a real one: fused Lovász rejected H % 8 != 0 labels on
hardware while every CPU test passed). This battery exercises the paths a
reference user hits, with edge shapes, on the actual chip:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/tpu_smoke.py [--models]

Default: loss paths (fused two-scale at 540 rows, all-ignore labels,
single-scale odd sizes, v1 bucket, exact sort). --models additionally
jit-runs every model family forward (adds ~15 min of compiles).
"""
from __future__ import annotations

import argparse
import sys

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

FAILED = []


def check(name, fn):
    try:
        fn()
        print(f"PASS  {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        FAILED.append(name)
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", action="store_true",
                    help="also run the model-family forward sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
        fused_bucket_lovasz_s8)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    task, bs, h, w, c = 2, 2, 540, 960, 17

    def two_scale():
        loss_fn = build_loss({
            "name": "TwoScaleLoss", "lovasz_impl": "bucket",
            "lovasz_buckets": 1024,
            "interm": {"name": "LovaszSoftmax", "weight": 0.4},
            "final": {"name": "LovaszSoftmax", "weight": 1.0}}, task)
        li = jnp.asarray(rng.normal(0, 2, (bs, h // 4, w // 4, c)), jnp.float32)
        lf = jnp.asarray(rng.normal(0, 2, (bs, h // 4, w // 4, c)), jnp.float32)
        full = jnp.zeros((bs, h, w, c), jnp.float32)

        def lo(a, b, lab):
            out = {"interm_logits": full, "logits": full,
                   "interm_logits_s8": a, "logits_s8": b}
            return loss_fn(out, lab, epoch=0)[0]

        step = jax.jit(lambda a, b, lab: (
            lo(a, b, lab), *jax.grad(lo, argnums=(0, 1))(a, b, lab)))

        # 540 rows: H % 8 != 0 exercises the h_pad path on hardware
        lbl = jnp.asarray(rng.integers(0, 18, (bs, h, w)), jnp.int32)
        t, ga, gb = step(li, lf, lbl)
        assert jnp.isfinite(t) and jnp.isfinite(ga).all() and jnp.isfinite(gb).all()
        # all-ignore labels: exact zero loss, zero grads
        t2, g2a, g2b = step(li, lf, jnp.full((bs, h, w), 17, jnp.int32))
        assert float(t2) == 0.0 and (g2a == 0).all() and (g2b == 0).all()

    def single_odd():
        lg = jnp.asarray(rng.normal(0, 2, (bs, 67, 119, c)), jnp.float32)
        lbl = jnp.asarray(rng.integers(0, 18, (bs, 536, 952)), jnp.int32)
        v, g = jax.jit(jax.value_and_grad(lambda x: fused_bucket_lovasz_s8(
            x, lbl, classes_to_ignore=17, n_buckets=1024)))(lg)
        assert jnp.isfinite(v) and jnp.isfinite(g).all()

    def dither():
        # per-step dithered bucket assignment (lovasz_dither): seed-
        # deterministic, seed-sensitive, finite grads, close to undithered
        from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
            fused_two_scale_bucket_lovasz_s8)
        li = jnp.asarray(rng.normal(0, 2, (bs, h // 8, w // 8, c)), jnp.float32)
        lf = jnp.asarray(rng.normal(0, 2, (bs, h // 8, w // 8, c)), jnp.float32)
        lbl = jnp.asarray(rng.integers(0, 18, (bs, h, w)), jnp.int32)
        f = jax.jit(lambda a, b, l, s: fused_two_scale_bucket_lovasz_s8(
            a, b, l, 0.4, 1.0, classes_to_ignore=17, n_buckets=256,
            dither_seed=s))
        v5, v5b = float(f(li, lf, lbl, jnp.int32(5))), float(f(li, lf, lbl, jnp.int32(5)))
        v6 = float(f(li, lf, lbl, jnp.int32(6)))
        v0 = float(jax.jit(lambda a, b, l: fused_two_scale_bucket_lovasz_s8(
            a, b, l, 0.4, 1.0, classes_to_ignore=17,
            n_buckets=256))(li, lf, lbl))
        assert v5 == v5b and v5 != v6 and abs(v5 - v0) < 5e-3, (v5, v6, v0)
        g = jax.jit(jax.grad(lambda a: fused_two_scale_bucket_lovasz_s8(
            a, lf, lbl, 0.4, 1.0, classes_to_ignore=17, n_buckets=256,
            dither_seed=7)))(li)
        assert jnp.isfinite(g).all()

    def v1_and_sort():
        logits = jnp.asarray(rng.normal(0, 2, (bs, h, w, c)), jnp.float32)
        lbl = jnp.asarray(rng.integers(0, 18, (bs, h, w)), jnp.int32)
        vals = {}
        for impl in ("bucket", "sort"):
            loss_fn = build_loss({"name": "LovaszSoftmax",
                                  "lovasz_impl": impl}, task)
            v, g = jax.jit(jax.value_and_grad(
                lambda a, lf=loss_fn: lf({"logits": a}, lbl, epoch=0)[0]))(logits)
            assert jnp.isfinite(v) and jnp.isfinite(g).all()
            vals[impl] = float(v)
        assert abs(vals["bucket"] - vals["sort"]) < 2e-3, vals

    def dense_contrastive():
        # DCL V1+V2 through the LossWrapper phase gate at CaDIS shapes,
        # value+grad, incl. the all-ignore edge (zero-anchor path)
        loss_fn = build_loss({"losses": {"DenseContrastiveLoss": 1.0,
                                         "DenseContrastiveLossV2": 0.5,
                                         "LovaszSoftmax": 1.0},
                              "dc_off_at_epoch": 10}, task)
        proj = jnp.asarray(rng.normal(0, 1, (bs, 68, 120, 128)), jnp.float32)
        logits = jnp.asarray(rng.normal(0, 2, (bs, h, w, c)), jnp.float32)
        lbl = jnp.asarray(rng.integers(0, 18, (bs, h, w)), jnp.int32)

        def run(p, lab, epoch):
            def total(p):
                return loss_fn({"logits": logits, "proj_features": p},
                               lab, epoch=epoch)[0]
            return jax.jit(jax.value_and_grad(total))(p)

        v, g = run(proj, lbl, jnp.int32(0))
        assert jnp.isfinite(v) and jnp.isfinite(g).all() and jnp.abs(g).max() > 0
        v2, g2 = run(proj, jnp.full((bs, h, w), 17, jnp.int32), jnp.int32(0))
        assert jnp.isfinite(v2) and jnp.isfinite(g2).all()

    def serving_export():
        # AOT export round-trip on the chip: symbolic-batch artifact,
        # deserialize, run at two batch sizes, match the live forward
        import tempfile

        from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
            DeviceAugmentSpec)
        from miccai2021_cataract_semantic_segmentation_tpu.models import (
            build_model)
        from miccai2021_cataract_semantic_segmentation_tpu.train import (
            export as exp)
        m = build_model({"model": "FCN", "width": 0.25}, task)
        vs = m.init({"params": jax.random.PRNGKey(0)},
                    jnp.zeros((1, 128, 256, 3), jnp.float32), False)
        spec = DeviceAugmentSpec(pad=True, normalise=True)
        exported = exp.export_serving(m.apply, vs, spec, (124, 256))
        with tempfile.TemporaryDirectory() as d:
            path = exp.save_serving(exported, d + "/m")
            served = exp.load_serving(path)
            direct = exp.make_serving_fn(m.apply, vs, spec)
            for b in (1, 2):
                imgs = jnp.asarray(
                    rng.integers(0, 256, (b, 124, 256, 3)), jnp.uint8)
                got, want = served(imgs), direct(imgs)
                assert got["pred"].shape == (b, 128, 256)
                assert (np.asarray(got["pred"]) ==
                        np.asarray(want["pred"])).all()

    check("fused two-scale bucket Lovász (540 rows + all-ignore)", two_scale)
    check("fused single-scale bucket Lovász (odd sizes)", single_odd)
    check("dithered bucket assignment (lovasz_dither, seed determinism)",
          dither)
    check("v1 bucket + exact sort Lovász (full-res)", v1_and_sort)
    check("DenseContrastive V1+V2 wrapper (CaDIS shapes + all-ignore)",
          dense_contrastive)
    check("AOT serving export round-trip (symbolic batch)", serving_export)

    if args.models:
        from miccai2021_cataract_semantic_segmentation_tpu.models import (
            build_model)
        x = jnp.asarray(rng.random((2, 272, 480, 3)), jnp.float32)
        graphs = [
            ("OCRNet-r18", {"model": "OCRNet", "backbone": "resnet18",
                            "out_stride": 8}),
            ("DeepLabv3-r18", {"model": "DeepLabv3", "backbone": "resnet18",
                               "out_stride": 8}),
            ("DeepLabv3Plus-r18", {"model": "DeepLabv3Plus",
                                   "backbone": "resnet18", "out_stride": 8}),
            ("UPerNet-r18", {"model": "UPerNet",
                             "encoder": {"model": "ResNet18"}}),
            ("PointRend-r18", {"model": "PointRend",
                               "encoder": {"model": "ResNet18"}}),
            ("UPerNet-Inceptionv3", {"model": "UPerNet",
                                     "encoder": {"model": "Inceptionv3"}}),
            ("HRNetv2-w18", {"model": "HRNetv2", "width": 18}),
            ("OCRNet-hrnetv2_18", {"model": "OCRNet",
                                   "backbone": "hrnetv2_18"}),
            ("FCN", {"model": "FCN", "width": 0.5}),
            ("UNet", {"model": "UNet", "width": 0.5}),
        ]

        def fwd(g):
            def run():
                m = build_model(g, task, dtype=jnp.bfloat16)
                vs = m.init({"params": jax.random.PRNGKey(0)}, x, False)
                out = jax.jit(lambda v, xx: m.apply(v, xx, False))(vs, x)
                lg = out["logits"] if isinstance(out, dict) else out
                assert jnp.isfinite(lg.astype(jnp.float32)).all()
            return run

        for name, g in graphs:
            check(f"forward {name}", fwd(g))

    if FAILED:
        print(f"\n{len(FAILED)} FAILED: {FAILED}", flush=True)
        sys.exit(1)
    print("\nall checks passed", flush=True)


if __name__ == "__main__":
    main()
