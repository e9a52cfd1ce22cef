"""Serving-artifact throughput: the exported StableHLO program vs live jit.

    python tools/bench_serving.py [--backbone resnet50] [--batch 8] [--iters 20]

Measures the flagship serving path (uint8 in -> pad/normalise -> forward ->
argmax/confidence) twice — once through a `train/export.py` artifact
round-tripped from disk, once through the live jitted function — and
reports both rates plus the artifact overhead (expected ~0: both run the
same XLA program).

Timing uses a data-dependent chain (each iteration's input is derived on
device from the previous prediction), because on the axon tunnel
independent dispatches can acknowledge enqueue rather than completion
(PERF.md methodology note).
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--tta", action="store_true",
                    help="bench the TTA-baked artifact (10 forwards/batch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
        DeviceAugmentSpec)
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train import export as exp

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    task, bs, h, w = 2, args.batch, args.height, args.width
    model = build_model({"model": "OCRNet", "backbone": args.backbone,
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, h + 4, w, 3), jnp.float32), False)
    spec = DeviceAugmentSpec(pad=True, normalise=True)

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (bs, h, w, 3), dtype=np.uint8))

    # chain: next input = base XOR broadcast(pred) — data-dependent across
    # dispatches, negligible work next to the forward. Deliberately a
    # SEPARATE top-level jit: wrapping the loaded artifact inside another
    # traced function re-inlines the serialized module and measured ~30x
    # slower on the CPU backend (see train/export.py usage note) — both
    # candidates here must be called the way production would call them.
    @jax.jit
    def remix(pred):
        return jnp.bitwise_xor(base, pred[:, :h, :, None].astype(jnp.uint8))

    def timed(serve_fn, label):
        # warm up THROUGH the loop pattern: the first loop-produced array
        # can trigger a second compile distinct from the asarray input's
        imgs = base
        for _ in range(2):
            out = serve_fn(imgs)
            imgs = remix(out["pred"])
        jax.block_until_ready(imgs)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = serve_fn(imgs)
            imgs = remix(out["pred"])
        jax.block_until_ready(imgs)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"# {label}: {dt * 1000:.1f} ms/batch "
              f"({bs / dt:.1f} fps)", file=sys.stderr, flush=True)
        return bs / dt

    tta_scales = (0.75, 1.0, 1.5, 1.75, 2.0) if args.tta else None
    live_fps = timed(jax.jit(exp.make_serving_fn(
        model.apply, variables, spec, tta_scales=tta_scales)), "live jit")

    exported = exp.export_serving(model.apply, variables, spec, (h, w),
                                  tta_scales=tta_scales)
    with tempfile.TemporaryDirectory() as d:
        path = exp.save_serving(exported, d + "/m")
        size_mb = path.stat().st_size / 1e6
        served = exp.load_serving(path)
        art_fps = timed(served, f"artifact ({size_mb:.0f} MB)")

    print(json.dumps({
        "metric": "serving_artifact_fps", "value": round(art_fps, 1),
        "unit": "frames/sec/chip", "live_jit_fps": round(live_fps, 1),
        "artifact_overhead_pct": round(100 * (live_fps / art_fps - 1), 1),
        "batch": bs, "artifact_mb": round(size_mb, 1)}))


if __name__ == "__main__":
    main()
