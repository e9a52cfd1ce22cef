"""Per-op device trace of the flagship EVAL step (the inference hot loop).

Captures a jax.profiler trace and parses the xplane protobuf directly
(the tensorboard_plugin_profile converter is broken in this image): plane
"/device:TPU:0", line "XLA Ops", event durations in picoseconds.

    python tools/eval_profile.py [--steps 5] [--top 40]
"""
from __future__ import annotations

import argparse
import collections
import glob
import sys
import tempfile

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def parse_xplane(tmpdir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(f"{tmpdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {tmpdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name or plane.name.endswith("#"):
            continue
        meta = plane.event_metadata
        per_op = collections.Counter()
        n_ev = collections.Counter()
        span_lo, span_hi = None, None
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            for e in line.events:
                name = meta[e.metadata_id].name
                per_op[name] += e.duration_ps / 1e9  # -> ms
                n_ev[name] += 1
                lo = e.offset_ps
                hi = e.offset_ps + e.duration_ps
                span_lo = lo if span_lo is None else min(span_lo, lo)
                span_hi = hi if span_hi is None else max(span_hi, hi)
        total = sum(per_op.values())
        span = (span_hi - span_lo) / 1e9 if span_lo is not None else 0.0
        yield plane.name, total, span, per_op.most_common(top), n_ev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import DeviceAugmentSpec
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import make_schedule
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import create_train_state
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import make_eval_step

    task, bs, h, w = 2, 8, 540, 960
    model = build_model({"model": "OCRNet", "backbone": "resnet50",
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    spec = DeviceAugmentSpec(pad=True, flip=False, blur=False, colorjitter=False)
    schedule = make_schedule({"epochs": 50, "learning_rate": 1e-4}, 100)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((bs, h + 4, w, 3)), {}, schedule)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, h, w, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 18, (bs, h, w), dtype=np.uint8))
    step = make_eval_step(spec, 17)

    logits, _, cm = step(state, images, labels)  # compile + warmup
    jax.block_until_ready(cm)

    tmpdir = tempfile.mkdtemp(prefix="cadis_evalprof_")
    with jax.profiler.trace(tmpdir):
        for _ in range(args.steps):
            logits, _, cm = step(state, images, labels)
        jax.block_until_ready(cm)

    for name, total, span, rows, n_ev in parse_xplane(tmpdir, args.top):
        print(f"== plane {name}: op-total {total / args.steps:.2f} ms/step, "
              f"span {span / args.steps:.2f} ms/step (over {args.steps} steps)")
        for op, ms in rows:
            print(f"  {ms / args.steps:8.3f} ms  x{n_ev[op]:<4d} {op}")


if __name__ == "__main__":
    main()
