#!/usr/bin/env python
"""Host input-pipeline throughput check.

The device train step runs at ~46 fps/chip (PERF.md), so the host must
decode + remap >= 46 image/label PNG pairs per second to keep the chip fed.
This benchmark builds a synthetic CaDIS tree of real 540x960 PNGs and times
`assemble_batch` through (a) the native C++ thread-pool decode path and
(b) the Python/cv2 fallback with a thread pool, printing frames/sec and a
keep-up verdict against a target device rate.

    python tools/bench_host_pipeline.py [--frames 64] [--bs 8] [--target 46]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build_tree(root: pathlib.Path, n_frames: int, h: int, w: int):
    import cv2
    rng = np.random.default_rng(0)
    (root / "Video01" / "Images").mkdir(parents=True)
    (root / "Video01" / "Labels").mkdir(parents=True)
    rows = []
    for f in range(n_frames):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        lbl = rng.integers(0, 36, (h, w), dtype=np.uint8)
        ip = f"Video01/Images/frame{f:06d}.png"
        lp = f"Video01/Labels/frame{f:06d}.png"
        cv2.imwrite(str(root / ip), img)
        cv2.imwrite(str(root / lp), lbl)
        rows.append((ip, lp))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--target", type=float, default=46.0,
                    help="device train fps the host must sustain")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    import pandas as pd

    from miccai2021_cataract_semantic_segmentation_tpu.data.dataset import SegDataset
    from miccai2021_cataract_semantic_segmentation_tpu.data.pipeline import assemble_batch

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="cadis_host_bench_"))
    rows = build_tree(tmp, args.frames, 540, 960)
    df = pd.DataFrame({"img_path": [r[0] for r in rows],
                       "lbl_path": [r[1] for r in rows]})
    ds = SegDataset(df, task=2, data_path=str(tmp))
    batches = [np.arange(i, i + args.bs) % args.frames
               for i in range(0, args.frames, args.bs)]

    def timed(fn, label):
        fn(batches[0])  # warmup (file cache, pool spin-up)
        t0 = time.perf_counter()
        n = 0
        for idx in batches:
            fn(idx)
            n += len(idx)
        dt = time.perf_counter() - t0
        fps = n / dt
        verdict = "OK" if fps >= args.target else "BOTTLENECK"
        print(f"{label:<34s} {fps:8.1f} frames/s  "
              f"({fps / args.target:4.1f}x device rate) {verdict}")
        return fps

    native_ok = hasattr(ds, "load_batch") and ds.load_batch(batches[0]) is not None
    if native_ok:
        timed(lambda idx: assemble_batch(ds, idx), "native C++ pool decode+remap")
    else:
        print("native C++ decode unavailable (falling back to Python)")

    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=args.workers)

    class _NoNative:
        def __init__(self, inner):
            self._inner = inner

        def __getitem__(self, i):
            return self._inner[i]

    timed(lambda idx: assemble_batch(_NoNative(ds), idx, pool=pool),
          f"python cv2 path ({args.workers} threads)")
    pool.shutdown(wait=False)


if __name__ == "__main__":
    main()
