#!/usr/bin/env python
"""Build the CaDIS frame table (data.csv) from a dataset directory tree.

Combines the reference's utils/df_from_data.py (path listing) and
utils/data_class_analysis.py:get_class_numbers (per-frame canonical-class
pixel counts) into one pass:

    python tools/build_frame_table.py --path /path/to/cadis -o data/data.csv

Expected tree: <path>/VideoXX/Images/*.png + <path>/VideoXX/Labels/*.png
(labels are single-channel uint8 canonical ids 0..35).
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np
import pandas as pd
from PIL import Image

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy  # noqa: E402


def build_frame_table(data_path: pathlib.Path, count_pixels: bool = True) -> pd.DataFrame:
    records = []
    videos = sorted(f for f in data_path.iterdir()
                    if f.is_dir() and f.name.startswith("Video"))
    for folder in videos:
        vid_num = int(folder.name[-2:])
        images = sorted((folder / "Images").iterdir())
        for k, image in enumerate(images):
            rec = {
                "vid_num": vid_num,
                "img_path": str(pathlib.PurePosixPath(folder.name) / "Images" / image.name),
                "lbl_path": str(pathlib.PurePosixPath(folder.name) / "Labels" / image.name),
                "per_video_index": k,
                "blacklisted": 0,
                "relabeled": 0,
            }
            if count_pixels:
                lbl = np.asarray(Image.open(data_path / rec["lbl_path"]))
                if lbl.ndim == 3:
                    lbl = lbl[..., 0]
                counts = np.bincount(lbl.reshape(-1), minlength=256)
                if counts[36:].sum():
                    raise ValueError(f"{rec['lbl_path']}: ids outside 0..35 found")
                for i, name in enumerate(taxonomy.CANONICAL_NAMES):
                    rec[name] = int(counts[i])
            records.append(rec)
    df = pd.DataFrame.from_records(records)
    return df.sort_values(by=["vid_num", "img_path"]).reset_index(drop=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-p", "--path", required=True, help="CaDIS dataset root")
    p.add_argument("-o", "--out", default="data/data.csv")
    p.add_argument("--no-pixel-counts", action="store_true",
                   help="skip label decoding (paths only, like df_from_data.py)")
    args = p.parse_args()
    df = build_frame_table(pathlib.Path(args.path), not args.no_pixel_counts)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(out, index=False)
    print(f"{len(df)} frames x {df['vid_num'].nunique()} videos -> {out}")


if __name__ == "__main__":
    main()
