#!/usr/bin/env python
"""Offline class-distribution and split-quality analysis on the frame table.

Equivalent of the reference's utils/data_class_analysis.py analysis passes
(class distribution per task, split-quality evaluation over video splits)
re-derived on the vectorised count matrices:

    python tools/class_analysis.py --csv data/data.csv [--split 2]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy  # noqa: E402
from miccai2021_cataract_semantic_segmentation_tpu.data.dataframe import (  # noqa: E402
    task_count_matrix)


def class_distribution(df: pd.DataFrame, task: int) -> pd.DataFrame:
    """Per task class: frame presence frequency + pixel share."""
    counts = task_count_matrix(df, task)
    presence = (counts > 0).mean(axis=0)
    pixel_share = counts.sum(axis=0) / counts.sum()
    base = list(taxonomy.TASK_CLASS_NAMES[task])
    names = (base + ["Ignore"] * (counts.shape[1] - len(base)))[: counts.shape[1]]
    return pd.DataFrame({"class": names, "frame_freq": presence,
                         "pixel_share": pixel_share})


def split_quality(df: pd.DataFrame, split: int) -> dict:
    """Per-subset class coverage: a good split has every class present in
    every subset (reference data_class_analysis.py:277-318)."""
    spl = taxonomy.DATA_SPLITS[int(split)]
    names = ["train", "valid", "test"][: len(spl)]
    report = {}
    for name, vids in zip(names, spl):
        part = df.loc[df["vid_num"].isin(vids)]
        for task in (1, 2, 3):
            counts = task_count_matrix(part, task)
            n_real = taxonomy.TASK_NUM_CLASSES[task]
            missing = [taxonomy.TASK_CLASS_NAMES[task][i]
                       for i in range(n_real) if counts[:, i].sum() == 0]
            report[f"{name}_t{task}_missing"] = missing
        report[f"{name}_frames"] = len(part)
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default=None)
    p.add_argument("--split", type=int, default=2)
    args = p.parse_args()
    from miccai2021_cataract_semantic_segmentation_tpu.data.dataframe import load_frame_table
    df = load_frame_table(args.csv)
    for task in (1, 2, 3):
        print(f"--- task {task} class distribution ---")
        print(class_distribution(df, task).to_string(index=False,
                                                     float_format="%.4f"))
    print(f"--- split {args.split} quality ---")
    for k, v in split_quality(df, args.split).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
