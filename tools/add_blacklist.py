#!/usr/bin/env python
"""Join the frame table's blacklist column onto a label table
(reference utils/add_blacklist_to_label_table.py):

    python tools/add_blacklist.py --label-table label_table.csv \
        --csv data/data.csv -o label_table_with_blacklist.csv
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--label-table", required=True)
    p.add_argument("--csv", default=None)
    p.add_argument("-o", "--out", required=True)
    args = p.parse_args()
    from miccai2021_cataract_semantic_segmentation_tpu.data.dataframe import load_frame_table
    lt = pd.read_csv(args.label_table)
    data = load_frame_table(args.csv)
    lt["blacklisted"] = data["blacklisted"]
    if "file_name" in lt:
        for ind, (name, path) in enumerate(zip(lt["file_name"], data["img_path"])):
            assert str(name) in str(path), \
                f"row {ind}: label-table file {name} does not match {path}"
    lt.to_csv(args.out, index=False)
    print(f"{len(lt)} rows -> {args.out}")


if __name__ == "__main__":
    main()
