"""CaDIS frame-table handling: data.csv loading, video splits, relabelled
substitution, blacklist filtering, per-task class-pixel columns.

Mirrors the semantics of the reference's BaseManager.get_seg_dataframes
(managers/BaseManager.py:231-284) and utils/utils.py:577-588 get_class_info.

The frame table (one row per frame: img/lbl relative paths, per-canonical-
class pixel counts, vid_num, blacklisted, relabeled, ...) ships with the
CaDIS benchmark. `load_frame_table` searches, in order: an explicit path,
$CADIS_DATA_CSV, <repo>/data/data.csv, <data_path>/data.csv. Use
tools/build_frame_table.py to regenerate it from a CaDIS directory tree.
"""
from __future__ import annotations

import os
import pathlib

import numpy as np
import pandas as pd

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]


def load_frame_table(path: str | None = None,
                     data_path: str | None = None) -> pd.DataFrame:
    candidates = [path, os.environ.get("CADIS_DATA_CSV")]
    if data_path:
        # a user-curated table in the dataset tree wins over the vendored one
        candidates.append(pathlib.Path(data_path) / "data.csv")
    candidates.append(_REPO_ROOT / "data" / "data.csv")
    for c in candidates:
        if c and pathlib.Path(c).is_file():
            return pd.read_csv(c)
    raise FileNotFoundError(
        "CaDIS frame table (data.csv) not found; set CADIS_DATA_CSV or pass "
        "config['data']['data_csv']")


def split_dataframes(df: pd.DataFrame, split: int, mode: str = "training",
                     use_relabeled: bool = False, blacklist: bool = True,
                     random_split=None, seed: int = 0,
                     ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(train, valid) frame tables for a video split.

    For 3-way splits, `mode == 'inference'` swaps the validation videos for
    the test videos (BaseManager.py:246-249). `random_split=[f_train,
    f_valid]` is the legacy frame-level random split (BaseManager.py:235-240).
    """
    if random_split is not None:
        train = df.sample(frac=random_split[0], random_state=seed).copy()
        valid = df.drop(train.index).copy()
        rest = random_split[1] / (1 - random_split[0])
        valid = valid.sample(frac=rest, random_state=seed)
    else:
        spl = taxonomy.DATA_SPLITS[int(split)]
        if len(spl) == 2:
            train_videos, valid_videos = spl
        else:
            train_videos, valid_videos, test_videos = spl
            if mode == "inference":
                valid_videos = test_videos
        train = df.loc[df["vid_num"].isin(train_videos)].copy()
        valid = df.loc[df["vid_num"].isin(valid_videos)].copy()

    if use_relabeled:
        for part in (train, valid):
            idx = part[part["relabeled"] == 1].index
            for i in idx:
                part.loc[i, "blacklisted"] = 0  # keep the corrected frame
                name = pathlib.Path(part.loc[i, "lbl_path"]).name
                part.loc[i, "lbl_path"] = "relabeled/" + name
    if blacklist:
        train = train.drop(train[train["blacklisted"] == 1].index)
        valid = valid.drop(valid[valid["blacklisted"] == 1].index)
    return train.reset_index(), valid.reset_index()


def canonical_count_matrix(df: pd.DataFrame) -> np.ndarray:
    """(n_frames, 36) per-frame canonical-class pixel counts from the named
    columns of the frame table."""
    cols = [c for c in taxonomy.CANONICAL_NAMES]
    return df[cols].to_numpy(dtype=np.float64)


def task_count_matrix(df: pd.DataFrame, task: int) -> np.ndarray:
    """(n_frames, num_classes[+ignore]) per-frame pixel counts in task space —
    the vectorised form of get_class_info (utils/utils.py:577-588)."""
    canon = canonical_count_matrix(df)
    n_out = taxonomy.num_label_values(task)
    out = np.zeros((len(df), n_out))
    for task_id, canon_ids in taxonomy.TASK_GROUPS[task].items():
        col = n_out - 1 if task_id == taxonomy.IGNORE_VALUE else task_id
        out[:, col] += canon[:, list(canon_ids)].sum(axis=1)
    return out
