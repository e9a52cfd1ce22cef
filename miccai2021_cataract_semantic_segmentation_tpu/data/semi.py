"""Semi-supervised data helpers (reference utils/semi_utis.py).

BalancedConcatDataset zips a labelled and an unlabelled dataset (index
wraps modulo each member's length, epoch length = longest member);
`video_files_from_split` maps split video ids to the CaDIS mp4 layout;
`excluded_frames_from_df` builds the per-video labelled-frame exclusion
dict used to avoid pseudo-labelling frames that have ground truth.
"""
from __future__ import annotations

import pathlib
import re
from collections import OrderedDict

import pandas as pd

_TRAIN_GROUPS = {
    "train_1": [1, 2, 3, 4, 5, 6, 7, 8],
    "train_2": [9, 10, 11, 12, 13, 14, 15, 16],
    "train_3": [17, 18, 19, 20, 21, 22, 23, 24],
    "train_4": [25],
}


class BalancedConcatDataset:
    """Each item is a tuple with one sample from every member dataset; the
    shorter members wrap around (semi_utis.py:6-23)."""

    def __init__(self, *datasets):
        self.datasets = datasets
        self.max_len = max(len(d) for d in self.datasets)

    def __getitem__(self, i):
        return tuple(d[i % len(d)] for d in self.datasets)

    def __len__(self):
        return self.max_len


class SemiSupervisedView:
    """Index-union view for end-to-end semi-supervised training.

    Indices [0, len(labeled)) fetch labeled items unchanged; indices
    [len(labeled), len(labeled)+len(unlabeled)) fetch unlabeled images
    paired with an all-`ignore_id` label plane — the real pseudo-labels are
    generated ON DEVICE inside the jitted train step (clipped_argmax of the
    eval-mode forward, ops/misc.py; reference helper torch_utils.py:7-21).

    Unlabeled members may return bare images, (img, ...) tuples (e.g.
    VideoDataset's (frame, frame_idx, vid)), or (img, lbl, meta) items —
    only the image is used.
    """

    def __init__(self, labeled, unlabeled, ignore_id: int):
        self.labeled = labeled
        self.unlabeled = unlabeled
        self.ignore_id = int(ignore_id)

    def __len__(self):
        return len(self.labeled) + len(self.unlabeled)

    def __getitem__(self, i: int):
        import numpy as np
        n_lab = len(self.labeled)
        if i < n_lab:
            return self.labeled[i]
        item = self.unlabeled[i - n_lab]
        img = item[0] if isinstance(item, tuple) else item
        lbl = np.full(img.shape[:2], self.ignore_id, np.uint8)
        return img, lbl, {"index": i, "unlabeled": True}

    def load_batch(self, indices):
        """Keep SegDataset's native C++ parallel decode for the labeled part
        of a mixed batch (data/pipeline.py:assemble_batch probes this hook):
        labeled indices decode natively, unlabeled ones per-sample, stitched
        back in order. Returns None (-> generic path) when the labeled
        member has no native loader."""
        import numpy as np
        if not hasattr(self.labeled, "load_batch"):
            return None
        idx = np.asarray(indices)
        n_lab = len(self.labeled)
        lab_pos = np.flatnonzero(idx < n_lab)
        native = self.labeled.load_batch(idx[lab_pos]) if len(lab_pos) else None
        if native is None and len(lab_pos):
            return None
        if native is not None:
            li, ll = native
            imgs = np.empty((len(idx), *li.shape[1:]), li.dtype)
            lbls = np.empty((len(idx), *ll.shape[1:]), np.uint8)
            imgs[lab_pos], lbls[lab_pos] = li, ll
        else:
            # all-unlabeled batch: the shape probe decodes idx[0], so keep
            # it and skip that index in the fill loop (video seek+decode is
            # the slowest step in this path)
            img0, lbl0, _ = self[int(idx[0])]
            imgs = np.empty((len(idx), *img0.shape), img0.dtype)
            lbls = np.empty((len(idx), *lbl0.shape), np.uint8)
            imgs[0], lbls[0] = img0, lbl0
        fill = np.flatnonzero(idx >= n_lab)
        if native is None:
            fill = fill[fill != 0]
        for k in fill:
            img, lbl, _ = self[int(idx[k])]
            imgs[k], lbls[k] = img, lbl
        return imgs, lbls


class _IndexSubset:
    """View of `base` restricted to `indices` (excludes GT-labelled frames
    from the unlabeled video pool)."""

    def __init__(self, base, indices):
        import numpy as np
        self.base = base
        self.indices = np.asarray(indices, dtype=np.int64)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.base[int(self.indices[i])]


def unlabeled_from_videos(data_path, train_df: pd.DataFrame,
                          height: int = 540, width: int = 960):
    """Build the unlabeled pool from the training split's surgery mp4s under
    `data_path` (the reference's semi recipe: unlabeled frames come from the
    full videos, semi_utis.py:26-46), EXCLUDING frames that carry ground
    truth in `train_df` (excluded_frames_from_df, semi_utis.py:49-69)."""
    import warnings
    from miccai2021_cataract_semantic_segmentation_tpu.data.dataset import VideoDataset
    ids = sorted(int(v) for v in train_df["vid_num"].unique())
    root = pathlib.Path(data_path or ".")
    files = [root / f for f in video_files_from_split(ids)]
    found = [f for f in files if f.is_file()]
    if not found:
        raise FileNotFoundError(
            f"semi-supervised mode: no training-split videos under {root} "
            f"(looked for {[str(f) for f in files[:3]]}...)")
    if len(found) < len(files):
        missing = [f.name for f in files if not f.is_file()]
        warnings.warn(
            f"semi-supervised mode: {len(missing)} of {len(files)} training-"
            f"split videos missing under {root} ({missing[:5]}...) — the "
            "unlabeled pool covers the found videos only", stacklevel=2)
    vds = VideoDataset([str(f) for f in found], height, width)
    excluded = excluded_frames_from_df(df=train_df, train_videos=ids)
    keep = []
    for v, path in enumerate(found):
        m = re.search(r"train(\d+)\.mp4$", str(path))
        vid_num = int(m.group(1)) if m else -1
        drop = set(excluded.get(vid_num, ()))
        base = int(vds.offsets[v])
        keep.extend(base + f for f in range(vds.frame_counts[v])
                    if f not in drop)
    return _IndexSubset(vds, keep)


def video_files_from_split(ids, debug: bool = False) -> list[pathlib.Path]:
    """Split video ids -> mp4 paths in the CaDIS video release layout
    (semi_utis.py:26-46)."""
    files = []
    for i in ids:
        for group, members in _TRAIN_GROUPS.items():
            if debug and group != "train_1":
                continue
            if debug and i not in (1, 3, 6):
                continue
            if i in members:
                files.append(pathlib.Path(group) / f"train{i:02d}.mp4")
                break
    return files


def excluded_frames_from_df(df: pd.DataFrame, train_videos: list[int]
                            ) -> "OrderedDict[int, list[int]]":
    """{video id: [labelled frame ids]} for non-blacklisted train frames
    (semi_utis.py:49-69). Frame id parsed from the image filename."""
    train = df.loc[df["vid_num"].isin(train_videos)]
    train = train.drop(train[train["blacklisted"] == 1].index)
    out: OrderedDict[int, list[int]] = OrderedDict()
    for _, row in train.iterrows():
        m = re.search(r"(\d+)\.\w+$", str(row["img_path"]))
        frame_id = int(m.group(1)) if m else -1
        out.setdefault(int(row["vid_num"]), []).append(frame_id)
    return out
