"""Segmentation metrics: confusion matrix, PA/PAC, mIoU with category views.

Device twin of the reference's utils/torch_utils.py:221-346 and numpy twin of
utils/metrics.py. The confusion matrix is computed as a one-hot matmul
(rows = predicted class, cols = ground-truth class) so it runs on the MXU
inside the jitted eval step, and is psum-reducible across a data mesh axis —
the matrix is only CxC int32, so the collective is negligible.

Semantics preserved from the reference:
  * For tasks 2/3 labels take values 0..C (C = ignore); the target one-hot is
    built over C+1 classes and the ignore column dropped (torch_utils.py:232-238).
  * IoU = diag / (row + col - diag), classes with empty denominator score 0
    (torch_utils.py:326-329).
  * Category means over `anatomies` / `instruments` / `rare` index sets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy


# ---------------------------------------------------------------------------
# Confusion matrix
# ---------------------------------------------------------------------------

def confusion_matrix(logits_or_pred: jnp.ndarray, labels: jnp.ndarray,
                     num_classes: int | None = None,
                     drop_ignore_col: bool = True) -> jnp.ndarray:
    """CxC int32 confusion matrix from NHWC logits (or NHW predicted ids).

    `labels` are network-space ids NHW (ignore id == num_classes for tasks
    2/3). Rows index predictions, columns ground truth.
    """
    if logits_or_pred.ndim == labels.ndim + 1:
        if num_classes is None:
            num_classes = logits_or_pred.shape[-1]
        pred = jnp.argmax(logits_or_pred, axis=-1)
    else:
        assert num_classes is not None, "num_classes required for id input"
        pred = logits_or_pred
    pred = pred.reshape(-1)
    lbl = labels.reshape(-1).astype(jnp.int32)
    # one-hot matmul on the MXU. bf16 one-hots (exact: values are 0/1) halve
    # the HBM traffic of the dominant (P, C) operands; accumulation is f32
    # via preferred_element_type so counts < 2^24 per call stay exact.
    oh_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.bfloat16)
    n_lbl = num_classes + 1 if drop_ignore_col else num_classes
    oh_lbl = jax.nn.one_hot(lbl, n_lbl, dtype=jnp.bfloat16)
    cm = jnp.dot(oh_pred.T, oh_lbl, preferred_element_type=jnp.float32)
    if drop_ignore_col and n_lbl != num_classes:
        cm = cm[:, :num_classes]
    return cm.astype(jnp.int32)


def confusion_matrix_np(logits: np.ndarray, labels: np.ndarray,
                        existing: np.ndarray | None = None) -> np.ndarray:
    """Host-side twin with the reference's consistency asserts (metrics.py:5-25).

    `logits` NHWC float (or NHW ids not supported here), `labels` NHW in
    0..C-1 (no ignore column handling — matches utils/metrics.py exactly).
    """
    num_classes = logits.shape[-1]
    pred = np.argmax(logits.reshape(-1, num_classes), axis=-1)
    lbl = labels.reshape(-1)
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (pred, lbl), 1)
    assert cm.sum() == lbl.size
    for i in range(num_classes):
        assert cm[i].sum() == np.sum(pred == i)
        assert cm[:, i].sum() == np.sum(lbl == i)
    if existing is not None:
        assert existing.shape == cm.shape
        cm = cm + existing
    return cm


def normalise_confusion_matrix(matrix, mode: str):
    """Row- or column-normalise; zero marginals stay zero (metrics.py:28-40)."""
    xp = jnp if isinstance(matrix, jnp.ndarray) else np
    m = matrix.astype(xp.float32)
    if mode == "row":
        s = m.sum(axis=1, keepdims=True)
    elif mode == "col":
        s = m.sum(axis=0, keepdims=True)
    else:
        raise ValueError("mode must be 'row' or 'col'")
    return m / xp.where(s == 0, 1.0, s)


# ---------------------------------------------------------------------------
# Accuracy / IoU
# ---------------------------------------------------------------------------

def pixel_accuracy(cm):
    """(overall PA, per-predicted-class mean PAC) — torch_utils.py:259-271."""
    xp = jnp if isinstance(cm, jnp.ndarray) else np
    diag = xp.diagonal(cm).astype(xp.float32)
    acc = diag.sum() / cm.sum()
    row = cm.sum(axis=1).astype(xp.float32)
    row = xp.where(row == 0, 1.0, row)
    return acc, (diag / row).mean()


def iou_from_confusion(cm):
    """Per-class IoU vector; classes with empty denominator get 0."""
    xp = jnp if isinstance(cm, jnp.ndarray) else np
    diag = xp.diagonal(cm).astype(xp.float32)
    row = cm.sum(axis=0).astype(xp.float32)  # ground-truth marginal
    col = cm.sum(axis=1).astype(xp.float32)  # prediction marginal
    denom = row + col - diag
    iou = diag / xp.where(denom == 0, 1.0, denom)
    return xp.where(denom == 0, 0.0, iou)


def mean_iou(cm, task: int, indices=None):
    """Mean IoU over `indices` (default: all real classes of `task`)."""
    iou = iou_from_confusion(cm)
    if indices is None:
        indices = tuple(range(taxonomy.TASK_NUM_CLASSES[task]))
    idx = np.asarray(indices, dtype=np.int32)
    return iou[idx].mean()


def mean_iou_breakdown(cm, task: int) -> dict:
    """Total / instruments / anatomies / rare mIoU (torch_utils.py:274-332)."""
    iou = iou_from_confusion(cm)
    cats = taxonomy.CATEGORIES[task]
    out = {
        "miou": iou[: taxonomy.TASK_NUM_CLASSES[task]].mean(),
        "per_class": iou,
    }
    for name in ("instruments", "anatomies", "rare"):
        idx = np.asarray(cats[name], dtype=np.int32)
        if idx.size:
            out[f"miou_{name}"] = iou[idx].mean()
    return out


def single_class_iou(cm, task: int, class_id: int):
    """IoU of a single class; 255 means the ignore class (torch_utils.py:335-346)."""
    xp = jnp if isinstance(cm, jnp.ndarray) else np
    if class_id == taxonomy.IGNORE_VALUE:
        class_id = cm.shape[0] - 1
    tp = cm[class_id, class_id]
    fn = cm[:, class_id].sum() - tp
    n_real = min(taxonomy.TASK_NUM_CLASSES[task], cm.shape[0])
    others = [c for c in range(n_real) if c != class_id]
    fp = cm[class_id, np.asarray(others)].sum()
    denom = (tp + fp + fn).astype(xp.float32)
    return xp.where(denom == 0, 0.0, tp.astype(xp.float32) / xp.where(denom == 0, 1.0, denom))


# ---------------------------------------------------------------------------
# Sliding-window local mIoU map (visualisation aid, torch_utils.py:189-218)
# ---------------------------------------------------------------------------

def sliding_miou(logits: jnp.ndarray, labels: jnp.ndarray,
                 kernel_size: int = 7, stride: int = 4,
                 original_size: bool = True) -> jnp.ndarray:
    """Per-window mean IoU map. logits NHWC, labels NHW -> N,H',W' float."""
    assert kernel_size % 2 == 1, "kernel size must be odd"
    n, h, w, c = logits.shape
    pred_oh = jax.nn.one_hot(jnp.argmax(logits, -1), c, dtype=jnp.float32)
    lbl_oh = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    ones = jnp.ones((kernel_size, kernel_size, 1, 1), jnp.float32)

    def window_sum(x):  # NHWC -> windowed sums via depthwise conv
        return jax.lax.conv_general_dilated(
            x, jnp.tile(ones, (1, 1, 1, c)), (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    inter = window_sum(pred_oh * lbl_oh)
    union = window_sum(jnp.maximum(pred_oh, lbl_oh))
    iou = jnp.where(union == 0, 1.0, inter / jnp.where(union == 0, 1.0, union))
    m = iou.mean(axis=-1)  # N,H',W'
    if original_size:
        m = jnp.repeat(jnp.repeat(m, stride, axis=1), stride, axis=2)
        off = kernel_size // 2
        pad_b = h - m.shape[1] - off
        pad_r = w - m.shape[2] - off
        m = jnp.pad(m, ((0, 0), (off, pad_b), (off, pad_r)))
    return m
