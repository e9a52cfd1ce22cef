"""Metric parity tests: device vs numpy twins and hand-computed values."""
import jax.numpy as jnp
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.ops import (
    confusion_matrix, confusion_matrix_np, normalise_confusion_matrix,
    pixel_accuracy, iou_from_confusion, mean_iou, mean_iou_breakdown,
    single_class_iou, sliding_miou,
)


def _random_case(num_classes=5, n=2, h=8, w=9, seed=0, n_label=None):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, h, w, num_classes)).astype(np.float32)
    labels = rng.integers(0, n_label or num_classes, size=(n, h, w))
    return logits, labels


def test_confusion_matrix_matches_numpy():
    logits, labels = _random_case()
    cm_dev = np.asarray(confusion_matrix(jnp.asarray(logits), jnp.asarray(labels),
                                         drop_ignore_col=False))
    cm_np = confusion_matrix_np(logits, labels)
    np.testing.assert_array_equal(cm_dev, cm_np)
    assert cm_dev.sum() == labels.size


def test_confusion_matrix_ignore_column_dropped():
    # labels may take value C (= ignore); those pixels land in the dropped col
    num_classes = 4
    logits, labels = _random_case(num_classes=num_classes, n_label=num_classes + 1)
    cm = np.asarray(confusion_matrix(jnp.asarray(logits), jnp.asarray(labels)))
    assert cm.shape == (num_classes, num_classes)
    assert cm.sum() == (labels != num_classes).sum()


def test_normalise():
    m = np.array([[2, 2], [0, 0]], dtype=np.int64)
    row = normalise_confusion_matrix(m, "row")
    np.testing.assert_allclose(row, [[0.5, 0.5], [0, 0]])
    col = normalise_confusion_matrix(m, "col")
    np.testing.assert_allclose(col, [[1, 1], [0, 0]])
    with pytest.raises(ValueError):
        normalise_confusion_matrix(m, "diag")


def test_pixel_accuracy_hand_value():
    # rows = pred, cols = gt
    cm = np.array([[3, 1], [1, 5]], dtype=np.int64)
    acc, acc_pc = pixel_accuracy(cm)
    np.testing.assert_allclose(acc, 8 / 10)
    np.testing.assert_allclose(acc_pc, (3 / 4 + 5 / 6) / 2)


def test_iou_hand_value():
    cm = np.array([[3, 1, 0], [1, 5, 0], [0, 0, 0]], dtype=np.int64)
    iou = iou_from_confusion(cm)
    # class 0: tp=3, fp=1, fn=1 -> 3/5; class 1: tp=5, fp=1, fn=1 -> 5/7
    np.testing.assert_allclose(iou, [3 / 5, 5 / 7, 0.0], rtol=1e-6)  # absent class -> 0
    np.testing.assert_allclose(mean_iou(cm, task=1, indices=(0, 1)),
                               (3 / 5 + 5 / 7) / 2, rtol=1e-6)


def test_breakdown_task1():
    rng = np.random.default_rng(1)
    cm = rng.integers(0, 50, size=(8, 8)).astype(np.int64)
    out = mean_iou_breakdown(cm, task=1)
    iou = iou_from_confusion(cm)
    np.testing.assert_allclose(out["miou"], iou.mean(), rtol=1e-6)
    np.testing.assert_allclose(out["miou_anatomies"], iou[[0, 4, 5, 6]].mean(), rtol=1e-6)
    np.testing.assert_allclose(out["miou_instruments"], iou[[7]].mean(), rtol=1e-6)
    np.testing.assert_allclose(out["miou_rare"], iou[[2]].mean(), rtol=1e-6)


def test_single_class_iou():
    cm = np.array([[3, 1], [1, 5]], dtype=np.int64)
    np.testing.assert_allclose(float(single_class_iou(cm, 1, 0)), 3 / 5)


def test_sliding_miou_shapes():
    logits, labels = _random_case(num_classes=3, n=1, h=16, w=16)
    m = sliding_miou(jnp.asarray(logits), jnp.asarray(labels), kernel_size=7, stride=4)
    assert m.shape == (1, 16, 16)
    m2 = sliding_miou(jnp.asarray(logits), jnp.asarray(labels), 7, 4, original_size=False)
    assert m2.shape == (1, 3, 3)
    assert float(jnp.max(m2)) <= 1.0 and float(jnp.min(m2)) >= 0.0


def test_sliding_miou_perfect_prediction():
    labels = np.zeros((1, 12, 12), np.int32)
    labels[:, :6] = 1
    logits = np.eye(3, dtype=np.float32)[labels] * 10
    m = sliding_miou(jnp.asarray(logits), jnp.asarray(labels), 5, 2, original_size=False)
    np.testing.assert_allclose(np.asarray(m), 1.0)
