"""Loss parity tests vs straightforward numpy oracles of the reference
semantics (losses/*.py in the reference repo)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from miccai2021_cataract_semantic_segmentation_tpu.losses import (
    build_loss, cross_entropy, lovasz_softmax, ohem_cross_entropy,
    focal_loss, generalized_dice, soft_iou,
)


def _case(num_classes=5, n=2, h=6, w=7, seed=0, n_label=None):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, h, w, num_classes)).astype(np.float32)
    labels = rng.integers(0, n_label or num_classes, size=(n, h, w)).astype(np.int32)
    return logits, labels


# ------------------------------------------------------------------ oracles

def np_lovasz(probs, labels, drop_label=None):
    """Per-class loop with dynamic 'present' filtering, as in the paper."""
    p = probs.reshape(-1, probs.shape[-1])
    l = labels.reshape(-1)
    if drop_label is not None:
        keep = l != drop_label
        p, l = p[keep], l[keep]
    losses = []
    for c in range(p.shape[-1]):
        fg = (l == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - p[:, c])
        order = np.argsort(-errors, kind="stable")
        e, f = errors[order], fg[order]
        gts = f.sum()
        inter = gts - np.cumsum(f)
        union = gts + np.cumsum(1 - f)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append(np.dot(e, jac))
    return np.mean(losses) if losses else 0.0


# ------------------------------------------------------------------ tests

def test_cross_entropy_vs_torch():
    logits, labels = _case()
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                             torch.from_numpy(labels).long()).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_cross_entropy_ignore_index():
    num_classes = 4
    logits, labels = _case(num_classes=num_classes, n_label=num_classes + 1)
    labels_ign = np.where(labels == num_classes, num_classes, labels)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels_ign),
                               ignore_index=num_classes))
    theirs = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                             torch.from_numpy(labels_ign).long(),
                             ignore_index=num_classes).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_cross_entropy_class_weights():
    logits, labels = _case(num_classes=3)
    w = np.array([0.2, 1.0, 2.5], np.float32)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               class_weights=w))
    theirs = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                             torch.from_numpy(labels).long(),
                             weight=torch.from_numpy(w)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


@pytest.mark.parametrize("n_label_extra", [0, 1])  # without / with ignore ids
def test_lovasz_vs_oracle(n_label_extra):
    num_classes = 5
    logits, labels = _case(num_classes=num_classes,
                           n_label=num_classes + n_label_extra, seed=3)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    ours = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels)))
    oracle = np_lovasz(np.asarray(probs), labels)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_lovasz_classes_to_ignore_matches_pixel_drop():
    num_classes = 4
    logits, labels = _case(num_classes=num_classes, n_label=num_classes + 1, seed=7)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    ours = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                classes_to_ignore=num_classes))
    oracle = np_lovasz(probs, labels, drop_label=num_classes)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_lovasz_perfect_prediction_is_zero():
    labels = np.zeros((1, 8, 8), np.int32)
    labels[:, :4] = 1
    logits = np.eye(3, dtype=np.float32)[labels] * 50
    val = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels)))
    assert val < 1e-5


def test_lovasz_gradient_finite():
    logits, labels = _case(seed=11)
    g = jax.grad(lambda x: lovasz_softmax(x, jnp.asarray(labels)))(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ohem_vs_oracle():
    num_classes = 6
    logits, labels = _case(num_classes=num_classes, n=1, h=16, w=16, seed=5,
                           n_label=num_classes + 1)
    thresh, min_kept = 0.7, 50
    ours = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                    ignore_index=num_classes, thresh=thresh,
                                    min_kept=min_kept))
    # oracle: reference OhemCrossEntropy.py:22-40
    lg = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tg = torch.from_numpy(labels).long()
    pixel_losses = F.cross_entropy(lg, tg, ignore_index=num_classes,
                                   reduction="none").view(-1)
    mask = tg.view(-1) != num_classes
    tmp = tg.clone()
    tmp[tmp == num_classes] = 0
    pred = F.softmax(lg, dim=1).gather(1, tmp.unsqueeze(1))
    pred, ind = pred.contiguous().view(-1)[mask].contiguous().sort()
    min_value = pred[min(min_kept, pred.numel() - 1)]
    threshold = max(min_value, thresh)
    kept = pixel_losses[mask][ind][pred < threshold]
    np.testing.assert_allclose(ours, kept.mean().item(), rtol=1e-5)


def test_focal_vs_oracle():
    logits, labels = _case(seed=9)
    gamma = 2.0
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=gamma))
    lg = torch.from_numpy(logits).reshape(-1, logits.shape[-1])
    tg = torch.from_numpy(labels).long().view(-1, 1)
    logpt = F.log_softmax(lg, dim=1).gather(1, tg).view(-1)
    pt = logpt.exp()
    oracle = (-((1 - pt) ** gamma) * logpt).mean().item()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_gen_dice_vs_oracle():
    num_classes = 4
    logits, labels = _case(num_classes=num_classes, n_label=num_classes + 1, seed=2)
    for weights in (None, "auto"):
        ours = float(generalized_dice(jnp.asarray(logits), jnp.asarray(labels),
                                      weights=weights))
        pred = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1)).reshape(-1, num_classes)
        tgt = np.eye(num_classes + 1)[labels.reshape(-1)][:, :num_classes]
        dividend = (pred * tgt).sum(0)
        divisor = (pred + tgt).sum(0)
        if weights == "auto":
            w = tgt.sum(0) ** 2
            w[w == 0] = 1
            w = 1 / w
            dividend, divisor = dividend * w, divisor * w
        frac = dividend / divisor
        oracle = 1 - 2 * frac[divisor != 0].mean()
        np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_soft_iou_vs_oracle():
    num_classes = 4
    logits, labels = _case(num_classes=num_classes, seed=4)
    ours = float(soft_iou(jnp.asarray(logits), jnp.asarray(labels)))
    pred = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1)).reshape(-1, num_classes)
    tgt = np.eye(num_classes)[labels.reshape(-1)]
    inter = (pred * tgt).sum(0)
    union = (pred + tgt - pred * tgt).sum(0)
    oracle = -(inter[union != 0] / union[union != 0]).mean()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_build_loss_two_scale():
    task = 2
    num_classes = 17
    rng = np.random.default_rng(0)
    final = rng.normal(size=(1, 16, 16, num_classes)).astype(np.float32)
    interm = rng.normal(size=(1, 8, 8, num_classes)).astype(np.float32)
    labels = rng.integers(0, 18, size=(1, 16, 16)).astype(np.int32)
    loss_fn = build_loss({
        "name": "TwoScaleLoss",
        "interm": {"name": "LovaszSoftmax"},
        "final": {"name": "LovaszSoftmax"},
    }, task)
    total, terms = loss_fn({"logits": jnp.asarray(final),
                            "interm_logits": jnp.asarray(interm)},
                           jnp.asarray(labels))
    assert np.isfinite(float(total))
    assert "TwoScaleLoss" in terms


def test_build_loss_wrapper_weighting_and_phase():
    task = 1
    logits, labels = _case(num_classes=8, n_label=8)
    outputs = {"logits": jnp.asarray(logits)}
    loss_fn = build_loss({
        "name": "LossWrapper",
        "losses": {"CrossEntropyLoss": 0.5, "LovaszSoftmax": 2.0},
        "dc_off_at_epoch": 10,
    }, task)
    total, terms = loss_fn(outputs, jnp.asarray(labels), epoch=20)
    ce = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    lv = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(float(total), 0.5 * ce + 2.0 * lv, rtol=1e-5)
    # before dc_off_at_epoch the Lovász term is gated off (LossWrapper.py:45-50)
    total_early, terms_early = loss_fn(outputs, jnp.asarray(labels), epoch=5)
    np.testing.assert_allclose(float(total_early), 0.5 * ce, rtol=1e-5)
    assert float(terms_early["LovaszSoftmax"]) == 0.0
