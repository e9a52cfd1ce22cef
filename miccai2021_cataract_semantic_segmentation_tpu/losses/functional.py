"""Jittable segmentation losses (NHWC logits, NHW integer labels).

Re-derivations of the reference loss zoo under XLA's static-shape rules:

  * Lovász-Softmax (losses/LovaszSoftmax.py): the data-dependent "classes
    present" filter becomes a presence-masked mean over a fixed class loop;
    dropped "ignore" pixels become (fg=0, error=0) entries which sort to the
    tail and multiply zero error — provably identical loss value.
  * OHEM CE (losses/OhemCrossEntropy.py): the data-dependent keep-set becomes
    sort + dynamic-index threshold + weight mask (fixed shapes throughout).
  * Focal / generalised Dice / SoftIoU: direct masked-mean ports.

All reductions return f32 scalars. Class loops are Python loops over a static
class count — they unroll into one fused XLA computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _flatten_logits(logits: Array) -> Array:
    return logits.reshape(-1, logits.shape[-1])


def cross_entropy(logits: Array, labels: Array, ignore_index: int = -1,
                  class_weights: Array | None = None) -> Array:
    """torch.nn.CrossEntropyLoss semantics (mean over non-ignored pixels,
    class-weighted mean if weights given)."""
    num_classes = logits.shape[-1]
    lp = jax.nn.log_softmax(_flatten_logits(logits).astype(jnp.float32), axis=-1)
    lbl = labels.reshape(-1)
    valid = (lbl != ignore_index) if ignore_index >= 0 else jnp.ones_like(lbl, jnp.bool_)
    safe = jnp.clip(lbl, 0, num_classes - 1)
    nll = -jnp.take_along_axis(lp, safe[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[safe] * valid
    else:
        w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def per_pixel_cross_entropy(logits: Array, labels: Array,
                            ignore_index: int = -1) -> tuple[Array, Array]:
    """(per-pixel NLL, valid mask), both flattened — building block for OHEM."""
    num_classes = logits.shape[-1]
    lp = jax.nn.log_softmax(_flatten_logits(logits).astype(jnp.float32), axis=-1)
    lbl = labels.reshape(-1)
    valid = (lbl != ignore_index) if ignore_index >= 0 else jnp.ones_like(lbl, jnp.bool_)
    safe = jnp.clip(lbl, 0, num_classes - 1)
    nll = -jnp.take_along_axis(lp, safe[:, None], axis=-1)[:, 0]
    return nll, valid


# ---------------------------------------------------------------------------
# Lovász-Softmax
# ---------------------------------------------------------------------------

def _lovasz_grad_from_sorted(fg_sorted: Array) -> Array:
    """Gradient of the Lovász extension w.r.t. sorted errors (Alg. 1).

    fg_sorted: (..., P) sorted foreground indicators. Returns (..., P).
    """
    gts = jnp.sum(fg_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=-1)
    jaccard = 1.0 - intersection / union
    # first-difference along the pixel axis, keeping element 0
    return jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1)


@jax.custom_vjp
def _sorted_lovasz_per_class(errors_t: Array, fg_t: Array) -> Array:
    """(R, P) non-negative errors + {0,1} fg -> (R,) per-row Lovász terms.

    TPU-optimised: the descending co-sort of (errors, fg) is ONE single-key
    uint32 sort — fg is packed into the error's mantissa LSB (<=1-ulp value
    perturbation; ties between equal truncated errors put fg=1 first, an
    arbitrary-but-consistent order, exactly like any float sort's ties).
    The custom VJP replaces autodiff's backward scatter-through-sort (the
    dominant cost on TPU: ~1s for 8x544x960x17) with a second key sort that
    un-permutes the Lovász gradient (~2x faster end to end).
    """
    key, _ = _lovasz_pack_sort(errors_t, fg_t, with_perm=False)
    e_sorted, fg_sorted = _lovasz_unpack(key)
    g = _lovasz_grad_from_sorted(fg_sorted)
    return jnp.sum(e_sorted * g, axis=-1)


def _lovasz_pack_sort(errors_t, fg_t, with_perm: bool):
    e_bits = jax.lax.bitcast_convert_type(errors_t.astype(jnp.float32), jnp.uint32)
    packed = (e_bits & jnp.uint32(0xFFFFFFFE)) | fg_t.astype(jnp.uint32)
    key = ~packed  # ascending sort of ~key == descending by (error, fg)
    if not with_perm:
        (key_s,) = jax.lax.sort((key,), dimension=1, num_keys=1)
        return key_s, None
    iota = jax.lax.broadcasted_iota(jnp.int32, errors_t.shape, 1)
    key_s, perm = jax.lax.sort((key, iota), dimension=1, num_keys=1)
    return key_s, perm


def _lovasz_unpack(key_sorted):
    packed = ~key_sorted
    fg_sorted = (packed & jnp.uint32(1)).astype(jnp.float32)
    e_sorted = jax.lax.bitcast_convert_type(packed & jnp.uint32(0xFFFFFFFE),
                                            jnp.float32)
    return e_sorted, fg_sorted


def _sorted_lovasz_fwd(errors_t, fg_t):
    key_s, perm = _lovasz_pack_sort(errors_t, fg_t, with_perm=True)
    e_sorted, fg_sorted = _lovasz_unpack(key_s)
    g = _lovasz_grad_from_sorted(fg_sorted)
    return jnp.sum(e_sorted * g, axis=-1), (perm, g)


def _sorted_lovasz_bwd(res, ct):
    perm, g = res
    # un-permute g back to pixel order: one int-keyed sort (no scatter)
    _, g_orig = jax.lax.sort((perm, g), dimension=1, num_keys=1)
    return g_orig * ct[:, None], None


_sorted_lovasz_per_class.defvjp(_sorted_lovasz_fwd, _sorted_lovasz_bwd)


def lovasz_errors(probs: Array, labels: Array, valid: Array):
    """Flattened (C, P) transposed error/fg matrices + (C,) presence mask —
    the sort-ready building blocks shared by single- and fused two-scale
    Lovász."""
    num_classes = probs.shape[-1]
    fg = (labels[:, None] == jnp.arange(num_classes)[None, :]).astype(jnp.float32)
    fg = fg * valid[:, None].astype(jnp.float32)
    errors = jnp.abs(fg - probs.astype(jnp.float32))
    errors = errors * valid[:, None]  # dropped pixels: error 0, fg 0
    present = (jnp.sum(fg, axis=0) > 0).astype(jnp.float32)
    return errors.T, fg.T, present


def lovasz_errors_from_logits(logits_flat: Array, labels: Array, valid: Array):
    """(errors_t, fg_t, present) built DIRECTLY in the transposed (C, P)
    layout: one transpose of the logits, softmax along the class (sublane)
    axis, fg/errors constructed transposed. Avoids the 2 extra (P, C)->(C, P)
    materialisations of `lovasz_errors(softmax(logits), ...)` — on TPU those
    lower to 17-step while loops of dynamic slices and cost more than the
    whole Lovász kernel."""
    num_classes = logits_flat.shape[-1]
    lt = logits_flat.T.astype(jnp.float32)                    # (C, P)
    probs_t = jax.nn.softmax(lt, axis=0)
    v = valid[None, :].astype(jnp.float32)
    fg_t = (labels[None, :] ==
            jnp.arange(num_classes)[:, None]).astype(jnp.float32) * v
    errors_t = jnp.abs(fg_t - probs_t) * v
    present = (jnp.sum(fg_t, axis=1) > 0).astype(jnp.float32)
    return errors_t, fg_t, present


def _per_class_fn(impl: str):
    if impl == "bucket":
        from miccai2021_cataract_semantic_segmentation_tpu.losses.bucket_lovasz import (
            bucket_lovasz_per_class)
        return bucket_lovasz_per_class
    return _sorted_lovasz_per_class


def _lovasz_flat(logits_flat: Array, labels: Array, valid: Array,
                 class_mask: Array, impl: str = "sort") -> Array:
    """Lovász-Softmax on flattened (P, C) logits / (P,) labels.

    `valid` (P,) masks pixels out entirely; `class_mask` (C,) masks which
    class channels participate in the average ('all' -> ones; a subset list
    -> indicator; the 'present' filter is applied on top dynamically).
    """
    errors_t, fg_t, present = lovasz_errors_from_logits(logits_flat, labels,
                                                        valid)
    per_class = _per_class_fn(impl)(errors_t, fg_t)  # (C,)
    m = class_mask.astype(jnp.float32) * present
    return jnp.sum(per_class * m) / jnp.maximum(jnp.sum(m), 1.0)


def lovasz_softmax(logits: Array, labels: Array,
                   classes_to_consider=None,
                   classes_to_ignore: int | None = None,
                   per_image: bool = False, impl: str = "sort") -> Array:
    """Multi-class Lovász-Softmax (reference losses/LovaszSoftmax.py:19-95).

    `classes_to_consider`: None/'present' (default) averages over classes
    present in the labels; 'all' over every channel; or an explicit id list.
    `classes_to_ignore`: a label value whose pixels are excluded entirely
    (the exp-2/3 ignore id). Default None matches the reference's default
    config, where ignore pixels count as background for every class.
    `impl`: 'sort' (exact, reference semantics) or 'bucket' (sort-free
    histogram formulation, O(1/2048) approximation — see bucket_lovasz.py).
    """
    num_classes = logits.shape[-1]
    if classes_to_consider in (None, "present", "all"):
        class_mask = jnp.ones(num_classes)
    else:
        class_mask = jnp.zeros(num_classes).at[jnp.asarray(classes_to_consider)].set(1.0)
    force_all = classes_to_consider == "all"

    def flat(lg, l):
        v = (l != classes_to_ignore) if classes_to_ignore is not None \
            else jnp.ones_like(l, jnp.bool_)
        if force_all:
            # 'all': no presence filter — emulate by passing full mask and
            # overriding presence with validity of the class list only
            return _lovasz_flat_all(lg.reshape(-1, num_classes), l.reshape(-1),
                                    v.reshape(-1), class_mask, impl)
        return _lovasz_flat(lg.reshape(-1, num_classes), l.reshape(-1),
                            v.reshape(-1), class_mask, impl)

    if per_image:
        return jnp.mean(jax.vmap(flat)(logits, labels))
    return flat(logits, labels)


def _lovasz_flat_all(logits_flat, labels, valid, class_mask, impl: str = "sort"):
    errors_t, fg_t, _ = lovasz_errors_from_logits(logits_flat, labels, valid)
    per_class = _per_class_fn(impl)(errors_t, fg_t)
    m = class_mask.astype(jnp.float32)
    return jnp.sum(per_class * m) / jnp.maximum(jnp.sum(m), 1.0)


def fused_two_scale_lovasz(interm_logits: Array, final_logits: Array,
                           labels: Array, w_interm: float, w_final: float,
                           classes_to_ignore: int | None = None,
                           impl: str = "sort") -> Array:
    """TwoScaleLoss(Lovász, Lovász) with BOTH scales' class rows stacked into
    ONE (2C, P) sort call — the sort dominates the loss cost on TPU and XLA
    parallelises rows, so fusing the scales roughly halves the loss time
    vs two sequential Lovász evaluations (reference losses/TwoScaleLoss.py
    computes them sequentially)."""
    num_classes = final_logits.shape[-1]
    l_flat = labels.reshape(-1)
    valid = (l_flat != classes_to_ignore) if classes_to_ignore is not None \
        else jnp.ones_like(l_flat, jnp.bool_)
    e_i, f_i, pr_i = lovasz_errors_from_logits(
        interm_logits.reshape(-1, num_classes), l_flat, valid)
    e_f, f_f, pr_f = lovasz_errors_from_logits(
        final_logits.reshape(-1, num_classes), l_flat, valid)
    per_class = _per_class_fn(impl)(jnp.concatenate([e_i, e_f], axis=0),
                                    jnp.concatenate([f_i, f_f], axis=0))
    loss_i = jnp.sum(per_class[:num_classes] * pr_i) / jnp.maximum(jnp.sum(pr_i), 1.0)
    loss_f = jnp.sum(per_class[num_classes:] * pr_f) / jnp.maximum(jnp.sum(pr_f), 1.0)
    return w_interm * loss_i + w_final * loss_f


# ---------------------------------------------------------------------------
# OHEM cross-entropy
# ---------------------------------------------------------------------------

def ohem_cross_entropy(logits: Array, labels: Array, ignore_index: int = -1,
                       thresh: float = 0.7, min_kept: int = 100_000) -> Array:
    """Online hard-example mining CE (reference losses/OhemCrossEntropy.py).

    Keeps pixels whose ground-truth-class probability is below
    max(thresh, k-th smallest valid probability), k = min_kept; averages
    their CE. Static shapes: invalid pixels get prob=2.0 so they sort last
    and can never pass the `< threshold` test.
    """
    nll, valid = per_pixel_cross_entropy(logits, labels, ignore_index)
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(_flatten_logits(logits).astype(jnp.float32), axis=-1)
    safe = jnp.clip(labels.reshape(-1), 0, num_classes - 1)
    p_gt = jnp.take_along_axis(probs, safe[:, None], axis=-1)[:, 0]
    p_gt = jnp.where(valid, p_gt, 2.0)
    sorted_p = jnp.sort(p_gt)
    n_valid = jnp.sum(valid)
    k = jnp.clip(jnp.minimum(jnp.int32(min_kept), n_valid - 1), 0, p_gt.size - 1)
    min_value = sorted_p[k]
    threshold = jnp.maximum(min_value, thresh)
    keep = valid & (p_gt < threshold)
    kw = keep.astype(jnp.float32)
    return jnp.sum(nll * kw) / jnp.maximum(jnp.sum(kw), 1.0)


# ---------------------------------------------------------------------------
# Focal loss
# ---------------------------------------------------------------------------

def focal_loss(logits: Array, labels: Array, gamma: float = 2.0,
               alpha: Array | None = None, ignore_index: int = -1) -> Array:
    """Focal loss (reference losses/FocalLoss.py). Mean over pixels; optional
    per-class alpha weights; optional ignore masking (the reference has no
    ignore handling — pass ignore_index=-1 for exact parity on task 1)."""
    num_classes = logits.shape[-1]
    lp = jax.nn.log_softmax(_flatten_logits(logits).astype(jnp.float32), axis=-1)
    lbl = labels.reshape(-1)
    valid = (lbl != ignore_index) if ignore_index >= 0 else jnp.ones_like(lbl, jnp.bool_)
    safe = jnp.clip(lbl, 0, num_classes - 1)
    logpt = jnp.take_along_axis(lp, safe[:, None], axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    if alpha is not None:
        logpt = logpt * jnp.asarray(alpha, jnp.float32)[safe]
    loss = -((1.0 - pt) ** gamma) * logpt
    v = valid.astype(jnp.float32)
    return jnp.sum(loss * v) / jnp.maximum(jnp.sum(v), 1.0)


# ---------------------------------------------------------------------------
# Generalised Dice / Soft IoU
# ---------------------------------------------------------------------------

def _one_hot_real_classes(labels: Array, num_classes: int) -> Array:
    """One-hot over the real class channels; ignore pixels (id==num_classes)
    produce all-zero rows — equivalent to the reference's "one-hot over C+1
    then drop the last column" (GenDiceLoss.py:22-27)."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def generalized_dice(logits: Array, labels: Array, weights=None,
                     naive: bool = False) -> Array:
    """Generalised Dice loss (Sudre et al. 2017; reference losses/GenDiceLoss.py)."""
    num_classes = logits.shape[-1]
    pred = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    target = _one_hot_real_classes(labels.reshape(-1), num_classes)
    pred = pred.reshape(-1, num_classes)
    dividend = jnp.sum(pred * target, axis=0)
    divisor = jnp.sum(pred + target, axis=0)
    if weights is not None:
        if isinstance(weights, str) and weights == "auto":
            w = jnp.sum(target, axis=0) ** 2
            w = 1.0 / jnp.where(w == 0, 1.0, w)
        else:
            w = jnp.asarray(weights, jnp.float32)
        dividend = dividend * w
        divisor = divisor * w
    frac = dividend / jnp.where(divisor == 0, 1.0, divisor)
    if naive:
        mean = jnp.mean(frac)
    else:
        present = (divisor != 0).astype(jnp.float32)
        mean = jnp.sum(frac * present) / jnp.maximum(jnp.sum(present), 1.0)
    return 1.0 - 2.0 * mean


def soft_iou(logits: Array, labels: Array, naive: bool = False) -> Array:
    """Soft (probabilistic) IoU, negative mean over present classes
    (reference losses/SoftIoU.py)."""
    num_classes = logits.shape[-1]
    pred = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, num_classes)
    target = _one_hot_real_classes(labels.reshape(-1), num_classes)
    inter = jnp.sum(pred * target, axis=0)
    union = jnp.sum(pred + target - pred * target, axis=0)
    frac = inter / jnp.where(union == 0, 1.0, union)
    if naive:
        return -jnp.mean(frac)
    present = (union != 0).astype(jnp.float32)
    return -jnp.sum(frac * present) / jnp.maximum(jnp.sum(present), 1.0)
