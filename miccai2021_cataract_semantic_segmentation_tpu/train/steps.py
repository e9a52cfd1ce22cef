"""The jitted train / eval steps — the hot loop of the framework.

One fused XLA program per step: uint8 batch -> on-device augmentation ->
forward (bf16-capable) -> loss -> grads -> Adam update -> device-side
metric accumulation. No per-step host syncs (the reference's per-batch
`.item()` logging pattern, OCRNet_Manager.py:101-123, is the anti-pattern
this design removes — metrics live on device and are fetched every N steps).

Data parallelism: inputs arrive sharded over the mesh 'data' axis; under
jit, XLA emits the gradient all-reduce and confusion-matrix reduction from
the sharding alone (GSPMD) — batch statistics of BatchNorm are computed
over the *global* batch, i.e. sync-BN semantics.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import cross_entropy
from miccai2021_cataract_semantic_segmentation_tpu.models.pointrend import point_sample
from miccai2021_cataract_semantic_segmentation_tpu.ops.augment import (
    IMAGENET_MEAN, IMAGENET_STD, augment_batch, pad_reflect_hw)
from miccai2021_cataract_semantic_segmentation_tpu.ops.metrics import confusion_matrix
from miccai2021_cataract_semantic_segmentation_tpu.ops.misc import downsample_labels


def eval_preprocess(images_u8, spec, labels_u8=None):
    """Deterministic eval-pipeline preprocessing: uint8 -> f32 [0,1], the
    2px vertical reflect pad and ImageNet normalise per `spec`. The single
    source of truth for the eval steps, the TTA step, and the serving
    export (train/export.py) — they must never desync."""
    x = images_u8.astype(jnp.float32) / 255.0
    pad = spec is not None and getattr(spec, "pad", False)
    if pad:
        x = pad_reflect_hw(x)
    if spec is not None and getattr(spec, "normalise", False):
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if labels_u8 is None:
        return x
    lbl = labels_u8.astype(jnp.int32)
    if pad:
        lbl = pad_reflect_hw(lbl)
    return x, lbl


def tta_merged_probs(forward: Callable, x, scales):
    """ttach-equivalent TTA merge: Compose(HFlip, Scale(scales)), softmax
    mean over the 2*len(scales) augmentations (BaseManager.py:652-660).
    `forward(xi) -> logits` at any spatial size."""
    from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import (
        resize_bilinear)
    h, w = x.shape[1:3]
    probs = None
    for s in scales:
        hs, ws = int(round(h * s)), int(round(w * s))
        xs = resize_bilinear(x, (hs, ws), align_corners=False)
        for flip in (False, True):
            xi = xs[:, :, ::-1] if flip else xs
            lg = forward(xi)
            if flip:
                lg = lg[:, :, ::-1]
            lg = resize_bilinear(lg, (h, w), align_corners=False)
            p = jax.nn.softmax(lg, axis=-1)
            probs = p if probs is None else probs + p
    return probs / (2 * len(scales))


def _semi_part(a: jnp.ndarray, geom: tuple, labeled: bool) -> jnp.ndarray:
    """Select the labeled (or unlabeled) samples of a shard-blocked semi
    batch via reshape + static slice on the blocked axis — shard-local under
    GSPMD (a flat index gather on the sharded batch axis could force
    cross-chip all-gathers of full-resolution tensors)."""
    n_sh, blk, half = geom
    ab = a.reshape(n_sh, blk, *a.shape[1:])
    part = ab[:, :half] if labeled else ab[:, half:]
    m = half if labeled else blk - half
    return part.reshape(n_sh * m, *a.shape[1:])


def _point_loss(outputs, labels, task: int, ignore_override: int | None = None):
    """PointRend auxiliary CE on the sampled points (EncDec_Manager.py:158-178):
    labels nearest-sampled at point_coords, CE with the task ignore index
    (or `ignore_override` — semi mode's pseudo-ignore id, which tasks 0/1
    would otherwise train on)."""
    coords = outputs["point_coords"]
    lbl_f = labels[..., None].astype(jnp.float32)
    # nearest sampling == bilinear on a one-channel label grid rounded;
    # replicate torch grid_sample(mode='nearest') by rounding coords to cells
    n, h, w, _ = lbl_f.shape
    xi = jnp.clip(jnp.floor(coords[..., 0] * w), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(coords[..., 1] * h), 0, h - 1).astype(jnp.int32)
    flat = labels.reshape(n, h * w)
    point_lbl = jnp.take_along_axis(flat, yi * w + xi, axis=1)
    ign = taxonomy.ignore_index(task) if ignore_override is None \
        else ignore_override
    return cross_entropy(outputs["point_logits"], point_lbl,
                         ignore_index=ign)


def _sharded_loss(loss_fn: Callable, mesh, data_axis: str,
                  check_vma: bool = True):
    """Per-data-shard loss via shard_map: each device computes loss_fn over
    its LOCAL batch shard and the scalars are pmean'd over the axis.

    This is the DDP-equivalent semantics (each replica's loss over its local
    batch) and the TPU-critical optimisation for sort-based losses: the
    batch-flattened Lovász sort would otherwise make GSPMD all-gather the
    full logits across chips (~285 MB/chip at 544x960x17 bs8) and run a
    global sort — per-shard sorting keeps all data local to each chip.

    check_vma=False is needed ONLY for the fused bucket-Lovász path: its
    pallas_call outputs carry no varying-mesh-axes annotation, and with the
    default check_vma=True jax rejects the composition outright (found by
    the flagship multi-chip dryrun). Every other loss keeps the default
    check so a missing pmean fails loudly instead of silently producing
    shard-inconsistent results (ADVICE r4).
    """
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map

    def apply(outputs, lbl, epoch, step):
        def local(outputs, lbl, epoch, step):
            total, terms = loss_fn(outputs, lbl, epoch=epoch, step=step)
            total = jax.lax.pmean(total, data_axis)
            terms = jax.tree.map(lambda t: jax.lax.pmean(t, data_axis), terms)
            return total, terms

        in_specs = (jax.tree.map(lambda _: P(data_axis), outputs),
                    P(data_axis), P(), P())
        return shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=(P(), P()),
                         check_vma=check_vma)(outputs, lbl, epoch, step)

    return apply


def make_train_step(loss_fn: Callable, spec, task: int,
                    has_point_head: bool = False, donate: bool = True,
                    mesh=None, data_axis: str = "data",
                    train_metrics: str = "full", debug_pred: bool = False,
                    semi: dict | None = None,
                    sharded_loss_check_vma: bool = True):
    """Build the jitted train step.

    loss_fn: (outputs dict, labels, epoch) -> (total, terms) from
    losses.build_loss. `spec` is the DeviceAugmentSpec (static). When `mesh`
    is given, the loss runs per data shard under shard_map (see
    _sharded_loss); the model fwd/bwd stays GSPMD-partitioned.
    `sharded_loss_check_vma`: set False only when the loss routes through
    the fused bucket-Lovász pallas kernels (see _sharded_loss).

    train_metrics: "full" computes the per-step train confusion matrix from
    the full-resolution logits (reference behaviour). "s8" computes it from
    the model's pre-upsample (stride-8) logits against stride-subsampled
    labels — when the loss also runs from the s8 logits (fused bucket
    Lovász), nothing else consumes the full-res upsample and XLA dead-code
    eliminates it (~7 ms/step at 544x960x17 bs8). Train-log metric only;
    validation/inference always use full resolution (COVERAGE.md
    deviations).

    semi: {"threshold": t, "ignore_id": k} enables on-device self-training
    pseudo-labels (end-to-end wiring for the reference's SemiSupervisedLoss,
    which the reference ships without a working path): the batch's second
    half is treated as unlabeled — its labels are replaced by
    clipped_argmax of an eval-mode forward of the current model on the same
    augmented images (the reference's own pseudo-labelling helper,
    torch_utils.py:7-21), with below-threshold pixels set to `ignore_id`.
    stop_gradient keeps the teacher pass out of the backward graph.
    """
    compute_loss = (_sharded_loss(loss_fn, mesh, data_axis,
                                  check_vma=sharded_loss_check_vma)
                    if mesh is not None
                    else (lambda outputs, lbl, epoch, step:
                          loss_fn(outputs, lbl, epoch=epoch, step=step)))

    def step(state, images_u8, labels_u8, rng, epoch):
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, points_rng, dropout_rng = jax.random.split(rng, 3)
        x, lbl = augment_batch(aug_rng, images_u8, labels_u8, spec, True)

        semi_geom = None
        if semi is not None:
            from miccai2021_cataract_semantic_segmentation_tpu.ops.misc import clipped_argmax
            # shard-blocked layout (trainer._epoch_batches): with S data
            # shards each contiguous block of batch/S samples is
            # [labeled half | unlabeled half], so the per-shard loss's
            # first-half/second-half split (SemiSupervisedLoss.py:44-84 via
            # shard_map) sees the right samples on every shard. All
            # selections are reshape + static slice on the blocked axis —
            # shard-local under GSPMD, no cross-chip gathers of the
            # full-res tensors.
            n = x.shape[0]
            n_sh = int(semi.get("n_shards", 1))
            blk = n // n_sh
            half = blk // 2
            semi_geom = (n_sh, blk, half)
            x_unlab = _semi_part(x, semi_geom, labeled=False)
            teacher = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                x_unlab, False)
            probs = jax.nn.softmax(
                jax.lax.stop_gradient(teacher["logits"]).astype(jnp.float32),
                axis=-1)
            pseudo = clipped_argmax(probs, float(semi["threshold"]),
                                    int(semi["ignore_id"])).astype(lbl.dtype)
            lbl_b = lbl.reshape(n_sh, blk, *lbl.shape[1:])
            pseudo_b = pseudo.reshape(n_sh, blk - half, *lbl.shape[1:])
            lbl = jnp.concatenate([lbl_b[:, :half], pseudo_b],
                                  axis=1).reshape(lbl.shape)

        def loss_of(params):
            outputs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, True, mutable=["batch_stats"],
                rngs={"points": points_rng, "dropout": dropout_rng})
            # state.step seeds the per-step bucket dither when
            # `lovasz_dither` is configured (losses/bucket_edges.py); inert
            # for every other loss (optional kwarg, unused by default)
            total, terms = compute_loss(outputs, lbl, epoch,
                                        state.step.astype(jnp.int32))
            if has_point_head and "point_logits" in outputs:
                p_loss = _point_loss(
                    outputs, lbl, task,
                    ignore_override=(int(semi["ignore_id"])
                                     if semi is not None else None))
                terms = {**terms, "point_loss": p_loss}
                total = total + p_loss
            return total, (terms, mutated["batch_stats"], outputs)

        (loss, (terms, new_stats, outputs)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        s8 = outputs.get("logits_s8", outputs.get("logits_s8_acf"))
        # semi mode: train metrics over the LABELED samples only (the
        # unlabeled half's "labels" are the model's own pseudo-labels —
        # counting them would measure self-agreement, not accuracy)
        cm_lg = outputs["logits"] if semi_geom is None \
            else _semi_part(outputs["logits"], semi_geom, labeled=True)
        cm_lbl = lbl if semi_geom is None else _semi_part(lbl, semi_geom, True)
        if train_metrics == "s8" and s8 is not None:
            cm_s8 = s8 if semi_geom is None else _semi_part(s8, semi_geom, True)
            # centre-aligned nearest subsample handles label heights that
            # are not exact multiples of the s8 grid (e.g. crop sizes), where
            # a floor-division stride would produce a shape mismatch
            cm = confusion_matrix(
                cm_s8, downsample_labels(cm_lbl, cm_s8.shape[1:3]))
        else:
            cm = confusion_matrix(cm_lg, cm_lbl)
        metrics = {"loss": loss, **terms, "confusion_matrix": cm,
                   "grad_norm": optax.global_norm(grads)}
        if debug_pred:
            # debugging mode (reference EncDec_Manager.py:86-94): ship the
            # augmented batch + full-res prediction back for disk triptychs
            x_img = x
            if spec is not None and getattr(spec, "normalise", False):
                x_img = x * IMAGENET_STD + IMAGENET_MEAN
            metrics["debug_img"] = (jnp.clip(x_img, 0.0, 1.0) * 255).astype(jnp.uint8)
            metrics["debug_lbl"] = lbl.astype(jnp.uint8)
            metrics["debug_pred"] = jnp.argmax(
                outputs["logits"], -1).astype(jnp.uint8)
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_eval_step(spec, num_classes: int):
    """Jitted eval step: pad (valid pipeline) -> forward -> confusion matrix.
    Returns (logits, cm) so callers can also image-log predictions."""

    def step(state, images_u8, labels_u8):
        x, lbl = eval_preprocess(images_u8, spec, labels_u8)
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, x, False)
        logits = outputs["logits"]
        cm = confusion_matrix(logits, lbl)
        return logits, lbl, cm

    return jax.jit(step)


def make_eval_loss_step(loss_fn, spec):
    """Eval step that also computes the validation loss (managers' validate
    loops log valid loss for best-loss checkpointing)."""

    def step(state, images_u8, labels_u8, epoch):
        x, lbl = eval_preprocess(images_u8, spec, labels_u8)
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, x, False)
        total, terms = loss_fn(outputs, lbl, epoch=epoch)
        cm = confusion_matrix(outputs["logits"], lbl)
        return outputs["logits"], lbl, cm, total

    return jax.jit(step)
