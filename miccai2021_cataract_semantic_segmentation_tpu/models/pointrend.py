"""PointRend decoder: coarse UPerNet prediction + uncertainty-driven point
refinement (reference models/PointRend.py + utils/pointrend_utils.py).

TPU-native re-design:
  * `point_sample` = bilinear gather with torch grid_sample
    align_corners=False zero-padding semantics, vmapped over the batch.
  * Train: random oversample -> top-k uncertain + fresh random points; all
    point counts static (jit-safe).
  * Eval: log2(scale) subdivision steps, each a 2x upsample + top-k uncertain
    points re-predicted by the MLP head and scattered back — a static Python
    loop of scatter/gather ops.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu.models.layers import to_f32
from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.models.upernet import UPerNetDecoder
from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear

Dtype = Any


def point_sample(feats: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC `feats` at (B,P,2) normalised [0,1]^2 coords ([x, y] order,
    like cv2 — pointrend_utils.py point_sample + grid_sample semantics with
    align_corners=False and zero padding). Returns (B,P,C)."""
    n, h, w, c = feats.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0, y - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = feats.reshape(n, h * w, c)
        idx = yc * w + xc  # (B,P)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * inside[..., None]

    out = (gather(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
           + gather(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
           + gather(y0 + 1, x0) * (wy * (1 - wx))[..., None]
           + gather(y0 + 1, x0 + 1) * (wy * wx)[..., None])
    return out


def calculate_uncertainty(point_logits: jnp.ndarray) -> jnp.ndarray:
    """-(top1 - top2) logit margin; higher = more uncertain
    (pointrend_utils.py:225-232). Input (..., C) -> (...)."""
    top2 = jax.lax.top_k(point_logits, 2)[0]
    return top2[..., 1] - top2[..., 0]


def sample_uncertain_points(rng, coarse_logits_nhwc, num_points: int,
                            oversample_ratio: float,
                            importance_sample_ratio: float) -> jnp.ndarray:
    """Train-time point selection (pointrend_utils.py:66-118). (B,P,2) coords."""
    n = coarse_logits_nhwc.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (n, num_sampled, 2))
    logits = point_sample(coarse_logits_nhwc, coords)
    unc = calculate_uncertainty(logits)  # (B, num_sampled)
    _, idx = jax.lax.top_k(unc, num_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if num_random > 0:
        picked = jnp.concatenate(
            [picked, jax.random.uniform(r2, (n, num_random, 2))], axis=1)
    return picked


def uncertain_points_on_grid(logits_nhwc: jnp.ndarray, num_points: int):
    """Eval-time: top-`num_points` uncertain grid cells -> (indices, coords)
    (pointrend_utils.py:120-149)."""
    n, h, w, c = logits_nhwc.shape
    num_points = min(h * w, num_points)
    unc = calculate_uncertainty(logits_nhwc).reshape(n, h * w)
    _, idx = jax.lax.top_k(unc, num_points)
    xs = (idx % w).astype(jnp.float32) / w + 0.5 / w
    ys = (idx // w).astype(jnp.float32) / h + 0.5 / h
    return idx, jnp.stack([xs, ys], axis=-1)


class PointHead(nn.Module):
    """MLP over per-point features, coarse logits re-concatenated at each
    layer (reference StandardPointHead)."""
    num_classes: int
    fc_dim: int = 256
    num_fc: int = 3
    coarse_each_layer: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([fine, coarse], axis=-1)  # (B,P,Cf+K)
        for k in range(self.num_fc):
            x = nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{k + 1}")(x)
            x = nn.relu(x)
            if self.coarse_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="predictor")(x)


class PointRendDecoder(nn.Module):
    task: int = 2
    num_points: int = 196             # pr_train_num_pts
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    subdivision_num_points: int = 784  # pr_subdivision_num_pts
    input_scales: Sequence[int] = (4, 8, 16, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, conv_out: Sequence[jnp.ndarray], train: bool = False):
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        coarse, _ = UPerNetDecoder(task=self.task,
                                   input_scales=tuple(self.input_scales),
                                   interpolate_result_up=False, dtype=self.dtype,
                                   name="coarse")(conv_out, train)
        head = PointHead(num_classes, dtype=self.dtype, name="point_head")
        scale = self.input_scales[0]

        def fine_features(coords):
            return jnp.concatenate(
                [point_sample(c, coords) for c in conv_out[::-1]], axis=-1)

        if train:
            rng = self.make_rng("points")
            coords = jax.lax.stop_gradient(sample_uncertain_points(
                rng, coarse, self.num_points, self.oversample_ratio,
                self.importance_sample_ratio))
            point_logits = head(fine_features(coords), point_sample(coarse, coords))
            seg = resize_bilinear(coarse, (coarse.shape[1] * scale,
                                           coarse.shape[2] * scale),
                                  align_corners=False)
            n, h, w, c = seg.shape
            xi = jnp.round(coords[..., 0] * (w - 1)).astype(jnp.int32)
            yi = jnp.round(coords[..., 1] * (h - 1)).astype(jnp.int32)
            idx = yi * w + xi
            flat = seg.reshape(n, h * w, c)
            pred = jax.vmap(lambda f, i, v: f.at[i].set(v))(flat, idx, point_logits)
            return {"logits": to_f32(pred.reshape(n, h, w, c)),
                    "coarse_logits": to_f32(seg),
                    "point_logits": to_f32(point_logits),
                    "point_coords": coords}

        # eval: iterative 2x subdivision refinement (PointRend.py:76-90)
        seg = coarse
        for _ in range(int(scale).bit_length() - 1):  # log2(scale) steps
            seg = resize_bilinear(seg, (seg.shape[1] * 2, seg.shape[2] * 2),
                                  align_corners=False)
            idx, coords = uncertain_points_on_grid(seg, self.subdivision_num_points)
            point_logits = head(fine_features(coords), point_sample(seg, coords))
            n, h, w, c = seg.shape
            flat = seg.reshape(n, h * w, c)
            flat = jax.vmap(lambda f, i, v: f.at[i].set(v))(flat, idx, point_logits)
            seg = flat.reshape(n, h, w, c)
        return {"logits": to_f32(seg)}
