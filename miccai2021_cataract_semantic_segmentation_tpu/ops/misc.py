"""Small device utilities mirroring the reference's utils/torch_utils.py
helpers: pseudo-label thresholding, one-hot, inverse test-time transforms.
All jittable (NHWC layout)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clipped_argmax(softmax_pred: jnp.ndarray, t: float,
                   ignore_value: int) -> jnp.ndarray:
    """NHWK softmax probs -> NHW pseudo labels: argmax where the max prob
    >= t, else ignore_value (torch_utils.py:7-21)."""
    assert 0 <= t < 1, f"threshold must be in [0,1) instead got {t}"
    scores = jnp.max(softmax_pred, axis=-1)
    indices = jnp.argmax(softmax_pred, axis=-1)
    return jnp.where(scores < t, jnp.asarray(ignore_value, indices.dtype),
                     indices)


def downsample_labels(labels: jnp.ndarray, hw) -> jnp.ndarray:
    """Nearest-sample NHW int labels to a coarser grid (h, w).

    Uses centre-aligned nearest indices (floor((i + 0.5) * H / h)) so
    non-integer ratios (e.g. 540 labels over a 68-row feature grid) stay
    aligned across the whole image and H < h (upsampling) is well-defined —
    a floor-division stride would drift by ~one feature row per image end
    and never sample the bottom/right label rows."""
    n, H, W = labels.shape
    h, w = hw
    yi = jnp.floor((jnp.arange(h) + 0.5) * (H / h)).astype(jnp.int32)
    xi = jnp.floor((jnp.arange(w) + 0.5) * (W / w)).astype(jnp.int32)
    return labels[:, yi[:, None], xi[None, :]]


def to_one_hot(labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """NHW int labels -> NHWC one-hot f32 (torch_utils.py:123-127 is NCHW;
    NHWC is the TPU-native layout)."""
    return jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)


def untransform(batched: jnp.ndarray, flip_dims) -> jnp.ndarray:
    """Invert the flips recorded at augmentation time, aligning predictions
    back to the un-augmented frame (torch_utils.py:38-61; rotation inversion
    is handled on-device by re-running the inverse affine in ops.augment).

    `flip_dims` per-item code: 0 = none, -1 = horizontal, -2 = vertical,
    -3 = both. Works for NHW or NHWC tensors.
    """
    flip_dims = jnp.asarray(flip_dims)
    h_flip = (flip_dims == -1) | (flip_dims == -3)
    v_flip = (flip_dims == -2) | (flip_dims == -3)
    expand = (slice(None),) + (None,) * (batched.ndim - 1)
    out = jnp.where(h_flip[expand], batched[:, :, ::-1], batched)
    out = jnp.where(v_flip[expand], out[:, ::-1], out)
    return out
