"""Bilinear resize with exact PyTorch align_corners semantics, as matmuls.

XLA has no native `align_corners=True` resize; `jax.image.resize` implements
only the half-pixel convention. Segmentation parity with the reference
requires both conventions (models use align_corners=True upsampling,
OCR.py:128; TwoScaleLoss uses align_corners=False, TwoScaleLoss.py:48).

We build the 1-D interpolation weights at trace time (shapes are static) and
apply them as two dense matmuls — separable resize rides the MXU instead of
the gather units, which on TPU is both exact and fast for the 68x120 -> 544x960
logit upsamples on the hot path.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) float64 bilinear interpolation matrix (cast at use)."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float64)
    out = np.arange(n_out, dtype=np.float64)
    if align_corners:
        pos = out * (n_in - 1) / max(n_out - 1, 1)
    else:
        pos = np.clip((out + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = pos - lo
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    mat[out.astype(np.int64), lo] += 1.0 - w_hi
    mat[out.astype(np.int64), hi] += w_hi
    return mat


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    align_corners: bool = True) -> jnp.ndarray:
    """Bilinear-resize NHWC (or HWC) `x` to spatial `size` = (H, W)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    out_h, out_w = size
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    dtype = x.dtype
    # accumulate in >= f32 (bf16 inputs upcast; f64 parity runs stay f64)
    acc = jnp.promote_types(dtype, jnp.float32)
    mh = jnp.asarray(_interp_matrix(h, out_h, align_corners), acc)
    mw = jnp.asarray(_interp_matrix(w, out_w, align_corners), acc)
    y = jnp.einsum("nhwc,Hh->nHwc", x.astype(acc), mh)
    y = jnp.einsum("nhwc,Ww->nhWc", y, mw)
    y = y.astype(dtype)
    return y[0] if squeeze else y


def resize_logits(logits: jnp.ndarray, size: tuple[int, int],
                  align_corners: bool = True) -> jnp.ndarray:
    """Alias used by the models for final/intermediate logit upsampling."""
    return resize_bilinear(logits, size, align_corners=align_corners)
