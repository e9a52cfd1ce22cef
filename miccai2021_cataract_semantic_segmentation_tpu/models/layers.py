"""Shared NHWC building blocks with exact torch layer semantics.

Conventions (chosen for checkpoint porting from the published PyTorch
weights):
  * NHWC activations, HWIO conv kernels (XLA-native layouts).
  * BatchNorm: flax momentum = 1 - torch momentum (torch updates
    running <- (1-m)*running + m*batch). torch defaults m=0.1 -> 0.9 here;
    the reference's ASPP uses m=0.0003 -> 0.9997 (DeepLabv3.py:98) and
    HRNet uses m=0.01 -> 0.99 (HRNetv2.py:19).
  * `torch_pad(k, s, d)` reproduces the reference's padded_conv2d padding
    formula (utils/torch_utils.py:130-147).
  * Pooling uses floor output sizing like torch (reduce_window semantics).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear

Dtype = Any


def torch_pad(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """'same-ish' padding as the reference computes it (ceil division)."""
    return (kernel_size + (kernel_size - 1) * (dilation - 1) - stride + 1) // 2


def acc_dtype(x) -> jnp.dtype:
    """Accumulation dtype: >= f32 (bf16 upcasts; f64 parity runs stay f64)."""
    return jnp.promote_types(x.dtype, jnp.float32)


def to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Model outputs leave in at-least-f32 (bf16 graphs emit f32 logits)."""
    return x.astype(acc_dtype(x))


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional ReLU, torch-initialised.

    Weight init matches torch defaults (kaiming-uniform with fan_in,
    a=sqrt(5)) closely enough for training from scratch; ported checkpoints
    overwrite it anyway.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    bn: bool = True
    relu: bool = True
    bn_momentum: float = 0.9  # flax convention
    bn_eps: float = 1e-5
    groups: int = 1
    dtype: Dtype = jnp.float32
    conv_name: str | None = None
    bn_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = torch_pad(self.kernel_size, self.stride, self.dilation)
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups,
                    use_bias=self.use_bias, dtype=self.dtype,
                    name=self.conv_name or "conv")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=self.bn_eps,
                             dtype=self.dtype, name=self.bn_name or "bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool_torch(x, window: int, stride: int, padding: int = 0):
    """torch MaxPool2d (floor mode). Padding uses -inf so edges are exact."""
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((padding, padding), (padding, padding)))


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics as two small matmuls (MXU-friendly).

    Bin i covers [floor(i*H/s), ceil((i+1)*H/s)) — exactly torch's bins.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw

    acc = acc_dtype(x)

    def pool_matrix(n_in, n_out):
        m = np.zeros((n_out, n_in), dtype=np.float64)
        for i in range(n_out):
            lo = (i * n_in) // n_out
            hi = -(-((i + 1) * n_in) // n_out)  # ceil
            m[i, lo:hi] = 1.0 / (hi - lo)
        return jnp.asarray(m, acc)

    y = jnp.einsum("nhwc,Hh->nHwc", x.astype(acc), pool_matrix(h, oh))
    y = jnp.einsum("nhwc,Ww->nhWc", y, pool_matrix(w, ow))
    return y.astype(x.dtype)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1): N,1,1,C."""
    return jnp.mean(x.astype(acc_dtype(x)), axis=(1, 2), keepdims=True).astype(x.dtype)


def upsample_like(x: jnp.ndarray, ref_hw: tuple[int, int],
                  align_corners: bool = True) -> jnp.ndarray:
    return resize_bilinear(x, ref_hw, align_corners=align_corners)
