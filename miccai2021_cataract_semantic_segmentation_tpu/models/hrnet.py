"""HRNetv2-W32 backbone + segmentation head (reference models/HRNetv2.py).

Four stages of parallel multi-resolution branches with full cross-resolution
fusion after each module. Stage widths (32, 64, 128, 256), BasicBlocks after
the Bottleneck stem stage, BN momentum torch 0.01 -> flax 0.99
(HRNetv2.py:19). All fuse/head upsamples are bilinear align_corners=False
(torch default in HRNetv2.py:251-256, 505-513).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.models.layers import to_f32, upsample_like
from miccai2021_cataract_semantic_segmentation_tpu.models.resnet import BasicBlock, Bottleneck

Dtype = Any

_BN = 0.99  # flax momentum for torch BN_MOMENTUM = 0.01


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=((p, p), (p, p)),
                    use_bias=self.bias, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(not train, momentum=_BN, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class _Branch(nn.Module):
    """num_blocks BasicBlocks at constant width."""
    width: int
    num_blocks: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for b in range(self.num_blocks):
            need_ds = b == 0 and x.shape[-1] != self.width
            x = BasicBlock(self.width, stride=1, downsample=need_ds,
                           bn_momentum=_BN, dtype=self.dtype,
                           name=f"block{b}")(x, train)
        return x


class _FuseModule(nn.Module):
    """One HighResolutionModule: per-branch blocks then full fusion
    (HRNetv2.py:116-260)."""
    widths: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.widths)
        xs = [
            _Branch(w, dtype=self.dtype, name=f"branch{i}")(x, train)
            for i, (x, w) in enumerate(zip(xs, self.widths))
        ]
        if n == 1:
            return xs
        fused = []
        for i in range(n):
            y = None
            for j in range(n):
                if j == i:
                    z = xs[j]
                elif j > i:  # upsample lower-res branch: 1x1 conv-bn then resize
                    z = _ConvBNReLU(self.widths[i], 1, relu=False, dtype=self.dtype,
                                    name=f"fuse{i}_{j}")(xs[j], train)
                    z = upsample_like(z, xs[i].shape[1:3], align_corners=False)
                else:  # downsample higher-res branch with strided 3x3s
                    z = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        z = _ConvBNReLU(self.widths[i] if last else self.widths[j],
                                        3, stride=2, relu=not last,
                                        dtype=self.dtype,
                                        name=f"fuse{i}_{j}_{k}")(z, train)
                y = z if y is None else y + z
            fused.append(nn.relu(y))
        return fused


def hrnet_trunk(x, train: bool, width: int, dtype) -> list:
    """Stem + stage1 + stages 2-4 of HRNetv2; returns the 4 branch maps
    (strides 4/8/16/32, widths w/2w/4w/8w).

    A plain helper (not a submodule) so both `HRNetv2` and the OCRNet
    hrnetv2-backbone path create the SAME parameter tree at the caller's
    scope — the torch-checkpoint porter's key mapping is unchanged.
    """
    w = width
    widths = [w, 2 * w, 4 * w, 8 * w]

    # stem: two strided 3x3 convs (stride 4 total)
    x = _ConvBNReLU(64, 3, 2, dtype=dtype, name="stem1")(x, train)
    x = _ConvBNReLU(64, 3, 2, dtype=dtype, name="stem2")(x, train)

    # stage 1: 4 Bottlenecks at width 32 (expansion 4 -> 128ch)
    for b in range(4):
        x = Bottleneck(w, stride=1, downsample=b == 0, bn_momentum=_BN,
                       dtype=dtype, name=f"layer1_{b}")(x, train)

    # transitions + stages 2-4
    xs = [x]
    for stage, n_br in ((2, 2), (3, 3), (4, 4)):
        new_xs = []
        for i in range(n_br):
            if i < len(xs):
                if xs[i].shape[-1] != widths[i]:
                    new_xs.append(_ConvBNReLU(widths[i], 3, 1, dtype=dtype,
                                              name=f"trans{stage}_{i}")(xs[i], train))
                else:
                    new_xs.append(xs[i])
            else:  # new branch: strided conv off the lowest-res branch
                new_xs.append(_ConvBNReLU(widths[i], 3, 2, dtype=dtype,
                                          name=f"trans{stage}_{i}")(xs[-1], train))
        xs = _FuseModule(tuple(widths[:n_br]), dtype=dtype,
                         name=f"stage{stage}")(new_xs, train)
    return xs


def hrnet_concat(xs, align_corners: bool = False) -> jnp.ndarray:
    """Concat all branches at 1/4 res (HRNetv2.py:505-513)."""
    hw = xs[0].shape[1:3]
    return jnp.concatenate(
        [xs[0]] + [upsample_like(z, hw, align_corners=align_corners)
                   for z in xs[1:]],
        axis=-1)


class HRNetv2(nn.Module):
    task: int = 2
    width: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        in_hw = x.shape[1:3]
        widths = [self.width * m for m in (1, 2, 4, 8)]

        xs = hrnet_trunk(x, train, self.width, self.dtype)

        # head: concat all branches at 1/4 res, 1x1 conv-bn-relu, classifier
        y = hrnet_concat(xs)
        # the reference's last_layer 1x1 conv keeps torch's default bias
        # (HRNetv2.py:285-292) — required for checkpoint parity
        y = _ConvBNReLU(sum(widths), 1, bias=True, dtype=self.dtype,
                        name="head")(y, train)
        logits = nn.Conv(num_classes, (1, 1), dtype=self.dtype, name="cls")(y)
        logits = upsample_like(logits, in_hw, align_corners=False)
        return {"logits": to_f32(logits)}
