"""DeepLabv3 and DeepLabv3+ (atrous ResNet + ASPP [+ decoder]).

Graph parity with the reference models/DeepLabv3.py and models/DeepLabv3Plus.py:
ASPP rates 6/12/18 x mult (mult=2 when out_stride<16), image-pool branch with
align_corners=True upsample, 5-way concat -> 1x1 -> BN -> ReLU; v3+ adds the
48-channel low-level (layer1) lateral and two 3x3 convs. Subtlety: the
reference passes momentum=0.0003 *positionally* into BatchNorm2d
(DeepLabv3.py:98,104 `norm(c_aspp, momentum)`), where torch's second
positional parameter is eps — so the ASPP/decoder BNs actually run with
eps=3e-4 and the default momentum 0.1 (flax 0.9). Verified by f64
activation parity against the reference (tests/test_port_parity.py).
Final logits are bilinearly upsampled (align_corners=True) to input size.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.models.layers import (
    ConvBN, global_avg_pool, upsample_like, to_f32)
from miccai2021_cataract_semantic_segmentation_tpu.models.projector import Projector
from miccai2021_cataract_semantic_segmentation_tpu.models.resnet import ResNetBackbone

Dtype = Any

_ASPP_BN_EPS = 3e-4  # reference quirk: eps, not momentum (see above)


def _dilate_stages(out_stride: int):
    """Reference mapping out_stride -> replace_stride_with_dilation flags
    (DeepLabv3.py:21-27, incl. the all-True quirk for out_stride 32)."""
    return {8: (False, True, True), 16: (False, False, True),
            32: (True, True, True)}[out_stride]


class ASPP(nn.Module):
    c_aspp: int = 256
    mult: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        branches = []
        branches.append(ConvBN(self.c_aspp, 1, bn_eps=_ASPP_BN_EPS,
                               dtype=self.dtype, name="aspp1")(x, train))
        for i, rate in enumerate((6, 12, 18)):
            branches.append(ConvBN(self.c_aspp, 3, dilation=rate * self.mult,
                                   bn_eps=_ASPP_BN_EPS, dtype=self.dtype,
                                   name=f"aspp{i + 2}")(x, train))
        pooled = global_avg_pool(x)
        pooled = ConvBN(self.c_aspp, 1, bn_eps=_ASPP_BN_EPS, dtype=self.dtype,
                        name="aspp5")(pooled, train)
        branches.append(upsample_like(pooled, (h, w), align_corners=True))
        y = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.c_aspp, 1, bn_eps=_ASPP_BN_EPS, dtype=self.dtype,
                      name="proj")(y, train)


class DeepLabv3(nn.Module):
    task: int = 2
    backbone: str = "resnet50"
    out_stride: int = 16
    c_aspp: int = 256
    projector: dict | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        in_hw = x.shape[1:3]
        feats = ResNetBackbone(self.backbone, _dilate_stages(self.out_stride),
                               dtype=self.dtype, name="backbone")(x, train)
        high = feats["layer4"]
        mult = 1 if self.out_stride >= 16 else 2
        y = ASPP(self.c_aspp, mult, dtype=self.dtype, name="aspp")(high, train)
        logits = nn.Conv(num_classes, (1, 1), dtype=self.dtype, name="conv_out")(y)
        # pre-upsample logits for losses that fuse the align_corners=True
        # upsample (losses/fused_lovasz.py); DCE'd when unused
        out = {"logits": to_f32(upsample_like(logits, in_hw)),
               "logits_s8": to_f32(logits),
               "deep_features": high}
        if self.projector is not None:
            out["proj_features"] = Projector(**self.projector, dtype=self.dtype,
                                             name="projector")(high, train)
        return out


class DeepLabv3Plus(nn.Module):
    task: int = 2
    backbone: str = "resnet50"
    out_stride: int = 16
    c_aspp: int = 256
    c_low_reduced: int = 48
    c_decoder: int = 256
    projector: dict | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        in_hw = x.shape[1:3]
        feats = ResNetBackbone(self.backbone, _dilate_stages(self.out_stride),
                               dtype=self.dtype, name="backbone")(x, train)
        low, high = feats["layer1"], feats["layer4"]
        mult = 1 if self.out_stride >= 16 else 2
        y = ASPP(self.c_aspp, mult, dtype=self.dtype, name="aspp")(high, train)
        # decoder (DeepLabv3Plus.py:139-175)
        lateral = ConvBN(self.c_low_reduced, 1, bn_eps=_ASPP_BN_EPS,
                         dtype=self.dtype, name="conv_low")(low, train)
        y = upsample_like(y, low.shape[1:3], align_corners=True)
        y = jnp.concatenate([lateral, y], axis=-1)
        y = ConvBN(self.c_decoder, 3, bn_eps=_ASPP_BN_EPS, dtype=self.dtype,
                   name="conv_3x3_1")(y, train)
        y = ConvBN(self.c_decoder, 3, bn_eps=_ASPP_BN_EPS, dtype=self.dtype,
                   name="conv_3x3_2")(y, train)
        logits = nn.Conv(num_classes, (1, 1), dtype=self.dtype, name="conv_out")(y)
        # pre-upsample logits for losses that fuse the align_corners=True
        # upsample (losses/fused_lovasz.py); DCE'd when unused
        out = {"logits": to_f32(upsample_like(logits, in_hw)),
               "logits_s8": to_f32(logits),
               "deep_features": high}
        if self.projector is not None:
            out["proj_features"] = Projector(**self.projector, dtype=self.dtype,
                                             name="projector")(high, train)
        return out
