"""OCRNet — the flagship graph (reference models/OCR.py).

Object-Contextual Representations on a dilated ResNet:
  * intermediate soft-object-region head off layer3 (OCR.py:83-89)
  * 3x3 conv to 512ch pixel features off layer4 (OCR.py:72-76)
  * SpatialGather: per-class spatial softmax of the interm logits pools the
    pixel features into K class-context vectors (OCR.py:146-170)
  * ObjectAttention: 1x1-conv Q/K/V attention of pixels over the K context
    vectors, scaled by key_channels**-0.5, concat + 1x1 fuse (OCR.py:173-321)
  * 1x1 classifier + bilinear (align_corners=True) upsample to input size.

TPU note: gather + attention are three einsums over an N x K map (K <= 25) —
they fuse cleanly in XLA; no custom kernel needed. The interm-head stride
resolves to 1 for every eligible backbone/out-stride combination
(OCR.py:80-82 — the second assignment makes s==1 in all cases).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.models.layers import ConvBN, acc_dtype, to_f32, upsample_like
from miccai2021_cataract_semantic_segmentation_tpu.models.projector import Projector
from miccai2021_cataract_semantic_segmentation_tpu.models.resnet import ResNetBackbone

Dtype = Any


def spatial_gather(feats: jnp.ndarray, probs_logits: jnp.ndarray,
                   scale: float = 1.0) -> jnp.ndarray:
    """(B,H,W,C) feats + (B,H,W,K) class logits -> (B,K,C) class context.

    Softmax over the spatial axis per class, then probability-weighted
    pooling of the pixel features (OCR.py:158-170).
    """
    b, h, w, c = feats.shape
    k = probs_logits.shape[-1]
    acc = acc_dtype(feats)
    probs = jax.nn.softmax(
        scale * probs_logits.reshape(b, -1, k).astype(acc), axis=1)
    f = feats.reshape(b, h * w, c).astype(acc)
    return jnp.einsum("bnk,bnc->bkc", probs, f).astype(feats.dtype)


class _QKVStack(nn.Module):
    """n_layers x (1x1 conv -> BN -> ReLU) applied to NHWC or (B,K,C)."""
    features: int
    n_layers: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        squeeze = x.ndim == 3  # (B,K,C) class-context input -> treat K as space
        if squeeze:
            x = x[:, :, None, :]
        for i in range(self.n_layers):
            x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x[:, :, 0, :] if squeeze else x


class ObjectAttention(nn.Module):
    """Pixel-to-class-context attention (OCR.py:175-284)."""
    key_channels: int = 256
    out_channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, train: bool = False):
        b, h, w, c = x.shape
        query = _QKVStack(self.key_channels, 2, self.dtype, name="f_pixel")(x, train)
        key = _QKVStack(self.key_channels, 2, self.dtype, name="f_object")(context, train)
        value = _QKVStack(self.key_channels, 1, self.dtype, name="f_down")(context, train)
        acc = acc_dtype(x)
        q = query.reshape(b, h * w, self.key_channels).astype(acc)
        sim = jnp.einsum("bnd,bkd->bnk", q, key.astype(acc))
        sim = jax.nn.softmax(sim * self.key_channels ** -0.5, axis=-1)
        ctx = jnp.einsum("bnk,bkd->bnd", sim, value.astype(acc))
        ctx = ctx.reshape(b, h, w, self.key_channels).astype(x.dtype)
        ctx = _QKVStack(c, 1, self.dtype, name="f_up")(ctx, train)
        return ctx


class SpatialOCR(nn.Module):
    """Attention + concat + 1x1 fuse (OCR.py:287-321)."""
    key_channels: int = 256
    out_channels: int = 512
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, context, train: bool = False):
        ctx = ObjectAttention(self.key_channels, self.out_channels,
                              self.dtype, name="attn")(feats, context, train)
        y = jnp.concatenate([ctx, feats], axis=-1)  # context first (OCR.py:320)
        y = ConvBN(self.out_channels, 1, dtype=self.dtype, name="fuse")(y, train)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


def _ocr_dilate_stages(backbone: str, out_stride: int):
    """OCR.py:49-56: resnet18/34 never dilate (out_stride 32); 50/101 follow
    the out-stride table."""
    if backbone in ("resnet18", "resnet34"):
        return (False, False, False)
    return {8: (False, True, True), 16: (False, False, True),
            32: (False, False, False)}[out_stride]


class OCRNet(nn.Module):
    task: int = 2
    backbone: str = "resnet50"
    out_stride: int = 8
    dropout: float = 0.0
    projector: dict | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        in_hw = x.shape[1:3]
        if self.backbone.startswith("hrnetv2"):
            # OCR-on-HRNet: the reference declares this combination "not yet
            # implemented" (OCR.py:69) — provided here as an extension in the
            # canonical HRNet-OCR layout (openseg): the four-branch trunk's
            # concat map at stride 4 feeds BOTH the soft-region head and the
            # pixel-feature conv. No reference checkpoints exist for it, so
            # there is no porter mapping (COVERAGE.md extensions).
            from miccai2021_cataract_semantic_segmentation_tpu.models.hrnet import (
                hrnet_concat, hrnet_trunk)
            # accept both "hrnetv2_18" and the openseg-style "hrnetv2_w18"
            suffix = (self.backbone.rsplit("_", 1)[1].lstrip("w")
                      if "_" in self.backbone else "")
            width = int(suffix) if suffix else 32
            cat = hrnet_concat(hrnet_trunk(x, train, width, self.dtype))
            low = high = cat
            interm_stride = 1
        else:
            feats = ResNetBackbone(self.backbone,
                                   _ocr_dilate_stages(self.backbone, self.out_stride),
                                   dtype=self.dtype, name="backbone")(x, train)
            low, high = feats["layer3"], feats["layer4"]

            # soft object regions off layer3 (OCR.py:83-89). For resnet18/34
            # the backbone is never dilated, so layer3 sits at half layer4's
            # grid — the reference *intends* a stride-2 interm head there but
            # a double-assignment bug (OCR.py:80-82) leaves s==1 and the
            # model crashes; we implement the intended stride.
            interm_stride = 2 if self.backbone in ("resnet18", "resnet34") else 1
        # use_bias=True: the reference leaves torch Conv2d's default bias on
        # these head convs (OCR.py:73,84) — required for checkpoint parity
        interm = ConvBN(512, 3, stride=interm_stride, use_bias=True,
                        dtype=self.dtype, name="interm_conv")(low, train)
        if self.dropout > 0:
            interm = nn.Dropout(self.dropout, deterministic=not train)(interm)
        interm_logits = nn.Conv(num_classes, (1, 1), use_bias=True,
                                dtype=self.dtype, name="interm_cls")(interm)

        # 512ch pixel features off layer4 (OCR.py:72-76)
        pix = ConvBN(512, 3, use_bias=True, dtype=self.dtype,
                     name="conv_high_map")(high, train)

        context = spatial_gather(pix, interm_logits)  # (B,K,512)
        ocr = SpatialOCR(key_channels=256, out_channels=512, dropout=self.dropout,
                         dtype=self.dtype, name="ocr")(pix, context, train)
        logits = nn.Conv(num_classes, (1, 1), use_bias=True, dtype=self.dtype,
                         name="conv_out")(ocr)

        out = {
            "logits": to_f32(upsample_like(logits, in_hw)),
            "interm_logits": to_f32(upsample_like(interm_logits, in_hw)),
            # pre-upsample logits for losses that fuse the align_corners
            # upsample into their own pipeline (losses/fused_lovasz.py);
            # XLA dead-code-eliminates these when the loss doesn't use them
            "logits_s8": to_f32(logits),
            "interm_logits_s8": to_f32(interm_logits),
            "deep_features": high,
        }
        if self.projector is not None:
            out["proj_features"] = Projector(**self.projector, dtype=self.dtype,
                                             name="projector")(high, train)
        return out
