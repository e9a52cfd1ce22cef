"""Generic encoder–decoder composer (reference models/EncDec.py).

The reference probes encoder channels/scales by a dummy 320x320 forward
(EncDec.py:18-26); here they're static properties of the backbone registry —
no probe pass needed. Output dict: {'logits', 'deep_features'[, 'proj_features']}
where deep_features are the deepest encoder features or their projection.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu.models.projector import Projector
from miccai2021_cataract_semantic_segmentation_tpu.models.resnet import (
    ENCODER_ALIASES, ResNetBackbone, output_channels,
)
from miccai2021_cataract_semantic_segmentation_tpu.models.upernet import UPerNetDecoder

Dtype = Any


class EncDec(nn.Module):
    task: int = 2
    encoder: dict | None = None   # {'model': 'ResNet50', ...}
    decoder: dict | None = None   # {'model': 'UPerNet' | 'PointRend', ...}
    projector: dict | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_cfg = self.encoder or {"model": "ResNet50"}
        dec_cfg = dict(self.decoder or {"model": "UPerNet"})
        if enc_cfg["model"] in ("Inceptionv3", "InceptionV3"):
            from miccai2021_cataract_semantic_segmentation_tpu.models.inception import (
                InceptionV3Encoder)
            feats = InceptionV3Encoder(dtype=self.dtype, name="encoder")(x, train)
        else:
            arch = ENCODER_ALIASES.get(enc_cfg["model"], enc_cfg["model"])
            feats = ResNetBackbone(arch, (False, False, False), dtype=self.dtype,
                                   name="encoder")(x, train)
        conv_out = [feats[f"layer{i}"] for i in (1, 2, 3, 4)]

        dec_name = dec_cfg.pop("model", "UPerNet")
        if dec_name == "UPerNet":
            logits, logits_small = UPerNetDecoder(
                task=self.task, input_scales=(4, 8, 16, 32),
                dtype=self.dtype, name="decoder",
                **{k: v for k, v in dec_cfg.items()
                   if k in ("pool_scales", "ppm_num_ch",
                            "fpn_num_ch", "fpn_num_lvl",
                            "interpolate_result_up")},
            )(conv_out, train)
            # "_acf" marks the align_corners=False upsample convention
            # (UPerNet.py:143-144) for losses that fuse the upsample
            out = {"logits": logits, "logits_s8_acf": logits_small}
        elif dec_name == "PointRend":
            from miccai2021_cataract_semantic_segmentation_tpu.models.pointrend import PointRendDecoder
            # accept both the reference config vocabulary (PointRend.py:14-19)
            # and the internal field names
            aliases = {"pr_train_num_pts": "num_points",
                       "pr_oversample_ratio": "oversample_ratio",
                       "pr_importance_sample_ratio": "importance_sample_ratio",
                       "pr_subdivision_num_pts": "subdivision_num_points"}
            kw = {aliases.get(k, k): v for k, v in dec_cfg.items()}
            out = PointRendDecoder(task=self.task, dtype=self.dtype,
                                   name="decoder",
                                   **{k: v for k, v in kw.items()
                                      if k in ("num_points", "oversample_ratio",
                                               "importance_sample_ratio",
                                               "subdivision_num_points")},
                                   )(conv_out, train)
        else:
            raise ValueError(f"Unknown decoder '{dec_name}'")

        if self.projector is not None:
            out["deep_features"] = Projector(**self.projector, dtype=self.dtype,
                                             name="projector")(conv_out[-1], train)
        else:
            out["deep_features"] = conv_out[-1]
        return out
