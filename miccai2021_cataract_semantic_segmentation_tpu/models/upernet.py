"""UPerNet decoder: PPM + FPN over 4 encoder scales (reference models/UPerNet.py).

All decoder interpolations use align_corners=False (UPerNet.py:119-143).
The quirky fusion concat order of the reference ([P2, P5, P4, P3]) is kept
so ported conv_last weights line up (UPerNet.py:135-141).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.models.layers import (
    ConvBN, adaptive_avg_pool, upsample_like, to_f32)

Dtype = Any


class UPerNetDecoder(nn.Module):
    task: int = 2
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    input_scales: Sequence[int] = (4, 8, 16, 32)
    ppm_num_ch: int = 512
    fpn_num_ch: int = 512
    fpn_num_lvl: int | None = None
    interpolate_result_up: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, conv_out: Sequence[jnp.ndarray], train: bool = False):
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        n_lvl = self.fpn_num_lvl or len(self.input_scales)
        n_lvl = max(1, min(n_lvl, len(self.input_scales)))
        top = conv_out[-1]
        hw = top.shape[1:3]

        # PPM over the deepest features
        ppm_out = [top]
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(top, (scale, scale))
            p = upsample_like(p, hw, align_corners=False)  # up BEFORE conv (UPerNet.py:119-123)
            ppm_out.append(ConvBN(self.ppm_num_ch, 1, dtype=self.dtype,
                                  name=f"ppm_conv_{i}")(p, train))
        y = jnp.concatenate(ppm_out, axis=-1)
        feature = ConvBN(self.fpn_num_ch, 3, dtype=self.dtype,
                         name="ppm_last_conv")(y, train)

        # FPN top-down
        fpn_features = [feature]
        for i in range(2, n_lvl + 1):
            lateral = ConvBN(self.fpn_num_ch, 1, dtype=self.dtype,
                             name=f"fpn_in_{n_lvl - i}")(conv_out[-i], train)
            feature = upsample_like(feature, lateral.shape[1:3], align_corners=False)
            feature = lateral + feature
            fpn_features.append(ConvBN(self.fpn_num_ch, 3, dtype=self.dtype,
                                       name=f"fpn_out_{n_lvl - i}")(feature, train))
        fpn_features.reverse()  # finest first

        out_hw = fpn_features[0].shape[1:3]
        fusion = [fpn_features[0]]
        for i in range(2, n_lvl + 1):  # reference order: [P2, P5, P4, P3]
            fusion.append(upsample_like(fpn_features[-i + 1], out_hw,
                                        align_corners=False))
        y = jnp.concatenate(fusion, axis=-1)
        y = ConvBN(self.fpn_num_ch, 3, dtype=self.dtype, name="conv_last")(y, train)
        logits = nn.Conv(num_classes, (1, 1), dtype=self.dtype, name="cls")(y)
        small = logits
        if self.interpolate_result_up:
            s = self.input_scales[-n_lvl]
            logits = upsample_like(logits, (out_hw[0] * s, out_hw[1] * s),
                                   align_corners=False)
        # (full-res logits, pre-upsample logits) — the second feeds losses
        # that fuse the align_corners=False upsample (losses/fused_lovasz.py)
        return to_f32(logits), to_f32(small)
