"""Width-scalable FCN-8s and minimal 4-level UNet (reference models/FCN.py,
models/UNet.py)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.models.layers import (
    max_pool_torch, torch_pad, upsample_like, to_f32)

Dtype = Any


class FCN(nn.Module):
    """FCN-8s with skip fusions p4/p3 and learned deconv upsampling
    (FCN.py:39-61). Deconvs use flax ConvTranspose with torch-equivalent
    output sizes (k=4,s=2,p=1 -> 2x; k=16,s=8,p=4 -> 8x)."""
    task: int = 1
    width: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        ch = np.round(np.array([64, 128, 256, 512, 512, 1024, 1024]) * self.width).astype(int)

        def conv(y, c, k, name):
            p = torch_pad(k)
            return nn.Conv(int(c), (k, k), padding=((p, p), (p, p)),
                           dtype=self.dtype, name=name)(y)

        def deconv(y, c, k, s, name):
            p = (k - s + 1) // 2  # reference padded_convtranspose2d
            return nn.ConvTranspose(int(c), (k, k), strides=(s, s),
                                    padding=((k - 1 - p, k - 1 - p),) * 2,
                                    transpose_kernel=True, dtype=self.dtype,
                                    name=name)(y)

        c1 = nn.relu(conv(x, ch[0], 3, "conv1")); p1 = max_pool_torch(c1, 2, 2)
        c2 = nn.relu(conv(p1, ch[1], 3, "conv2")); p2 = max_pool_torch(c2, 2, 2)
        c3 = nn.relu(conv(p2, ch[2], 3, "conv3")); p3 = max_pool_torch(c3, 2, 2)
        c4 = nn.relu(conv(p3, ch[3], 3, "conv4")); p4 = max_pool_torch(c4, 2, 2)
        c5 = nn.relu(conv(p4, ch[4], 3, "conv5")); p5 = max_pool_torch(c5, 2, 2)
        c6 = nn.relu(conv(p5, ch[5], 3, "conv6"))
        c7 = nn.relu(conv(c6, ch[6], 1, "conv7"))
        c8 = conv(c7, num_classes, 1, "conv8")
        # For inputs not divisible by 32 the deconv output can be off-by-one
        # vs the skip feature (e.g. 540x960); align by resize (identity when
        # shapes already match, which is the /32-divisible reference case).
        def fuse(y, skip):
            if y.shape[1:3] != skip.shape[1:3]:
                y = upsample_like(y, skip.shape[1:3], align_corners=False)
            return y + skip

        fcn_16s = fuse(deconv(c8, num_classes, 4, 2, "deconv32"),
                       conv(p4, num_classes, 1, "p4_conv"))
        fcn_8s = fuse(deconv(fcn_16s, num_classes, 4, 2, "deconv16"),
                      conv(p3, num_classes, 1, "p3_conv"))
        logits = deconv(fcn_8s, num_classes, 16, 8, "deconv8")
        if logits.shape[1:3] != x.shape[1:3]:
            logits = upsample_like(logits, x.shape[1:3], align_corners=False)
        return {"logits": to_f32(logits)}


class UNet(nn.Module):
    """4-level UNet with align_corners=True 2x upsampling (UNet.py:36-62).

    Note: like the reference, num_classes here includes the ignore channel
    for tasks 2/3 (UNet.py:21 has no '-1')."""
    task: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_classes = taxonomy.num_label_values(self.task)

        def double_conv(y, c, name):
            for i in (1, 2):
                y = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"{name}_conv{i}")(y)
                y = nn.relu(y)
            return y

        d1 = double_conv(x, 64, "down1")
        d2 = double_conv(max_pool_torch(d1, 2, 2), 128, "down2")
        d3 = double_conv(max_pool_torch(d2, 2, 2), 256, "down3")
        d4 = double_conv(max_pool_torch(d3, 2, 2), 512, "down4")

        def up(y, skip):
            y = upsample_like(y, (y.shape[1] * 2, y.shape[2] * 2), align_corners=True)
            return jnp.concatenate([y, skip], axis=-1)

        y = double_conv(up(d4, d3), 256, "up3")
        y = double_conv(up(y, d2), 128, "up2")
        y = double_conv(up(y, d1), 64, "up1")
        logits = nn.Conv(num_classes, (1, 1), dtype=self.dtype, name="conv_last")(y)
        return {"logits": to_f32(logits)}
