"""Projection head for contrastive auxiliary features (models/Projector.py).

A stack of conv-ReLU(-BN) layers described by `mlp` = [[k, c, s], ...]
followed by a 1x1 conv to dimension `d`.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class Projector(nn.Module):
    d: int = 128
    mlp: Sequence[Sequence[int]] = ()
    use_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (k, c, s) in enumerate(self.mlp):
            p = (k - s + 1) // 2  # reference Projector.py:34
            x = nn.Conv(c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        use_bias=not self.use_bn, dtype=self.dtype,
                        name=f"mlp_{i}")(x)
            x = nn.relu(x)
            if self.use_bn:
                x = nn.BatchNorm(not train, momentum=0.9997, dtype=self.dtype,
                                 name=f"mlp_bn_{i}")(x)
        return nn.Conv(self.d, (1, 1), dtype=self.dtype, name="out")(x)
