"""Small conv+FC discriminator (reference models/simple_discriminator.py —
unused by the shipped configs but part of the model zoo)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class SimpleDiscriminator(nn.Module):
    """3x (strided VALID conv + BN + relu) -> flatten -> fc 32 -> sigmoid(fc 1).

    Channel widths d, 2d, 4d (simple_discriminator.py:14-24)."""
    d: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (c, k) in enumerate([(self.d, 5), (2 * self.d, 3), (4 * self.d, 3)]):
            x = nn.Conv(c, (k, k), strides=(2, 2), padding="VALID",
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype,
                             name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(32, dtype=self.dtype, name="fc1")(x))
        return nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="fc2")(x))
