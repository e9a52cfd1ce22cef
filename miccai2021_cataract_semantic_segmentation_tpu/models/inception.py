"""Inception-v3 encoder for EncDec (reference models/Inception.py).

torchvision inception_v3 re-expressed in flax, returning the reference's four
feature-map cut points (Inception.py:20-58): after Conv2d_4a_3x3 (192ch),
Mixed_5d (288ch), Mixed_6e (768ch), Mixed_7c (2048ch). Module names follow
the torch state-dict keys (Conv2d_1a_3x3, Mixed_5b.branch1x1, ...) so
pretrained checkpoints port mechanically (OIHW->HWIO + name join).

torchvision conventions kept: convs have no bias, BN eps=1e-3; stem and
reduction convs are unpadded ('VALID'), giving the same odd spatial sizes.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu.models.layers import max_pool_torch

Dtype = Any


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=0.001) + relu."""
    features: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel, strides=(self.stride, self.stride),
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(not train, epsilon=1e-3, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg_pool3(x):
    """torch avg_pool2d(3, stride=1, padding=1, count_include_pad=True):
    zero-pad then divide by the full window size (9), padding included."""
    import jax
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    s = jax.lax.reduce_window(xp, jnp.zeros((), x.dtype), jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
    return s / jnp.asarray(9.0, x.dtype)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3, train)
        bp = _avg_pool3(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=d, name="branch3x3")(x, train)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=d, name="branch3x3dbl_3")(bd, train)
        bp = max_pool_torch(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd, train)
        bp = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=d, name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=d, name="branch7x7x3_4")(b7, train)
        bp = max_pool_torch(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3, train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3, train),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd, train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd, train),
        ], axis=-1)
        bp = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


INCEPTION_CHANNELS = (192, 288, 768, 2048)


class InceptionV3Encoder(nn.Module):
    """4 feature maps at the reference's cut points (Inception.py:20-58)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = BasicConv2d(32, (3, 3), stride=2, dtype=d, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x, train)
        x = max_pool_torch(x, 3, 2)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x, train)
        c1 = x
        x = max_pool_torch(x, 3, 2)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x, train)
        c2 = x
        x = InceptionB(dtype=d, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x, train)
        c3 = x
        x = InceptionD(dtype=d, name="Mixed_7a")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7b")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7c")(x, train)
        return {"layer1": c1, "layer2": c2, "layer3": c3, "layer4": x}
