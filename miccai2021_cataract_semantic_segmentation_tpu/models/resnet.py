"""torchvision-compatible ResNet / ResNeXt / WideResNet backbones in flax.

Mirrors torchvision's resnet.py structure (stem conv7x7/2 + maxpool3x3/2,
BasicBlock / Bottleneck layers, `replace_stride_with_dilation`) with module
names matching the torch state-dict keys (`conv1`, `bn1`, `layer1.0.conv2`,
`layer2.0.downsample.0` ...) so the published checkpoints port mechanically
(OIHW->HWIO transpose + name join). Reference usage: models/OCR.py:47-67,
models/DeepLabv3.py:20-44, models/ResNet.py, models/ResNeXt.py,
models/WideResNet.py.

Returns a dict of all four stage outputs {'layer1'..'layer4'}; callers pick
what they need and XLA dead-code-eliminates the rest.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu.models.layers import max_pool_torch

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation, kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(not train, momentum=self.bn_momentum, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(not train, momentum=self.bn_momentum, dtype=self.dtype, name="bn2")(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_0")(x)
            identity = nn.BatchNorm(not train, momentum=self.bn_momentum,
                                    dtype=self.dtype, name="downsample_1")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(not train, momentum=self.bn_momentum, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation, kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(not train, momentum=self.bn_momentum, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(not train, momentum=self.bn_momentum, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_0")(x)
            identity = nn.BatchNorm(not train, momentum=self.bn_momentum,
                                    dtype=self.dtype, name="downsample_1")(identity)
        return nn.relu(y + identity)


_ARCHS = {
    # name: (block, layers, groups, base_width)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3), 1, 128),
}

# aliases used by the reference's EncDec encoder registry (models/__init__.py)
ENCODER_ALIASES = {
    "ResNet18": "resnet18", "ResNet34": "resnet34",
    "ResNet50": "resnet50", "ResNet101": "resnet101",
    "ResNeXt50": "resnext50_32x4d", "ResNeXt101": "resnext101_32x8d",
    "WideResNet50": "wide_resnet50_2", "WideResNet101": "wide_resnet101_2",
}


def output_channels(arch: str) -> tuple[int, int, int, int]:
    block, layers, groups, base_width = _ARCHS[arch]
    return tuple(p * block.expansion for p in (64, 128, 256, 512))


class ResNetBackbone(nn.Module):
    """4-stage feature extractor.

    `dilate_stages`: torchvision's replace_stride_with_dilation triple for
    (layer2, layer3, layer4) — True turns that layer's stride into dilation.
    """
    arch: str = "resnet50"
    dilate_stages: Sequence[bool] = (False, False, False)
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layer_sizes, groups, base_width = _ARCHS[self.arch]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(not train, momentum=self.bn_momentum, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)

        feats = {}
        dilation = 1
        in_planes = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layer_sizes)):
            stride = 1 if li == 0 else 2
            if li > 0 and self.dilate_stages[li - 1]:
                dilation *= stride
                stride = 1
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                # torchvision: first block of a dilated layer uses the
                # *previous* dilation for its 3x3 conv
                d = dilation // (2 if (bi == 0 and li > 0 and self.dilate_stages[li - 1]) else 1)
                need_ds = bi == 0 and (s != 1 or in_planes != planes * block.expansion)
                kwargs = dict(planes=planes, stride=s, dilation=max(d, 1),
                              downsample=need_ds, bn_momentum=self.bn_momentum,
                              dtype=self.dtype, name=f"layer{li + 1}_{bi}")
                if block is Bottleneck:
                    kwargs.update(groups=groups, base_width=base_width)
                x = block(**kwargs)(x, train)
                in_planes = planes * block.expansion
            feats[f"layer{li + 1}"] = x
        return feats
