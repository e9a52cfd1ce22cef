"""Load the reference PyTorch models (/root/reference/models) as numerical
oracles for checkpoint-port parity tests.

torchvision is not installed in this image, so a faithful torchvision-style
ResNet (same architecture, same state-dict naming, ResNet-V1.5 stride
placement, replace_stride_with_dilation semantics) plus an
IntermediateLayerGetter are provided here and injected as a `torchvision`
stub before importing the reference modules. The reference's heavy `utils`
package (cv2/matplotlib/PIL imports) is replaced by a thin fake exposing
only CLASS_INFO (loaded from the real utils/defaults.py) and conv3x3
(replicated from utils/torch_utils.py:171-187).

Only importable from tests; never shipped in the package.
"""
from __future__ import annotations

import importlib
import importlib.util
import sys
import types

import torch
from torch import nn

REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# torchvision-compatible ResNet (architecture + naming)
# ---------------------------------------------------------------------------

def _conv3x3(cin, cout, stride=1, groups=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                     groups=groups, bias=False, dilation=dilation)


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 base_width=64, dilation=1):
        super().__init__()
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 base_width=64, dilation=1):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = _conv1x1(inplanes, width)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = _conv3x3(width, width, stride, groups, dilation)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = _conv1x1(width, planes * self.expansion)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TVResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, groups=1,
                 width_per_group=64, replace_stride_with_dilation=None):
        super().__init__()
        self.inplanes = 64
        self.dilation = 1
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.groups = groups
        self.base_width = width_per_group
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], 2,
                                       replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(block, 256, layers[2], 2,
                                       replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(block, 512, layers[3], 2,
                                       replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample, self.groups,
                        self.base_width, previous_dilation)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, groups=self.groups,
                                base_width=self.base_width,
                                dilation=self.dilation))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(pretrained=False, progress=True, **kw):
    assert not pretrained, "no network access: pretrained stubs must be False"
    return TVResNet(BasicBlock, [2, 2, 2, 2], **kw)


def resnet34(pretrained=False, progress=True, **kw):
    assert not pretrained
    return TVResNet(BasicBlock, [3, 4, 6, 3], **kw)


def resnet50(pretrained=False, progress=True, **kw):
    assert not pretrained
    return TVResNet(Bottleneck, [3, 4, 6, 3], **kw)


def resnet101(pretrained=False, progress=True, **kw):
    assert not pretrained
    return TVResNet(Bottleneck, [3, 4, 23, 3], **kw)


def resnext50_32x4d(pretrained=False, progress=True, **kw):
    assert not pretrained
    return TVResNet(Bottleneck, [3, 4, 6, 3], groups=32, width_per_group=4, **kw)


def resnext101_32x8d(pretrained=False, progress=True, **kw):
    assert not pretrained
    return TVResNet(Bottleneck, [3, 4, 23, 3], groups=32, width_per_group=8, **kw)


def wide_resnet50_2(pretrained=False, progress=True, **kw):
    assert not pretrained
    return TVResNet(Bottleneck, [3, 4, 6, 3], width_per_group=128, **kw)


def wide_resnet101_2(pretrained=False, progress=True, **kw):
    assert not pretrained
    return TVResNet(Bottleneck, [3, 4, 23, 3], width_per_group=128, **kw)


class IntermediateLayerGetter(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter behaviour: keep
    children up to the last requested layer; forward returns {out_name: t}."""

    def __init__(self, model, return_layers):
        orig = dict(return_layers)
        layers = {}
        remaining = dict(return_layers)
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = {}
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


# ---------------------------------------------------------------------------
# module injection
# ---------------------------------------------------------------------------

def _tv_conv3x3(in_planes, out_planes, batch_norm, relu, stride=1):
    """utils/torch_utils.py:171-187 conv3x3 factory (UPerNet dependency)."""
    c = nn.Conv2d(in_planes, out_planes, 3, stride=stride, padding=1, bias=False)
    mods = [c]
    if batch_norm:
        mods.append(nn.BatchNorm2d(out_planes))
    if relu:
        mods.append(nn.ReLU(inplace=True))
    return mods[0] if len(mods) == 1 else nn.Sequential(*mods)


_loaded: dict | None = None


def load_reference_models() -> dict:
    """Import the reference model modules with stubbed torchvision/utils.
    Returns {name: class} for the parity-target models."""
    global _loaded
    if _loaded is not None:
        return _loaded

    # torchvision stub ------------------------------------------------------
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    for f in (resnet18, resnet34, resnet50, resnet101, resnext50_32x4d,
              resnext101_32x8d, wide_resnet50_2, wide_resnet101_2):
        setattr(tvm, f.__name__, f)
    tvu = types.ModuleType("torchvision.models._utils")
    tvu.IntermediateLayerGetter = IntermediateLayerGetter
    tvt = types.ModuleType("torchvision.transforms")
    for name in ("ToPILImage", "ColorJitter", "ToTensor", "Normalize",
                 "RandomApply"):
        setattr(tvt, name, type(name, (), {}))
    tv.models = tvm
    tv.transforms = tvt
    tvm._utils = tvu
    sys.modules.setdefault("torchvision", tv)
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models._utils"] = tvu
    sys.modules["torchvision.transforms"] = tvt

    # reference utils/defaults.py (pure data) -------------------------------
    spec = importlib.util.spec_from_file_location(
        "ref_defaults", f"{REFERENCE}/utils/defaults.py")
    defaults = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(defaults)

    fake_utils = types.ModuleType("utils")
    fake_utils.__path__ = [f"{REFERENCE}/utils"]
    fake_utils.CLASS_INFO = defaults.CLASS_INFO
    fake_utils.DEFAULT_VALUES = getattr(defaults, "DEFAULT_VALUES", {})
    fake_utils.conv3x3 = _tv_conv3x3
    fake_uu = types.ModuleType("utils.utils")
    fake_uu.CLASS_INFO = defaults.CLASS_INFO
    sys.modules["utils"] = fake_utils
    sys.modules["utils.utils"] = fake_uu

    # reference models as a package with a controlled __init__ --------------
    fake_models = types.ModuleType("models")
    fake_models.__path__ = [f"{REFERENCE}/models"]
    sys.modules["models"] = fake_models
    projector = importlib.import_module("models.Projector")
    fake_models.Projector = projector.Projector
    ocr = importlib.import_module("models.OCR")
    dlv3 = importlib.import_module("models.DeepLabv3")
    dlv3p = importlib.import_module("models.DeepLabv3Plus")
    upn = importlib.import_module("models.UPerNet")
    res = importlib.import_module("models.ResNet")
    # EncDec does `from models import *` + globals() lookups
    for name in ("ResNet18", "ResNet34", "ResNet50", "ResNet101"):
        setattr(fake_models, name, getattr(res, name))
    fake_models.UPerNet = upn.UPerNet
    # PointRend must be visible in the models namespace BEFORE EncDec's
    # `from models import *` snapshot (EncDec.py:13-14 globals() lookup)
    pointrend = importlib.import_module("models.PointRend")
    fake_models.PointRend = pointrend.PointRend
    # pointrend_utils hard-codes dtype=torch.float for the subdivision
    # coords (pointrend_utils.py:145), which breaks the f64 oracle runs —
    # rebind with a dtype-following wrapper (values identical)
    _orig_grid_pts = pointrend.get_uncertain_point_coords_on_grid

    def _grid_pts(uncertainty_map, num_points):
        idx, coords = _orig_grid_pts(uncertainty_map, num_points)
        return idx, coords.to(uncertainty_map.dtype)

    pointrend.get_uncertain_point_coords_on_grid = _grid_pts
    encdec = importlib.import_module("models.EncDec")
    # the reference HRNetv2 uses the np.int alias removed in numpy>=1.24
    # (HRNetv2.py:360, in __init__) — restore it for the test process
    import numpy as _np
    _np.int = int
    hrnet = importlib.import_module("models.HRNetv2")

    _loaded = {
        "OCRNet": ocr.OCRNet,
        "DeepLabv3": dlv3.DeepLabv3,
        "DeepLabv3Plus": dlv3p.DeepLabv3Plus,
        "UPerNet": upn.UPerNet,
        "EncDec": encdec.EncDec,
        "HRNetv2": hrnet.HRNetv2,
        "PointRend": pointrend.PointRend,
        "CLASS_INFO": defaults.CLASS_INFO,
    }
    return _loaded


def randomize_module(m: nn.Module, seed: int = 0):
    """Random weights + non-trivial BN running stats so eval-mode parity
    exercises every ported leaf."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
                mod.running_var.copy_(
                    1.0 + 0.5 * torch.rand(mod.running_var.shape, generator=gen))
    return m
