"""Model registry — explicit name->constructor table replacing the
reference's `globals()[config['graph']['model']]` reflection
(managers/BaseManager.py:409, main.py:46).

`build_model(graph_config, task, dtype)` accepts the reference's `graph`
config section vocabulary and returns a flax Module whose __call__ produces
an output dict {'logits': NHWK f32, 'interm_logits'?, 'deep_features'?,
'proj_features'?, ...}.
"""
from __future__ import annotations

import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu.models.deeplab import ASPP, DeepLabv3, DeepLabv3Plus  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.encdec import EncDec  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.discriminator import SimpleDiscriminator  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.ensemble import build_ensemble, ensemble_apply, normalise_imagenet  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.inception import InceptionV3Encoder  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.fcn_unet import FCN, UNet  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.hrnet import HRNetv2  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.ocr import OCRNet  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.pointrend import PointRendDecoder  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.projector import Projector  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.resnet import ResNetBackbone, output_channels  # noqa: F401
from miccai2021_cataract_semantic_segmentation_tpu.models.upernet import UPerNetDecoder  # noqa: F401


def build_model(graph: dict, task: int, dtype=jnp.float32):
    """Construct a model from a reference-style `graph` config section."""
    name = graph.get("model", "OCRNet")
    common = dict(task=task, dtype=dtype)
    if name == "OCRNet":
        return OCRNet(backbone=graph.get("backbone", "resnet101"),
                      out_stride=graph.get("out_stride", 8),
                      dropout=graph.get("dropout", 0.0),
                      projector=graph.get("projector"), **common)
    if name == "DeepLabv3":
        return DeepLabv3(backbone=graph.get("backbone", "resnet50"),
                         out_stride=graph.get("out_stride", 16),
                         c_aspp=graph.get("aspp", {}).get("channels", 256),
                         projector=graph.get("projector"), **common)
    if name == "DeepLabv3Plus":
        return DeepLabv3Plus(backbone=graph.get("backbone", "resnet50"),
                             out_stride=graph.get("out_stride", 16),
                             c_aspp=graph.get("aspp", {}).get("channels", 256),
                             projector=graph.get("projector"), **common)
    if name == "EncDec":
        return EncDec(encoder=graph.get("encoder"), decoder=graph.get("decoder"),
                      projector=graph.get("projector"), **common)
    if name == "UPerNet":  # shorthand: EncDec with a UPerNet decoder
        return EncDec(encoder=graph.get("encoder", {"model": "ResNet50"}),
                      decoder={"model": "UPerNet", **graph.get("decoder", {})},
                      projector=graph.get("projector"), **common)
    if name == "PointRend":  # shorthand: EncDec with a PointRend decoder
        return EncDec(encoder=graph.get("encoder", {"model": "ResNet50"}),
                      decoder={"model": "PointRend", **graph.get("decoder", {})},
                      projector=graph.get("projector"), **common)
    if name == "HRNetv2":
        return HRNetv2(width=graph.get("width", 32), **common)
    if name == "FCN":
        return FCN(width=graph.get("width", 1.0), **common)
    if name == "UNet":
        return UNet(**common)
    if name == "SimpleDiscriminator":
        return SimpleDiscriminator(d=graph.get("d", 64), dtype=dtype)
    raise ValueError(f"Unknown model '{name}'")
