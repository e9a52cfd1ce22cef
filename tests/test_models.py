"""Model graph tests: output shapes, parameter-count goldens, backbone
structure parity with torchvision (fc removed).

Golden counts derived analytically from the torchvision/reference layer
shapes (e.g. resnet50 = 25,557,032 total incl. fc 2,049,000 -> 23,508,032
backbone-only; DeepLabv3 = backbone + ASPP 15.54M + 1x1 classifier).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
from miccai2021_cataract_semantic_segmentation_tpu.models.resnet import ResNetBackbone


def _n_params(variables):
    return int(sum(np.prod(v.shape) for v in jax.tree.leaves(variables["params"])))


def _init(model, shape=(1, 32, 48, 3), train=False):
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init({"params": rng, "points": rng, "dropout": rng}, x, train)
    return variables, x


@pytest.mark.parametrize("arch,expected", [
    ("resnet18", 11_176_512),
    ("resnet50", 23_508_032),
])
def test_backbone_param_goldens(arch, expected):
    m = ResNetBackbone(arch)
    variables, x = _init(m)
    assert _n_params(variables) == expected


def test_backbone_feature_pyramid():
    m = ResNetBackbone("resnet18")
    variables, x = _init(m, (1, 64, 64, 3))
    feats = m.apply(variables, x)
    assert feats["layer1"].shape == (1, 16, 16, 64)
    assert feats["layer2"].shape == (1, 8, 8, 128)
    assert feats["layer3"].shape == (1, 4, 4, 256)
    assert feats["layer4"].shape == (1, 2, 2, 512)


def test_backbone_dilation_keeps_resolution():
    # out_stride 8: layer3/layer4 dilated instead of strided
    m = ResNetBackbone("resnet50", dilate_stages=(False, True, True))
    variables, x = _init(m, (1, 64, 64, 3))
    feats = m.apply(variables, x)
    assert feats["layer2"].shape[1:3] == (8, 8)
    assert feats["layer3"].shape[1:3] == (8, 8)
    assert feats["layer4"].shape[1:3] == (8, 8)
    # dilation does not change the parameter count
    assert _n_params(variables) == 23_508_032


@pytest.mark.parametrize("graph,n_classes,expected_params", [
    ({"model": "DeepLabv3", "backbone": "resnet50", "out_stride": 16}, 17, 39_047_505),
    # 38,868,578 == the reference torch model's exact count (incl. the
    # conv_high_map/interm-head conv biases, OCR.py:73,84 default bias=True)
    ({"model": "OCRNet", "backbone": "resnet50", "out_stride": 8}, 17, 38_868_578),
])
def test_model_goldens(graph, n_classes, expected_params):
    m = build_model(graph, task=2)
    variables, x = _init(m)
    out = m.apply(variables, x)
    assert out["logits"].shape == (1, 32, 48, n_classes)
    assert _n_params(variables) == expected_params


def test_ocrnet_outputs():
    m = build_model({"model": "OCRNet", "backbone": "resnet18"}, task=1)
    variables, x = _init(m, (2, 32, 32, 3))
    out = m.apply(variables, x)
    assert out["logits"].shape == (2, 32, 32, 8)
    assert out["interm_logits"].shape == (2, 32, 32, 8)
    assert out["deep_features"].shape[-1] == 512  # resnet18 layer4


def test_deeplabv3plus_shapes():
    m = build_model({"model": "DeepLabv3Plus", "backbone": "resnet50"}, task=3)
    variables, x = _init(m)
    out = m.apply(variables, x)
    assert out["logits"].shape == (1, 32, 48, 25)


def test_upernet_and_small_models():
    for graph, k in [
        ({"model": "UPerNet", "encoder": {"model": "ResNet18"}}, 17),
        ({"model": "FCN", "width": 0.25}, 17),
        ({"model": "UNet"}, 18),  # UNet keeps the ignore channel (UNet.py:21)
        ({"model": "HRNetv2"}, 17),
    ]:
        m = build_model(graph, task=2)
        variables, x = _init(m)
        out = m.apply(variables, x)
        assert out["logits"].shape == (1, 32, 48, k), graph


def test_ocrnet_hrnet_backbone():
    """OCR-on-HRNet extension: the reference declares the combination "not
    yet implemented" (OCR.py:69); here the HRNet trunk's stride-4 concat map
    feeds both the soft-region head and the pixel-feature conv."""
    m = build_model({"model": "OCRNet", "backbone": "hrnetv2"}, task=2)
    variables, x = _init(m, (1, 32, 48, 3))
    out = m.apply(variables, x)
    assert out["logits"].shape == (1, 32, 48, 17)
    assert out["interm_logits"].shape == (1, 32, 48, 17)
    assert out["logits_s8"].shape == (1, 8, 12, 17)  # pre-upsample: stride 4

    # the trunk must expose the SAME parameter tree as HRNetv2 itself (the
    # shared hrnet_trunk helper guarantees porter-visible names): every
    # non-head HRNetv2 param subtree appears here with identical shapes
    hr = build_model({"model": "HRNetv2"}, task=2)
    hr_vars, _ = _init(hr, (1, 32, 48, 3))
    for key, sub in hr_vars["params"].items():
        if key in ("head", "cls"):
            continue
        assert key in variables["params"], key
        a = jax.tree.map(lambda v: v.shape, sub)
        b = jax.tree.map(lambda v: v.shape, variables["params"][key])
        assert a == b, key


def test_pointrend_train_and_eval():
    graph = {"model": "PointRend", "encoder": {"model": "ResNet18"},
             "decoder": {"num_points": 16, "subdivision_num_points": 32}}
    m = build_model(graph, task=1)
    variables, x = _init(m, (1, 32, 32, 3), train=True)
    out, _ = m.apply(variables, x, True, rngs={"points": jax.random.PRNGKey(1)},
                     mutable=["batch_stats"])
    assert out["logits"].shape == (1, 32, 32, 8)
    assert out["point_logits"].shape == (1, 16, 8)
    assert out["point_coords"].shape == (1, 16, 2)
    out_eval = m.apply(variables, x, False)
    assert out_eval["logits"].shape == (1, 32, 32, 8)


def test_train_mode_updates_batch_stats():
    m = build_model({"model": "DeepLabv3", "backbone": "resnet18"}, task=1)
    # note: DeepLabv3 asserts resnet50/101 in the reference but the backbone
    # registry here accepts any; use resnet50 for strictness elsewhere
    variables, x = _init(m, (2, 32, 32, 3))
    x = jnp.ones_like(x)
    out, mutated = m.apply(variables, x, True, mutable=["batch_stats"])
    # running stats moved away from init (mean 0)
    leaves = jax.tree.leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_ensemble_merge():
    from miccai2021_cataract_semantic_segmentation_tpu.models import ensemble_apply
    m1 = build_model({"model": "FCN", "width": 0.25}, task=1)
    v1, x = _init(m1, (1, 32, 32, 3))
    members = [(lambda v, xx: m1.apply(v, xx), v1, False),
               (lambda v, xx: m1.apply(v, xx), v1, True)]
    probs = ensemble_apply(members, x, merge="mean")
    assert probs.shape == (1, 32, 32, 8)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
