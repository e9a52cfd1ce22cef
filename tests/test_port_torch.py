"""Checkpoint-porting tests: synthetic torch-style state dicts with the
reference's exact key naming are mapped onto the flax trees; every mapped
leaf must change and keep its shape."""
import jax
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
from miccai2021_cataract_semantic_segmentation_tpu.train.port_torch import (
    port_state_dict, strip_moco_prefix, _conv_to_hwio,
)


def _fill_resnet18_sd(sd, prefix=""):
    """torchvision resnet18 state-dict keys (the well-known naming)."""
    def conv(key, o, i, k):
        sd[prefix + key] = np.random.default_rng(len(sd)).normal(
            size=(o, i, k, k)).astype(np.float32)

    def bn(key, c):
        # values distinct from flax init (scale=1, bias=0) so the test can
        # detect that every mapped leaf actually changed
        for leaf, val in [("weight", np.full(c, 1.5)), ("bias", np.full(c, 0.1)),
                          ("running_mean", np.full(c, 0.25)),
                          ("running_var", np.full(c, 2.0))]:
            sd[prefix + key + "." + leaf] = val.astype(np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    channels = [64, 64, 128, 256, 512]
    for li, blocks in zip(range(1, 5), (2, 2, 2, 2)):
        c_out, c_in = channels[li], channels[li - 1]
        for b in range(blocks):
            base = f"layer{li}.{b}."
            conv(base + "conv1.weight", c_out, c_in if b == 0 else c_out, 3)
            bn(base + "bn1", c_out)
            conv(base + "conv2.weight", c_out, c_out, 3)
            bn(base + "bn2", c_out)
            if b == 0 and li > 1:
                conv(base + "downsample.0.weight", c_out, c_in, 1)
                bn(base + "downsample.1", c_out)
    return sd


def _leaves_with_paths(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_port_ocrnet_resnet18():
    m = build_model({"model": "OCRNet", "backbone": "resnet18"}, task=1)
    variables = m.init(jax.random.PRNGKey(0),
                       np.zeros((1, 64, 64, 3), np.float32), False)
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    _fill_resnet18_sd(sd, "backbone.")
    # OCR head keys (models/OCR.py structure)
    def conv(key, o, i, k, bias=False):
        sd[key + ".weight"] = np.random.default_rng(len(sd)).normal(
            size=(o, i, k, k)).astype(np.float32)
        if bias:
            sd[key + ".bias"] = np.zeros(o, np.float32)

    def bn(key, c):
        for leaf, val in [("weight", np.full(c, 1.5)), ("bias", np.full(c, 0.1)),
                          ("running_mean", np.full(c, 0.5)),
                          ("running_var", np.full(c, 1.5))]:
            sd[key + "." + leaf] = val.astype(np.float32)

    conv("conv_high_map.0", 512, 512, 3)
    bn("conv_high_map.1", 512)
    conv("interm_prediction_head.0", 512, 256, 3)
    bn("interm_prediction_head.1", 512)
    conv("interm_prediction_head.4", 8, 512, 1, bias=True)
    for qkv, n, cin in (("f_pixel", 2, 512), ("f_object", 2, 512),
                        ("f_down", 1, 512)):
        for i in range(n):
            conv(f"spatial_ocr_head.object_context_block.{qkv}.{3 * i}",
                 256, cin if i == 0 else 256, 1)
            bn(f"spatial_ocr_head.object_context_block.{qkv}.{3 * i + 1}", 256)
    conv("spatial_ocr_head.object_context_block.f_up.0", 512, 256, 1)
    bn("spatial_ocr_head.object_context_block.f_up.1", 512)
    conv("spatial_ocr_head.conv_bn_dropout.0", 512, 1024, 1)
    bn("spatial_ocr_head.conv_bn_dropout.1", 512)
    conv("conv_out", 8, 512, 1, bias=True)

    new_params, new_stats = port_state_dict("OCRNet", sd, params, stats)

    old = _leaves_with_paths(params)
    new = _leaves_with_paths(new_params)
    changed = sum(1 for k in old if not np.array_equal(old[k], new[k]))
    # every conv kernel + cls bias + BN scale/bias should be overwritten
    assert changed > 60, f"only {changed} param leaves changed"
    for k in old:
        assert old[k].shape == new[k].shape, k
    # BN running stats landed in batch_stats
    s_old = _leaves_with_paths(stats)
    s_new = _leaves_with_paths(new_stats)
    stats_changed = sum(1 for k in s_old if not np.array_equal(s_old[k], s_new[k]))
    assert stats_changed > 30
    # model still runs with ported weights
    out = m.apply({"params": new_params, "batch_stats": new_stats},
                  np.zeros((1, 32, 32, 3), np.float32), False)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_port_backbone_kernel_orientation():
    """OIHW->HWIO transpose sanity on a known kernel."""
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    hwio = _conv_to_hwio(w)
    assert hwio.shape == (5, 7, 3, 2)
    assert hwio[0, 0, 0, 0] == w[0, 0, 0, 0]
    assert hwio[4, 6, 2, 1] == w[1, 2, 4, 6]


def test_strip_moco_prefix():
    sd = {"module.encoder_q.conv1.weight": np.zeros(1),
          "module.encoder_q.fc.weight": np.zeros(1),
          "module.encoder_k.conv1.weight": np.zeros(1)}
    out = strip_moco_prefix(sd)
    assert "conv1.weight" in out
    assert not any(k.startswith("fc.") for k in out)


def test_trainer_torch_checkpoint_hook(tmp_path):
    """config {"torch_checkpoint": path} ports a .pt into the Trainer state."""
    import pandas as pd
    import torch
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer

    sd = {}
    _fill_resnet18_sd(sd, "backbone.")
    # minimal OCR head keys for resnet18 (task 1)
    def conv(key, o, i, k, bias=False):
        sd[key + ".weight"] = np.random.default_rng(len(sd)).normal(
            size=(o, i, k, k)).astype(np.float32)
        if bias:
            sd[key + ".bias"] = np.random.default_rng(len(sd)).normal(
                size=(o,)).astype(np.float32)
    conv("conv_high_map.0", 512, 512, 3)
    conv("interm_prediction_head.0", 512, 256, 3)
    conv("interm_prediction_head.4", 8, 512, 1, bias=True)
    conv("conv_out", 8, 512, 1, bias=True)
    pt = tmp_path / "chkpt_best.pt"
    torch.save({"model_state_dict": {k: torch.from_numpy(v)
                                     for k, v in sd.items()}}, pt)

    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8),
                      rng.integers(0, 8, (2, 32, 32), dtype=np.uint8))
    df = pd.DataFrame({"vid_num": np.ones(2, int)})
    config = {
        "name": "port", "mode": "inference",
        "graph": {"model": "OCRNet", "backbone": "resnet18"},
        "data": {"experiment": 1, "batch_size": 1, "split": 0,
                 "transforms": []},
        "loss": {}, "train": {},
        "torch_checkpoint": str(pt),
        "log_path": str(tmp_path), "precision": "f32", "seed": 0,
    }
    t = Trainer(config, datasets=(ds, ds, df, df))
    # a ported conv kernel matches the torch tensor (OIHW->HWIO)
    got = np.asarray(t.state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, _conv_to_hwio(sd["conv1.weight"])
                               if "conv1.weight" in sd else
                               _conv_to_hwio(sd["backbone.conv1.weight"]),
                               rtol=1e-6)
