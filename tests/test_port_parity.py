"""Activation-level checkpoint-port parity against the reference PyTorch
models (/root/reference/models, imported via tests/torch_oracle.py).

For each parity-target graph: build the torch model with random weights and
non-trivial BN running stats, port its state_dict through
train.port_torch.port_state_dict, run both in eval mode on the same input,
and require the logits to agree to ~1e-4 — including the align_corners
bilinear upsample paths (OCR.py:128-138). This is the evidence that the
published CaDIS checkpoints (86.40/79.40/71.94 test mIoU) port faithfully.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp
import jax

from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
from miccai2021_cataract_semantic_segmentation_tpu.train.port_torch import (
    port_state_dict,
)

from tests.torch_oracle import load_reference_models, randomize_module


def _port_and_apply(name, graph, torch_model, x_nchw, task=2, x64=False):
    """Port the torch state dict and run the flax model in eval mode.

    `x64=True` runs the flax side in float64 (the torch side must then be
    .double()): with both frameworks in f64, agreement at 1e-6 proves the
    ported graph computes the *same function* — f32 runs differ at ~2e-4
    purely from accumulation order (oneDNN vs XLA)."""
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    dtype = jnp.float64 if x64 else jnp.float32
    if x64:
        jax.config.update("jax_enable_x64", True)
    try:
        model = build_model(graph, task, dtype=dtype)
        x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1)).astype(
            np.float64 if x64 else np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc), False)
        params, stats = variables["params"], variables.get("batch_stats", {})
        params, stats = port_state_dict(name, sd, params, stats)
        out = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x_nhwc), False)
        out = jax.tree.map(np.asarray, out)
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)
    return out


def _assert_close(torch_nchw, flax_nhwk, label, atol=1e-6, rtol=1e-5):
    ref = torch_nchw.detach().numpy()
    got = np.transpose(np.asarray(flax_nhwk), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol, err_msg=label)


# note: the reference's OCRNet+resnet18 crashes in its own forward (the
# interm-head stride override at OCR.py:82-84 leaves the interm grid at
# stride 16 while layer4 is at 32, so SpatialGather's matmul fails) — only
# the resnet50/101 group is testable against the oracle.
@pytest.mark.parametrize("backbone,out_stride", [("resnet50", 8),
                                                 ("resnet50", 16)])
def test_ocrnet_port_parity(backbone, out_stride):
    refs = load_reference_models()
    tm = refs["OCRNet"]({"backbone": backbone, "out_stride": out_stride,
                         "pretrained": False}, 2)
    randomize_module(tm, 0).eval().double()
    x = torch.randn(1, 3, 96, 128,
                    generator=torch.Generator().manual_seed(7)).double()
    with torch.no_grad():
        interm_t, final_t = tm(x)
    out = _port_and_apply("OCRNet", {"model": "OCRNet", "backbone": backbone,
                                     "out_stride": out_stride}, tm,
                          x.numpy(), x64=True)
    _assert_close(final_t, out["logits"], "OCRNet final logits")
    _assert_close(interm_t, out["interm_logits"], "OCRNet interm logits")


def test_ocrnet_port_parity_full_res():
    """Flagship claim at the paper resolution (544x960, align_corners=True
    upsample from stride 8)."""
    refs = load_reference_models()
    tm = refs["OCRNet"]({"backbone": "resnet50", "out_stride": 8,
                         "pretrained": False}, 2)
    randomize_module(tm, 1).eval()
    x = torch.randn(1, 3, 544, 960, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        interm_t, final_t = tm(x)
    out = _port_and_apply("OCRNet", {"model": "OCRNet", "backbone": "resnet50",
                                     "out_stride": 8}, tm, x.numpy())
    # f32 at full res: bound the cross-framework accumulation noise and
    # require the per-pixel argmax (what drives mIoU) to agree everywhere
    _assert_close(final_t, out["logits"], "OCRNet 544x960 final logits",
                  atol=5e-4, rtol=1e-2)
    ref_arg = final_t.numpy().argmax(1)
    got_arg = np.asarray(out["logits"]).argmax(-1)
    agree = (ref_arg == got_arg).mean()
    assert agree > 0.999, f"argmax agreement {agree:.5f}"


def test_deeplabv3_port_parity():
    refs = load_reference_models()
    tm = refs["DeepLabv3"]({"backbone": "resnet50", "out_stride": 16,
                            "pretrained": False}, 2)
    randomize_module(tm, 2).eval().double()
    x = torch.randn(1, 3, 96, 128,
                    generator=torch.Generator().manual_seed(9)).double()
    with torch.no_grad():
        final_t = tm(x)
    if isinstance(final_t, tuple):
        final_t = final_t[-1]
    out = _port_and_apply("DeepLabv3", {"model": "DeepLabv3",
                                        "backbone": "resnet50",
                                        "out_stride": 16}, tm,
                          x.numpy(), x64=True)
    _assert_close(final_t, out["logits"], "DeepLabv3 logits")


def test_deeplabv3plus_port_parity():
    refs = load_reference_models()
    tm = refs["DeepLabv3Plus"]({"backbone": "resnet50", "out_stride": 16,
                                "pretrained": False}, 2)
    randomize_module(tm, 3).eval().double()
    x = torch.randn(1, 3, 96, 128,
                    generator=torch.Generator().manual_seed(10)).double()
    with torch.no_grad():
        final_t = tm(x)
    if isinstance(final_t, tuple):
        final_t = final_t[-1]
    out = _port_and_apply("DeepLabv3Plus", {"model": "DeepLabv3Plus",
                                            "backbone": "resnet50",
                                            "out_stride": 16}, tm,
                          x.numpy(), x64=True)
    _assert_close(final_t, out["logits"], "DeepLabv3+ logits")


def test_encdec_upernet_port_parity():
    refs = load_reference_models()
    cfg = {"encoder": {"model": "ResNet50", "pretrained": False},
           "decoder": {"model": "UPerNet"}}
    tm = refs["EncDec"](dict(cfg), 2)
    randomize_module(tm, 4).eval().double()
    x = torch.randn(1, 3, 96, 128,
                    generator=torch.Generator().manual_seed(11)).double()
    with torch.no_grad():
        deep_t, pred_t = tm(x)
    out = _port_and_apply("EncDec", {"model": "EncDec", **cfg}, tm,
                          x.numpy(), x64=True)
    _assert_close(pred_t, out["logits"], "EncDec-UPerNet logits")


def test_hrnet_port_parity():
    refs = load_reference_models()
    tm = refs["HRNetv2"]({}, 2)
    randomize_module(tm, 5).eval().double()
    x = torch.randn(1, 3, 96, 128,
                    generator=torch.Generator().manual_seed(13)).double()
    with torch.no_grad():
        pred_t = tm(x)
    out = _port_and_apply("HRNetv2", {"model": "HRNetv2"}, tm, x.numpy(),
                          x64=True)
    _assert_close(pred_t, out["logits"], "HRNetv2 logits")


def test_encdec_pointrend_port_parity():
    """Eval-mode PointRend: coarse UPerNet + two deterministic subdivision
    rounds (top-k uncertain points, grid_sample features, MLP refinement) —
    full-output parity proves the porter AND the sampling semantics."""
    refs = load_reference_models()
    cfg = {"encoder": {"model": "ResNet50", "pretrained": False},
           "decoder": {"model": "PointRend", "pr_train_num_pts": 64,
                       "pr_subdivision_num_pts": 49,
                       # PointRend's coarse head must stay at the 1/4 grid
                       # (PointRend.py:37 comment; UPerNet.py:143-144)
                       "interpolate_result_up": False}}
    tm = refs["EncDec"](dict(cfg), 2)
    randomize_module(tm, 6).eval().double()
    x = torch.randn(1, 3, 96, 128,
                    generator=torch.Generator().manual_seed(17)).double()
    # the reference's pointrend_utils creates coordinate tensors with the
    # torch default dtype; switch it to double for the f64 oracle run
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            deep_t, pred_t = tm(x)
    finally:
        torch.set_default_dtype(torch.float32)
    out = _port_and_apply(
        "EncDec",
        {"model": "EncDec", "encoder": {"model": "ResNet50"},
         "decoder": {"model": "PointRend", "pr_train_num_pts": 64,
                     "pr_subdivision_num_pts": 49}},
        tm, x.numpy(), x64=True)
    _assert_close(pred_t, out["logits"], "EncDec-PointRend eval logits")
