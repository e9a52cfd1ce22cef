"""PyTorch -> JAX checkpoint porting for the published CaDIS weights.

Maps reference state-dict keys (torchvision ResNet naming wrapped by the
models in /root/reference/models) onto this package's flax param/batch-stat
trees. Conventions:
  * conv weight OIHW -> HWIO transpose; grouped convs keep group-major O.
  * nn.BatchNorm2d {weight, bias} -> params {scale, bias};
    {running_mean, running_var} -> batch_stats {mean, var}.
  * torch "layer1.0.conv2" -> flax ("layer1_0", "conv2"); Sequential indices
    are resolved by per-model tables below.
  * MoCo-v2 self-supervised checkpoints ("module.encoder_q." prefixes,
    BaseManager.py:532-571) are normalised before mapping.

Entry points: `port_state_dict(model_name, state_dict, params, batch_stats)`
returns new (params, batch_stats); `load_torch_checkpoint(path)` reads a
.pt/.pth file with torch (CPU) and returns a numpy state dict.
"""
from __future__ import annotations

import re
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    import torch
    payload = torch.load(path, map_location="cpu")
    sd = payload.get("model_state_dict", payload.get("state_dict", payload))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def strip_moco_prefix(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """MoCo-v2 key normalisation: keep encoder_q, drop fc head."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module.encoder_q."):
            k = k[len("module.encoder_q."):]
        if k.startswith("fc."):
            continue
        out[k] = v
    return out


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    """Overwrite an existing leaf; a missing path is a porter-table bug and
    must fail loudly (a silent setdefault would leave the real leaf at its
    random init while injecting an orphan subtree the model never reads)."""
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"porter path {path} missing at '{p}' "
                           f"(have: {sorted(node)[:12]})")
        node = node[p]
    if path[-1] not in node:
        raise KeyError(f"porter leaf {path} not in target tree "
                       f"(have: {sorted(node)})")
    expect = np.shape(node[path[-1]])
    if expect != np.shape(value):
        raise ValueError(f"porter shape mismatch at {path}: "
                         f"{np.shape(value)} -> {expect}")
    node[path[-1]] = value


def _resnet_flax_path(torch_key: str) -> tuple[tuple[str, ...], str] | None:
    """torchvision resnet key -> (flax module path, leaf kind).

    kinds: 'kernel' (conv), 'bn.<leaf>' where leaf in scale/bias/mean/var.
    """
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    # collapse "layerX.N" -> "layerX_N", "downsample.N" -> "downsample_N"
    path: list[str] = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if re.fullmatch(r"layer\d+", m) and i + 1 < len(mods) and mods[i + 1].isdigit():
            path.append(f"{m}_{mods[i + 1]}")
            i += 2
        elif m == "downsample" and i + 1 < len(mods) and mods[i + 1].isdigit():
            path.append(f"downsample_{mods[i + 1]}")
            i += 2
        else:
            path.append(m)
            i += 1
    if leaf == "weight" and (path[-1].startswith("conv") or path[-1] == "downsample_0"):
        return tuple(path), "kernel"
    if path[-1].startswith("bn") or path[-1] == "downsample_1":
        kind = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}.get(leaf)
        return (tuple(path), f"bn.{kind}") if kind else None
    if leaf == "bias" and path[-1].startswith("conv"):
        return tuple(path), "bias"
    return None


def port_resnet_backbone(sd: dict[str, np.ndarray], prefix: str = "",
                         target_prefix: tuple[str, ...] = ()):
    """Yield (params_path, value) and (stats_path, value) pairs for a
    torchvision-style resnet subtree of the state dict."""
    params_updates, stats_updates = [], []
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        sub = k[len(prefix):]
        if sub.startswith(("fc.",)):
            continue
        res = _resnet_flax_path(sub)
        if res is None:
            continue
        path, kind = res
        path = target_prefix + path
        if kind == "kernel":
            params_updates.append((path + ("kernel",), _conv_to_hwio(v)))
        elif kind == "bias":
            params_updates.append((path + ("bias",), v))
        elif kind.startswith("bn."):
            leaf = kind.split(".")[1]
            if leaf in ("scale", "bias"):
                params_updates.append((path + (leaf,), v))
            else:
                stats_updates.append((path + (leaf,), v))
    return params_updates, stats_updates


def _seq_map(sd, torch_prefix: str, entries):
    """Map a torch Sequential: entries = [(torch_idx, flax_name, kind)] with
    kind 'conv'|'bn'. Yields (is_param, path-within-module, value)."""
    out = []
    for idx, flax_name, kind in entries:
        base = f"{torch_prefix}.{idx}."
        if kind == "conv":
            if base + "weight" in sd:
                out.append((True, (flax_name, "kernel"),
                            _conv_to_hwio(sd[base + "weight"])))
            if base + "bias" in sd:
                out.append((True, (flax_name, "bias"), sd[base + "bias"]))
        else:
            for tleaf, fleaf, is_param in [("weight", "scale", True),
                                           ("bias", "bias", True),
                                           ("running_mean", "mean", False),
                                           ("running_var", "var", False)]:
                key = base + tleaf
                if key in sd:
                    out.append((is_param, (flax_name, fleaf), sd[key]))
    return out


def _apply(params, batch_stats, p_updates, s_updates):
    import jax
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    for path, v in p_updates:
        _set(params, path, np.asarray(v))
    for path, v in s_updates:
        _set(batch_stats, path, np.asarray(v))
    return params, batch_stats


# ---------------------------------------------------------------------------
# per-model mappings
# ---------------------------------------------------------------------------

def _module_updates(sd, table):
    """table: list of (torch_prefix, entries, flax_module_path)."""
    p_updates, s_updates = [], []
    for torch_prefix, entries, flax_path in table:
        for is_param, sub, v in _seq_map(sd, torch_prefix, entries):
            (p_updates if is_param else s_updates).append((flax_path + sub, v))
    return p_updates, s_updates


_CONVBN = [(0, "conv", "conv"), (1, "bn", "bn")]  # Sequential(conv, bn, relu)


def port_ocrnet(sd, params, batch_stats):
    """Reference models/OCR.py state dict -> flax OCRNet tree."""
    p_up, s_up = port_resnet_backbone(sd, "backbone.", ("backbone",))
    table = [
        ("conv_high_map", _CONVBN, ("conv_high_map",)),
        # interm head: Sequential(conv, bn, relu, dropout, conv-cls)
        ("interm_prediction_head", [(0, "conv", "conv"), (1, "bn", "bn")],
         ("interm_conv",)),
        ("spatial_ocr_head.conv_bn_dropout", _CONVBN, ("ocr", "fuse")),
    ]
    for qkv, n in (("f_pixel", 2), ("f_object", 2), ("f_down", 1), ("f_up", 1)):
        entries = []
        for i in range(n):
            entries += [(3 * i, f"conv{i}", "conv"), (3 * i + 1, f"bn{i}", "bn")]
        table.append((f"spatial_ocr_head.object_context_block.{qkv}",
                      entries, ("ocr", "attn", qkv)))
    tp, ts = _module_updates(sd, table)
    p_up += tp
    s_up += ts
    # plain convs
    for tkey, fpath in [("interm_prediction_head.4", ("interm_cls",)),
                        ("conv_out", ("conv_out",))]:
        if f"{tkey}.weight" in sd:
            p_up.append((fpath + ("kernel",), _conv_to_hwio(sd[f"{tkey}.weight"])))
        if f"{tkey}.bias" in sd:
            p_up.append((fpath + ("bias",), sd[f"{tkey}.bias"]))
    return _apply(params, batch_stats, p_up, s_up)


def _aspp_table(flax_prefix=("aspp",)):
    table = []
    for i in range(1, 6):
        table.append((f"aspp.aspp{i}", [(None, "conv", "rawconv")], None))
    return table  # unused marker — ASPP handled specially below


def _port_aspp(sd, flax_prefix, p_up, s_up):
    """ASPP convs are bare (not Sequential): aspp1..aspp5 + conv2, BNs
    aspp1_bn..aspp5_bn + bn2 (DeepLabv3.py:96-141)."""
    pairs = [(f"aspp.aspp{i}", f"aspp.aspp{i}_bn", (f"aspp{i}",))
             for i in range(1, 6)] + [("aspp.conv2", "aspp.bn2", ("proj",))]
    for conv_key, bn_key, fname in pairs:
        if conv_key + ".weight" in sd:
            p_up.append((flax_prefix + fname + ("conv", "kernel"),
                         _conv_to_hwio(sd[conv_key + ".weight"])))
        for tleaf, fleaf, is_p in [("weight", "scale", True), ("bias", "bias", True),
                                   ("running_mean", "mean", False),
                                   ("running_var", "var", False)]:
            k = bn_key + "." + tleaf
            if k in sd:
                (p_up if is_p else s_up).append(
                    (flax_prefix + fname + ("bn", fleaf), sd[k]))


def port_deeplabv3(sd, params, batch_stats):
    p_up, s_up = port_resnet_backbone(sd, "backbone.", ("backbone",))
    _port_aspp(sd, ("aspp",), p_up, s_up)
    if "conv_out.weight" in sd:
        p_up.append((("conv_out", "kernel"), _conv_to_hwio(sd["conv_out.weight"])))
        p_up.append((("conv_out", "bias"), sd["conv_out.bias"]))
    return _apply(params, batch_stats, p_up, s_up)


def port_deeplabv3plus(sd, params, batch_stats):
    p_up, s_up = port_resnet_backbone(sd, "backbone.", ("backbone",))
    _port_aspp(sd, ("aspp",), p_up, s_up)
    # decoder (DeepLabv3Plus.py:139-175): conv_low(+bn), conv_3x3_1/2(+bn), conv_out
    for conv_key, bn_key, fname in [("decoder.conv_low", "decoder.conv_low_bn", "conv_low"),
                                    ("decoder.conv_3x3_1", "decoder.conv_3x3_1_bn", "conv_3x3_1"),
                                    ("decoder.conv_3x3_2", "decoder.conv_3x3_2_bn", "conv_3x3_2")]:
        p_up.append(((fname, "conv", "kernel"), _conv_to_hwio(sd[conv_key + ".weight"])))
        for tleaf, fleaf, is_p in [("weight", "scale", True), ("bias", "bias", True),
                                   ("running_mean", "mean", False),
                                   ("running_var", "var", False)]:
            (p_up if is_p else s_up).append(((fname, "bn", fleaf), sd[bn_key + "." + tleaf]))
    p_up.append((("conv_out", "kernel"), _conv_to_hwio(sd["decoder.conv_out.weight"])))
    p_up.append((("conv_out", "bias"), sd["decoder.conv_out.bias"]))
    return _apply(params, batch_stats, p_up, s_up)


def _upernet_table(torch_prefix: str, flax_prefix: tuple[str, ...],
                   n_lvl: int = 4):
    """Sequential table for a UPerNet decoder subtree (models/UPerNet.py)."""
    table = []
    for i in range(4):  # ppm convs: Sequential(conv, bn, relu)
        table.append((f"{torch_prefix}ppm_conv.{i}", _CONVBN,
                      flax_prefix + (f"ppm_conv_{i}",)))
    # conv3x3 helper builds Sequential(conv, bn, relu) (torch_utils.py:165-187)
    table.append((f"{torch_prefix}ppm_last_conv", _CONVBN,
                  flax_prefix + ("ppm_last_conv",)))
    for i in range(n_lvl - 1):
        table.append((f"{torch_prefix}fpn_in.{i}", _CONVBN,
                      flax_prefix + (f"fpn_in_{i}",)))
        # fpn_out entries are Sequential(Sequential(conv,bn,relu)) -> "0.0"/"0.1"
        table.append((f"{torch_prefix}fpn_out.{i}.0", _CONVBN,
                      flax_prefix + (f"fpn_out_{i}",)))
    table.append((f"{torch_prefix}conv_last.0", _CONVBN,
                  flax_prefix + ("conv_last",)))
    return table


def _upernet_cls(sd, torch_prefix, flax_prefix, p_up):
    key = f"{torch_prefix}conv_last.1"
    if f"{key}.weight" in sd:
        p_up.append((flax_prefix + ("cls", "kernel"),
                     _conv_to_hwio(sd[f"{key}.weight"])))
        p_up.append((flax_prefix + ("cls", "bias"), sd[f"{key}.bias"]))


def port_encdec_upernet(sd, params, batch_stats, n_lvl: int = 4):
    """EncDec(ResNet encoder + UPerNet decoder) state dict (models/EncDec.py,
    models/UPerNet.py)."""
    p_up, s_up = port_resnet_backbone(sd, "enc_model.", ("encoder",))
    tp, ts = _module_updates(sd, _upernet_table("dec_model.", ("decoder",),
                                                n_lvl))
    p_up += tp
    s_up += ts
    _upernet_cls(sd, "dec_model.", ("decoder",), p_up)
    return _apply(params, batch_stats, p_up, s_up)


def port_encdec_pointrend(sd, params, batch_stats, n_lvl: int = 4):
    """EncDec(ResNet encoder + PointRend decoder): partial UPerNet coarse
    head + StandardPointHead Conv1d MLP (models/PointRend.py:29-141)."""
    p_up, s_up = port_resnet_backbone(sd, "enc_model.", ("encoder",))
    tp, ts = _module_updates(
        sd, _upernet_table("dec_model.partial_upernet.",
                           ("decoder", "coarse"), n_lvl))
    p_up += tp
    s_up += ts
    _upernet_cls(sd, "dec_model.partial_upernet.", ("decoder", "coarse"), p_up)
    # point head: Conv1d(out, in, 1) -> Dense kernel (in, out)
    head = [k[len("dec_model.point_head."):].split(".")[0]
            for k in sd if k.startswith("dec_model.point_head.")]
    for mod in sorted(set(head)):
        w = sd[f"dec_model.point_head.{mod}.weight"]
        p_up.append((("decoder", "point_head", mod, "kernel"), w[:, :, 0].T))
        p_up.append((("decoder", "point_head", mod, "bias"),
                     sd[f"dec_model.point_head.{mod}.bias"]))
    return _apply(params, batch_stats, p_up, s_up)


def port_encdec(sd, params, batch_stats, n_lvl: int = 4):
    """Dispatch EncDec checkpoints on the decoder type found in the keys."""
    if any(k.startswith("dec_model.point_head.") for k in sd):
        return port_encdec_pointrend(sd, params, batch_stats, n_lvl)
    return port_encdec_upernet(sd, params, batch_stats, n_lvl)


_BN_LEAVES = [("weight", "scale", True), ("bias", "bias", True),
              ("running_mean", "mean", False), ("running_var", "var", False)]


def port_hrnet(sd, params, batch_stats):
    """Reference models/HRNetv2.py state dict -> flax HRNetv2 tree.

    Stage modules sit at index 0 (all stages have num_modules=1,
    HRNetv2.py:279-309); transitions for existing branches are
    Sequential(conv, bn, relu), new branches wrap one more Sequential."""
    p_up, s_up = [], []

    def convbn(conv_key, bn_key, fpath):
        if f"{conv_key}.weight" in sd:
            p_up.append((fpath + ("conv", "kernel"),
                         _conv_to_hwio(sd[f"{conv_key}.weight"])))
        if f"{conv_key}.bias" in sd:
            p_up.append((fpath + ("conv", "bias"), sd[f"{conv_key}.bias"]))
        for tleaf, fleaf, is_p in _BN_LEAVES:
            k = f"{bn_key}.{tleaf}"
            if k in sd:
                (p_up if is_p else s_up).append((fpath + ("bn", fleaf), sd[k]))

    def block_updates(torch_base, flax_base):
        """One BasicBlock/Bottleneck subtree via the resnet key mapper."""
        for k, v in sd.items():
            if not k.startswith(torch_base + "."):
                continue
            res = _resnet_flax_path(k[len(torch_base) + 1:])
            if res is None:
                continue
            path, kind = res
            path = flax_base + path
            if kind == "kernel":
                p_up.append((path + ("kernel",), _conv_to_hwio(v)))
            elif kind.startswith("bn."):
                leaf = kind.split(".")[1]
                (p_up if leaf in ("scale", "bias") else s_up).append(
                    (path + (leaf,), v))

    convbn("conv1", "bn1", ("stem1",))
    convbn("conv2", "bn2", ("stem2",))
    for b in range(4):
        block_updates(f"layer1.{b}", (f"layer1_{b}",))
    for t, n_br in ((1, 2), (2, 3), (3, 4)):
        for i in range(n_br):
            base = f"transition{t}.{i}"
            if f"{base}.0.weight" in sd:        # existing branch: conv,bn,relu
                convbn(f"{base}.0", f"{base}.1", (f"trans{t + 1}_{i}",))
            elif f"{base}.0.0.weight" in sd:    # new branch: Seq(Seq(...))
                convbn(f"{base}.0.0", f"{base}.0.1", (f"trans{t + 1}_{i}",))
    for s, n_br in ((2, 2), (3, 3), (4, 4)):
        for i in range(n_br):
            for b in range(4):
                block_updates(f"stage{s}.0.branches.{i}.{b}",
                              (f"stage{s}", f"branch{i}", f"block{b}"))
            for j in range(n_br):
                base = f"stage{s}.0.fuse_layers.{i}.{j}"
                if j > i:
                    convbn(f"{base}.0", f"{base}.1",
                           (f"stage{s}", f"fuse{i}_{j}"))
                elif j < i:
                    for k in range(i - j):
                        convbn(f"{base}.{k}.0", f"{base}.{k}.1",
                               (f"stage{s}", f"fuse{i}_{j}_{k}"))
    convbn("last_layer.0", "last_layer.1", ("head",))
    p_up.append((("cls", "kernel"), _conv_to_hwio(sd["last_layer.3.weight"])))
    p_up.append((("cls", "bias"), sd["last_layer.3.bias"]))
    return _apply(params, batch_stats, p_up, s_up)


PORTERS = {
    "OCRNet": port_ocrnet,
    "DeepLabv3": port_deeplabv3,
    "DeepLabv3Plus": port_deeplabv3plus,
    "UPerNet": port_encdec,
    "EncDec": port_encdec,
    "PointRend": port_encdec_pointrend,
    "HRNetv2": port_hrnet,
}


def port_state_dict(model_name: str, sd: dict[str, np.ndarray], params,
                    batch_stats):
    if model_name not in PORTERS:
        raise ValueError(f"no porter for model '{model_name}'")
    return PORTERS[model_name](sd, params, batch_stats)
