"""End-to-end test of the paper-reproduction harness
(tools/reproduce_paper.py): a synthetic CaDIS tree + a synthetic reference
.pt must flow through config parse -> torch port -> batched TTA-capable
inference -> printed table, leaving only the real dataset/checkpoints
between the repo and the BASELINE mIoU acceptance (VERDICT r3 item 3)."""
import json
import sys

import numpy as np
import pytest


def _write_fake_cadis(root, videos, frames_per_video=3, h=64, w=96):
    """Minimal CaDIS tree + frame table rows for the given video ids."""
    import cv2
    rng = np.random.default_rng(0)
    rows = []
    for v in videos:
        d = root / f"Video{v:02d}"
        (d / "Images").mkdir(parents=True)
        (d / "Labels").mkdir()
        for i in range(frames_per_video):
            name = f"Video{v}_frame{i:06d}.png"
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            lbl = rng.integers(0, 36, (h, w), dtype=np.uint8)
            cv2.imwrite(str(d / "Images" / name), img)
            cv2.imwrite(str(d / "Labels" / name), lbl)
            rows.append({
                "img_path": f"Video{v:02d}/Images/{name}",
                "lbl_path": f"Video{v:02d}/Labels/{name}",
                "blacklisted": 0, "relabeled": 0.0, "vid_num": v,
            })
    import pandas as pd
    csv = root / "mini_data.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


def _write_fake_checkpoint(path, n_cls=8):
    """Reference-style OCRNet-resnet18 state dict saved as chkpt_best.pt
    (the published checkpoints' container format, BaseManager.py:471-495)."""
    torch = pytest.importorskip("torch")
    from tests.test_port_torch import _fill_resnet18_sd

    sd = {}
    _fill_resnet18_sd(sd, "backbone.")

    def conv(key, o, i, k, bias=False):
        sd[key + ".weight"] = np.random.default_rng(len(sd)).normal(
            size=(o, i, k, k)).astype(np.float32)
        if bias:
            sd[key + ".bias"] = np.random.default_rng(len(sd)).normal(
                size=(o,)).astype(np.float32)

    def bn(key, c):
        for leaf, val in [("weight", np.full(c, 1.2)),
                          ("bias", np.full(c, 0.05)),
                          ("running_mean", np.full(c, 0.3)),
                          ("running_var", np.full(c, 1.4))]:
            sd[key + "." + leaf] = val.astype(np.float32)

    conv("conv_high_map.0", 512, 512, 3)
    bn("conv_high_map.1", 512)
    conv("interm_prediction_head.0", 512, 256, 3)
    bn("interm_prediction_head.1", 512)
    conv("interm_prediction_head.4", n_cls, 512, 1, bias=True)
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
    conv("conv_out", n_cls, 512, 1, bias=True)
    torch.save({"model_state_dict": {k: torch.from_numpy(np.asarray(v))
                                     for k, v in sd.items()}}, path)


def test_reproduce_paper_end_to_end(tmp_path, capsys):
    from tools import reproduce_paper

    # split 2: train videos include 1; test videos are (2, 12, 22)
    csv = _write_fake_cadis(tmp_path, videos=[1, 2, 12, 22])
    pt = tmp_path / "chkpt_best.pt"
    _write_fake_checkpoint(pt, n_cls=8)   # task 1 head

    argv = ["--data-root", str(tmp_path),
            "--ckpt", f"1={pt}",
            "--backbone", "resnet18",
            "--data-csv", str(csv),
            "--max-frames", "5",
            "--valid-batch-size", "2",
            "--log-path", str(tmp_path / "logs"),
            "--tolerance", "0.5"]
    with pytest.raises(SystemExit) as e:
        reproduce_paper.main(argv)
    # random weights cannot hit 86.40 -> the harness must FAIL loudly
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert "paper" in out and "task" in out
    payload = json.loads(out.strip().splitlines()[-1])
    rows = {r["task"]: r for r in payload["results"]}
    assert rows[1]["miou"] is not None          # task 1 actually evaluated
    assert rows[1]["paper_miou"] == 86.40
    assert "FAIL" in rows[1]["status"]
    assert rows[2]["status"].startswith("skipped")
    assert rows[3]["status"].startswith("skipped")


def test_reproduce_paper_tta_path(tmp_path, capsys):
    """--tta exercises the flip+multi-scale merge through the same harness
    (BaseManager.py:652-660 recipe)."""
    from tools import reproduce_paper

    csv = _write_fake_cadis(tmp_path, videos=[1, 2], frames_per_video=2)
    pt = tmp_path / "chkpt_best.pt"
    _write_fake_checkpoint(pt, n_cls=8)
    argv = ["--data-root", str(tmp_path),
            "--ckpt", f"1={pt}",
            "--backbone", "resnet18",
            "--data-csv", str(csv),
            "--max-frames", "2",
            "--valid-batch-size", "1",
            "--log-path", str(tmp_path / "logs"),
            "--tta"]
    with pytest.raises(SystemExit) as e:
        reproduce_paper.main(argv)
    assert e.value.code == 1
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["task"]: r for r in payload["results"]}[1]["miou"] is not None


def test_reproduce_paper_dry_table(capsys):
    from tools import reproduce_paper
    reproduce_paper.main(["--data-root", "/nonexistent", "--dry-table"])
    out = capsys.readouterr().out
    for v in ("86.40", "79.40", "71.94"):
        assert v in out
