"""End-to-end CLI test: synthetic CaDIS tree -> frame table -> main.py
training (split 0 debug split) -> inference, through the real config files'
key vocabulary."""
import json
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture()
def synthetic_cadis(tmp_path):
    from PIL import Image
    sys.path.insert(0, str(REPO / "tools"))
    from build_frame_table import build_frame_table

    rng = np.random.default_rng(0)
    root = tmp_path / "cadis"
    for v in (1, 5):  # split 0 is the debug split [[1],[5]] (defaults.py:2)
        (root / f"Video{v:02d}" / "Images").mkdir(parents=True)
        (root / f"Video{v:02d}" / "Labels").mkdir(parents=True)
        for f in range(6):
            img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
            lbl = rng.integers(0, 36, (64, 96), dtype=np.uint8)
            Image.fromarray(img).save(root / f"Video{v:02d}" / "Images" / f"frame{f:06d}.png")
            Image.fromarray(lbl).save(root / f"Video{v:02d}" / "Labels" / f"frame{f:06d}.png")
    df = build_frame_table(root)
    df.to_csv(root / "data.csv", index=False)
    return root


def test_main_cli_train_and_infer(synthetic_cadis, tmp_path):
    sys.path.insert(0, str(REPO))
    import main as cli

    cfg = {
        "name": "cli_smoke",
        "mode": "training",
        "manager": "FCN",
        "graph": {"model": "FCN", "width": 0.25},
        "data": {
            "experiment": 2,
            "split": 0,
            "batch_size": 2,
            "blacklist": False,
            "transforms": ["flip"],
            "repeat_factor": [1],
            "repeat_factor_freq_thresh": 0.5,
        },
        "loss": {"name": "CrossEntropyLoss"},
        "train": {"learning_rate": 1e-3, "epochs": 2},
        "log_path": str(tmp_path / "logs"),
        "run_id": "cli_smoke_run",
        "log_every_n_epochs": 1,
        "max_valid_imgs": 1,
        "precision": "f32",
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    cli.main(["-c", str(cfg_path), "-dp", str(synthetic_cadis)])

    run_dir = tmp_path / "logs" / "cli_smoke_run"
    assert (run_dir / "info.json").is_file()
    info = json.loads((run_dir / "info.json").read_text())
    assert "metrics" in info or "miou" in json.dumps(info)
    assert (run_dir / "chkpts").is_dir()
    assert (run_dir / "ind_dist.npz").is_file()

    # inference mode reusing the checkpoint
    cfg["mode"] = "inference"
    cfg["load_checkpoint"] = "cli_smoke_run"
    cfg["run_id"] = "cli_smoke_infer"
    cfg_path.write_text(json.dumps(cfg))
    cli.main(["-c", str(cfg_path), "-dp", str(synthetic_cadis)])
    info = json.loads((tmp_path / "logs" / "cli_smoke_infer" / "info.json").read_text())
    blob = json.dumps(info)
    assert "miou" in blob and "frames_per_sec" in blob
