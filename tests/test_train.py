"""Training layer tests: LR schedules, end-to-end synthetic training,
checkpoint save/restore, config parsing."""
import json
import numpy as np
import pandas as pd
import pytest

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
    build_multiplier_table, make_schedule,
)
from miccai2021_cataract_semantic_segmentation_tpu.train.config import (
    parse_config, DEFAULT_CONFIG_NESTED,
)


# ------------------------------------------------------------- LR schedules

def test_exponential_schedule():
    t = build_multiplier_table({"lr_fct": "exponential", "lr_params": 0.9}, 10)
    np.testing.assert_allclose(t[:3], [1.0, 0.9, 0.81], rtol=1e-6)


def test_exponential_with_restarts():
    t = build_multiplier_table({"lr_fct": "exponential", "lr_params": 0.5,
                                "lr_restarts": [4], "lr_restart_vals": 0.5}, 8)
    np.testing.assert_allclose(t[3], 0.5 ** 3, rtol=1e-6)
    np.testing.assert_allclose(t[4], 0.5, rtol=1e-6)  # restart at half base
    np.testing.assert_allclose(t[5], 0.25, rtol=1e-6)


def test_cosine_schedule():
    t = build_multiplier_table({"lr_fct": "cosine"}, 10)
    np.testing.assert_allclose(t[0], 1.0)
    np.testing.assert_allclose(t[5], 0.5, atol=1e-6)


def test_polynomial_schedule():
    t = build_multiplier_table({"lr_fct": "polynomial", "lr_params": 1.0}, 10)
    np.testing.assert_allclose(t[5], 0.5, atol=1e-6)


def test_piecewise_static():
    cfg = {"lr_fct": "piecewise_static",
           "lr_params": {"piecewise_static_schedule": [[4, 1.0], [10, 0.1]]}}
    t = build_multiplier_table(cfg, 10)
    assert t[0] == t[4] == 1.0
    assert t[5] == t[10] == pytest.approx(0.1)


def test_static_ends_at_zero_segment():
    t = build_multiplier_table({"lr_fct": "static"}, 5)
    assert t[0] == 1.0 and t[5] == 0.0  # final restart pins base to 0


def test_make_schedule_epochwise_vs_batchwise():
    cfg = {"lr_fct": "exponential", "lr_params": 0.5, "learning_rate": 1.0,
           "epochs": 4, "lr_batchwise": False, "lr_restarts": [],
           "lr_restart_vals": 1}
    s = make_schedule(cfg, steps_per_epoch=3)
    assert float(s(0)) == float(s(2)) == 1.0  # constant within epoch
    assert float(s(3)) == pytest.approx(0.5)
    s2 = make_schedule({**cfg, "lr_batchwise": True}, steps_per_epoch=3)
    assert float(s2(1)) == pytest.approx(0.5)  # advances per step


# ------------------------------------------------------------- config system

def test_parse_config(tmp_path):
    cfg_file = tmp_path / "run.json"
    cfg_file.write_text(json.dumps({
        "name": "x", "mode": "training",
        "graph": {"model": "OCRNet"},
        "data": {"experiment": 2, "batch_size": 8},
        "loss": {"name": "LovaszSoftmax"},
        "train": {"epochs": 7},
    }))
    (tmp_path / "path_info.json").write_text(json.dumps(
        {"me": ["/data", "/logs"]}))
    c = parse_config(str(cfg_file), user="me")
    assert c["data_path"] == "/data" and c["log_path"] == "/logs"
    assert c["data"]["batch_size"] == 8
    # defaults filled in
    assert c["data"]["repeat_factor"] == [0, 0]
    assert c["train"]["epochs"] == 7
    assert c["train"]["lr_fct"] == "exponential"
    assert c["data"]["transform_values"]["experiment"] == 2
    # nested defaults not mutated across parses
    assert DEFAULT_CONFIG_NESTED["data"]["batch_size"] == 10


# ----------------------------------------------------- end-to-end mini train

def _mini_trainer(tmp_path, epochs=1, graph=None, loss=None, extra_data=None):
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer
    rng = np.random.default_rng(0)
    n = 8
    ds = ArrayDataset(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
                      rng.integers(0, 8, (n, 32, 32), dtype=np.uint8))
    rows = {"vid_num": np.ones(n, int), "blacklisted": np.zeros(n, int),
            "relabeled": np.zeros(n, float)}
    counts = rng.integers(0, 1000, (n, 36))
    for i, name in enumerate(taxonomy.CANONICAL_NAMES):
        rows[name] = counts[:, i]
    df = pd.DataFrame(rows)
    config = {
        "name": "t", "mode": "training",
        "graph": graph or {"model": "FCN", "width": 0.125},
        "data": {"experiment": 1, "batch_size": 4, "split": 0,
                 "transforms": ["flip"], **(extra_data or {})},
        "loss": loss or {"name": "CrossEntropyLoss"},
        "train": {"epochs": epochs, "learning_rate": 1e-3},
        "log_path": str(tmp_path), "log_every_n_epochs": 1,
        "precision": "f32", "max_valid_imgs": 1, "seed": 0,
    }
    return Trainer(config, datasets=(ds, ds, df, df))


def test_trainer_end_to_end(tmp_path):
    t = _mini_trainer(tmp_path, epochs=2,
                      extra_data={"repeat_factor": [1],
                                  "repeat_factor_freq_thresh": 0.3})
    assert t.train_schedule[0] == "default"
    assert t.train_schedule[1] == "repeat_factor"
    t.train()
    assert "miou" in t.metrics
    assert (t.run_dir / "info.json").exists()
    assert (t.run_dir / "ind_dist.npz").exists()
    # checkpoint restore round-trip
    import jax
    before = jax.tree.leaves(t.state.params)[0]
    meta = t.load_checkpoint("best")
    after = jax.tree.leaves(t.state.params)[0]
    assert meta["best_miou"] >= 0
    assert before.shape == after.shape
    res = t.infer()
    assert 0 <= res["miou"] <= 1


def test_trainer_loader_schedules(tmp_path):
    t = _mini_trainer(tmp_path, epochs=4,
                      extra_data={"oversampling": [1, 2],
                                  "weighted_random": [2, 3],
                                  "adaptive_batching": [3, 4]})
    assert [t.train_schedule[e] for e in range(4)] == \
        ["default", "oversampling", "weighted_random", "adaptive_batching"]
    rng = np.random.default_rng(0)
    for e in range(4):
        b = t._epoch_batches(e, rng)
        assert b.shape[1] == t.batch_size
        # epoch length is mode-natural (oversampling epochs are longer)
        assert len(b) == t._expected_steps(t.train_schedule[e])


def test_trainer_ensemble_inference(tmp_path):
    """Ensemble manager path: merged-member inference through Trainer.infer."""
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer
    rng = np.random.default_rng(0)
    n = 4
    ds = ArrayDataset(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
                      rng.integers(0, 8, (n, 32, 32), dtype=np.uint8))
    df = pd.DataFrame({"vid_num": np.ones(n, int)})
    config = {
        "name": "ens", "mode": "inference", "manager": "Ensemble",
        "graph": {"model": "Ensemble", "merge": "mean",
                  "members": {"1": {"model": "FCN", "width": 0.125},
                              "2": {"model": "UNet"}}},
        "data": {"experiment": 1, "batch_size": 1, "split": 0,
                 "transforms": []},
        "loss": {}, "train": {},
        "log_path": str(tmp_path), "precision": "f32", "seed": 0,
    }
    t = Trainer(config, datasets=(ds, ds, df, df))
    results = t.infer()
    assert 0.0 <= results["miou"] <= 1.0
    assert results["frames_per_sec"] > 0


def test_untransform_and_clipped_argmax():
    import jax.numpy as jnp
    from miccai2021_cataract_semantic_segmentation_tpu.ops import (
        clipped_argmax, to_one_hot, untransform)
    probs = jnp.asarray([[[[0.9, 0.1], [0.5, 0.5]]]])  # (1,1,2,2)
    lbl = clipped_argmax(probs, 0.6, ignore_value=255)
    assert lbl[0, 0, 0] == 0 and lbl[0, 0, 1] == 255
    oh = to_one_hot(jnp.asarray([[[1, 0]]]), 2)
    assert oh.shape == (1, 1, 2, 2) and float(oh[0, 0, 0, 1]) == 1.0
    x = jnp.arange(8.0).reshape(2, 2, 2)
    y = untransform(x, [-1, 0])  # first item h-flipped, second untouched
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(x[0, :, ::-1]))
    np.testing.assert_array_equal(np.asarray(y[1]), np.asarray(x[1]))


def test_demo_video_inference(tmp_path):
    """Streaming video inference writes colour-mapped side-by-side AVIs."""
    import cv2
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer
    from miccai2021_cataract_semantic_segmentation_tpu.train.video import demo_infer

    rng = np.random.default_rng(0)
    h, w = 64, 96
    vids = []
    for v in range(2):
        path = tmp_path / f"vid{v}.avi"
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"XVID"),
                             10, (w, h))
        for _ in range(10):
            wr.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        wr.release()
        vids.append(str(path))

    ds = ArrayDataset(rng.integers(0, 255, (4, h, w, 3), dtype=np.uint8),
                      rng.integers(0, 8, (4, h, w), dtype=np.uint8))
    df = pd.DataFrame({"vid_num": np.ones(4, int)})
    config = {
        "name": "vid", "mode": "demo_video_inference",
        "graph": {"model": "FCN", "width": 0.125},
        "data": {"experiment": 1, "batch_size": 1, "split": 0,
                 "transforms": []},
        "loss": {}, "train": {},
        "video_height": h, "video_width": w,
        "log_path": str(tmp_path), "precision": "f32", "seed": 0,
    }
    t = Trainer(config, datasets=(ds, ds, df, df))
    n = demo_infer(t, video_paths=vids, batch_size=4)
    assert n >= 16  # 20 frames, batches of 4, drop tail
    outs = list(t.run_dir.glob("*.avi"))
    assert len(outs) == 2
    cap = cv2.VideoCapture(str(outs[0]))
    ok, frame = cap.read()
    assert ok and frame.shape == (h, 2 * w, 3)
