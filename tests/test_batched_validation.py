"""Exact batched validation (round 4): every record contributes to the
confusion matrix at ANY valid_batch_size — the tail batch is padded and the
padded rows masked out exactly (data/pipeline.py:eval_batches,
trainer.validate/infer) — so mIoU/PA/PAC are identical at bs=1 and bs>1.
Reference behaviour being improved: bs=1 eval loop (BaseManager.py:663-669).
"""
import numpy as np
import pandas as pd
import pytest

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy


def _mini_trainer(tmp_path, n_valid=11, run_id="bv"):
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer
    rng = np.random.default_rng(0)
    n_train = 8
    train = ArrayDataset(
        rng.integers(0, 255, (n_train, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 8, (n_train, 32, 32), dtype=np.uint8))
    valid = ArrayDataset(
        rng.integers(0, 255, (n_valid, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 8, (n_valid, 32, 32), dtype=np.uint8))

    def frame(n):
        rows = {"vid_num": np.ones(n, int), "blacklisted": np.zeros(n, int),
                "relabeled": np.zeros(n, float)}
        counts = rng.integers(0, 1000, (n, 36))
        for i, name in enumerate(taxonomy.CANONICAL_NAMES):
            rows[name] = counts[:, i]
        return pd.DataFrame(rows)

    config = {
        "name": "bv", "mode": "training", "run_id": run_id,
        "graph": {"model": "FCN", "width": 0.125},
        "data": {"experiment": 1, "batch_size": 4, "split": 0,
                 "transforms": ["flip"]},
        "loss": {"name": "CrossEntropyLoss"},
        "train": {"epochs": 1, "learning_rate": 1e-3},
        "log_path": str(tmp_path), "log_every_n_epochs": 1,
        "precision": "f32", "max_valid_imgs": 1, "seed": 0,
    }
    return Trainer(config, datasets=(train, valid, frame(n_train),
                                     frame(n_valid)))


def test_eval_batches_covers_all_records():
    from miccai2021_cataract_semantic_segmentation_tpu.data import eval_batches
    for n, bs in ((11, 4), (12, 4), (3, 8), (1, 1), (9, 2)):
        batches, n_pad = eval_batches(n, bs)
        flat = batches.reshape(-1)
        real = flat[: len(flat) - n_pad] if n_pad else flat
        assert sorted(set(real.tolist())) == list(range(n)), (n, bs)
        assert batches.shape[1] == bs
        if n_pad:
            assert (flat[len(flat) - n_pad:] == n - 1).all()


def test_validate_metrics_exact_at_any_bs(tmp_path):
    tr = _mini_trainer(tmp_path, n_valid=11)
    tr.valid_batch_size = 1
    tr.validate(0)
    m1 = dict(tr.metrics)
    tr.valid_batch_size = 4           # 11 % 4 = 3 -> padded tail of 1
    tr.validate(0)
    m4 = dict(tr.metrics)
    for key in ("miou", "pa", "pac", "miou_instruments", "miou_anatomies"):
        if key in m1:
            assert m1[key] == pytest.approx(m4[key], abs=1e-6), key
    np.testing.assert_allclose(m1["per_class_iou"], m4["per_class_iou"],
                               atol=1e-6)


def test_infer_covers_tail_and_times_post_compile(tmp_path):
    tr = _mini_trainer(tmp_path, n_valid=11, run_id="bv2")
    tr.valid_batch_size = 1
    r1 = tr.infer(tta=False)
    tr.valid_batch_size = 4
    r4 = tr.infer(tta=False)
    assert r1["miou"] == pytest.approx(r4["miou"], abs=1e-6)
    assert r1["pa"] == pytest.approx(r4["pa"], abs=1e-6)
    assert r4["frames_per_sec"] > 0
