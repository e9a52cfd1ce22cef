"""Round-2 parity/correctness fixes (VERDICT.md round 1 items 4-10):
jitted LossWrapper phase switching, repeat-factor epoch length, TTA
augmentation set, video tail frames + per-video frame stride, threaded host
pipeline determinism, adaptive-batching windowed IoU read-back."""
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.data.samplers import (
    RepeatFactorSampler,
)

from tests.test_train import _mini_trainer


# ------------------------------------------------- LossWrapper under jit

def test_losswrapper_dc_off_jitted():
    """dc_off_at_epoch gating must work with a *traced* epoch
    (LossWrapper.py:45-50); round 1 crashed with TracerBoolConversionError."""
    loss_fn = build_loss({"losses": {"LovaszSoftmax": 1.0,
                                     "CrossEntropyLoss": 1.0},
                          "dc_off_at_epoch": 3}, 1)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, (2, 16, 16)), jnp.int32)

    @jax.jit
    def run(epoch):
        total, terms = loss_fn({"logits": logits}, labels, epoch=epoch)
        return total, terms

    t_before, terms_before = run(jnp.int32(1))
    t_after, terms_after = run(jnp.int32(5))
    assert float(terms_before["LovaszSoftmax"]) == 0.0
    assert float(terms_after["LovaszSoftmax"]) > 0.0
    assert float(terms_before["CrossEntropyLoss"]) == pytest.approx(
        float(terms_after["CrossEntropyLoss"]), rel=1e-6)
    assert float(t_after) > float(t_before)


# --------------------------------------------- repeat-factor epoch length

def _toy_df(n=64, seed=3):
    rng = np.random.default_rng(seed)
    rows = {"vid_num": np.ones(n, int), "blacklisted": np.zeros(n, int),
            "relabeled": np.zeros(n, float)}
    counts = rng.integers(1, 50, (n, 36))
    # task-1 class 3 (Eye Retractors) present in only n/8 frames -> its
    # repeat factor max(1, sqrt(0.9/0.125)) ~ 2.7 repeats those frames
    counts[:, 3] = 0
    counts[: n // 8, 3] = 100
    for i, name in enumerate(taxonomy.CANONICAL_NAMES):
        rows[name] = counts[:, i]
    return pd.DataFrame(rows)


def test_rf_epoch_length_matches_expectation():
    """Reference rf epochs run ~sum r(I)/bs batches
    (repeat_factor_sampling.py:102-131) — not len(train)/bs."""
    df = _toy_df()
    bs = 4
    s = RepeatFactorSampler(df, 0.9, 1, blacklist=True, seed=0)
    expected = s.repeat_factors.sum() / bs
    assert expected > len(df) / bs + 1, "toy df must actually repeat frames"
    lengths = [len(s.epoch_batches(bs)) for _ in range(30)]
    assert abs(np.mean(lengths) - expected) < 2.0  # stochastic envelope
    assert min(lengths) > len(df) // bs  # every epoch longer than default


def test_trainer_rf_epoch_steps(tmp_path):
    t = _mini_trainer(tmp_path, epochs=2,
                      extra_data={"repeat_factor": [0],
                                  "repeat_factor_freq_thresh": 0.9})
    rf_expected = t._expected_steps("repeat_factor")
    assert t.epoch_steps == [rf_expected, rf_expected]
    rng = np.random.default_rng(0)
    b = t._epoch_batches(0, rng)
    # natural stochastic length, not trimmed to len(train)//bs
    assert abs(len(b) - rf_expected) <= max(2, rf_expected // 2)


def test_make_schedule_variable_epoch_lengths():
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
        make_schedule)
    cfg = {"lr_fct": "exponential", "lr_params": 0.5, "learning_rate": 1.0,
           "epochs": 3, "lr_batchwise": False}
    s = make_schedule(cfg, [2, 4, 2])
    # epoch 0 = steps 0-1, epoch 1 = steps 2-5, epoch 2 = steps 6-7
    assert float(s(0)) == float(s(1)) == 1.0
    assert float(s(2)) == float(s(5)) == pytest.approx(0.5)
    assert float(s(6)) == pytest.approx(0.25)


# ----------------------------------------------------------- TTA parity

def test_tta_scales_and_merge(tmp_path):
    """Compose(HFlip, Scale([0.75,1,1.5,1.75,2])) = 10 augmentations with a
    mean merge (BaseManager.py:652-660)."""
    t = _mini_trainer(tmp_path)
    calls = []

    def fake_apply(variables, x, train, **kw):
        calls.append(tuple(x.shape[1:3]))
        k = taxonomy.TASK_NUM_CLASSES[t.task]
        return {"logits": jnp.zeros(x.shape[:3] + (k,))}

    t.state = t.state.replace(apply_fn=fake_apply)
    step = t._make_tta_step()
    imgs = np.zeros((1, 32, 32, 3), np.uint8)
    lbls = np.zeros((1, 32, 32), np.uint8)
    probs, _, cm = step(t.state, imgs, lbls)
    assert len(calls) == 10  # 2 flips x 5 scales, traced once each
    hs = sorted(set(h for h, w in calls))
    assert hs == [24, 32, 48, 56, 64]  # 32 * [0.75, 1, 1.5, 1.75, 2]
    # mean merge of uniform softmaxes stays a probability distribution
    k = taxonomy.TASK_NUM_CLASSES[t.task]
    np.testing.assert_allclose(np.asarray(probs[0, 0, 0]), np.full(k, 1 / k),
                               rtol=1e-5)


# ------------------------------------------------------ video inference

@pytest.fixture
def tiny_videos(tmp_path):
    import cv2
    paths = []
    for v in range(2):
        p = tmp_path / f"dev0{v}.avi"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"XVID"), 5,
                            (64, 64))
        assert w.isOpened(), "cv2 VideoWriter unavailable"
        for f in range(5):
            frame = np.full((64, 64, 3), 10 * f + 100 * v, np.uint8)
            w.write(frame)
        w.release()
        paths.append(str(p))
    return paths


def test_video_inference_processes_all_frames(tmp_path, tiny_videos):
    """Tail partial batches must be written (round-1 bug dropped the last
    len % batch_size frames), and frame_freq strides per video."""
    from miccai2021_cataract_semantic_segmentation_tpu.train.video import (
        demo_infer)
    t = _mini_trainer(tmp_path)
    t.config["video_height"] = 64
    t.config["video_width"] = 64
    t.config["mode"] = "demo_video_inference"
    n = demo_infer(t, video_paths=tiny_videos, batch_size=4)
    assert n == 10  # 2 videos x 5 frames, 10 % 4 != 0
    outs = list(t.run_dir.glob("*.avi"))
    assert len(outs) == 2

    t.config["demo_frame_freq"] = 2
    t.config["mode"] = "video_inference"  # prediction-only writer shape
    n = demo_infer(t, video_paths=tiny_videos, batch_size=4)
    assert n == 6  # frames 0,2,4 per video — per-video stride


# ----------------------------------------------- threaded host pipeline

def test_assemble_batch_pool_deterministic():
    from concurrent.futures import ThreadPoolExecutor
    from miccai2021_cataract_semantic_segmentation_tpu.data import (
        ArrayDataset, assemble_batch, build_transform_pipeline)
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.integers(0, 255, (8, 40, 48, 3), dtype=np.uint8),
                      rng.integers(0, 8, (8, 40, 48), dtype=np.uint8))
    pipe = build_transform_pipeline(["affine"], {}, 1)
    assert pipe.host_train, "affine must be a host transform"
    idx = np.arange(8)
    serial = assemble_batch(ds, idx, pipe, np.random.default_rng(7))
    with ThreadPoolExecutor(max_workers=4) as pool:
        pooled = assemble_batch(ds, idx, pipe, np.random.default_rng(7), pool)
    np.testing.assert_array_equal(serial[0], pooled[0])
    np.testing.assert_array_equal(serial[1], pooled[1])


def test_epoch_iterator_num_workers():
    from miccai2021_cataract_semantic_segmentation_tpu.data import (
        ArrayDataset, epoch_iterator)
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8),
                      rng.integers(0, 8, (8, 16, 16), dtype=np.uint8))
    batches = np.arange(8).reshape(2, 4)
    got = [np.asarray(i) for _, _, i in
           epoch_iterator(ds, batches, None, num_workers=3)]
    np.testing.assert_array_equal(np.concatenate(got), np.arange(8))
