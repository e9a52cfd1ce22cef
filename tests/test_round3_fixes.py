"""Round-3 fidelity tests: resume exactness, debugging dumps, s8 train
metrics, and the ignore-pixel exclusion of the fused bucket kernels."""
import numpy as np
import pandas as pd
import pytest

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy


def _mini_trainer(tmp_path, *, run_id=None, epochs=3, extra_cfg=None,
                  extra_data=None, n=8):
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
                      rng.integers(0, 8, (n, 32, 32), dtype=np.uint8))
    rows = {"vid_num": np.ones(n, int), "blacklisted": np.zeros(n, int),
            "relabeled": np.zeros(n, float)}
    counts = rng.integers(0, 1000, (n, 36))
    for i, name in enumerate(taxonomy.CANONICAL_NAMES):
        rows[name] = counts[:, i]
    df = pd.DataFrame(rows)
    config = {
        "name": "r3", "mode": "training",
        "graph": {"model": "FCN", "width": 0.125},
        "data": {"experiment": 1, "batch_size": 4, "split": 0,
                 "transforms": ["flip"], **(extra_data or {})},
        "loss": {"name": "CrossEntropyLoss"},
        "train": {"epochs": epochs, "learning_rate": 1e-3},
        "log_path": str(tmp_path), "log_every_n_epochs": 1,
        "precision": "f32", "max_valid_imgs": 1, "seed": 0,
        **(extra_cfg or {}),
    }
    if run_id:
        config["run_id"] = run_id
    return Trainer(config, datasets=(ds, ds, df, df))


# ------------------------------------------------------------ resume fidelity

class _Interrupt(Exception):
    pass


def test_resume_reproduces_uninterrupted_run(tmp_path):
    """Kill-and-resume at epoch k must produce the same remaining batch
    schedule, ind_counts, global_step, and final params as an uninterrupted
    run (VERDICT r2 item 5; reference restores global_step,
    BaseManager.py:520-525). Repeat-factor at epoch 1+ exercises sampler-RNG
    replay, not just the base np_rng."""
    import jax
    rf = {"repeat_factor": [1], "repeat_factor_freq_thresh": 0.3}

    # uninterrupted reference run
    t_a = _mini_trainer(tmp_path, run_id="run_a", extra_data=rf)
    t_a.train()

    # interrupted run: killed entering epoch 2's validation (epoch-1 'last'
    # checkpoint exists via log_every_n_epochs=1)
    t_b = _mini_trainer(tmp_path, run_id="run_b", extra_data=rf)
    orig_validate = t_b.validate

    def validate(epoch):
        if epoch >= 2:
            raise _Interrupt()
        return orig_validate(epoch)

    t_b.validate = validate
    with pytest.raises(_Interrupt):
        t_b.train()

    # fresh process/trainer resumes from the 'last' checkpoint
    t_c = _mini_trainer(tmp_path, run_id="run_b", extra_data=rf)
    meta = t_c.load_checkpoint("last")
    assert t_c.start_epoch == 2
    assert t_c.global_step > 0  # restored, not reset to 0
    t_c.train()

    assert t_c.global_step == t_a.global_step
    np.testing.assert_array_equal(t_c.ind_counts, t_a.ind_counts)
    # bitwise: both runs execute the same deterministic op sequence on the
    # same backend, so the resumed params must be EXACTLY the uninterrupted
    # run's (COVERAGE.md makes the bitwise claim; this enforces it)
    for a, c in zip(jax.tree.leaves(t_a.state.params),
                    jax.tree.leaves(t_c.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


# ------------------------------------------------------------ debugging dumps

def test_debugging_dump_mode(tmp_path):
    """config['debugging'] writes per-batch img|gt|pred triptychs to
    <run_dir>/debug/ (reference EncDec_Manager.py:86-94, 201-206)."""
    t = _mini_trainer(tmp_path, epochs=1, extra_cfg={"debugging": True})
    t.train()
    dumps = sorted((t.run_dir / "debug").glob("e000_b*_*.png"))
    assert len(dumps) == 2 * 4  # 2 batches x batch_size 4
    valid_dumps = list((t.run_dir / "debug").glob("valid_e000_*.png"))
    assert valid_dumps
    import cv2
    img = cv2.imread(str(dumps[0]))
    assert img is not None and img.shape == (32, 3 * 32, 3)  # img|gt|pred


# --------------------------------------------------------- s8 train metrics

def test_train_metrics_s8_confusion_matrix():
    """train_metrics='s8' computes the train-log confusion matrix from the
    pre-upsample logits against stride-subsampled labels (VERDICT r2 item
    3a); 'full' keeps the reference's full-res semantics."""
    import jax
    import jax.numpy as jnp
    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
        DeviceAugmentSpec)
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
        make_schedule)
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
        create_train_state)
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
        make_train_step)

    task = 2
    model = build_model({"model": "OCRNet", "backbone": "resnet18",
                         "out_stride": 8}, task)
    loss_fn = build_loss({
        "name": "TwoScaleLoss", "lovasz_impl": "bucket",
        "lovasz_buckets": 1024,
        "interm": {"name": "LovaszSoftmax", "weight": 0.4},
        "final": {"name": "LovaszSoftmax", "weight": 1.0}}, task)
    spec = DeviceAugmentSpec(pad=False, flip=False)
    sched = make_schedule({"epochs": 1, "learning_rate": 1e-4}, 2)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 64, 128, 3)), {}, sched)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (2, 64, 128, 3), dtype=np.uint8))
    lbl = jnp.asarray(rng.integers(0, 17, (2, 64, 128), dtype=np.uint8))

    step_s8 = make_train_step(loss_fn, spec, task, donate=False,
                              train_metrics="s8")
    _, m = step_s8(state, img, lbl, jax.random.PRNGKey(1), 0)
    # resnet18 never dilates (reference OCR.py:49-56): pre-upsample logits
    # are stride 32 at 64x128 -> 2x4 grid
    assert int(np.asarray(m["confusion_matrix"]).sum()) == 2 * 2 * 4
    assert np.isfinite(float(m["loss"]))

    step_full = make_train_step(loss_fn, spec, task, donate=False,
                                train_metrics="full")
    _, m2 = step_full(state, img, lbl, jax.random.PRNGKey(1), 0)
    assert int(np.asarray(m2["confusion_matrix"]).sum()) == 2 * 64 * 128


# ------------------------------------------- fused-kernel ignore exclusion

def test_fused_bucket_ignores_excluded_exactly():
    """Ignore-labeled pixels must be excluded from the bucket histograms
    entirely (ADVICE r2): the fused loss on labels with ignore pixels must
    match the exact sort loss on the same inputs much tighter than the
    bucket quantisation envelope would allow if ignores leaked into g_bg."""
    import jax
    import jax.numpy as jnp
    from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
        fused_bucket_lovasz_s8)
    from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
        lovasz_softmax)
    from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import (
        resize_bilinear)

    rng = np.random.default_rng(3)
    c, h, w = 6, 32, 64
    logits_s8 = jnp.asarray(rng.normal(0, 2, (2, h // 8, w // 8, c)),
                            jnp.float32)
    # half the pixels carry the ignore id
    lbl = rng.integers(0, c, (2, h, w))
    lbl[:, :, ::2] = c  # ignore id == c
    lbl = jnp.asarray(lbl)

    fused = float(fused_bucket_lovasz_s8(
        logits_s8, lbl, classes_to_ignore=c, n_buckets=1024,
        align_corners=True))
    full = resize_bilinear(logits_s8, (h, w), align_corners=True)
    exact = float(lovasz_softmax(full, lbl, classes_to_ignore=c))
    assert abs(fused - exact) < 2e-3, (fused, exact)


# ------------------------------------------------------ parallel video decode

def test_parallel_video_decode_matches_serial(tmp_path):
    """Multi-worker ordered decode (video_decode_workers) must produce the
    same frames in the same order as the serial path."""
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
        for _ in range(11):  # odd count exercises the padded tail batch
            wr.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        wr.release()
        vids.append(str(path))

    ds = ArrayDataset(rng.integers(0, 255, (4, h, w, 3), dtype=np.uint8),
                      rng.integers(0, 8, (4, h, w), dtype=np.uint8))
    df = pd.DataFrame({"vid_num": np.ones(4, int)})

    def run(workers, run_id):
        config = {
            "name": "vidp", "mode": "video_inference", "run_id": run_id,
            "graph": {"model": "FCN", "width": 0.125},
            "data": {"experiment": 1, "batch_size": 1, "split": 0,
                     "transforms": []},
            "loss": {}, "train": {},
            "video_height": h, "video_width": w,
            "log_path": str(tmp_path), "precision": "f32", "seed": 0,
        }
        t = Trainer(config, datasets=(ds, ds, df, df))
        n = demo_infer(t, video_paths=vids, batch_size=4,
                       decode_workers=workers)
        return n, sorted(t.run_dir.glob("*.avi"))

    n_ser, out_ser = run(1, "ser")
    n_par, out_par = run(3, "par")
    assert n_ser == n_par == 22
    for a, b in zip(out_ser, out_par):
        ca, cb = cv2.VideoCapture(str(a)), cv2.VideoCapture(str(b))
        assert int(ca.get(cv2.CAP_PROP_FRAME_COUNT)) == \
            int(cb.get(cv2.CAP_PROP_FRAME_COUNT))
        ok_a, fa = ca.read()
        ok_b, fb = cb.read()
        assert ok_a and ok_b
        np.testing.assert_array_equal(fa, fb)
