"""End-to-end semi-supervised self-training (extension): the reference
ships SemiSupervisedLoss + semi helpers but no path uses them; here the
Trainer wires unlabeled data + on-device clipped_argmax pseudo-labels
(torch_utils.py:7-21) into the jitted step."""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.data.semi import SemiSupervisedView


def _sets(n=8, hw=(32, 32), n_cls=8, seed=0):
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (n, *hw, 3), dtype=np.uint8)
    lbls = rng.integers(0, n_cls, (n, *hw), dtype=np.uint8)
    return ArrayDataset(imgs, lbls), rng


def test_semi_view():
    lab, rng = _sets()
    unlab, _ = _sets(seed=1)
    view = SemiSupervisedView(lab, unlab, ignore_id=8)
    assert len(view) == 16
    img, lbl, meta = view[3]
    np.testing.assert_array_equal(lbl, lab[3][1])  # labeled passthrough
    img_u, lbl_u, meta_u = view[8 + 2]
    np.testing.assert_array_equal(img_u, unlab[2][0])
    assert (lbl_u == 8).all() and meta_u["unlabeled"]
    # tuple-style unlabeled members (VideoDataset returns (frame, idx, vid))
    class Frames:
        def __len__(self):
            return 2
        def __getitem__(self, i):
            return np.zeros((16, 16, 3), np.uint8), i, 0
    v2 = SemiSupervisedView(lab, Frames(), ignore_id=8)
    img3, lbl3, _ = v2[8]
    assert img3.shape == (16, 16, 3) and (lbl3 == 8).all()


def test_semi_step_threshold_gates_unlabeled_loss():
    """thr -> 1: every pseudo pixel is ignored so the unlabeled CE term is
    exactly 0; thr = 0: all pseudo pixels kept, term > 0."""
    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import DeviceAugmentSpec
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import make_schedule
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import create_train_state
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import make_train_step

    task = 1
    model = build_model({"model": "FCN", "width": 0.125}, task)
    loss_fn = build_loss({"name": "SemiSupervisedLoss",
                          "labeled": {"name": "CrossEntropyLoss", "weight": 1.0},
                          "unlabeled": {"name": "CrossEntropyLoss", "weight": 0.5}},
                         task)
    spec = DeviceAugmentSpec()
    schedule = make_schedule({"epochs": 1, "learning_rate": 1e-3}, 2)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((4, 32, 32, 3)), {}, schedule)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 8, (4, 32, 32), dtype=np.uint8))

    def run(thr):
        step = make_train_step(
            loss_fn, spec, task, donate=False,
            semi={"threshold": thr, "ignore_id": 8, "n_shards": 1})
        _, m = step(state, images, labels, jax.random.PRNGKey(1), 0)
        return {k: float(v) for k, v in m.items()
                if k in ("labeled", "unlabeled", "loss")}

    hi = run(0.999999)
    lo = run(0.0)
    assert hi["unlabeled"] == 0.0
    assert lo["unlabeled"] > 0.0
    assert np.isfinite(lo["loss"]) and np.isfinite(hi["loss"])
    # labeled term sees the same GT either way
    np.testing.assert_allclose(hi["labeled"], lo["labeled"], rtol=1e-5)


def test_semi_pseudo_ignore_propagates_per_loss_type():
    """Below-threshold pseudo pixels (id = num_classes) must be excluded by
    every supported loss, incl. on task 1 which has no native ignore class;
    losses with no ignore mechanism are refused."""
    import pytest
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss

    task, n_cls = 1, 8
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, n_cls)).astype(np.float32))
    lbl = rng.integers(0, n_cls, (2, 16, 16)).astype(np.int32)
    lbl_ign = lbl.copy()
    lbl_ign[1, :8, :] = n_cls  # pseudo-ignore pixels in the unlabeled half
    for name in ("CrossEntropyLoss", "OhemCrossEntropy", "LovaszSoftmax"):
        fn = build_loss({"name": "SemiSupervisedLoss",
                         "labeled": {"name": name, "weight": 1.0}}, task)
        v, _ = fn({"logits": logits}, jnp.asarray(lbl_ign), epoch=None)
        assert np.isfinite(float(v)), name
        # corrupting logits under the ignored pixels must not change the loss
        bad = np.asarray(logits).copy()
        bad[1, :8, :, :] = 100.0 * rng.standard_normal(bad[1, :8, :, :].shape)
        v2, _ = fn({"logits": jnp.asarray(bad)}, jnp.asarray(lbl_ign), epoch=None)
        np.testing.assert_allclose(float(v), float(v2), rtol=1e-4, err_msg=name)
    with pytest.raises(NotImplementedError, match="ignore mechanism"):
        build_loss({"name": "SemiSupervisedLoss",
                    "labeled": {"name": "GenDiceLoss"}}, task)


def test_trainer_semi_end_to_end(tmp_path):
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer
    lab, rng = _sets()
    valid, _ = _sets(seed=2)
    unlab, _ = _sets(n=12, seed=3)
    n = len(lab)
    rows = {"vid_num": np.ones(n, int), "blacklisted": np.zeros(n, int),
            "relabeled": np.zeros(n, float)}
    counts = rng.integers(0, 1000, (n, 36))
    for i, name in enumerate(taxonomy.CANONICAL_NAMES):
        rows[name] = counts[:, i]
    df = pd.DataFrame(rows)
    config = {
        "name": "semi", "mode": "training",
        "graph": {"model": "FCN", "width": 0.125},
        "data": {"experiment": 1, "batch_size": 4, "split": 0,
                 "transforms": ["flip"]},
        "loss": {"name": "SemiSupervisedLoss",
                 "labeled": {"name": "CrossEntropyLoss", "weight": 1.0},
                 "unlabeled": {"name": "CrossEntropyLoss", "weight": 0.5},
                 "pseudo_threshold": 0.5},
        "train": {"epochs": 2, "learning_rate": 1e-3},
        "log_path": str(tmp_path), "log_every_n_epochs": 1,
        "precision": "f32", "max_valid_imgs": 1, "seed": 0,
    }
    t = Trainer(config, datasets=(lab, valid, df, df, unlab))
    assert t.semi and t.lab_batch_size == 2
    # shard-blocked batch layout: every block of bs/S columns is
    # [labeled | unlabeled]
    np_rng = np.random.default_rng(0)
    b = t._epoch_batches(0, np_rng)
    n_sh = t.mesh.shape["data"] if t.mesh is not None else 1
    blk = 4 // n_sh
    blocks = b.reshape(len(b), n_sh, blk)
    assert (blocks[:, :, : blk // 2] < n).all()       # labeled ids
    assert (blocks[:, :, blk // 2:] >= n).all()       # unlabeled ids
    t.train()
    assert "miou" in t.metrics and np.isfinite(t.metrics["miou"])
    # ind_dist tracked labeled indices only
    assert t.ind_counts.shape == (n,)
    assert t.ind_counts.sum() > 0
