"""DenseContrastiveLoss / V2 reconstructions (losses/contrastive.py) and the
LossWrapper phase gate (reference LossWrapper.py:50-58)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.losses.contrastive import (
    dense_contrastive_loss, dense_contrastive_loss_v2)

TASK = 2
C = 17  # task-2 classes; ignore id == 17


def _clustered_features(rng, b=2, h=8, w=8, d=16, n_cls=3, noise=0.0):
    """Labels in {0..n_cls-1}; features = one basis vector per class + noise."""
    lbl = rng.integers(0, n_cls, (b, h, w)).astype(np.int32)
    basis = np.eye(d, dtype=np.float32)[:n_cls]
    feats = basis[lbl] + noise * rng.standard_normal((b, h, w, d)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(lbl)


def test_v1_separable_beats_random():
    rng = np.random.default_rng(0)
    f_good, lbl = _clustered_features(rng)
    f_rand = jnp.asarray(rng.standard_normal(f_good.shape).astype(np.float32))
    l_good = dense_contrastive_loss(f_good, lbl, TASK)
    l_rand = dense_contrastive_loss(f_rand, lbl, TASK)
    assert float(l_good) < float(l_rand)
    # perfectly clustered features at low temperature -> near-zero loss
    assert float(dense_contrastive_loss(f_good, lbl, TASK, temperature=0.02)) < 0.05


def test_v1_ignore_pixels_have_no_influence():
    rng = np.random.default_rng(1)
    feats, lbl = _clustered_features(rng, noise=0.1)
    lbl2 = np.asarray(lbl).copy()
    lbl2[:, :2, :] = C  # ignore class
    base = dense_contrastive_loss(feats, jnp.asarray(lbl2), TASK)
    # corrupt the features under the ignored pixels: loss must not move
    f2 = np.asarray(feats).copy()
    f2[:, :2, :, :] = 1e3 * rng.standard_normal(f2[:, :2, :, :].shape)
    assert np.allclose(float(base),
                       float(dense_contrastive_loss(jnp.asarray(f2),
                                                    jnp.asarray(lbl2), TASK)),
                       atol=1e-5)


def test_v1_downsamples_fullres_labels():
    rng = np.random.default_rng(2)
    feats, lbl = _clustered_features(rng)
    # labels at 4x the feature grid: nearest subsample must recover lbl
    lbl_full = jnp.repeat(jnp.repeat(lbl, 4, axis=1), 4, axis=2)
    a = dense_contrastive_loss(feats, lbl, TASK)
    b = dense_contrastive_loss(feats, lbl_full, TASK)
    assert np.allclose(float(a), float(b), rtol=1e-6)


def test_downsample_labels_centre_aligned():
    from miccai2021_cataract_semantic_segmentation_tpu.losses.contrastive import (
        _downsample_labels)
    # non-integer ratio (27 label rows over 8 feature rows): each sampled
    # value must come from the centre of its feature cell, not drift
    H, W, h, w = 27, 33, 8, 8
    lbl = jnp.broadcast_to(jnp.arange(H)[None, :, None], (1, H, W))
    ds = np.asarray(_downsample_labels(lbl, (h, w)))[0, :, 0]
    expect = np.floor((np.arange(h) + 0.5) * H / h).astype(int)
    assert np.array_equal(ds, expect)
    # upsampling direction (H < h) is well-defined, no crash
    up = _downsample_labels(jnp.zeros((1, 4, 4), jnp.int32), (8, 8))
    assert up.shape == (1, 8, 8)


def test_v1_grad_finite_and_nonzero():
    rng = np.random.default_rng(3)
    feats, lbl = _clustered_features(rng, noise=0.5)
    g = jax.grad(lambda f: dense_contrastive_loss(f, lbl, TASK))(feats)
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


def test_v2_separable_beats_random_and_skips_singletons():
    rng = np.random.default_rng(4)
    f_good, lbl = _clustered_features(rng, b=1, h=8, w=8, noise=0.0)
    f_rand = jnp.asarray(rng.standard_normal(f_good.shape).astype(np.float32))
    l_good = dense_contrastive_loss_v2(f_good, lbl, TASK, anchor_stride=2)
    l_rand = dense_contrastive_loss_v2(f_rand, lbl, TASK, anchor_stride=2)
    assert float(l_good) < float(l_rand)
    # all pixels one class -> every anchor positive-only pairs: finite loss
    one = dense_contrastive_loss_v2(f_good, jnp.zeros_like(lbl), TASK)
    assert np.isfinite(float(one))
    # all pixels ignore -> no anchors at all: loss 0, not NaN
    zero = dense_contrastive_loss_v2(f_good, jnp.full_like(lbl, C), TASK)
    assert float(zero) == 0.0


def test_losswrapper_phase_gate_jit():
    """DC on / Lovász off before dc_off_at_epoch and vice versa after, with
    `epoch` a traced value (the jitted-step regime)."""
    loss_fn = build_loss({
        "losses": {"DenseContrastiveLoss": 1.0, "LovaszSoftmax": 1.0},
        "dc_off_at_epoch": 2,
    }, TASK)
    rng = np.random.default_rng(5)
    b, h, w = 2, 16, 16
    logits = jnp.asarray(rng.standard_normal((b, h, w, C)).astype(np.float32))
    proj = jnp.asarray(rng.standard_normal((b, h // 2, w // 2, 8)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, C, (b, h, w)).astype(np.int32))
    outputs = {"logits": logits, "proj_features": proj}

    @jax.jit
    def run(epoch):
        return loss_fn(outputs, lbl, epoch=epoch)

    _, terms_pre = run(jnp.int32(0))
    _, terms_post = run(jnp.int32(3))
    assert float(terms_pre["DenseContrastiveLoss"]) > 0
    assert float(terms_pre["LovaszSoftmax"]) == 0.0
    assert float(terms_post["DenseContrastiveLoss"]) == 0.0
    assert float(terms_post["LovaszSoftmax"]) > 0

    # without the gate both terms are always on (reference: V2 is ungated)
    loss_fn2 = build_loss({
        "losses": {"DenseContrastiveLossV2": 1.0, "LovaszSoftmax": 1.0},
    }, TASK)
    _, t = loss_fn2(outputs, lbl, epoch=jnp.int32(0))
    assert float(t["DenseContrastiveLossV2"]) > 0
    assert float(t["LovaszSoftmax"]) > 0


def test_trainer_dc_phase_recipe(tmp_path):
    """End-to-end: the reference's dc_off_at_epoch phase recipe (contrastive
    warmup -> segmentation loss) through the full Trainer, with an EncDec +
    Projector graph (EncDec_Manager passes the projected deep_features to the
    wrapper)."""
    import pandas as pd
    from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer

    rng = np.random.default_rng(0)
    n = 4
    ds = ArrayDataset(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
                      rng.integers(0, 8, (n, 32, 32), dtype=np.uint8))
    rows = {"vid_num": np.ones(n, int), "blacklisted": np.zeros(n, int),
            "relabeled": np.zeros(n, float)}
    counts = rng.integers(0, 1000, (n, 36))
    for i, name in enumerate(taxonomy.CANONICAL_NAMES):
        rows[name] = counts[:, i]
    df = pd.DataFrame(rows)
    config = {
        "name": "dc", "mode": "training",
        "graph": {"model": "EncDec", "encoder": {"model": "ResNet18"},
                  "decoder": {"model": "UPerNet", "channels": 32},
                  "projector": {"d": 16}},
        "data": {"experiment": 1, "batch_size": 4, "split": 0,
                 "transforms": []},
        "loss": {"losses": {"DenseContrastiveLoss": 1.0,
                            "CrossEntropyLoss": 1.0},
                 "dc_off_at_epoch": 1},
        "train": {"epochs": 2, "learning_rate": 1e-3},
        "log_path": str(tmp_path), "log_every_n_epochs": 1,
        "precision": "f32", "max_valid_imgs": 1, "seed": 0,
    }
    t = Trainer(config, datasets=(ds, ds, df, df))
    t.train()
    assert "miou" in t.metrics and np.isfinite(t.metrics["miou"])


def test_losswrapper_dc_requires_features():
    loss_fn = build_loss({"losses": {"DenseContrastiveLoss": 1.0}}, TASK)
    logits = jnp.zeros((1, 8, 8, C))
    lbl = jnp.zeros((1, 8, 8), jnp.int32)
    with pytest.raises(ValueError, match="proj_features"):
        loss_fn({"logits": logits}, lbl, epoch=None)
    # raw-deep_features fallback works (reference EncDec semantics) but warns
    deep = jnp.ones((1, 4, 4, 8))
    with pytest.warns(UserWarning, match="deep_features"):
        total, _ = loss_fn({"logits": logits, "deep_features": deep}, lbl,
                           epoch=None)
    assert np.isfinite(float(total))


def test_ocr_hrnet_width_spellings():
    """Both 'hrnetv2_18' and openseg-style 'hrnetv2_w18' select width 18."""
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    shapes = []
    for name in ("hrnetv2_18", "hrnetv2_w18"):
        m = build_model({"model": "OCRNet", "backbone": name}, 2)
        v = m.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 3)), False)
        shapes.append(jax.tree.map(lambda a: a.shape, v["params"]))
    assert shapes[0] == shapes[1]
    # width-18 trunk: first branch of stage2 is 18 channels wide
    assert shapes[0]["stage2"]["branch0"]["block0"]["conv1"]["kernel"][-1] == 18
