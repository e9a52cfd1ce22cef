"""Dithered (stochastic) bucket assignment for the fused bucket Lovász.

The dither replaces the fixed uniform bucket map floor(e*B) with
floor(e*B + d - 1/2), d ~ U[0,1) from a stateless hash of (global pixel
index, step seed) — unbiased quantisation in expectation over steps
(losses/bucket_edges.py). These tests pin:
  * the numpy hash twin == the in-kernel hash (same bucket ids);
  * determinism per seed and variation across seeds;
  * unbiasedness of the dithered map (E[midpoint] == e);
  * gradient sanity vs the sort oracle;
  * config wiring (`lovasz_dither` + the train step's step counter).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.losses.bucket_edges import (
    dither_unit_np, dithered_bucket_id_np, fmix32_jax, fmix32_np)
from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
    _fu_core_fwd, fused_two_scale_bucket_lovasz_s8)
from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
    fused_two_scale_lovasz)
from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear


def test_fmix32_jax_matches_numpy_twin():
    rng = np.random.default_rng(0)
    x = rng.integers(-2**31, 2**31, 4096, dtype=np.int64).astype(np.int32)
    got = np.asarray(fmix32_jax(jnp.asarray(x))).view(np.uint32)
    want = fmix32_np(x.view(np.uint32))
    np.testing.assert_array_equal(got, want)


def test_dither_unit_distribution():
    """d in [0, 1), roughly uniform (mean ~ 1/2, all 16 bins populated)."""
    idx = np.arange(1 << 16, dtype=np.uint32)
    d = dither_unit_np(idx, seed=123)
    assert d.min() >= 0.0 and d.max() < 1.0
    assert abs(float(d.mean()) - 0.5) < 0.01
    hist, _ = np.histogram(d, bins=16, range=(0, 1))
    assert (hist > 0.8 * len(idx) / 16).all()


def test_dithered_bucket_id_unbiased():
    """E_seed[bucket midpoint] == e for e away from [0,1] boundaries —
    the whole point of the dither (fixed edges are biased within-bucket)."""
    B = 16
    es = np.asarray([0.11, 0.23, 0.47, 0.62, 0.89], np.float32)
    idx = np.arange(4096, dtype=np.uint32)  # one pixel index per draw
    for e in es:
        bids = dithered_bucket_id_np(np.full(idx.shape, e, np.float32),
                                     idx, seed=7, n_buckets=B)
        mid = (bids.astype(np.float64) + 0.5) / B
        assert abs(mid.mean() - float(e)) < 2e-3, e
    # undithered floor map is biased by up to half a bucket: sanity-check
    # the dither actually improves on it for an off-midpoint error
    e = np.float32(0.11)   # floor map puts it at midpoint 0.09375 (|b|=0.016)
    fixed_mid = (np.minimum(int(e * B), B - 1) + 0.5) / B
    assert abs(fixed_mid - e) > 5e-3


def _tiny(seed=0, c=4):
    rng = np.random.default_rng(seed)
    n, h8, w8, H, W = 1, 9, 12, 72, 96
    li = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32)) * 2
    lf = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32)) * 2
    lbl = jnp.asarray(rng.integers(0, c, (n, H, W)).astype(np.int32))
    return li, lf, lbl, (H, W), c


def test_kernel_dither_matches_numpy_oracle_histogram():
    """The in-kernel dithered bucket ids must equal the numpy twin
    (dithered_bucket_id_np on the hash of the GLOBAL padded pixel index) —
    checked through the forward histograms. A tiny tolerance absorbs
    last-ulp error differences between the in-kernel interpolation matmuls
    and resize_bilinear flipping a bucket at an edge."""
    li, lf, lbl, (H, W), c = _tiny()
    B, seed = 64, 42
    n = li.shape[0]
    h_pad, w_pad = -(-H // 8) * 8, -(-W // 128) * 128
    lbl_p = jnp.pad(lbl, ((0, 0), (0, h_pad - H), (0, w_pad - W)),
                    constant_values=-1)
    hist = np.asarray(_fu_core_fwd(
        [li, lf], lbl_p, c, 8, (H, W), B, True, "uniform",
        jnp.asarray([seed], jnp.int32), True))          # (2C, B, 4)

    # numpy oracle: same upsample+softmax (via the XLA twin), same hash
    idx = (np.arange(n)[:, None, None] * h_pad * w_pad
           + np.arange(h_pad)[None, :, None] * w_pad
           + np.arange(w_pad)[None, None, :]).astype(np.uint32)
    idx = idx[:, :H, :W]
    want = np.zeros((2 * c, B, 2), np.int64)            # [fg, bg]
    lbl_np = np.asarray(lbl)
    for si, lg in enumerate((li, lf)):
        p = np.asarray(jax.nn.softmax(
            resize_bilinear(lg, (H, W), align_corners=True), axis=-1))
        for cc in range(c):
            fg = (lbl_np == cc)
            e = np.abs(fg.astype(np.float32) - p[..., cc])
            bid = dithered_bucket_id_np(e, idx, seed, B)
            r = si * c + cc
            np.add.at(want[r, :, 0], bid[fg], 1)
            np.add.at(want[r, :, 1], bid[~fg], 1)
    got = np.stack([hist[..., 0], hist[..., 1]], axis=-1).astype(np.int64)
    # a handful of edge flips allowed; a wrong hash/index would differ by
    # thousands of counts
    assert np.abs(got - want).sum() <= 20, np.abs(got - want).sum()


def test_dither_seed_determinism_and_grad():
    li, lf, lbl, (H, W), c = _tiny(seed=1)

    def f(a, s):
        return fused_two_scale_bucket_lovasz_s8(
            a, lf, lbl, 0.4, 1.0, n_buckets=256, dither_seed=s)

    g1 = jax.grad(f)(li, 9)
    g1b = jax.grad(f)(li, 9)
    g2 = jax.grad(f)(li, 10)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g1b))
    assert np.abs(np.asarray(g1) - np.asarray(g2)).max() > 0

    # dithered gradient stays aligned with the sort oracle
    gs = jax.grad(lambda a: fused_two_scale_lovasz(
        resize_bilinear(a, (H, W), True), resize_bilinear(lf, (H, W), True),
        lbl, 0.4, 1.0, impl="sort"))(li)
    a, b = np.asarray(gs).ravel(), np.asarray(g1).ravel()
    assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.99


def test_dither_value_close_to_sort():
    li, lf, lbl, (H, W), c = _tiny(seed=2)
    ref = fused_two_scale_lovasz(
        resize_bilinear(li, (H, W), True), resize_bilinear(lf, (H, W), True),
        lbl, 0.4, 1.0, impl="sort")
    got = fused_two_scale_bucket_lovasz_s8(li, lf, lbl, 0.4, 1.0,
                                           n_buckets=256, dither_seed=5)
    assert abs(float(got) - float(ref)) < 4e-3


def test_build_loss_dither_wiring_and_train_step():
    """`lovasz_dither: true` + the step counter: different steps must give
    different dither (the averaging mechanism), same step identical."""
    li, lf, lbl, (H, W), c = _tiny(seed=3)
    loss_fn = build_loss({
        "name": "TwoScaleLoss", "lovasz_impl": "bucket",
        "lovasz_buckets": 256, "lovasz_dither": True,
        "interm": {"name": "LovaszSoftmax", "weight": 0.4},
        "final": {"name": "LovaszSoftmax", "weight": 1.0}}, task=1)
    up = {"interm_logits": resize_bilinear(li, (H, W), True),
          "logits": resize_bilinear(lf, (H, W), True),
          "interm_logits_s8": li, "logits_s8": lf}
    v0, _ = loss_fn(up, lbl, step=jnp.int32(0))
    v0b, _ = loss_fn(up, lbl, step=jnp.int32(0))
    v1, _ = loss_fn(up, lbl, step=jnp.int32(1))
    vn, _ = loss_fn(up, lbl)        # no step -> fixed seed 0 (eval path)
    assert float(v0) == float(v0b)
    assert float(v0) != float(v1)
    assert np.isfinite(float(vn))
