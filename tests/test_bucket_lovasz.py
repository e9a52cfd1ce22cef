"""Bucket (sort-free) Lovász vs the exact sort implementation."""
import jax
import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
    _sorted_lovasz_per_class, fused_two_scale_lovasz, lovasz_softmax,
)
from miccai2021_cataract_semantic_segmentation_tpu.losses.bucket_lovasz import (
    bucket_lovasz_per_class,
)


def _data(R=3, P=40000, fg_rate=0.1, seed=0):
    rng = np.random.default_rng(seed)
    e = jnp.asarray(rng.random((R, P), dtype=np.float32))
    fg = jnp.asarray((rng.random((R, P)) < fg_rate).astype(np.float32))
    return e, fg


def test_bucket_matches_sort_loss():
    e, fg = _data()
    exact = _sorted_lovasz_per_class(e, fg)
    approx = bucket_lovasz_per_class(e, fg)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                               atol=2e-4)


def test_bucket_matches_sort_grad():
    e, fg = _data(P=20000)
    ge = jax.grad(lambda x: _sorted_lovasz_per_class(x, fg).sum())(e)
    gb = jax.grad(lambda x: bucket_lovasz_per_class(x, fg).sum())(e)
    corr = float(jnp.sum(ge * gb) /
                 jnp.sqrt(jnp.sum(ge ** 2) * jnp.sum(gb ** 2)))
    assert corr > 0.999, corr
    # totals per class agree (within-bucket averaging preserves block sums)
    np.testing.assert_allclose(np.asarray(ge.sum(1)), np.asarray(gb.sum(1)),
                               atol=1e-4)


def test_bucket_peaked_distribution():
    """Near-converged softmax: errors cluster near 0 (the training regime)."""
    rng = np.random.default_rng(1)
    R, P = 2, 30000
    e = jnp.asarray((rng.random((R, P)) ** 8).astype(np.float32))
    fg = jnp.asarray((rng.random((R, P)) < 0.05).astype(np.float32))
    exact = _sorted_lovasz_per_class(e, fg)
    approx = bucket_lovasz_per_class(e, fg)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                               rtol=2e-3, atol=2e-4)


def test_bucket_all_ignore_is_finite():
    e = jnp.zeros((2, 8192))
    fg = jnp.zeros((2, 8192))
    v = bucket_lovasz_per_class(e, fg)
    assert np.isfinite(np.asarray(v)).all()
    g = jax.grad(lambda x: bucket_lovasz_per_class(x, fg).sum())(e)
    assert np.isfinite(np.asarray(g)).all()


def test_lovasz_softmax_impl_flag():
    rng = np.random.default_rng(2)
    lg = jnp.asarray(rng.normal(size=(2, 32, 48, 8)).astype(np.float32))
    lb = jnp.asarray(rng.integers(0, 8, (2, 32, 48), dtype=np.int32))
    v_sort = lovasz_softmax(lg, lb, impl="sort")
    v_bucket = lovasz_softmax(lg, lb, impl="bucket")
    np.testing.assert_allclose(float(v_bucket), float(v_sort), atol=5e-4)


def test_fused_two_scale_bucket():
    rng = np.random.default_rng(3)
    li = jnp.asarray(rng.normal(size=(1, 32, 48, 17)).astype(np.float32))
    lf = jnp.asarray(rng.normal(size=(1, 32, 48, 17)).astype(np.float32))
    lb = jnp.asarray(rng.integers(0, 18, (1, 32, 48), dtype=np.int32))
    v_sort = fused_two_scale_lovasz(li, lf, lb, 0.4, 1.0, impl="sort")
    v_bucket = fused_two_scale_lovasz(li, lf, lb, 0.4, 1.0, impl="bucket")
    np.testing.assert_allclose(float(v_bucket), float(v_sort), atol=5e-4)
