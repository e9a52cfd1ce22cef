"""Adaptive (two-sided log) bucket edges for the fused bucket Lovász
(losses/bucket_edges.py; PERF.md §4.2).

The edge map must be a valid monotone partition of [0, 1], the in-kernel
bit-trick bucket id must agree with the numpy twin and stay inside its own
edge intervals, and the fused kernels under edges="adaptive" must stay
within the quantisation envelope of the exact sort loss (reference
losses/LovaszSoftmax.py:34-95)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.losses.bucket_edges import (
    bucket_edges, bucket_id_np, bucket_midpoints_np, make_bid_fn)
from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
    fused_two_scale_lovasz, lovasz_softmax)
from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
    fused_bucket_lovasz_s8, fused_two_scale_bucket_lovasz_s8)
from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear


def _samples(rng, n=50000):
    return np.concatenate([
        rng.uniform(0, 1, n), rng.uniform(0, 1e-4, n // 4),
        1 - rng.uniform(0, 1e-4, n // 4),
        [0.0, 1.0, 0.5, 2.0 ** -17, 1 - 2.0 ** -17]]).astype(np.float32)


@pytest.mark.parametrize("n_buckets", [64, 256, 512, 1024, 2048])
def test_adaptive_edges_partition(n_buckets):
    e = bucket_edges(n_buckets, "adaptive")
    assert e.shape == (n_buckets + 1,)
    assert e[0] == 0.0 and e[-1] == 1.0
    assert np.all(np.diff(e) > 0)
    assert abs(e[n_buckets // 2] - 0.5) < 1e-12     # mirror point
    m = bucket_midpoints_np(n_buckets, "adaptive")
    assert np.all((m > e[:-1]) & (m < e[1:]))


@pytest.mark.parametrize("n_buckets", [256, 1024])
def test_adaptive_bid_containment_and_monotone(n_buckets):
    rng = np.random.default_rng(0)
    s = _samples(rng)
    e = bucket_edges(n_buckets, "adaptive")
    bid = bucket_id_np(s, n_buckets, "adaptive")
    assert bid.min() >= 0 and bid.max() < n_buckets
    s64 = s.astype(np.float64)
    assert np.all((e[bid] <= s64) & (s64 <= e[bid + 1]))
    order = np.argsort(s, kind="stable")
    assert np.all(np.diff(bid[order]) >= 0)         # monotone in e
    # jax bit-trick fn == numpy twin, element for element
    f = make_bid_fn(n_buckets, "adaptive")
    assert np.array_equal(np.asarray(jax.jit(f)(jnp.asarray(s))), bid)


def test_adaptive_resolution_profile():
    """The design intent in numbers: at B=256 adaptive is finer than uniform
    near both ends and coarser mid-range (losses/bucket_edges.py)."""
    B = 256
    eu = np.diff(bucket_edges(B, "uniform"))
    ea = np.diff(bucket_edges(B, "adaptive"))
    for probe in (0.001, 0.01, 0.99, 0.999):
        b = bucket_id_np(np.float32([probe]), B, "adaptive")[0]
        assert ea[b] < eu[0], f"adaptive not finer at e={probe}"
    mid = bucket_id_np(np.float32([0.4]), B, "adaptive")[0]
    assert ea[mid] > eu[0], "adaptive should be coarser mid-range"


def test_invalid_bucket_counts_rejected():
    with pytest.raises(ValueError):
        bucket_edges(384, "adaptive")      # not 32 * 2^k
    with pytest.raises(ValueError):
        bucket_edges(16, "adaptive")       # fewer than one bucket per octave
    with pytest.raises(ValueError):
        bucket_edges(256, "quantile")      # unknown mode
    with pytest.raises(ValueError):
        bucket_edges(256, "adaptive3")     # octaves must be a power of two


@pytest.mark.parametrize("mode", ["adaptive8", "adaptive4"])
def test_octave_variants_partition_and_bid(mode):
    """Octave-count dials (PERF.md §4.2 measured all of them WORSE than
    uniform at B=256 — kept for the record + future workloads)."""
    B = 256
    e = bucket_edges(B, mode)
    assert e[0] == 0.0 and e[-1] == 1.0 and np.all(np.diff(e) > 0)
    rng = np.random.default_rng(2)
    s = _samples(rng, 20000)
    bid = bucket_id_np(s, B, mode)
    s64 = s.astype(np.float64)
    assert np.all((e[bid] <= s64) & (s64 <= e[bid + 1]))
    f = make_bid_fn(B, mode)
    assert np.array_equal(np.asarray(jax.jit(f)(jnp.asarray(s))), bid)


class TestFusedAdaptive:
    def _data(self, c=5, seed=0):
        rng = np.random.default_rng(seed)
        n, h8, w8, H, W = 2, 17, 30, 136, 240
        li = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32)) * 2
        lf = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32)) * 2
        lbl = jnp.asarray(rng.integers(0, c, (n, H, W)).astype(np.int32))
        return li, lf, lbl, (H, W), c

    @pytest.mark.parametrize("n_buckets", [256, 1024])
    def test_two_scale_value_and_grad_vs_sort(self, n_buckets):
        li, lf, lbl, (H, W), c = self._data()
        ref = fused_two_scale_lovasz(
            resize_bilinear(li, (H, W), True),
            resize_bilinear(lf, (H, W), True), lbl, 0.4, 1.0, impl="sort")
        got = fused_two_scale_bucket_lovasz_s8(
            li, lf, lbl, 0.4, 1.0, n_buckets=n_buckets, edges="adaptive")
        assert abs(float(got) - float(ref)) < 4e-3
        g = jax.grad(lambda a: fused_two_scale_bucket_lovasz_s8(
            a, lf, lbl, 0.4, 1.0, n_buckets=n_buckets, edges="adaptive"))(li)
        gs = jax.grad(lambda a: fused_two_scale_lovasz(
            resize_bilinear(a, (H, W), True),
            resize_bilinear(lf, (H, W), True), lbl, 0.4, 1.0,
            impl="sort"))(li)
        a, b = np.asarray(g).ravel(), np.asarray(gs).ravel()
        assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.999
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_single_scale_adaptive_vs_sort(self):
        li, lf, lbl, (H, W), c = self._data(seed=2)
        ref = lovasz_softmax(resize_bilinear(lf, (H, W), True), lbl,
                             impl="sort")
        got = fused_bucket_lovasz_s8(lf, lbl, n_buckets=256, edges="adaptive")
        assert abs(float(got) - float(ref)) < 4e-3

    def test_build_loss_threads_edges(self):
        """lovasz_edges reaches the fused kernels through build_loss: the
        adaptive value must differ from the uniform one at low B (different
        quantisation) while both stay within the sort envelope."""
        li, lf, lbl, (H, W), c = self._data(seed=1)
        outs = {"interm_logits": resize_bilinear(li, (H, W), True),
                "logits": resize_bilinear(lf, (H, W), True),
                "interm_logits_s8": li, "logits_s8": lf}
        vals = {}
        for edges in ("uniform", "adaptive"):
            loss_fn = build_loss({
                "name": "TwoScaleLoss", "lovasz_impl": "bucket",
                "lovasz_buckets": 256, "lovasz_edges": edges,
                "interm": {"name": "LovaszSoftmax", "weight": 0.4},
                "final": {"name": "LovaszSoftmax", "weight": 1.0}}, task=1)
            vals[edges], _ = loss_fn(outs, lbl)
        ref = fused_two_scale_lovasz(outs["interm_logits"], outs["logits"],
                                     lbl, 0.4, 1.0, impl="sort")
        assert float(vals["uniform"]) != float(vals["adaptive"])
        for v in vals.values():
            assert abs(float(v) - float(ref)) < 4e-3
