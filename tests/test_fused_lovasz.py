"""Fused stride-8 two-scale bucket Lovász (losses/fused_lovasz.py) vs the
sort-based oracle and the v1 bucket path.

The fused path owns the align_corners=True upsample + softmax + histogram
pipeline (reference models/OCR.py:128-138 + losses/TwoScaleLoss.py:43-52),
so parity is checked end to end from stride-8 logits."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
    fused_two_scale_lovasz)
from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
    fused_two_scale_bucket_lovasz_s8, upsample_nchw)
from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear


@pytest.fixture
def shapes():
    rng = np.random.default_rng(0)
    n, h8, w8, c, H, W = 2, 17, 30, 5, 136, 240
    li = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32)) * 2
    lf = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32)) * 2
    lbl = jnp.asarray(rng.integers(0, c, (n, H, W)).astype(np.int32))
    return li, lf, lbl, (H, W), c


def test_upsample_nchw_matches_resize_bilinear(shapes):
    li, lf, lbl, (H, W), c = shapes
    ref = resize_bilinear(lf, (H, W), align_corners=True)       # (N,H,W,C)
    got = upsample_nchw(lf, (H, W)).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_fused_value_matches_sort_oracle(shapes):
    li, lf, lbl, (H, W), c = shapes
    li_up = resize_bilinear(li, (H, W), align_corners=True)
    lf_up = resize_bilinear(lf, (H, W), align_corners=True)
    ref = fused_two_scale_lovasz(li_up, lf_up, lbl, 0.4, 1.0, impl="sort")
    got = fused_two_scale_bucket_lovasz_s8(li, lf, lbl, 0.4, 1.0)
    assert abs(float(got) - float(ref)) < 2e-3


def test_fused_value_with_ignore_class(shapes):
    li, lf, lbl, (H, W), c = shapes
    lbl = lbl.at[:, :8, :].set(c - 1)
    li_up = resize_bilinear(li, (H, W), align_corners=True)
    lf_up = resize_bilinear(lf, (H, W), align_corners=True)
    ref = fused_two_scale_lovasz(li_up, lf_up, lbl, 0.4, 1.0,
                                 classes_to_ignore=c - 1, impl="sort")
    got = fused_two_scale_bucket_lovasz_s8(li, lf, lbl, 0.4, 1.0,
                                           classes_to_ignore=c - 1)
    assert abs(float(got) - float(ref)) < 2e-3


def test_fused_gradient_cosine_vs_sort(shapes):
    li, lf, lbl, (H, W), c = shapes

    def f_sort(a, b):
        return fused_two_scale_lovasz(
            resize_bilinear(a, (H, W), True), resize_bilinear(b, (H, W), True),
            lbl, 0.4, 1.0, impl="sort")

    def f_new(a, b):
        return fused_two_scale_bucket_lovasz_s8(a, b, lbl, 0.4, 1.0)

    gs = jax.grad(f_sort, argnums=(0, 1))(li, lf)
    gn = jax.grad(f_new, argnums=(0, 1))(li, lf)
    for a, b in zip(gs, gn):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999
        assert abs(np.linalg.norm(b) / np.linalg.norm(a) - 1) < 0.02


def test_build_loss_routes_s8_outputs(shapes):
    """TwoScaleLoss + bucket impl + *_s8 outputs -> the fused kernel path;
    value must agree with the same loss fed full-res logits only."""
    li, lf, lbl, (H, W), c = shapes
    loss_fn = build_loss({"name": "TwoScaleLoss", "lovasz_impl": "bucket",
                          "interm": {"name": "LovaszSoftmax", "weight": 0.4},
                          "final": {"name": "LovaszSoftmax", "weight": 1.0}},
                         task=1)
    up = {"interm_logits": resize_bilinear(li, (H, W), True),
          "logits": resize_bilinear(lf, (H, W), True)}
    v_plain, _ = loss_fn({**up}, lbl)
    v_fused, _ = loss_fn({**up, "interm_logits_s8": li, "logits_s8": lf}, lbl)
    assert abs(float(v_fused) - float(v_plain)) < 2e-3


def test_fused_degenerate_labels_finite(shapes):
    li, lf, lbl, (H, W), c = shapes
    for fill in (0, c - 1):
        l2 = jnp.full_like(lbl, fill)
        v = fused_two_scale_bucket_lovasz_s8(li, lf, l2, 0.4, 1.0)
        g = jax.grad(lambda a: fused_two_scale_bucket_lovasz_s8(
            a, lf, l2, 0.4, 1.0))(li)
        assert np.isfinite(float(v))
        assert bool(jnp.all(jnp.isfinite(g)))


def test_fused_under_jit_and_odd_width():
    """Non-128-multiple widths exercise the lane-padding path."""
    rng = np.random.default_rng(1)
    n, h8, w8, c, H, W = 1, 9, 12, 4, 72, 96
    li = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32))
    lf = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, c, (n, H, W)).astype(np.int32))
    ref = fused_two_scale_lovasz(
        resize_bilinear(li, (H, W), True), resize_bilinear(lf, (H, W), True),
        lbl, 0.4, 1.0, impl="sort")
    got = jax.jit(lambda a, b, l: fused_two_scale_bucket_lovasz_s8(
        a, b, l, 0.4, 1.0))(li, lf, lbl)
    assert abs(float(got) - float(ref)) < 2e-3


def test_fused_odd_height_padding():
    """H not a multiple of 8 (e.g. unpadded 540-row CaDIS labels) exercises
    the block-height padding path: zero rows in the interp matrix + -1 label
    rows, exact by the same exclusion as lane padding. Value AND gradient
    must match the sort oracle (grads on pad rows are zero by construction).

    Round-3 regression: before the h_pad path, _pick_bh fell back to bh=4
    and Mosaic rejected the (1, 4, W) label block on real TPUs."""
    rng = np.random.default_rng(3)
    n, h8, w8, c, H, W = 1, 9, 12, 4, 68, 96   # H = 68 % 8 == 4
    li = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32))
    lf = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, c, (n, H, W)).astype(np.int32))

    def f_sort(a, b):
        return fused_two_scale_lovasz(
            resize_bilinear(a, (H, W), True), resize_bilinear(b, (H, W), True),
            lbl, 0.4, 1.0, impl="sort")

    def f_new(a, b):
        return fused_two_scale_bucket_lovasz_s8(a, b, lbl, 0.4, 1.0)

    got = jax.jit(f_new)(li, lf)
    ref = f_sort(li, lf)
    assert abs(float(got) - float(ref)) < 2e-3
    gs = jax.grad(f_sort, argnums=(0, 1))(li, lf)
    gn = jax.grad(f_new, argnums=(0, 1))(li, lf)
    for a, b in zip(gs, gn):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999


@pytest.mark.parametrize("n_buckets", [512, 1024, 4096])
def test_fused_bucket_counts(shapes, n_buckets):
    """`lovasz_buckets` dial: every supported split (incl. the paired-row
    kernel at <=1024 buckets and the 128-row split at 4096) stays within
    the O(1/B) envelope of the sort oracle."""
    li, lf, lbl, (H, W), c = shapes
    ref = fused_two_scale_lovasz(
        resize_bilinear(li, (H, W), True), resize_bilinear(lf, (H, W), True),
        lbl, 0.4, 1.0, impl="sort")
    got = fused_two_scale_bucket_lovasz_s8(li, lf, lbl, 0.4, 1.0,
                                           n_buckets=n_buckets)
    assert abs(float(got) - float(ref)) < 4e-3
    g = jax.grad(lambda a: fused_two_scale_bucket_lovasz_s8(
        a, lf, lbl, 0.4, 1.0, n_buckets=n_buckets))(li)
    gs = jax.grad(lambda a: fused_two_scale_lovasz(
        resize_bilinear(a, (H, W), True), resize_bilinear(lf, (H, W), True),
        lbl, 0.4, 1.0, impl="sort"))(li)
    a, b = np.asarray(g).ravel(), np.asarray(gs).ravel()
    assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.999


class TestSingleScaleFused:
    """Single-scale fused bucket Lovász (DeepLab/UPerNet recipes)."""

    def _data(self, c=5, seed=0):
        rng = np.random.default_rng(seed)
        n, h8, w8, H, W = 2, 17, 30, 136, 240
        lg = jnp.asarray(rng.normal(size=(n, h8, w8, c)).astype(np.float32)) * 2
        lbl = jnp.asarray(rng.integers(0, c, (n, H, W)).astype(np.int32))
        return lg, lbl, (H, W)

    @pytest.mark.parametrize("align_corners", [True, False])
    def test_value_and_grad_vs_sort(self, align_corners):
        from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
            lovasz_softmax)
        from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
            fused_bucket_lovasz_s8)
        lg, lbl, (H, W) = self._data()
        ref = lovasz_softmax(resize_bilinear(lg, (H, W), align_corners),
                             lbl, impl="sort")
        got = fused_bucket_lovasz_s8(lg, lbl, align_corners=align_corners)
        assert abs(float(got) - float(ref)) < 2e-3
        g = jax.grad(lambda a: fused_bucket_lovasz_s8(
            a, lbl, align_corners=align_corners))(lg)
        gs = jax.grad(lambda a: lovasz_softmax(
            resize_bilinear(a, (H, W), align_corners), lbl, impl="sort"))(lg)
        a, b = np.asarray(g).ravel(), np.asarray(gs).ravel()
        assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.999

    def test_class_modes_and_ignore(self):
        from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
            lovasz_softmax)
        from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
            fused_bucket_lovasz_s8)
        lg, lbl, (H, W) = self._data()
        up = resize_bilinear(lg, (H, W), True)
        for kwargs in ({"classes_to_consider": "all"},
                       {"classes_to_consider": [0, 2, 3]},
                       {"classes_to_ignore": 4}):
            ref = lovasz_softmax(up, lbl, impl="sort", **kwargs)
            got = fused_bucket_lovasz_s8(lg, lbl, **kwargs)
            assert abs(float(got) - float(ref)) < 2e-3, kwargs

    def test_odd_class_count_pairing_tail(self):
        """C=5 with 1024 buckets exercises the paired kernel + tail row."""
        from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
            lovasz_softmax)
        from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
            fused_bucket_lovasz_s8)
        lg, lbl, (H, W) = self._data(c=5, seed=3)
        ref = lovasz_softmax(resize_bilinear(lg, (H, W), True), lbl, impl="sort")
        got = fused_bucket_lovasz_s8(lg, lbl, n_buckets=1024)
        assert abs(float(got) - float(ref)) < 4e-3

    def test_build_loss_routes_single_s8(self):
        from miccai2021_cataract_semantic_segmentation_tpu.losses.functional import (
            lovasz_softmax)
        lg, lbl, (H, W) = self._data()
        up = resize_bilinear(lg, (H, W), True)
        loss_fn = build_loss({"name": "LovaszSoftmax", "lovasz_impl": "bucket"},
                             task=1)
        v_plain, _ = loss_fn({"logits": up}, lbl)
        v_fused, _ = loss_fn({"logits": up, "logits_s8": lg}, lbl)
        assert abs(float(v_fused) - float(v_plain)) < 2e-3
        # align_corners=False models route through the _acf key
        up0 = resize_bilinear(lg, (H, W), align_corners=False)
        v0, _ = loss_fn({"logits": up0, "logits_s8_acf": lg}, lbl)
        ref0 = lovasz_softmax(up0, lbl, impl="sort")
        assert abs(float(v0) - float(ref0)) < 2e-3

    def test_losswrapper_routes_single_s8(self):
        lg, lbl, (H, W) = self._data()
        up0 = resize_bilinear(lg, (H, W), align_corners=False)
        loss_fn = build_loss({"losses": {"LovaszSoftmax": 1},
                              "LovaszSoftmax": {"name": "LovaszSoftmax",
                                                "lovasz_impl": "bucket"}},
                             task=1)
        v_plain, _ = loss_fn({"logits": up0}, lbl)
        v_fused, _ = loss_fn({"logits": up0, "logits_s8_acf": lg}, lbl)
        assert abs(float(v_fused) - float(v_plain)) < 2e-3
