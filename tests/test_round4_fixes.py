"""Round-4 review items (VERDICT r3): bucket-dial envelope guard and the
v4 in-kernel-upsample fused Lovász plumbing."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss


def _two_scale_cfg(n_buckets):
    return {"name": "TwoScaleLoss", "lovasz_impl": "bucket",
            "lovasz_buckets": n_buckets,
            "interm": {"name": "LovaszSoftmax", "weight": 0.4},
            "final": {"name": "LovaszSoftmax", "weight": 1.0}}


def test_bucket_dial_below_envelope_warns():
    """lovasz_buckets < 1024 leaves the twin-verified envelope (PERF.md 4.1
    measured 3.5%/5.4% trajectory divergence at 512/256) — build_loss must
    say so instead of silently accepting the dial (VERDICT r3 item 6)."""
    with pytest.warns(UserWarning, match="twin-verified envelope"):
        build_loss(_two_scale_cfg(512), task=2)
    with pytest.warns(UserWarning, match="twin-verified envelope"):
        build_loss({"name": "LovaszSoftmax", "lovasz_impl": "bucket",
                    "lovasz_buckets": 256}, task=2)


def test_bucket_dial_default_is_silent():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_loss(_two_scale_cfg(1024), task=2)
        build_loss(_two_scale_cfg(2048), task=2)
        # sort impl never warns regardless of a stale buckets key
        build_loss({"name": "LovaszSoftmax", "lovasz_buckets": 64}, task=2)


def test_v4_packed_prep_round_trip():
    """_fu_prep's packed (N, hs_pad, R*ws_pad) layout must invert exactly
    through the unpack used by the VJP (losses/fused_lovasz.py)."""
    from miccai2021_cataract_semantic_segmentation_tpu.losses.fused_lovasz import (
        _fu_prep)
    rng = np.random.default_rng(0)
    n, hs, ws, c = 2, 9, 12, 4
    li = jnp.asarray(rng.normal(size=(n, hs, ws, c)).astype(np.float32))
    lf = jnp.asarray(rng.normal(size=(n, hs, ws, c)).astype(np.float32))
    hs_pad, ws_pad = 16, 128
    ls2d = _fu_prep([li, lf], hs_pad, ws_pad)
    assert ls2d.shape == (n, hs_pad, 2 * c * ws_pad)
    back = ls2d.reshape(n, hs_pad, 2 * c, ws_pad)[:, :hs, :, :ws]
    back = back.transpose(0, 1, 3, 2)
    np.testing.assert_array_equal(np.asarray(back[..., :c]), np.asarray(li))
    np.testing.assert_array_equal(np.asarray(back[..., c:]), np.asarray(lf))


def test_flagship_mesh_dryrun_runs_in_suite():
    """The exact shipped flagship combination — OCRNet-R50-os8 +
    `lovasz_impl: bucket` (fused Pallas kernels, interpret off-TPU) through
    the per-shard shard_map loss on a (4,2) data x model mesh, plus an eval
    step and an orbax save/restore round-trip under the mesh — must
    execute end to end (VERDICT r3 item 2; found+fixed: pallas_call inside
    shard_map requires check_vma=False, train/steps.py:_sharded_loss)."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_v4_matches_v3_kernels_value_and_grad():
    """The v4 (in-kernel upsample) and v3 (pre-upsampled grids) paths are
    the same math — values and gradients must agree to float rounding."""
    from miccai2021_cataract_semantic_segmentation_tpu.losses import (
        fused_lovasz as fl)
    rng = np.random.default_rng(1)
    n, hs, ws, c, H, W = 1, 9, 12, 4, 68, 96
    li = jnp.asarray(rng.normal(size=(n, hs, ws, c)).astype(np.float32))
    lf = jnp.asarray(rng.normal(size=(n, hs, ws, c)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, c, (n, H, W)).astype(np.int32))

    def loss(v3):
        def f(a, b):
            old = fl._USE_V3
            fl._USE_V3 = v3
            try:
                return fl.fused_two_scale_bucket_lovasz_s8(a, b, lbl, 0.4, 1.0)
            finally:
                fl._USE_V3 = old
        return f

    v3 = float(loss(True)(li, lf))
    v4 = float(loss(False)(li, lf))
    assert abs(v3 - v4) < 1e-5
    g3 = jax.grad(loss(True), argnums=(0, 1))(li, lf)
    g4 = jax.grad(loss(False), argnums=(0, 1))(li, lf)
    for a, b in zip(g3, g4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)
