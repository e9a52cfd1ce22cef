"""Resize parity vs torch's bilinear interpolation (both corner conventions)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from miccai2021_cataract_semantic_segmentation_tpu.ops import resize_bilinear


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape,size", [
    ((2, 8, 12, 3), (17, 29)),   # upsample
    ((1, 16, 16, 4), (7, 5)),    # downsample
    ((1, 68, 120, 2), (272, 480)),  # stride-8-style logit upsample (scaled down for 1-cpu CI)
])
def test_matches_torch(align_corners, shape, size):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=align_corners))
    theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
                           mode="bilinear", align_corners=align_corners)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=5e-5)


def test_identity():
    x = jnp.ones((1, 4, 4, 2))
    y = resize_bilinear(x, (4, 4))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_hwc_input():
    x = jnp.arange(12.0).reshape(2, 3, 2)
    y = resize_bilinear(x, (4, 6), align_corners=True)
    assert y.shape == (4, 6, 2)
