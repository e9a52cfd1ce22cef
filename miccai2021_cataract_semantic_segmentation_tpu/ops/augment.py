"""Fused on-device augmentation for the default CaDIS training recipe.

The reference runs pad / flip / blur / colorjitter / normalise per-sample in
Python DataLoader workers (utils/transforms.py, torchvision ColorJitter).
Here the whole default recipe is one jittable, vectorised function over the
uint8 batch — it fuses into the forward pass, the host only ships raw uint8
frames, and per-sample randomness comes from a single threaded PRNG key.

Parity notes:
  * ColorJitter: factor ranges and per-op math match torchvision's
    semantics (brightness/contrast/saturation blend, hue shift in HSV).
    DEVIATION: torchvision applies the four ops in a per-sample random
    permutation; we apply them in a FIXED order (brightness, contrast,
    saturation, hue) because a vmapped lax.switch over permutations runs
    every branch for every image (see color_jitter's docstring for the
    cost analysis). Recorded in COVERAGE.md.
  * Blur: PIL GaussianBlur with radius ~ U{3..6} applied with prob 0.05
    (transforms.py:242-251); implemented as a separable gaussian with a
    static 37-tap kernel whose sigma is per-sample (sigma=0 -> identity tap).
  * Pad: 540x960 -> 544x960 vertical reflect (transforms.py:8-20).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import DeviceAugmentSpec

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])

_BLUR_RADIUS = 18  # 3 * max sigma (6); static tap count 37


def pad_reflect_hw(x: jnp.ndarray, ver: int = 2) -> jnp.ndarray:
    """(B,H,W,...) -> (B,H+2*ver,W,...) vertical reflect pad."""
    widths = [(0, 0), (ver, ver)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, widths, mode="reflect")


# ---------------------------------------------------------------------------
# Colour ops (torchvision functional semantics, [0,1] float RGB)
# ---------------------------------------------------------------------------

def _grayscale(x):
    w = jnp.array([0.299, 0.587, 0.114])
    return jnp.sum(x * w, axis=-1, keepdims=True)


def adjust_brightness(x, f):
    return jnp.clip(x * f, 0.0, 1.0)


def adjust_contrast(x, f):
    mean = jnp.mean(_grayscale(x), axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(x * f + mean * (1 - f), 0.0, 1.0)


def adjust_saturation(x, f):
    return jnp.clip(x * f + _grayscale(x) * (1 - f), 0.0, 1.0)


def rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(mx == r, (g - b) / safe % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(x):
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    conds = [jnp.stack([v, t, p], -1), jnp.stack([q, v, p], -1),
             jnp.stack([p, v, t], -1), jnp.stack([p, q, v], -1),
             jnp.stack([t, p, v], -1), jnp.stack([v, p, q], -1)]
    out = conds[0]
    for k in range(1, 6):
        out = jnp.where((i == k)[..., None], conds[k], out)
    return out


def adjust_hue(x, f):
    hsv = rgb_to_hsv(x)
    h = (hsv[..., 0] + f) % 1.0
    return jnp.clip(hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], -1)), 0.0, 1.0)


def color_jitter(rng, x, brightness=(2 / 3, 1.5), contrast=(2 / 3, 1.5),
                 saturation=(2 / 3, 1.5), hue=(-0.05, 0.05)):
    """Per-image jitter of a single image (H,W,3 float in [0,1]); callers
    vmap over the batch.

    TPU note: torchvision applies the four ops in a random permutation, but
    under vmap a lax.switch over the permutation executes ALL branches for
    every image (16 full-image passes + 4 HSV round-trips). Factor ranges
    are symmetric, so a fixed order has a near-identical augmentation
    distribution at 1/4 the cost — we apply brightness, contrast,
    saturation, hue in fixed order (each exactly once)."""
    kb, kc, ks, kh = jax.random.split(rng, 4)
    fb = jax.random.uniform(kb, minval=brightness[0], maxval=brightness[1])
    fc = jax.random.uniform(kc, minval=contrast[0], maxval=contrast[1])
    fs = jax.random.uniform(ks, minval=saturation[0], maxval=saturation[1])
    fh = jax.random.uniform(kh, minval=hue[0], maxval=hue[1])
    x = adjust_brightness(x, fb)
    x = adjust_contrast(x, fc)
    x = adjust_saturation(x, fs)
    x = adjust_hue(x, fh)
    return x


# ---------------------------------------------------------------------------
# Blur
# ---------------------------------------------------------------------------

def _gaussian_taps(sigma):
    """(2R+1,) normalised taps; sigma==0 yields an identity (delta) kernel."""
    r = jnp.arange(-_BLUR_RADIUS, _BLUR_RADIUS + 1, dtype=jnp.float32)
    safe = jnp.maximum(sigma, 1e-6)
    w = jnp.exp(-0.5 * (r / safe) ** 2)
    w = jnp.where(sigma > 0, w, (r == 0).astype(jnp.float32))
    return w / jnp.sum(w)


def gaussian_blur(x, sigma):
    """Separable depthwise blur of one image (H,W,C), scalar sigma (0 = no-op)."""
    c = x.shape[-1]
    taps = _gaussian_taps(sigma)
    k = taps.shape[0]
    kern_v = jnp.broadcast_to(taps.reshape(k, 1, 1, 1), (k, 1, 1, c))
    kern_h = jnp.broadcast_to(taps.reshape(1, k, 1, 1), (1, k, 1, c))
    xp = jnp.pad(x, ((_BLUR_RADIUS, _BLUR_RADIUS), (0, 0), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp[None], kern_v, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    yp = jnp.pad(y, ((0, 0), (_BLUR_RADIUS, _BLUR_RADIUS), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        yp[None], kern_h, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return z


# ---------------------------------------------------------------------------
# Full fused pipeline
# ---------------------------------------------------------------------------

def _augment_one(rng, img_f32, spec: DeviceAugmentSpec):
    kf, kj = jax.random.split(rng, 2)
    if spec.colorjitter:
        img_f32 = color_jitter(kj, img_f32)
    elif spec.pseudo_colorjitter_strength is not None:
        s = spec.pseudo_colorjitter_strength
        ext = (1 - s * 0.25, 1 + s * 0.25)
        do = jax.random.uniform(kf) < 0.7  # RandomApply p=0.7 (utils.py:435)
        jittered = color_jitter(kj, img_f32, ext, ext, ext, (-0.02 * s, 0.02 * s))
        img_f32 = jnp.where(do, jittered, img_f32)
    return img_f32


def _blur_batch(rng, x):
    """Per-image blur with prob 0.05 and radius U{3..6} (transforms.py:242-251).

    The 37-tap separable conv is gated behind a batch-level lax.cond: with
    bs=8 only ~34% of steps have any blurred image, so ~66% of steps skip
    the convs entirely at runtime (a vmapped per-image cond would execute
    both branches for every image)."""
    n = x.shape[0]
    kp, ks = jax.random.split(rng)
    do = jax.random.uniform(kp, (n,)) < 0.05
    sigma = jax.random.randint(ks, (n,), 3, 7).astype(jnp.float32)
    sigma = jnp.where(do, sigma, 0.0)
    return jax.lax.cond(
        jnp.any(do),
        lambda x: jax.vmap(gaussian_blur)(x, sigma),
        lambda x: x,
        x)


@partial(jax.jit, static_argnames=("spec", "train"))
def augment_batch(rng, images_u8: jnp.ndarray, labels: jnp.ndarray,
                  spec: DeviceAugmentSpec, train: bool = True):
    """uint8 NHWC images + int NHW labels -> (f32 images, i32 labels).

    Order matches the reference pipeline: common flips first, then pad, then
    per-image photometric ops, then normalise. `spec` is static (hashable
    dataclass) so each recipe compiles once.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    lbl = labels.astype(jnp.int32)
    n = x.shape[0]
    rngs = jax.random.split(rng, n + 2)
    if train and spec.flip:
        flip = jax.random.uniform(rngs[0], (n,)) < 0.5
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1], x)
        lbl = jnp.where(flip[:, None, None], lbl[:, :, ::-1], lbl)
    if spec.pad:
        x = pad_reflect_hw(x)
        lbl = pad_reflect_hw(lbl)
    if train and spec.blur:
        x = _blur_batch(rngs[1], x)
    if train and (spec.colorjitter
                  or spec.pseudo_colorjitter_strength is not None):
        x = jax.vmap(lambda r, im: _augment_one(r, im, spec))(rngs[2:], x)
    if spec.normalise:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x, lbl
