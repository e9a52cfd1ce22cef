"""Host-side (numpy/cv2) joint image+label transforms.

TPU-first split of the reference's utils/transforms.py: the default training
recipe (pad / flip / blur / colorjitter / normalise — configs/*_rf_lvsz.json)
runs fused ON DEVICE (ops/augment.py). The transforms here are the ones
that genuinely belong on the host: geometric warps that change the crop
(AffineNP, CropNP) and the validation pad. `build_transform_pipeline`
parses the reference's transform-name list (utils/utils.py:332-450) and
returns (host_fn, device_spec): host_fn maps (img u8 HWC, lbl u8 HW, rng) ->
(img, lbl); device_spec configures the on-device augmentation step.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import cv2
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.data.dataframe import task_count_matrix  # noqa: F401 (re-export convenience)


def pad_reflect(arr: np.ndarray, ver=(2, 2), hor=(0, 0)) -> np.ndarray:
    """PadNP: 540x960 -> 544x960 vertical reflect pad (transforms.py:8-20)."""
    widths = (ver, hor) + (((0, 0),) if arr.ndim == 3 else ())
    return np.pad(arr, widths, mode="reflect")


def random_flip(img, lbl, rng: np.random.Generator, prob=(0.0, 0.5)):
    """Joint ver/hor flip (FlipNP, transforms.py:222-239)."""
    if rng.random() < prob[0]:
        img, lbl = img[::-1], lbl[::-1]
    if rng.random() < prob[1]:
        img, lbl = img[:, ::-1], lbl[:, ::-1]
    return np.ascontiguousarray(img), np.ascontiguousarray(lbl)


# ---------------------------------------------------------------------------
# Affine (shift . rot . shear homography), optional crop-to-valid
# ---------------------------------------------------------------------------

def _shift_m(ver, hor):
    m = np.eye(3)
    m[0, 2], m[1, 2] = hor, ver
    return m


def _rot_m(cy, cx, deg):
    r = np.radians(deg)
    m = np.eye(3)
    m[:2, :2] = [[np.cos(r), -np.sin(r)], [np.sin(r), np.cos(r)]]
    return _shift_m(cy, cx) @ m @ _shift_m(-cy, -cx)


def _shear_m(cy, cx, sv, sh):
    m = np.eye(3)
    m[1, 0], m[0, 1] = sv, sh
    return _shift_m(cy, cx) @ m @ _shift_m(-cy, -cx)


def largest_valid_rect(valid: np.ndarray, aspect_hw: tuple[int, int],
                       scale: int = 16) -> tuple[int, int, int, int]:
    """Largest axis-aligned rectangle of the target aspect ratio inside a
    validity mask, by exhaustive scan on a `scale`-downsampled grid.

    Replaces the reference's boundary-point heuristic (transforms.py:114-219)
    with an exact-on-the-grid O(HW) histogram-of-heights search.
    Returns (v0, v1, h0, h1) in full-resolution pixel coords.
    """
    m = (valid[::scale, ::scale] > 0.5).astype(np.int32)
    H, W = m.shape
    ratio = aspect_hw[0] / aspect_hw[1]  # h = ratio * w
    heights = np.zeros(W, np.int32)
    best = (0, 0, H, W)  # v0,h0,v1,h1 fallback: whole grid
    best_area = -1.0
    for r in range(H):
        heights = np.where(m[r] > 0, heights + 1, 0)
        # for each column, widest run ending constraints via stack scan
        stack: list[int] = []
        for c in range(W + 1):
            h = heights[c] if c < W else 0
            start = c
            while stack and heights[stack[-1]] >= h:
                top = stack.pop()
                height = heights[top]
                width = c - top
                # clip to aspect ratio
                w_fit = min(width, height / ratio)
                h_fit = w_fit * ratio
                area = w_fit * h_fit
                if area > best_area:
                    best_area = area
                    best = (r + 1 - int(h_fit), top, r + 1, top + int(w_fit))
                start = top
            stack.append(start)
    v0, h0, v1, h1 = best
    return v0 * scale, max(v1 * scale - 1, v0 * scale + 1), \
        h0 * scale, max(h1 * scale - 1, h0 * scale + 1)


@dataclass
class AffineTransform:
    """Joint warp of img + validity mask + label through a random
    shift.rot.shear homography (AffineNP, transforms.py:23-99).

    The label is warped as a single channel with nearest-neighbour sampling —
    equivalent to the reference's one-hot bilinear warp + argmax for the
    non-crop path and far cheaper; crop_to_fit resizes with nearest labels.
    """
    rotation: float = 10.0
    rot_centre_offset: tuple = (0.25, 0.25)
    shift: float = 0.1
    shear: tuple = (0.1, 0.1)
    shear_centre_offset: tuple = (0.25, 0.25)
    crop_to_fit: bool = False

    def __call__(self, img, lbl, rng: np.random.Generator):
        h, w = lbl.shape
        rot = self.rotation * (2 * rng.random() - 1)
        rcy = int(round(h * (0.5 + self.rot_centre_offset[0] * (2 * rng.random() - 1))))
        rcx = int(round(w * (0.5 + self.rot_centre_offset[1] * (2 * rng.random() - 1))))
        sv = int(round(h * self.shift * rng.random()))
        sh = int(round(w * self.shift * rng.random()))
        shv = self.shear[0] * (2 * rng.random() - 1)
        shh = self.shear[1] * (2 * rng.random() - 1)
        scy = int(round(h * (0.5 + self.shear_centre_offset[0] * (2 * rng.random() - 1))))
        scx = int(round(w * (0.5 + self.shear_centre_offset[1] * (2 * rng.random() - 1))))
        matrix = _shift_m(sv, sh) @ _rot_m(rcy, rcx, rot) @ _shear_m(scy, scx, shv, shh)

        out_size = (w * 2, h * 2) if self.crop_to_fit else (w, h)
        img_w = cv2.warpPerspective(img, matrix, out_size)
        lbl_w = cv2.warpPerspective(lbl, matrix, out_size, flags=cv2.INTER_NEAREST)
        if not self.crop_to_fit:
            return img_w, lbl_w
        valid = cv2.warpPerspective(np.ones((h, w), np.float32), matrix, out_size)
        v0, v1, h0, h1 = largest_valid_rect(valid, (h, w))
        img_c = cv2.resize(img_w[v0:v1, h0:h1], (w, h))
        lbl_c = cv2.resize(lbl_w[v0:v1, h0:h1], (w, h), interpolation=cv2.INTER_NEAREST)
        return img_c, lbl_c


@dataclass
class CropTransform:
    """Random or class-frequency-weighted square crop snapped to x32
    (CropNP, transforms.py:254-303)."""
    size: float = 0.4
    mode: str = "random"
    task: int = 2

    def __post_init__(self):
        sums = np.zeros(taxonomy.num_label_values(self.task))
        for task_id, canon_ids in taxonomy.TASK_GROUPS[self.task].items():
            col = len(sums) - 1 if task_id == taxonomy.IGNORE_VALUE else task_id
            sums[col] = taxonomy.CLASS_SUMS[list(canon_ids)].sum()
        self.class_frequencies = sums / sums.sum()

    def __call__(self, img, lbl, rng: np.random.Generator):
        h, w = lbl.shape
        crop = int(32 * ((self.size * h) // 32))
        if crop >= h or crop >= w:
            crop = min(h, w)
        if self.mode == "random":
            v = rng.integers(0, max(h - crop, 1))
            hh = rng.integers(0, max(w - crop, 1))
        elif self.mode == "freq":
            margin = crop // 2
            window = lbl[margin:h - margin, margin:h - margin]
            probs = 1.0 / self.class_frequencies[window]
            probs = probs / probs.sum()
            pick = rng.choice(probs.size, p=probs.ravel())
            v = pick // probs.shape[1]
            hh = pick % probs.shape[1]
        else:
            raise ValueError(f"crop mode '{self.mode}' not recognised")
        return (np.ascontiguousarray(img[v:v + crop, hh:hh + crop]),
                np.ascontiguousarray(lbl[v:v + crop, hh:hh + crop]))


# ---------------------------------------------------------------------------
# Pipeline parsing
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DeviceAugmentSpec:
    """What the on-device fused augmentation step should do (ops/augment.py).
    Frozen/hashable so it can be a static jit argument."""
    pad: bool = False
    flip: bool = False
    blur: bool = False
    colorjitter: bool = False
    pseudo_colorjitter_strength: int | None = None
    normalise: bool = False


@dataclass
class TransformPipeline:
    host_train: list = field(default_factory=list)
    device: DeviceAugmentSpec = field(default_factory=DeviceAugmentSpec)
    valid_pad: bool = False

    def apply_host(self, img, lbl, rng):
        for t in self.host_train:
            img, lbl = t(img, lbl, rng)
        return img, lbl


def build_transform_pipeline(transform_list, transform_values: dict,
                             task: int) -> TransformPipeline:
    """Parse the reference's transform-name vocabulary
    (utils/utils.py:332-450) into host + device stages."""
    p = TransformPipeline()
    names = [t for t in transform_list if isinstance(t, str)]

    rotation, shift, shear = 0.0, 0.0, (0.0, 0.0)
    rc_off = (0.2, 0.2)
    set_affine = False
    if "rot" in names:
        rotation, set_affine = 15.0, True
    if "shift" in names:
        shift, set_affine = 0.1, True
    if "shear" in names:
        shear, set_affine = (0.1, 0.1), True
    if "affine" in names:
        rotation, shear, rc_off, set_affine = 10.0, (0.1, 0.1), (0.1, 0.1), True
    if set_affine:
        p.host_train.append(AffineTransform(
            rotation=rotation, rot_centre_offset=rc_off, shift=shift,
            shear=shear, shear_centre_offset=(0.2, 0.2), crop_to_fit=False))
    if "crop" in names:
        p.host_train.append(CropTransform(
            size=transform_values.get("crop_size", 0.4),
            mode=transform_values.get("crop_mode", "random"), task=task))

    strength = None
    if "pseudo_colorjitter" in names:
        strength = 2
        for e in transform_list:
            if isinstance(e, dict) and "strength" in e:
                strength = e["strength"]
    p.device = DeviceAugmentSpec(
        pad="pad" in names and "crop" not in names,  # train pad only without crop
        flip="flip" in names,
        blur="blur" in names,
        colorjitter="colorjitter" in names,
        pseudo_colorjitter_strength=strength,
        normalise="torchvision_normalise" in names,
    )
    p.valid_pad = "pad" in names
    return p
