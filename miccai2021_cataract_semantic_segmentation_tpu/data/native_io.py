"""ctypes bindings for the native (C++) host data path — libpng decode +
LUT remap + resize running on a std::thread pool (native/cadis_io.cpp).

This is the TPU framework's equivalent of the reference's OpenCV C++ layer
(cv2.imread in datasets/Dataset_from_df.py:36-47). The library auto-builds
with g++ on first use; every entry point has a Python/cv2 fallback so the
framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libcadis_io.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.is_file()
    except Exception:
        return False


def get_lib():
    """The loaded shared library, building it on first use; None if
    unavailable (no g++/libpng)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.is_file() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.cadis_decode_png.restype = ctypes.c_int
    lib.cadis_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.cadis_load_batch.restype = None
    lib.cadis_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.cadis_resize_bilinear_u8.restype = None
    lib.cadis_resize_bilinear_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_png(path: str, channels: int = 3) -> np.ndarray:
    """Decode one PNG to (H,W,3) RGB or (H,W) gray uint8."""
    lib = get_lib()
    assert lib is not None, "native IO library unavailable"
    # probe dimensions with a zero-expectation decode into a probe buffer is
    # wasteful; read the 8-byte IHDR instead
    h, w = png_dimensions(path)
    out = np.empty((h, w, channels) if channels == 3 else (h, w), np.uint8)
    gh, gw = ctypes.c_int(), ctypes.c_int()
    rc = lib.cadis_decode_png(str(path).encode(), _u8ptr(out), channels,
                              h, w, ctypes.byref(gh), ctypes.byref(gw))
    if rc != 0:
        raise IOError(f"PNG decode failed ({rc}): {path}")
    return out


def png_dimensions(path: str) -> tuple[int, int]:
    """(height, width) from the PNG IHDR without decoding."""
    with open(path, "rb") as f:
        header = f.read(24)
    if header[:8] != b"\x89PNG\r\n\x1a\n" or header[12:16] != b"IHDR":
        raise IOError(f"not a PNG: {path}")
    w = int.from_bytes(header[16:20], "big")
    h = int.from_bytes(header[20:24], "big")
    return h, w


def load_batch(img_paths, lbl_paths, h: int, w: int,
               lut: np.ndarray | None = None, n_threads: int = 0
               ) -> tuple[np.ndarray, np.ndarray]:
    """Parallel decode of n (image, label) pairs into (n,h,w,3) u8 and
    (n,h,w) u8, labels remapped through `lut` (256,) in C++."""
    lib = get_lib()
    assert lib is not None, "native IO library unavailable"
    n = len(img_paths)
    imgs = np.empty((n, h, w, 3), np.uint8)
    lbls = np.empty((n, h, w), np.uint8)
    status = np.zeros(n, np.int32)
    ImgArr = ctypes.c_char_p * n
    img_arr = ImgArr(*[str(p).encode() for p in img_paths])
    lbl_arr = ImgArr(*[str(p).encode() for p in lbl_paths])
    lut_ptr = _u8ptr(np.ascontiguousarray(lut, np.uint8)) if lut is not None \
        else ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    lib.cadis_load_batch(img_arr, lbl_arr, n, h, w, lut_ptr, _u8ptr(imgs),
                         _u8ptr(lbls),
                         status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                         n_threads)
    bad = np.nonzero(status)[0]
    if len(bad):
        raise IOError(f"batch decode failed for items {bad.tolist()} "
                      f"(status {status[bad].tolist()}), first: {img_paths[bad[0]]}")
    return imgs, lbls


def resize_bilinear_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None, "native IO library unavailable"
    img = np.ascontiguousarray(img)
    ch = 1 if img.ndim == 2 else img.shape[2]
    out_shape = (dh, dw) if img.ndim == 2 else (dh, dw, ch)
    out = np.empty(out_shape, np.uint8)
    lib.cadis_resize_bilinear_u8(_u8ptr(img), img.shape[0], img.shape[1], ch,
                                 _u8ptr(out), dh, dw)
    return out
