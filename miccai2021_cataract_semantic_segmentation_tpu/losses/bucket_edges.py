"""Bucket-edge maps for the histogram (bucket) Lovász kernels.

The bucket Lovász quantises per-pixel errors e = |fg - p| in [0, 1] into B
buckets (losses/bucket_lovasz.py, losses/fused_lovasz.py). With UNIFORM
edges (bid = floor(e*B)) the within-bucket gradient smearing is worst
exactly where errors concentrate: after a few epochs almost every pixel
has e near 0 (confident correct) or e near 1 (confident wrong — the
rare-class foregrounds the Lovász gradient weights most, reference
losses/LovaszSoftmax.py:34-61), so the buckets that hold the most pixels
and steepest Jaccard slopes are the coarsest relative to their content.

ADAPTIVE edges spend resolution logarithmically toward BOTH ends: with
u = min(e, 1-e), buckets are per-octave linear in u over 16 octaves
(u from 2^-17 to 0.5), mirrored around e = 0.5. The bucket id needs no
in-kernel gather or searchsorted: for positive f32, the exponent+mantissa
bit pattern is monotone, so

    bid = (bitcast_i32(max(u, 2^-17)) >> (23 - j)) - q0      [j sub-octave bits]

is a shift+subtract — ~4 extra VPU integer ops per element vs uniform.
The map is monotone in e (the high side mirrors via B-1-q), so the
descending-order prefix walk in _losses_and_tables is unchanged; only the
midpoint table used to reconstruct the loss VALUE from counts differs.

At B=256 adaptive edges are ~4-30x finer than uniform below e≈0.03 and
above e≈0.97, and up to 8x coarser mid-range — the trade the trajectory
twins measure (tools/trajectory_twins.py --edges adaptive, PERF.md §4.2).
"""
from __future__ import annotations

import numpy as np

_OCTAVES = 16            # default u-octave count ("adaptive"); e_min = 2^-17


def _parse_mode(edges: str) -> int:
    """'adaptive' -> 16 octaves; 'adaptiveN' -> N octaves (power of two).
    Fewer octaves trade dynamic range near 0/1 for finer mid-range buckets
    (each octave gets half/N_oct sub-buckets): mid-training fg errors sit in
    [0.05, 0.5], where the 16-octave map measured WORSE than uniform in the
    200-step twins (PERF.md §4.2) — the octave count is the dial."""
    if edges == "adaptive":
        return _OCTAVES
    if edges.startswith("adaptive"):
        n = int(edges[len("adaptive"):])
        if n < 1 or n & (n - 1):
            raise ValueError(f"octave count must be a power of two: '{edges}'")
        return n
    raise ValueError(f"unknown edges mode '{edges}'")


def _adaptive_split(n_buckets: int, octaves: int) -> tuple[int, int]:
    """(half, j): half buckets per side, 2^j sub-buckets per octave."""
    half = n_buckets // 2
    if half < octaves or 2 * half != n_buckets:
        raise ValueError(
            f"adaptive edges need n_buckets = 2 * {octaves} * 2^k, "
            f"got {n_buckets}")
    j = int(round(np.log2(half / octaves)))
    if octaves * (1 << j) != half:
        raise ValueError(
            f"adaptive edges need n_buckets = 2 * {octaves} * 2^k, "
            f"got {n_buckets}")
    return half, j


def bucket_edges(n_buckets: int, edges: str = "uniform") -> np.ndarray:
    """(B+1,) float64 bucket edge array; edges[0] = 0, edges[B] = 1."""
    if edges == "uniform":
        return np.linspace(0.0, 1.0, n_buckets + 1)
    octaves = _parse_mode(edges)
    half, j = _adaptive_split(n_buckets, octaves)
    exp0 = 127 - (octaves + 1)         # f32 exponent field of u_min
    qs = np.arange(half + 1, dtype=np.int64)
    bits = ((exp0 << j) + qs) << (23 - j)
    lo = bits.astype(np.uint32).view(np.float32).astype(np.float64)
    lo[0] = 0.0        # bucket 0 absorbs u < 2^-(octaves+1); edge q=half is 0.5
    hi = 1.0 - lo[::-1]    # mirror for the e >= 0.5 side
    return np.concatenate([lo, hi[1:]])


def bucket_midpoints_np(n_buckets: int, edges: str = "uniform") -> np.ndarray:
    """(B,) f32 representative error per bucket for reconstructing the se
    sums from counts (fused_lovasz._bucket_midpoints contract): arithmetic
    midpoints of the edge pairs. Pure count->value mapping — the VJP's
    gradient tables never consume it, so the edge mode cannot change
    gradients beyond the bucket-assignment itself."""
    e = bucket_edges(n_buckets, edges)
    return (0.5 * (e[:-1] + e[1:])).astype(np.float32)


def bucket_id_np(e: np.ndarray, n_buckets: int,
                 edges: str = "uniform") -> np.ndarray:
    """Numpy twin of the in-kernel bucket-id map (tests + host tooling)."""
    e = np.asarray(e, np.float32)
    if edges == "uniform":
        return np.minimum((e * n_buckets).astype(np.int32), n_buckets - 1)
    octaves = _parse_mode(edges)
    half, j = _adaptive_split(n_buckets, octaves)
    exp0 = 127 - (octaves + 1)
    u = np.minimum(e, np.float32(1.0) - e)
    uc = np.maximum(u, np.float32(2.0 ** -(octaves + 1)))
    q = (uc.view(np.int32) >> (23 - j)) - (exp0 << j)
    q = np.minimum(q, half - 1)
    return np.where(e < 0.5, q, (n_buckets - 1) - q).astype(np.int32)


# ---------------------------------------------------------------------------
# Per-pixel dither (stochastic quantisation). With fixed uniform edges the
# bucket map floor(e*B) systematically groups each pixel with the same
# neighbours every step, and the 3-seed twins measured a small but
# consistent upward trajectory bias at B=256 (PERF.md 4.2.1). Subtractive
# dither replaces the fixed map with floor(e*B + d - 1/2), d ~ U[0, 1)
# drawn from a counter-based hash of (global pixel index, step seed):
# E_d[floor(x + d - 1/2)] = x - 1/2 + E[d] + ... = x exactly, so the
# assignment is UNBIASED in expectation over steps — systematic smearing
# becomes zero-mean noise that SGD averages out. The hash is stateless
# (murmur3 finalizer), so the backward kernel reproduces the forward's
# bucket ids bit-exactly from the same (index, seed) regardless of its
# different block height — gradients stay exact for the sampled loss.
# ---------------------------------------------------------------------------

# murmur3 fmix32 constants as signed int32 (TPU kernels compute in int32;
# multiplication wraps two's-complement in both XLA and numpy uint32)
_FMIX_C1 = -2048144789      # 0x85EBCA6B
_FMIX_C2 = -1028477387      # 0xC2B2AE35


def fmix32_np(h: np.ndarray) -> np.ndarray:
    """murmur3 finalizer on uint32 arrays — the numpy twin of the in-kernel
    hash (wraparound multiply, logical shifts)."""
    h = h.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


def dither_unit_np(idx: np.ndarray, seed: int) -> np.ndarray:
    """d in [0, 1): 16-bit uniform from hash(global pixel index ^ seed)."""
    h = fmix32_np(idx.astype(np.uint32) ^ np.uint32(seed & 0xFFFFFFFF))
    return (h & np.uint32(0xFFFF)).astype(np.float32) * np.float32(1 / 65536)


def dithered_bucket_id_np(e: np.ndarray, idx: np.ndarray, seed: int,
                          n_buckets: int) -> np.ndarray:
    """Numpy twin of the in-kernel dithered (uniform-edge) bucket map:
    bid = clip(floor(e*B + d - 1/2), 0, B-1), via the shifted-error form
    the kernels use (e' = e + (d - 1/2)/B through the standard uniform map,
    whose int32 truncation-toward-zero clamps the e' < 0 tail to bucket 0)."""
    d = dither_unit_np(idx, seed)
    e2 = e.astype(np.float32) + (d - np.float32(0.5)) / np.float32(n_buckets)
    return np.minimum((e2 * n_buckets).astype(np.int32), n_buckets - 1)


def fmix32_jax(h):
    """In-kernel murmur3 finalizer on int32 (Pallas/TPU traceable)."""
    import jax
    sr = jax.lax.shift_right_logical
    h = h ^ sr(h, 16)
    h = h * np.int32(_FMIX_C1)
    h = h ^ sr(h, 13)
    h = h * np.int32(_FMIX_C2)
    return h ^ sr(h, 16)


def make_bid_fn(n_buckets: int, edges: str = "uniform"):
    """In-kernel bucket-id function: f32 error array -> int32 bucket ids.
    Traceable inside Pallas TPU kernels (bitcast + shift are VPU ops)."""
    import jax
    import jax.numpy as jnp

    if edges == "uniform":
        def bid_uniform(e):
            return jnp.minimum((e * n_buckets).astype(jnp.int32),
                               n_buckets - 1)
        return bid_uniform
    octaves = _parse_mode(edges)
    half, j = _adaptive_split(n_buckets, octaves)
    q0 = (127 - (octaves + 1)) << j
    shift = 23 - j
    e_min = np.float32(2.0 ** -(octaves + 1))

    def bid_adaptive(e):
        u = jnp.minimum(e, 1.0 - e)
        uc = jnp.maximum(u, e_min)
        q = jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(uc, jnp.int32), shift) - q0
        q = jnp.minimum(q, half - 1)
        return jnp.where(e < 0.5, q, (n_buckets - 1) - q)

    return bid_adaptive
