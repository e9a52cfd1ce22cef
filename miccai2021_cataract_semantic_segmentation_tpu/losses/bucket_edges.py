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
