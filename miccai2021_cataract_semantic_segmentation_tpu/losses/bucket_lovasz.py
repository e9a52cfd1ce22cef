"""Bucketed Lovász-Softmax — a sort-free TPU formulation.

The exact Lovász term per class is an integral over error thresholds:

    L_c = sum_i e_(i) (J(i) - J(i-1)) = ∫_0^1 J(N(t), F(t)) dt

where N(t) / F(t) count pixels (resp. foreground pixels) with error >= t and
J(n, f) = 1 - (G - f) / (G + n - f). Quantising errors to B buckets turns
the integral into a prefix-sum over a per-class histogram — no sort at all.
Within a bucket the contribution telescopes exactly; using each bucket's
MEAN error (tracked as a sum histogram) instead of the bucket midpoint makes
the estimate exact up to within-bucket error-vs-rank correlation, giving
|L_bucket - L_sort| = O(1/B) (empirically ~1e-4..1e-3 at B=2048 on CaDIS
shapes) and gradient cosine > 0.9999 vs the sort path.

TPU mapping: histograms are awkward on TPU (no fast scatter), so the bucket
id is split two-level, b = 32*hi + lo, and the joint histogram becomes one
MXU matmul per 8192-pixel chunk:

    hist[64 hi, 128 cols] += onehot_hi[64, k] (x) B[128, k]   (transposed RHS)

where B's 128 rows are [count | count*e] x the combined column lo + 32*fg —
so a single matmul accumulates all four channels [n_fg, n_bg, se_fg, se_bg].
The backward gather g[bucket(e_p)] is tbl^T[comb, hi] @ onehot_hi[hi, k]
followed by a masked sublane reduce. Layout is the whole game: every one-hot
is built LANE-major ((rows, pixels) with pixels in the 128-lane axis, rows
in sublanes) and contracted along lanes — sublane-major construction of the
same one-hots is ~20x slower. fwd+bwd are linear passes over the data
(~60 + ~7 ms at 17x4.2M) instead of two O(P log P) sorts (~350 ms each).

vs the sort path (losses/functional.py): ~9x faster at 8x544x960x17 but
inexact at O(1/B); select with loss config {"lovasz_impl": "bucket"}.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STEP = 8192                 # pixels per inner matmul (K dimension)
_INNER = 4                   # inner steps per grid step (amortise DMA latency)
CHUNK = _STEP * _INNER       # pixels per kernel block
_HI, _LO = 64, 32            # two-level split: n_buckets = _HI * _LO = 2048
N_BUCKETS = _HI * _LO


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _chunk_view(a, p_pad):
    """(R, P_pad) -> (R, n_chunks, 1, CHUNK), a pure in-memory reshape.
    The trailing (1, CHUNK) block keeps the pixel dim one-dimensional so the
    histogram contraction is a single MXU matmul (Mosaic supports exactly
    one contracting dim)."""
    r = a.shape[0]
    return a.reshape(r, p_pad // CHUNK, 1, CHUNK)


def _pad_rp(a, p_pad, p_real):
    return jnp.pad(a, ((0, 0), (0, p_pad - p_real))) if p_pad != p_real else a


# ---------------------------------------------------------------------------
# Kernel 1: joint (hi, lo) histogram of 4 weighted channels
# out[r, hi, c*_LO + lo] = sum over pixels in bucket (hi, lo) of channel c
# channels: 0 = fg count, 1 = bg count, 2 = e*fg sum, 3 = e*bg sum
#
# Per grid step one CHUNK of _CS x 128 pixels is processed as a batched
# matmul: for every sublane row s, onehot_hi (64, 128) @ weighted onehot_lo
# (128, 128) accumulates the (hi, channel*32+lo) joint histogram. The
# one-hots are built vectorised in VMEM and never touch HBM.
# ---------------------------------------------------------------------------

def _hist_kernel(e_ref, fg_ref, out_ref, *, p_real):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (_HI, _STEP), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * _LO, _STEP), 0)

    def body(s, acc):
        e = e_ref[0, 0, 0, pl.ds(s * _STEP, _STEP)]     # (_STEP,)
        fg = fg_ref[0, 0, 0, pl.ds(s * _STEP, _STEP)]
        gidx = (p * CHUNK + s * _STEP
                + jax.lax.broadcasted_iota(jnp.int32, (1, _STEP), 1)[0])
        bid = jnp.minimum((e * N_BUCKETS).astype(jnp.int32), N_BUCKETS - 1)
        bid = jnp.where(gidx < p_real, bid, -1)
        hi = jnp.where(bid < 0, -1, bid // _LO)
        # combined column id folds fg into lo: 0..63 = lo + 32*fg
        comb = jnp.where(bid < 0, -1,
                         bid % _LO + _LO * fg.astype(jnp.int32))
        # Everything lane-major ((rows, _STEP) — full vreg lanes); the RHS
        # is contracted along ITS lanes too (transposed-RHS matmul):
        #   out[h, col] += sum_k A[h, k] * B[col, k]
        # A[h, k] = 1[hi[k] == h]
        # B[0:64, k] = 1[comb[k] == col]; B[64:128, k] = same * e[k]
        a2 = (hi[None, :] == iota_h).astype(jnp.bfloat16)        # (64, _STEP)
        mask = (comb[None, :] == iota_c).astype(jnp.bfloat16)    # (64, _STEP)
        b2t = jnp.concatenate([mask, mask * e[None, :].astype(jnp.bfloat16)],
                              axis=0)                            # (128, _STEP)
        return acc + jax.lax.dot_general(
            a2, b2t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (64, 128)

    acc = jax.lax.fori_loop(0, _INNER, body, jnp.zeros((_HI, 128), jnp.float32))
    out_ref[0, :, :] += acc


def _bucket_histogram(errors_t, fg_t):
    """(R, P) -> (R, N_BUCKETS, 4) channel histograms."""
    r, p_real = errors_t.shape
    p_pad = -(-p_real // CHUNK) * CHUNK
    errors_t = _pad_rp(errors_t.astype(jnp.float32), p_pad, p_real)
    fg_t = _pad_rp(fg_t.astype(jnp.float32), p_pad, p_real)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, p_real=p_real),
        grid=(r, p_pad // CHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, 1, CHUNK), lambda i, p: (i, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CHUNK), lambda i, p: (i, p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _HI, 128), lambda i, p: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, _HI, 128), jnp.float32),
        interpret=_use_interpret(),
    )(_chunk_view(errors_t, p_pad), _chunk_view(fg_t, p_pad))
    # columns: [count(comb) | sum_e(comb)] with comb = lo + _LO*fg
    # -> channels [n_fg, n_bg, se_fg, se_bg] per bucket hi*_LO+lo
    out = out.reshape(r, _HI, 2, 2, _LO)     # (R, hi, {count,se}, {bg,fg}, lo)
    out = out.transpose(0, 1, 4, 3, 2).reshape(r, N_BUCKETS, 4)
    # flattened last axis order: [fg_flag * 2 + kind] with kind 0=count 1=se
    n_bg, se_bg = out[..., 0], out[..., 1]
    n_fg, se_fg = out[..., 2], out[..., 3]
    return jnp.stack([n_fg, n_bg, se_fg, se_bg], axis=-1)


# ---------------------------------------------------------------------------
# Kernel 2: backward gather grad_p = (fg ? t_fg : t_bg)[bucket(e_p)]
# tables arrive as TBL (R, _HI, 2*_LO): [:, :, :_LO] = fg, [:, :, _LO:] = bg
# via the bilinear form onehot_hi @ TBL @ onehot_lo^T (two dense contractions)
# ---------------------------------------------------------------------------

def _grad_kernel(e_ref, fg_ref, tbl_ref, out_ref):
    # transposed form: every tensor is (64, _STEP) — 64 sublanes x full lanes,
    # the same layout family as the fwd kernel's efficient a2 construction
    tbl_t = tbl_ref[0, :, :].T.astype(jnp.bfloat16)  # (comb, hi)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (_HI, _STEP), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * _LO, _STEP), 0)

    def body(s, carry):
        e = e_ref[0, 0, 0, pl.ds(s * _STEP, _STEP)]
        fg = fg_ref[0, 0, 0, pl.ds(s * _STEP, _STEP)]
        bid = jnp.minimum((e * N_BUCKETS).astype(jnp.int32), N_BUCKETS - 1)
        hi = bid // _LO
        comb = bid % _LO + _LO * fg.astype(jnp.int32)
        oh_hi = (hi[None, :] == iota_h).astype(jnp.bfloat16)   # (64, _STEP)
        # grad_p = sum_c 1[comb_p == c] * (TBL^T @ oh_hi)[c, p]:
        # one M=64, K=64, N=_STEP matmul + masked sublane reduce
        tmp = jax.lax.dot_general(
            tbl_t, oh_hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (64, _STEP)
        picked = jnp.where(comb[None, :] == iota_c, tmp, 0.0)
        out_ref[0, 0, 0, pl.ds(s * _STEP, _STEP)] = jnp.sum(picked, axis=0)
        return carry

    jax.lax.fori_loop(0, _INNER, body, 0)


def _bucket_grad(errors_t, fg_t, g_fg, g_bg):
    """g_fg/g_bg: (R, N_BUCKETS) ct-scaled per-bucket gradients."""
    r, p_real = errors_t.shape
    p_pad = -(-p_real // CHUNK) * CHUNK
    errors_t = _pad_rp(errors_t.astype(jnp.float32), p_pad, p_real)
    fg_t = _pad_rp(fg_t.astype(jnp.float32), p_pad, p_real)
    tbl = jnp.concatenate([g_bg.reshape(r, _HI, _LO),
                           g_fg.reshape(r, _HI, _LO)], axis=-1)  # (R, hi, comb)
    out = pl.pallas_call(
        _grad_kernel,
        grid=(r, p_pad // CHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, 1, CHUNK), lambda i, p: (i, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CHUNK), lambda i, p: (i, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HI, 2 * _LO), lambda i, p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, CHUNK), lambda i, p: (i, p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, p_pad // CHUNK, 1, CHUNK),
                                       jnp.float32),
        interpret=_use_interpret(),
    )(_chunk_view(errors_t, p_pad), _chunk_view(fg_t, p_pad), tbl)
    return out.reshape(r, p_pad)[:, :p_real]


# ---------------------------------------------------------------------------
# Loss math on the (R, B, 4) histograms (tiny, plain XLA)
# ---------------------------------------------------------------------------

def _losses_and_tables(hist):
    """(per_class (R,), g_fg (R,B), g_bg (R,B)) from bucket histograms.

    Buckets are walked in DESCENDING error order; J endpoints come from
    prefix counts; each bucket's contribution is mean_error * ΔJ for its
    fg block then its bg block (fg-first tie order, matching the sort
    path's LSB tie-break).
    """
    n1 = hist[..., 0][:, ::-1]   # descending bucket order
    n0 = hist[..., 1][:, ::-1]
    se1 = hist[..., 2][:, ::-1]
    se0 = hist[..., 3][:, ::-1]
    g_total = jnp.sum(n1, axis=1, keepdims=True)              # (R, 1)

    cum_n = jnp.cumsum(n1 + n0, axis=1)
    cum_f = jnp.cumsum(n1, axis=1)
    s = cum_n - (n1 + n0)        # prefix count before this bucket
    f = cum_f - n1

    def jacc(i, fo):
        inter = g_total - fo
        union = g_total + i - fo
        return 1.0 - jnp.where(union > 0,
                               inter / jnp.where(union > 0, union, 1.0), 1.0)

    j_start = jacc(s, f)
    j_mid = jacc(s + n1, f + n1)
    j_end = jacc(s + n1 + n0, f + n1)
    g_fg = (j_mid - j_start) / jnp.maximum(n1, 1.0)
    g_bg = (j_end - j_mid) / jnp.maximum(n0, 1.0)
    per_class = jnp.sum(se1 * g_fg + se0 * g_bg, axis=1)
    # tables back in ascending bucket order for the gather kernel
    return per_class, g_fg[:, ::-1], g_bg[:, ::-1]


# ---------------------------------------------------------------------------
# custom-vjp entry point (same contract as _sorted_lovasz_per_class)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def bucket_lovasz_per_class(errors_t, fg_t):
    """(R, P) non-negative errors + {0,1} fg -> (R,) per-class Lovász terms
    via two-level bucket histograms (see module docstring)."""
    per_class, _, _ = _losses_and_tables(_bucket_histogram(errors_t, fg_t))
    return per_class


def _bucket_fwd(errors_t, fg_t):
    per_class, g_fg, g_bg = _losses_and_tables(
        _bucket_histogram(errors_t, fg_t))
    return per_class, (errors_t, fg_t, g_fg, g_bg)


def _bucket_bwd(res, ct):
    errors_t, fg_t, g_fg, g_bg = res
    grad = _bucket_grad(errors_t, fg_t, g_fg * ct[:, None], g_bg * ct[:, None])
    return grad, None


bucket_lovasz_per_class.defvjp(_bucket_fwd, _bucket_bwd)
