"""Fully-fused bucket Lovász from pre-upsample logits (NCHW Pallas kernels).

Round-1's bucket Lovász kernel was fast (23 ms) but the XLA glue around it
cost ~100 ms/step: transposing full-res NHWC logits into the kernel's
class-major row layout lowered to 17-step while loops of
dynamic-update-slices, and any reshape that merges batch into the pixel
lane dim forces a tile relayout. Round 3 (the "v3" kernels, kept as an A/B
fallback via CADIS_FUSED_V3=1) removed the glue by blocking the upsampled
logits in their native (N, C, H, W) layout — but still materialised the
two full-res f32 logit grids in HBM (~3 GB/step R+W across fwd+bwd,
PERF.md 2.2) purely as the interface between the `upsample_nchw`
dot_generals and the kernels.

Round 4 (the "v4" kernels, the default) moves the bilinear interpolation
INSIDE the kernels, so the full-res grids never exist anywhere:

  * stride-8 logits arrive packed as (N, hs_pad, R*ws_pad) — R class rows
    (both scales), each ws_pad lanes wide. Per grid cell, ONE MXU matmul
    h-interpolates every row at once and per-group M-stacked matmuls
    (g = 128//bh classes per pass = full systolic-array rows)
    w-interpolate the (C, bh, W) tile into VMEM scratch;
  * softmax over C, fg/error construction, bucketing, and the histogram
    matmuls run in-kernel as before; backward rebuilds the probs the same
    way, applies the softmax VJP, then the TRANSPOSED interpolation
    in-kernel and accumulates the stride-8 gradient block (1, hs_pad,
    R*ws_pad) across row cells — gradients leave at stride-8 size;
  * the interpolation matrices are the exact `_interp_matrix` coefficients
    of ops/resize: the v4 forward is bit-identical to v3 on the bench
    workload and gradients agree at relL2 ~5e-9 (tools/check_fused_v4.py
    on a real v5e);
  * sublane->lane flattening inside a kernel cannot be a vector op
    (Mosaic rejects the shape cast), so values are staged through VMEM
    scratch refs: ref reads yield canonical-layout values and
    aligned-lane stores accept them.

Histograms are COUNT-ONLY int8 one-hot matmuls into int32 (the v5e MXU
runs int8 at twice the bf16 rate); the per-bucket error sums feeding the
loss VALUE are reconstructed from bucket midpoints, which cannot change
gradients — the custom VJP's tables are pure count functions
(_bucket_midpoints). The bucket count is a config dial (`lovasz_buckets`):
below the pass-packing thresholds the histogram cost is MXU-pass-count
bound, and the hi/lo split shrinks with B so two rows (B <= 2048) or four
rows (B <= 512) share one 128-wide pass (see _nchw_fwd_kernel). The
flagship recipe ships with 1024.

Entry points: `fused_two_scale_bucket_lovasz_s8` (OCRNet's TwoScaleLoss,
both scales in one kernel pass; reference losses/TwoScaleLoss.py:43-52 +
losses/LovaszSoftmax.py:34-95 on align_corners=True upsampled logits,
models/OCR.py:128-138) and `fused_bucket_lovasz_s8` (single-scale
LovaszSoftmax for the DeepLab/UPerNet heads, align convention per model).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miccai2021_cataract_semantic_segmentation_tpu.losses.bucket_edges import (
    bucket_midpoints_np, fmix32_jax, make_bid_fn)
from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import _interp_matrix

def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Loss math on the (R, B, 4) histograms (same derivation as bucket_lovasz)
# ---------------------------------------------------------------------------

def _losses_and_tables(hist):
    """per_row (R,), gts (R,), g_fg/g_bg (R, B) bucket gradients."""
    n1 = hist[..., 0][:, ::-1]   # descending bucket order
    n0 = hist[..., 1][:, ::-1]
    se1 = hist[..., 2][:, ::-1]
    se0 = hist[..., 3][:, ::-1]
    g_total = jnp.sum(n1, axis=1, keepdims=True)

    cum_n = jnp.cumsum(n1 + n0, axis=1)
    cum_f = jnp.cumsum(n1, axis=1)
    s = cum_n - (n1 + n0)
    f = cum_f - n1

    def jacc(i, fo):
        union = g_total + i - fo
        return 1.0 - jnp.where(union > 0,
                               (g_total - fo) / jnp.where(union > 0, union, 1.0),
                               1.0)

    j_start = jacc(s, f)
    j_mid = jacc(s + n1, f + n1)
    j_end = jacc(s + n1 + n0, f + n1)
    g_fg = (j_mid - j_start) / jnp.maximum(n1, 1.0)
    g_bg = (j_end - j_mid) / jnp.maximum(n0, 1.0)
    per_row = jnp.sum(se1 * g_fg + se0 * g_bg, axis=1)
    return per_row, g_total[:, 0], g_fg[:, ::-1], g_bg[:, ::-1]


# ---------------------------------------------------------------------------
# v3: NCHW-block kernels. The (R, P) row layout above is kernel-optimal but
# producing it from the upsample's (C·N, H, W) output needs an XLA reshape
# that merges N into the pixel lane dim — which XLA lowers to a 17-step
# while loop of dynamic-update-slices (~30 ms/step fwd+bwd, measured). These
# kernels instead block the upsampled logits in their NATIVE (N, C, H, W)
# layout and do softmax + fg/error construction + histogram (and, backward,
# the softmax VJP) entirely in-kernel. No (C, P) array ever exists in HBM.
# ---------------------------------------------------------------------------

def _pick_bh(h: int, cap: int = 8) -> int:
    """Largest block height <= cap dividing H (W is lane-padded separately).

    Mosaic requires the block's second-minor dim to be a multiple of 8 (or
    the full dim), so callers pad H to a multiple of 8 first (zero rows in
    the interpolation matrix + ignore rows in the labels — both free).

    The caps are measured optima at the bench shape (fewer grid cells =
    less per-cell overhead, but past ~32 rows the block stops fitting even
    the raised vmem budget; see _VMEM_LIMIT)."""
    for bh in (cap, 32, 16, 8):
        if bh <= cap and h % bh == 0:
            return bh
    raise ValueError(f"fused Lovász needs H padded to a multiple of 8, got {h}")


import os

_FWD_BH_CAP = int(os.environ.get("CADIS_FUSED_FWD_BH", 16))
_BWD_BH_CAP = int(os.environ.get("CADIS_FUSED_BWD_BH", 8))
_BWD1_BH_CAP = int(os.environ.get("CADIS_FUSED_BWD1_BH", 16))
# Mosaic's default scoped-vmem budget is 16 MB; v5e has 128 MB of physical
# VMEM. Raising the per-kernel limit lets the block heights above grow
# past round 3's caps (bigger blocks = fewer grid cells = less per-cell
# overhead). 64 MB leaves plenty for XLA's own fusions in the same program.
_VMEM_LIMIT = int(os.environ.get("CADIS_FUSED_VMEM_MB", 64)) * 1024 * 1024
# Escape hatch back to the round-3 kernels (full-res logit grids in HBM
# between XLA upsample dot_generals and the kernels) for A/B comparison.
_USE_V3 = os.environ.get("CADIS_FUSED_V3") == "1"
# The v4 kernels' small input blocks fit much larger block heights than the
# v3 ones (whose (1, C, bh, W) logit blocks dominated VMEM), and larger bh
# halves both the grid-cell count and the M-stacked matmul pass count.
# (v3 at bh=32 also compiles pathologically slowly in Mosaic — its caps
# stay at the round-3 values above.)
_FU_FWD_BH_CAP = int(os.environ.get("CADIS_FU_FWD_BH", 32))
_FU_BWD_BH_CAP = int(os.environ.get("CADIS_FU_BWD_BH", 16))


def _cparams():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _softmax_rows(x):
    """softmax over axis 0 of (C, bh, W); returns f32."""
    m = jnp.max(x, axis=0, keepdims=True)
    ex = jnp.exp(x - m)
    return ex / jnp.sum(ex, axis=0, keepdims=True)


# Flattening (C, bh, W) -> (C, bh*W) inside a kernel cannot be a vector op:
# Mosaic rejects both the shape cast (sublanes can't merge into lanes) and
# concatenation of sublane-offset slices. Refs are plain memory though, so
# the kernels stage values in VMEM scratch and move sublane rows to lane
# offsets with ref-to-ref copies (every ref read yields a canonical-layout
# value; every aligned-lane store accepts one).


def _nchw_fwd_kernel(lbl_ref, li_ref, lf_ref, out_ref, pscr, sscr, lscr,
                     *, n_cls, bh, w, w_real, hi_n, lo_n, edges):
    """pscr: (2C, K) f32 scratch holding both scales' flattened probs, so the
    per-class work is ONE fori_loop body (compile-time critical: a 34-way
    Python unroll of the one-hot+matmul body takes Mosaic >10 min).
    `w` is the lane-padded width; lanes >= w_real are pad and are excluded
    from the histogram exactly (their bucket id is forced to -1).

    The histogram is COUNT-ONLY: columns are the 2*lo_n (bg|fg) occupancy
    masks, matmul'd as int8 one-hots into int32 counts (the v5e MXU runs
    int8 at twice the bf16 rate). The se sums are reconstructed outside
    the kernel from bucket midpoints — gradients are unaffected because
    the VJP tables are pure count functions (_bucket_midpoints).

    Bucket split (hi_n, lo_n): when both 2*hi_n <= 128 and 4*lo_n <= 128
    (e.g. 1024 buckets as 64x16), the TWO SCALES of each class are packed
    into ONE 128-wide MXU pass — their one-hots stack along M and their
    column blocks along N; the diagonal blocks of the product are the two
    histograms and the off-diagonal garbage costs nothing because the
    systolic array computes its full tile anyway. At hi_n <= 32 FOUR rows
    (two classes x two scales) quad-pack per pass."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sscr[...] = _softmax_rows(li_ref[0].astype(jnp.float32))
    for j in range(bh):
        pscr[0:n_cls, pl.ds(j * w, w)] = sscr[:, j, :]
        lscr[0:1, pl.ds(j * w, w)] = lbl_ref[0, j, :][None]
    sscr[...] = _softmax_rows(lf_ref[0].astype(jnp.float32))
    for j in range(bh):
        pscr[n_cls:2 * n_cls, pl.ds(j * w, w)] = sscr[:, j, :]
    _twoscale_hist_body(pscr, lscr, out_ref, n_cls=n_cls, bh=bh, w=w,
                        w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges)


def _twoscale_hist_body(pscr, lscr, out_ref, *, n_cls, bh, w, w_real,
                        hi_n, lo_n, edges="uniform"):
    """Histogram accumulation from staged (2C, K) probs + (1, K) labels —
    shared by the v3 (pre-upsampled grids) and v4 (in-kernel upsample)
    forward kernels. See _nchw_fwd_kernel for the packing layouts."""
    k = bh * w
    n_b = hi_n * lo_n
    cols = 2 * lo_n
    paired = 2 * hi_n <= 128 and 2 * cols <= 128
    lbl = lscr[0:1, :]                                   # (1, K) i32
    valid = (lbl >= 0).astype(jnp.float32)
    # ignore-labeled pixels are excluded from the histogram entirely (same
    # bid=-1 route as the lane-pad mask), matching classes_to_ignore
    # semantics exactly rather than counting them as e=0 background
    keep = lbl >= 0                                      # (1, K) bool
    if w_real != w:
        kio = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        keep = keep & (kio % w < w_real)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hi_n, k), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * lo_n, k), 0)
    bid_of = make_bid_fn(n_b, edges)

    def one_hots(r, fg, fg_i):
        prow = pscr[pl.ds(r, 1), :] * valid              # (1, K)
        e = jnp.abs(fg.astype(jnp.float32) - prow)
        bid = jnp.where(keep, bid_of(e), -1)
        hi = jnp.where(bid < 0, -1, bid // lo_n)
        comb = jnp.where(bid < 0, -1, bid % lo_n + lo_n * fg_i)
        a2 = (hi == iota_h).astype(jnp.int8)             # (HI, K)
        b2t = (comb == iota_c).astype(jnp.int8)          # (2LO, K)
        return a2, b2t

    quad = 4 * hi_n <= 128 and 4 * cols <= 128

    def pair_one(c):
        fg = lbl == c
        fg_i = fg.astype(jnp.int32)
        a_i, b_i = one_hots(c, fg, fg_i)
        a_f, b_f = one_hots(c + n_cls, fg, fg_i)
        a2 = jnp.concatenate([a_i, a_f], axis=0)         # (2HI, K)
        b2t = jnp.concatenate([b_i, b_f], axis=0)        # (2*2LO, K)
        acc = jax.lax.dot_general(
            a2, b2t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)            # (2HI, 2*2LO)
        out_ref[pl.ds(c, 1), :, :] += acc[:hi_n, :cols][None]
        out_ref[pl.ds(c + n_cls, 1), :, :] += acc[hi_n:, cols:][None]

    if quad:
        # hi_n <= 32 (B <= 512): FOUR rows — both scales of TWO classes —
        # stack into one 128-wide MXU pass, halving pass count again vs the
        # paired layout (the pass is K-cycle-bound regardless of its N, so
        # only pass count matters below the pairing threshold; measured in
        # tools/loss_probe.py).
        def quad_body(p, _):
            c0 = 2 * p
            c1 = c0 + 1
            fg0 = lbl == c0
            fg1 = lbl == c1
            f0i, f1i = fg0.astype(jnp.int32), fg1.astype(jnp.int32)
            a_i0, b_i0 = one_hots(c0, fg0, f0i)
            a_f0, b_f0 = one_hots(c0 + n_cls, fg0, f0i)
            a_i1, b_i1 = one_hots(c1, fg1, f1i)
            a_f1, b_f1 = one_hots(c1 + n_cls, fg1, f1i)
            a4 = jnp.concatenate([a_i0, a_f0, a_i1, a_f1], axis=0)  # (4HI, K)
            b4 = jnp.concatenate([b_i0, b_f0, b_i1, b_f1], axis=0)  # (4cols, K)
            acc = jax.lax.dot_general(
                a4, b4, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)        # (4HI, 4cols)
            out_ref[pl.ds(c0, 1), :, :] += acc[:hi_n, :cols][None]
            out_ref[pl.ds(c0 + n_cls, 1), :, :] += \
                acc[hi_n:2 * hi_n, cols:2 * cols][None]
            out_ref[pl.ds(c1, 1), :, :] += \
                acc[2 * hi_n:3 * hi_n, 2 * cols:3 * cols][None]
            out_ref[pl.ds(c1 + n_cls, 1), :, :] += \
                acc[3 * hi_n:, 3 * cols:][None]
            return 0

        jax.lax.fori_loop(0, n_cls // 2, quad_body, 0)
        if n_cls % 2:
            pair_one(n_cls - 1)
    elif paired:
        def pair(c, _):
            pair_one(c)
            return 0

        jax.lax.fori_loop(0, n_cls, pair, 0)
    else:
        def row(r, _):
            cls = jax.lax.rem(r, n_cls)
            fg = lbl == cls
            a2, b2t = one_hots(r, fg, fg.astype(jnp.int32))
            acc = jax.lax.dot_general(
                a2, b2t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)        # (HI, 2LO)
            out_ref[pl.ds(r, 1), :, :] += acc[None]
            return 0

        jax.lax.fori_loop(0, 2 * n_cls, row, 0)


def _degrad_rows(pscr, dscr, lscr, tbl_ref, *, n_rows, n_cls, bh, w, w_real,
                 hi_n, lo_n, edges="uniform"):
    """Fill dscr rows with dL/dp from staged probs + the VJP bucket tables,
    including the softmax VJP per scale — shared by the v3 and v4 backward
    kernels (two-scale: n_rows = 2C; single-scale: n_rows = C)."""
    k = bh * w
    n_b = hi_n * lo_n
    lbl = lscr[0:1, :]
    valid = (lbl >= 0).astype(jnp.float32)
    if w_real != w:
        kio = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        valid = valid * (kio % w < w_real).astype(jnp.float32)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hi_n, k), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * lo_n, k), 0)

    bid_of = make_bid_fn(n_b, edges)

    def row(r, _):
        cls = jax.lax.rem(r, n_cls)
        prow = pscr[pl.ds(r, 1), :] * valid
        fg = lbl == cls
        e = jnp.abs(fg.astype(jnp.float32) - prow)
        bid = bid_of(e)
        hi = bid // lo_n
        comb = bid % lo_n + lo_n * fg.astype(jnp.int32)
        oh_hi = (hi == iota_h).astype(jnp.bfloat16)      # (HI, K)
        tbl = tbl_ref[r, :, :].astype(jnp.bfloat16)      # (2LO, HI)
        tmp = jax.lax.dot_general(
            tbl, oh_hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (2LO, K)
        de = jnp.sum(jnp.where(comb == iota_c, tmp, 0.0), axis=0,
                     keepdims=True)                      # (1, K)
        # dL/dp = de * sign(p - fg) * valid
        dscr[pl.ds(r, 1), :] = jnp.where(fg, -de, de) * valid
        return 0

    jax.lax.fori_loop(0, n_rows, row, 0)

    for si in range(n_rows // n_cls):
        lo_r, hi_r = si * n_cls, (si + 1) * n_cls
        pf = pscr[lo_r:hi_r, :]                          # (C, K)
        dp = dscr[lo_r:hi_r, :]
        s = jnp.sum(dp * pf, axis=0, keepdims=True)      # softmax VJP
        dscr[lo_r:hi_r, :] = pf * (dp - s)


def _nchw_bwd_kernel(lbl_ref, li_ref, lf_ref, tbl_ref, dli_ref, dlf_ref,
                     pscr, dscr, sscr, lscr, *, n_cls, bh, w, w_real,
                     hi_n, lo_n, edges):
    sscr[...] = _softmax_rows(li_ref[0].astype(jnp.float32))
    for j in range(bh):
        pscr[0:n_cls, pl.ds(j * w, w)] = sscr[:, j, :]
        lscr[0:1, pl.ds(j * w, w)] = lbl_ref[0, j, :][None]
    sscr[...] = _softmax_rows(lf_ref[0].astype(jnp.float32))
    for j in range(bh):
        pscr[n_cls:2 * n_cls, pl.ds(j * w, w)] = sscr[:, j, :]
    _degrad_rows(pscr, dscr, lscr, tbl_ref, n_rows=2 * n_cls, n_cls=n_cls,
                 bh=bh, w=w, w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges)
    for si, dref in ((0, dli_ref), (1, dlf_ref)):
        lo_r, hi_r = si * n_cls, (si + 1) * n_cls
        for j in range(bh):
            dref[0, :, j, :] = dscr[lo_r:hi_r, pl.ds(j * w, w)]


def _bucket_split(n_buckets: int) -> tuple[int, int]:
    """(hi, lo) for a bucket count; hi one-hot rows, 2*lo histogram cols
    (count-only columns: bg|fg occupancy; see _nchw_fwd_kernel).

    hi shrinks with B so the MXU packing deepens: 64 enables the 2-row
    paired layout (B <= 2048), 32 the 4-row quad layout (B <= 512)."""
    hi = 128 if n_buckets > 2048 else (64 if n_buckets > 512 else 32)
    lo = n_buckets // hi
    if hi * lo != n_buckets or lo < 1 or 2 * lo > 128:
        raise ValueError(f"unsupported lovasz bucket count {n_buckets}")
    return hi, lo


def _bucket_midpoints(n_buckets: int, edges: str = "uniform"):
    """Bucket-midpoint error values for reconstructing the se sums from
    counts: se[b] ~= n[b] * midpoint(b). The VJP's gradient tables are pure
    COUNT functions (see _losses_and_tables: g_fg/g_bg come from n1/n0
    cumsums only), so this approximation shifts the reported loss VALUE by
    at most half a bucket width per pixel while leaving dL/dlogits
    bit-identical to the exact-se variant. Non-uniform `edges` modes use
    their own midpoint table (losses/bucket_edges.py)."""
    return jnp.asarray(bucket_midpoints_np(n_buckets, edges))


def _nchw_histogram(logits_i, logits_f, labels, n_cls: int, bh: int,
                    w_real: int, n_buckets: int, edges: str = "uniform"):
    hi_n, lo_n = _bucket_split(n_buckets)
    n, c, h, w = logits_i.shape
    out = pl.pallas_call(
        functools.partial(_nchw_fwd_kernel, n_cls=n_cls, bh=bh, w=w,
                          w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * c, hi_n, 2 * lo_n), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * c, hi_n, 2 * lo_n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2 * c, bh * w), jnp.float32),
                        pltpu.VMEM((c, bh, w), jnp.float32),
                        pltpu.VMEM((1, bh * w), jnp.int32)],
        interpret=_use_interpret(),
        compiler_params=_cparams(),
    )(labels, logits_i, logits_f)
    r = 2 * c
    out = out.reshape(r, hi_n, 2, lo_n).astype(jnp.float32)
    n_bg = out[:, :, 0].reshape(r, n_buckets)
    n_fg = out[:, :, 1].reshape(r, n_buckets)
    mid = _bucket_midpoints(n_buckets, edges)
    return jnp.stack([n_fg, n_bg, n_fg * mid, n_bg * mid], axis=-1)


def _nchw_grad(logits_i, logits_f, labels, tbl, n_cls: int, bh: int,
               w_real: int, n_buckets: int, edges: str = "uniform"):
    hi_n, lo_n = _bucket_split(n_buckets)
    n, c, h, w = logits_i.shape
    return pl.pallas_call(
        functools.partial(_nchw_bwd_kernel, n_cls=n_cls, bh=bh, w=w,
                          w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, 2 * lo_n, hi_n), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(logits_i.shape, jnp.float32),
            jax.ShapeDtypeStruct(logits_f.shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * c, bh * w), jnp.float32),
                        pltpu.VMEM((2 * c, bh * w), jnp.float32),
                        pltpu.VMEM((c, bh, w), jnp.float32),
                        pltpu.VMEM((1, bh * w), jnp.int32)],
        interpret=_use_interpret(),
        compiler_params=_cparams(),
    )(labels, logits_i, logits_f, tbl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def lovasz_two_scale_nchw(logits_i, logits_f, labels, n_cls: int,
                          bhs: tuple[int, int], w_real: int,
                          n_buckets: int = 2048, edges: str = "uniform"):
    """Two-scale bucket-Lovász core on (N, C, H, W_pad) f32 logit grids.

    `labels` (N, H, W_pad) i32 with ignore pixels pre-folded to -1 and pad
    lanes (>= w_real) set to -1. Softmax over C happens inside the kernels.
    `bhs` = (forward, backward) kernel block heights (see _pick_bh).
    Returns (per_row (2C,), gts (2C,)) — rows [0, C) are the interm scale,
    [C, 2C) the final scale."""
    per_row, gts, _, _ = _losses_and_tables(
        _nchw_histogram(logits_i, logits_f, labels, n_cls, bhs[0], w_real,
                        n_buckets, edges))
    return per_row, gts


def _nchw_fwd(logits_i, logits_f, labels, n_cls, bhs, w_real, n_buckets,
              edges):
    per_row, gts, g_fg, g_bg = _losses_and_tables(
        _nchw_histogram(logits_i, logits_f, labels, n_cls, bhs[0], w_real,
                        n_buckets, edges))
    return (per_row, gts), (logits_i, logits_f, labels, g_fg, g_bg)


def _nchw_bwd(n_cls, bhs, w_real, n_buckets, edges, res, cts):
    bh = bhs[1]
    logits_i, logits_f, labels, g_fg, g_bg = res
    hi_n, lo_n = _bucket_split(n_buckets)
    ct = cts[0]
    r = g_fg.shape[0]
    gf = (g_fg * ct[:, None]).reshape(r, hi_n, lo_n)
    gb = (g_bg * ct[:, None]).reshape(r, hi_n, lo_n)
    tbl = jnp.concatenate([gb, gf], axis=-1).transpose(0, 2, 1)  # (R, 2LO, HI)
    dli, dlf = _nchw_grad(logits_i, logits_f, labels, tbl, n_cls, bh, w_real,
                          n_buckets, edges)
    return dli, dlf, None


lovasz_two_scale_nchw.defvjp(_nchw_fwd, _nchw_bwd)


def upsample_nchw(logits_small: jnp.ndarray, out_hw: tuple[int, int],
                  align_corners: bool = True, w_pad: int | None = None,
                  h_pad: int | None = None) -> jnp.ndarray:
    """(N, h, w, C) -> (N, C, H[_pad], W[_pad]) f32 bilinear upsample as two
    dot_generals.

    The class transpose happens at stride-8 size; both contractions write
    natural row-major layouts, so the output feeds the NCHW kernels with no
    relayout. `w_pad` / `h_pad` zero-pad the interpolation matrix columns so
    the output is lane-aligned (W) and block-height aligned (H) — the pads
    cost nothing in the matmuls; H pad rows must be masked by the caller
    (ignore-label rows)."""
    n, h, w, c = logits_small.shape
    oh, ow = out_hw
    acc = jnp.promote_types(logits_small.dtype, jnp.float32)
    mh_np = _interp_matrix(h, oh, align_corners).T                 # (h, H)
    if h_pad is not None and h_pad != oh:
        mh_np = np.pad(mh_np, ((0, 0), (0, h_pad - oh)))
    mh = jnp.asarray(mh_np, acc)
    mw_np = _interp_matrix(w, ow, align_corners).T                 # (w, W)
    if w_pad is not None and w_pad != ow:
        mw_np = np.pad(mw_np, ((0, 0), (0, w_pad - ow)))
    mw = jnp.asarray(mw_np, acc)
    t = logits_small.transpose(0, 3, 1, 2).astype(acc)   # (N, C, h, w)
    t = t.reshape(n * c, h, w)
    x1 = jax.lax.dot_general(t, mh, (((1,), (0,)), ((), ())))   # (NC, w, H)
    x2 = jax.lax.dot_general(x1, mw, (((1,), (0,)), ((), ())))  # (NC, H, W)
    return x2.reshape(n, c, mh.shape[1], mw.shape[1])


# ---------------------------------------------------------------------------
# v4: in-kernel bilinear upsample (round 4). v3's full-res (N, C, H, W) f32
# logit grids were ~3 GB/step of HBM traffic whose only purpose was to carry
# data between the upsample dot_generals and the kernels (PERF.md 2.2).
# These kernels take the stride-8 logits in a packed (N, hs_pad, R*ws_pad)
# lane-blocked layout (R = n_scales*C class rows, each ws_pad lanes wide)
# plus the two interpolation matrices, and build each (C, bh, W) tile in
# VMEM with MXU matmuls:
#   1. ONE (bh, hs_pad) x (hs_pad, R*ws_pad) matmul h-interpolates every
#      class row of the block at once;
#   2. per group of g = 128//bh classes, a lane-sliced M-stack feeds ONE
#      (g*bh, ws_pad) x (ws_pad, W) matmul — full systolic-array rows, so
#      the skinny per-class form never hits the MXU.
# Backward rebuilds the probs the same way, then applies the TRANSPOSED
# interpolation in-kernel (W-downsample via mw^T with the same M-stacking,
# then one h-transpose matmul over the whole packed layout) and accumulates
# the (1, hs_pad, R*ws_pad) stride-8 gradient block across row cells. The
# full-res logit and gradient grids never exist anywhere.
# ---------------------------------------------------------------------------


def _fu_stage_probs(u1scr, sscr, pscr, lscr, lbl_ref, mw_ref, *, n_scales,
                    n_cls, bh, w, ws_pad):
    """Width-interpolate u1scr's h-interpolated rows and stage softmax probs
    of every scale into pscr's flattened (R, K) layout (labels into lscr)."""
    gmax = max(1, 128 // bh)
    for j in range(bh):
        lscr[0:1, pl.ds(j * w, w)] = lbl_ref[0, j, :][None]
    for si in range(n_scales):
        r = 0
        while r < n_cls:
            g = min(gmax, n_cls - r)
            row0 = si * n_cls + r
            parts = [u1scr[:, (row0 + t) * ws_pad:(row0 + t + 1) * ws_pad]
                     for t in range(g)]
            a = parts[0] if g == 1 else jnp.concatenate(parts, axis=0)
            tt = jax.lax.dot_general(
                a, mw_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (g*bh, w)
            for t in range(g):
                sscr[pl.ds(r + t, 1)] = tt[t * bh:(t + 1) * bh][None]
            r += g
        sscr[...] = _softmax_rows(sscr[...])
        for j in range(bh):
            pscr[si * n_cls:(si + 1) * n_cls, pl.ds(j * w, w)] = sscr[:, j, :]


def _dither_shift(seed_ref, *, bh, w, n_b):
    """(1, K) error shift (d - 1/2)/B from a counter-based hash of the
    GLOBAL pixel index (batch-row-col order) and the step seed, so the
    backward kernel reproduces the forward's bucket ids bit-exactly even at
    a different block height (losses/bucket_edges.py dither rationale).
    Global index of lane l in grid cell (i, j): (i*H_pad + j*bh)*W_pad + l —
    the (bh, w) block flattens row-major, so consecutive lanes are
    consecutive pixels."""
    k = bh * w
    base = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) * k
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    h = fmix32_jax(idx ^ seed_ref[0])
    d = (h & 0xFFFF).astype(jnp.float32) * np.float32(1 / 65536)
    return (d - np.float32(0.5)) * np.float32(1.0 / n_b)


def _fu_bucket_fields(pscr, lscr, hiscr, combscr, *, n_scales, n_cls, k, w,
                      w_real, hi_n, lo_n, mask_pad, edges="uniform",
                      dshift=None):
    """Precompute the bucket-id fields for EVERY row at once.

    The per-row formulation computed e/bid/hi/comb on (1, K) vectors — a
    (1, K) array occupies one sublane of each vreg, so every elementwise op
    ran at 1/8 of VPU width; over 2C rows x ~8 ops x K lanes that was the
    single largest cost in the round-3 kernels (~10 ms/step at the bench
    shape). Computing the same fields on (C, K) blocks per scale uses all
    sublanes; the per-row remainder in the matmul loops is just the
    full-width (HI/2LO, K) one-hot compares and the MXU passes.

    hiscr/combscr: (R, K) int32 scratch. Excluded pixels (ignore labels,
    lane padding — forward only, `mask_pad`) get hi = comb = -1, which no
    iota row matches: identical exclusion semantics to the row form."""
    n_b = hi_n * lo_n
    lbl = lscr[0:1, :]
    valid = (lbl >= 0).astype(jnp.float32)
    keep = lbl >= 0
    if mask_pad and w_real != w:
        kio = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        keep = keep & (kio % w < w_real)
    cls_iota = jax.lax.broadcasted_iota(jnp.int32, (n_cls, k), 0)
    fg = (lbl == cls_iota)                                   # (C, K)
    fg_f = fg.astype(jnp.float32)
    fg_i = fg.astype(jnp.int32)
    bid_of = make_bid_fn(n_b, edges)
    for si in range(n_scales):
        rows = slice(si * n_cls, (si + 1) * n_cls)
        p = pscr[rows, :] * valid                            # (C, K)
        e = jnp.abs(fg_f - p)
        if dshift is not None:
            # dithered uniform map: floor((e + (d-1/2)/B) * B) through the
            # standard bid fn; int32 truncation-toward-zero clamps the
            # e' < 0 tail to bucket 0 (bucket_edges.dithered_bucket_id_np)
            e = e + dshift
        bid = bid_of(e)
        if mask_pad:
            bid = jnp.where(keep, bid, -1)
            hiscr[rows, :] = jnp.where(bid < 0, -1, bid // lo_n)
            combscr[rows, :] = jnp.where(bid < 0, -1,
                                         bid % lo_n + lo_n * fg_i)
        else:
            hiscr[rows, :] = bid // lo_n
            combscr[rows, :] = bid % lo_n + lo_n * fg_i


def _fu_fwd_kernel(seed_ref, lbl_ref, ls_ref, mhT_ref, mw_ref, out_ref,
                   u1scr, pscr, sscr, lscr, hiscr, combscr,
                   *, n_scales, n_cls, bh, w, w_real, hi_n, lo_n, ws_pad,
                   edges, dither):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    u1scr[...] = jax.lax.dot_general(
        mhT_ref[...], ls_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bh, R*ws_pad)
    _fu_stage_probs(u1scr, sscr, pscr, lscr, lbl_ref, mw_ref,
                    n_scales=n_scales, n_cls=n_cls, bh=bh, w=w,
                    ws_pad=ws_pad)
    k = bh * w
    dshift = _dither_shift(seed_ref, bh=bh, w=w, n_b=hi_n * lo_n) \
        if dither else None
    _fu_bucket_fields(pscr, lscr, hiscr, combscr, n_scales=n_scales,
                      n_cls=n_cls, k=k, w=w, w_real=w_real, hi_n=hi_n,
                      lo_n=lo_n, mask_pad=True, edges=edges, dshift=dshift)
    _fu_hist_accumulate(hiscr, combscr, out_ref, n_rows=n_scales * n_cls,
                        n_cls=n_cls, k=k, hi_n=hi_n, lo_n=lo_n,
                        pack_scales=(n_scales == 2))


def _fu_hist_accumulate(hiscr, combscr, out_ref, *, n_rows, n_cls, k,
                        hi_n, lo_n, pack_scales):
    """Histogram one-hot matmuls from the precomputed bucket fields, with
    the same MXU pass packing as the v3 kernels (see _nchw_fwd_kernel):
    two-scale packs a class's two scales per 128-wide pass (and quad-packs
    two classes at hi_n <= 32); single-scale pairs/quads classes."""
    cols = 2 * lo_n
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hi_n, k), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (cols, k), 0)

    def one_hots(r):
        a2 = (hiscr[pl.ds(r, 1), :] == iota_h).astype(jnp.int8)
        b2t = (combscr[pl.ds(r, 1), :] == iota_c).astype(jnp.int8)
        return a2, b2t

    def accumulate(row_ids):
        """One MXU pass covering len(row_ids) (row, col) diagonal blocks."""
        parts = [one_hots(r) for r in row_ids]
        a = parts[0][0] if len(parts) == 1 else \
            jnp.concatenate([p[0] for p in parts], axis=0)
        b = parts[0][1] if len(parts) == 1 else \
            jnp.concatenate([p[1] for p in parts], axis=0)
        acc = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        for i, r in enumerate(row_ids):
            out_ref[pl.ds(r, 1), :, :] += \
                acc[i * hi_n:(i + 1) * hi_n, i * cols:(i + 1) * cols][None]

    n_pack = max(p for p in (4, 2, 1)
                 if p * hi_n <= 128 and p * cols <= 128)
    if pack_scales:
        # rows r and r + n_cls are the two scales of class r
        group = min(n_pack, 2)
        quad = n_pack >= 4
        if quad:
            def qbody(p, _):
                c0 = 2 * p
                accumulate([c0, c0 + n_cls, c0 + 1, c0 + 1 + n_cls])
                return 0

            jax.lax.fori_loop(0, n_cls // 2, qbody, 0)
            if n_cls % 2:
                accumulate([n_cls - 1, 2 * n_cls - 1])
        elif group == 2:
            def pbody(c, _):
                accumulate([c, c + n_cls])
                return 0

            jax.lax.fori_loop(0, n_cls, pbody, 0)
        else:
            def rbody(r, _):
                accumulate([r])
                return 0

            jax.lax.fori_loop(0, n_rows, rbody, 0)
    else:
        g = max(1, min(n_pack, n_rows))
        def gbody(p, _):
            accumulate([g * p + t for t in range(g)])
            return 0

        jax.lax.fori_loop(0, n_rows // g, gbody, 0)
        for r in range(n_rows - n_rows % g, n_rows):
            accumulate([r])


def _fu_bwd_kernel(seed_ref, lbl_ref, ls_ref, mhT_ref, mw_ref, mwT_ref,
                   tbl_ref, dls_ref, u1scr, pscr, dscr, sscr, lscr, hiscr,
                   combscr, *, n_scales, n_cls, bh, w, w_real, hi_n, lo_n,
                   ws_pad, edges, dither):
    @pl.when(pl.program_id(1) == 0)
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)

    u1scr[...] = jax.lax.dot_general(
        mhT_ref[...], ls_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    _fu_stage_probs(u1scr, sscr, pscr, lscr, lbl_ref, mw_ref,
                    n_scales=n_scales, n_cls=n_cls, bh=bh, w=w,
                    ws_pad=ws_pad)
    k = bh * w
    n_rows = n_scales * n_cls
    # full-width bucket fields (see _fu_bucket_fields; bwd keeps the row
    # form's exact semantics: no lane-pad masking of bid — invalid pixels
    # zero out via `valid` below). The dither shift reproduces the forward's
    # bucket ids exactly: same (global index, seed) hash, block-height
    # independent (_dither_shift).
    dshift = _dither_shift(seed_ref, bh=bh, w=w, n_b=hi_n * lo_n) \
        if dither else None
    _fu_bucket_fields(pscr, lscr, hiscr, combscr, n_scales=n_scales,
                      n_cls=n_cls, k=k, w=w, w_real=w_real, hi_n=hi_n,
                      lo_n=lo_n, mask_pad=False, edges=edges, dshift=dshift)
    lbl = lscr[0:1, :]
    valid = (lbl >= 0).astype(jnp.float32)
    if w_real != w:
        kio = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        valid = valid * (kio % w < w_real).astype(jnp.float32)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hi_n, k), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * lo_n, k), 0)

    def row(r, _):
        cls = jax.lax.rem(r, n_cls)
        oh_hi = (hiscr[pl.ds(r, 1), :] == iota_h).astype(jnp.bfloat16)
        tbl = tbl_ref[r, :, :].astype(jnp.bfloat16)          # (2LO, HI)
        tmp = jax.lax.dot_general(
            tbl, oh_hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (2LO, K)
        de = jnp.sum(jnp.where(combscr[pl.ds(r, 1), :] == iota_c, tmp, 0.0),
                     axis=0, keepdims=True)                  # (1, K)
        fg = lbl == cls
        dscr[pl.ds(r, 1), :] = jnp.where(fg, -de, de) * valid
        return 0

    jax.lax.fori_loop(0, n_rows, row, 0)
    for si in range(n_scales):
        lo_r, hi_r = si * n_cls, (si + 1) * n_cls
        pf = pscr[lo_r:hi_r, :]
        dp = dscr[lo_r:hi_r, :]
        s = jnp.sum(dp * pf, axis=0, keepdims=True)          # softmax VJP
        dscr[lo_r:hi_r, :] = pf * (dp - s)
    # transposed interpolation: dscr (R, K) -> stride-8 grads. u1scr is dead
    # after the prob rebuild and is reused as the (bh, R*ws_pad) staging
    # buffer for the W-downsampled rows.
    gmax = max(1, 128 // bh)
    for si in range(n_scales):
        lo_r = si * n_cls
        for j in range(bh):
            sscr[:, j, :] = dscr[lo_r:lo_r + n_cls, pl.ds(j * w, w)]
        r = 0
        while r < n_cls:
            g = min(gmax, n_cls - r)
            parts = [sscr[r + t] for t in range(g)]          # (bh, w) each
            a = parts[0] if g == 1 else jnp.concatenate(parts, axis=0)
            dw = jax.lax.dot_general(
                a, mwT_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (g*bh, ws_pad)
            for t in range(g):
                c0 = (lo_r + r + t) * ws_pad
                u1scr[:, c0:c0 + ws_pad] = dw[t * bh:(t + 1) * bh]
            r += g
    dsm = jax.lax.dot_general(
        mhT_ref[...], u1scr[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (hs_pad, R*wsp)
    dls_ref[...] += dsm[None]


def _fu_prep(parts, hs_pad, ws_pad):
    """[(N, hs, ws, C)] per scale -> packed (N, hs_pad, R*ws_pad) f32."""
    n, hs, ws, _ = parts[0].shape
    ls = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    ls = ls.transpose(0, 1, 3, 2).astype(jnp.float32)        # (N, hs, R, ws)
    ls = jnp.pad(ls, ((0, 0), (0, hs_pad - hs), (0, 0), (0, ws_pad - ws)))
    return ls.reshape(n, hs_pad, ls.shape[2] * ws_pad)


def _fu_mats(hs, ws, hs_pad, ws_pad, out_hw, h_pad, w_pad, align):
    """Zero-padded interpolation matrices: mhT (h_pad, hs_pad),
    mw (ws_pad, w_pad), mwT (w_pad, ws_pad). Identical coefficients to
    upsample_nchw / ops.resize; pad rows/cols are zero so padded target
    pixels get zero logits (excluded via ignore labels) and padded source
    rows get zero gradients."""
    oh, ow = out_hw
    mh = _interp_matrix(hs, oh, align).T                     # (hs, oh)
    mh = np.pad(mh, ((0, hs_pad - hs), (0, h_pad - oh)))
    mw = _interp_matrix(ws, ow, align).T                     # (ws, ow)
    mw = np.pad(mw, ((0, ws_pad - ws), (0, w_pad - ow)))
    return (jnp.asarray(np.ascontiguousarray(mh.T), jnp.float32),
            jnp.asarray(mw, jnp.float32),
            jnp.asarray(np.ascontiguousarray(mw.T), jnp.float32))


def _fu_histogram(ls2d, labels, mhT, mw, n_scales: int, n_cls: int, bh: int,
                  w_real: int, n_buckets: int, edges: str = "uniform",
                  seed=None, dither: bool = False):
    hi_n, lo_n = _bucket_split(n_buckets)
    n, hs_pad, lanes = ls2d.shape
    r_rows = n_scales * n_cls
    ws_pad = lanes // r_rows
    h_pad, w_pad = labels.shape[1], labels.shape[2]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    out = pl.pallas_call(
        functools.partial(_fu_fwd_kernel, n_scales=n_scales, n_cls=n_cls,
                          bh=bh, w=w_pad, w_real=w_real, hi_n=hi_n,
                          lo_n=lo_n, ws_pad=ws_pad, edges=edges,
                          dither=dither),
        grid=(n, h_pad // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bh, w_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs_pad, lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, hs_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws_pad, w_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_rows, hi_n, 2 * lo_n),
                               lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_rows, hi_n, 2 * lo_n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bh, lanes), jnp.float32),
                        pltpu.VMEM((r_rows, bh * w_pad), jnp.float32),
                        pltpu.VMEM((n_cls, bh, w_pad), jnp.float32),
                        pltpu.VMEM((1, bh * w_pad), jnp.int32),
                        pltpu.VMEM((r_rows, bh * w_pad), jnp.int32),
                        pltpu.VMEM((r_rows, bh * w_pad), jnp.int32)],
        interpret=_use_interpret(),
        compiler_params=_cparams(),
    )(seed, labels, ls2d, mhT, mw)
    out = out.reshape(r_rows, hi_n, 2, lo_n).astype(jnp.float32)
    n_bg = out[:, :, 0].reshape(r_rows, n_buckets)
    n_fg = out[:, :, 1].reshape(r_rows, n_buckets)
    mid = _bucket_midpoints(n_buckets, edges)
    return jnp.stack([n_fg, n_bg, n_fg * mid, n_bg * mid], axis=-1)


def _fu_grad(ls2d, labels, mhT, mw, mwT, tbl, n_scales: int, n_cls: int,
             bh: int, w_real: int, n_buckets: int, edges: str = "uniform",
             seed=None, dither: bool = False):
    hi_n, lo_n = _bucket_split(n_buckets)
    n, hs_pad, lanes = ls2d.shape
    r_rows = n_scales * n_cls
    ws_pad = lanes // r_rows
    h_pad, w_pad = labels.shape[1], labels.shape[2]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        functools.partial(_fu_bwd_kernel, n_scales=n_scales, n_cls=n_cls,
                          bh=bh, w=w_pad, w_real=w_real, hi_n=hi_n,
                          lo_n=lo_n, ws_pad=ws_pad, edges=edges,
                          dither=dither),
        grid=(n, h_pad // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bh, w_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs_pad, lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, hs_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws_pad, w_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, ws_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_rows, 2 * lo_n, hi_n), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hs_pad, lanes), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hs_pad, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bh, lanes), jnp.float32),
                        pltpu.VMEM((r_rows, bh * w_pad), jnp.float32),
                        pltpu.VMEM((r_rows, bh * w_pad), jnp.float32),
                        pltpu.VMEM((n_cls, bh, w_pad), jnp.float32),
                        pltpu.VMEM((1, bh * w_pad), jnp.int32),
                        pltpu.VMEM((r_rows, bh * w_pad), jnp.int32),
                        pltpu.VMEM((r_rows, bh * w_pad), jnp.int32)],
        interpret=_use_interpret(),
        compiler_params=_cparams(),
    )(seed, labels, ls2d, mhT, mw, mwT, tbl)


def _fu_core_fwd(parts, labels, n_cls, bh, out_hw, n_buckets, align,
                 edges="uniform", seed=None, dither=False):
    n, hs, ws, _ = parts[0].shape
    hs_pad = -(-hs // 8) * 8
    ws_pad = -(-ws // 128) * 128
    h_pad, w_pad = labels.shape[1], labels.shape[2]
    mhT, mw, _ = _fu_mats(hs, ws, hs_pad, ws_pad, out_hw, h_pad, w_pad, align)
    ls2d = _fu_prep(parts, hs_pad, ws_pad)
    return _fu_histogram(ls2d, labels, mhT, mw, len(parts), n_cls, bh,
                         out_hw[1], n_buckets, edges, seed, dither)


def _fu_core_bwd(parts, labels, g_fg, g_bg, ct, n_cls, bh, out_hw,
                 n_buckets, align, edges="uniform", seed=None, dither=False):
    """Shared VJP tail: build the bucket-gradient tables, run the grad
    kernel, unpack the packed stride-8 layout back to per-scale NHWC."""
    n, hs, ws, c = parts[0].shape
    hs_pad = -(-hs // 8) * 8
    ws_pad = -(-ws // 128) * 128
    h_pad, w_pad = labels.shape[1], labels.shape[2]
    hi_n, lo_n = _bucket_split(n_buckets)
    r_rows = g_fg.shape[0]
    gf = (g_fg * ct[:, None]).reshape(r_rows, hi_n, lo_n)
    gb = (g_bg * ct[:, None]).reshape(r_rows, hi_n, lo_n)
    tbl = jnp.concatenate([gb, gf], axis=-1).transpose(0, 2, 1)
    mhT, mw, mwT = _fu_mats(hs, ws, hs_pad, ws_pad, out_hw, h_pad, w_pad,
                            align)
    ls2d = _fu_prep(parts, hs_pad, ws_pad)
    dls = _fu_grad(ls2d, labels, mhT, mw, mwT, tbl, len(parts), n_cls, bh,
                   out_hw[1], n_buckets, edges, seed, dither)
    d = dls.reshape(n, hs_pad, r_rows, ws_pad)[:, :hs, :, :ws]
    d = d.transpose(0, 1, 3, 2)                          # (N, hs, ws, R)
    return [d[..., i * c:(i + 1) * c].astype(p.dtype)
            for i, p in enumerate(parts)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def lovasz_two_scale_s8(li_s8, lf_s8, labels, seed, n_cls: int,
                        bhs: tuple[int, int], out_hw: tuple[int, int],
                        n_buckets: int = 2048, edges: str = "uniform",
                        dither: bool = False):
    """Two-scale bucket-Lovász straight from stride-8 NHWC logits with the
    align_corners=True bilinear upsample fused into the kernels (v4).

    `labels` (N, H_pad, W_pad) i32 with ignore pixels folded to -1 and all
    padding (lanes >= out_hw[1], rows >= out_hw[0]) set to -1. `seed` is a
    (1,) int32 dither seed (consumed only when `dither`). Returns
    (per_row (2C,), gts (2C,)): rows [0, C) interm scale, [C, 2C) final."""
    per_row, gts, _, _ = _losses_and_tables(
        _fu_core_fwd([li_s8, lf_s8], labels, n_cls, bhs[0], out_hw,
                     n_buckets, True, edges, seed, dither))
    return per_row, gts


def _fu2_fwd(li_s8, lf_s8, labels, seed, n_cls, bhs, out_hw, n_buckets,
             edges, dither):
    per_row, gts, g_fg, g_bg = _losses_and_tables(
        _fu_core_fwd([li_s8, lf_s8], labels, n_cls, bhs[0], out_hw,
                     n_buckets, True, edges, seed, dither))
    return (per_row, gts), (li_s8, lf_s8, labels, seed, g_fg, g_bg)


def _fu2_bwd(n_cls, bhs, out_hw, n_buckets, edges, dither, res, cts):
    li_s8, lf_s8, labels, seed, g_fg, g_bg = res
    dli, dlf = _fu_core_bwd([li_s8, lf_s8], labels, g_fg, g_bg, cts[0],
                            n_cls, bhs[1], out_hw, n_buckets, True, edges,
                            seed, dither)
    return dli, dlf, None, None


lovasz_two_scale_s8.defvjp(_fu2_fwd, _fu2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def lovasz_single_s8(lg_s8, labels, seed, n_cls: int, bhs: tuple[int, int],
                     out_hw: tuple[int, int], n_buckets: int,
                     align_corners: bool, edges: str = "uniform",
                     dither: bool = False):
    """Single-scale bucket-Lovász from stride-8 NHWC logits with the model's
    final bilinear upsample fused into the kernels (v4)."""
    per_class, gts, _, _ = _losses_and_tables(
        _fu_core_fwd([lg_s8], labels, n_cls, bhs[0], out_hw, n_buckets,
                     align_corners, edges, seed, dither))
    return per_class, gts


def _fu1_fwd(lg_s8, labels, seed, n_cls, bhs, out_hw, n_buckets,
             align_corners, edges, dither):
    per_class, gts, g_fg, g_bg = _losses_and_tables(
        _fu_core_fwd([lg_s8], labels, n_cls, bhs[0], out_hw, n_buckets,
                     align_corners, edges, seed, dither))
    return (per_class, gts), (lg_s8, labels, seed, g_fg, g_bg)


def _fu1_bwd(n_cls, bhs, out_hw, n_buckets, align_corners, edges, dither,
             res, cts):
    lg_s8, labels, seed, g_fg, g_bg = res
    (dlg,) = _fu_core_bwd([lg_s8], labels, g_fg, g_bg, cts[0], n_cls,
                          bhs[1], out_hw, n_buckets, align_corners, edges,
                          seed, dither)
    return dlg, None, None


lovasz_single_s8.defvjp(_fu1_fwd, _fu1_bwd)


# ---------------------------------------------------------------------------
# Public entry: fused two-scale Lovász from stride-8 logits
# ---------------------------------------------------------------------------

def _norm_dither_seed(dither_seed):
    """(seed (1,) int32, dither flag) from a dither_seed argument: None
    disables dither; any int / traced scalar enables it (the per-step seed,
    typically state.step — see losses/bucket_edges.py dither rationale)."""
    if dither_seed is None:
        return None, False
    if _USE_V3:
        raise ValueError("lovasz dither requires the v4 fused kernels "
                         "(unset CADIS_FUSED_V3)")
    return jnp.asarray(dither_seed, jnp.int32).reshape(1), True


def fused_two_scale_bucket_lovasz_s8(interm_logits_s8, final_logits_s8,
                                     labels, w_interm: float, w_final: float,
                                     classes_to_ignore: int | None = None,
                                     n_buckets: int = 2048,
                                     edges: str = "uniform",
                                     dither_seed=None):
    """TwoScaleLoss(Lovász, Lovász) evaluated at full label resolution from
    stride-8 logits, with the align_corners=True upsample fused into the
    transposed-layout pipeline (reference: models/OCR.py:128-138 upsamples
    both logit sets with align_corners=True before TwoScaleLoss).

    `edges`: bucket-edge mode, "uniform" or "adaptive" (two-sided log edges,
    losses/bucket_edges.py) — same kernel cost, different quantisation.
    `dither_seed`: int or traced int scalar enables per-pixel stochastic
    bucket assignment seeded per step (unbiased quantisation — see
    losses/bucket_edges.py); None = deterministic edges."""
    n, h, w = labels.shape
    c = final_logits_s8.shape[-1]
    lbl = labels.astype(jnp.int32)
    if classes_to_ignore is not None:
        lbl = jnp.where(lbl == classes_to_ignore, -1, lbl)
    h_pad = -(-h // 8) * 8
    w_pad = -(-w // 128) * 128
    if w_pad != w or h_pad != h:
        lbl = jnp.pad(lbl, ((0, 0), (0, h_pad - h), (0, w_pad - w)),
                      constant_values=-1)
    seed, dither = _norm_dither_seed(dither_seed)
    if not _USE_V3:
        bhs = (_pick_bh(h_pad, _FU_FWD_BH_CAP), _pick_bh(h_pad, _FU_BWD_BH_CAP))
        if seed is None:
            seed = jnp.zeros((1,), jnp.int32)
        per_row, gts = lovasz_two_scale_s8(interm_logits_s8, final_logits_s8,
                                           lbl, seed, c, bhs, (h, w),
                                           n_buckets, edges, dither)
    else:
        bhs = (_pick_bh(h_pad, _FWD_BH_CAP), _pick_bh(h_pad, _BWD_BH_CAP))
        li = upsample_nchw(interm_logits_s8, (h, w), w_pad=w_pad,
                           h_pad=h_pad).astype(jnp.float32)
        lf = upsample_nchw(final_logits_s8, (h, w), w_pad=w_pad,
                           h_pad=h_pad).astype(jnp.float32)
        per_row, gts = lovasz_two_scale_nchw(li, lf, lbl, c, bhs, w,
                                             n_buckets, edges)
    present = (gts > 0).astype(jnp.float32)
    pr_i, pr_f = present[:c], present[c:]
    loss_i = jnp.sum(per_row[:c] * pr_i) / jnp.maximum(jnp.sum(pr_i), 1.0)
    loss_f = jnp.sum(per_row[c:] * pr_f) / jnp.maximum(jnp.sum(pr_f), 1.0)
    return w_interm * loss_i + w_final * loss_f


# ---------------------------------------------------------------------------
# Single-scale NCHW kernels (DeepLabv3/v3+/UPerNet recipes): same bucket
# machinery, one logits grid. Pairing packs two CLASSES per 128-wide MXU
# pass (any two rows pair — unlike the two-scale kernel they don't share a
# foreground mask, so each row computes its own).
# ---------------------------------------------------------------------------

def _nchw1_fwd_kernel(lbl_ref, lg_ref, out_ref, pscr, sscr, lscr,
                      *, n_cls, bh, w, w_real, hi_n, lo_n, edges):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sscr[...] = _softmax_rows(lg_ref[0].astype(jnp.float32))
    for j in range(bh):
        pscr[0:n_cls, pl.ds(j * w, w)] = sscr[:, j, :]
        lscr[0:1, pl.ds(j * w, w)] = lbl_ref[0, j, :][None]
    _single_hist_body(pscr, lscr, out_ref, n_cls=n_cls, bh=bh, w=w,
                      w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges)


def _single_hist_body(pscr, lscr, out_ref, *, n_cls, bh, w, w_real,
                      hi_n, lo_n, edges="uniform"):
    """Single-scale histogram accumulation from staged probs — shared by
    the v3 and v4 forward kernels (class-paired MXU packing)."""
    k = bh * w
    n_b = hi_n * lo_n
    cols = 2 * lo_n
    paired = 2 * hi_n <= 128 and 2 * cols <= 128
    lbl = lscr[0:1, :]
    valid = (lbl >= 0).astype(jnp.float32)
    # ignore pixels excluded exactly via bid=-1; count-only int8 histogram
    # columns (see _nchw_fwd_kernel)
    keep = lbl >= 0
    if w_real != w:
        kio = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        keep = keep & (kio % w < w_real)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hi_n, k), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * lo_n, k), 0)
    bid_of = make_bid_fn(n_b, edges)

    def one_hots(r):
        prow = pscr[pl.ds(r, 1), :] * valid
        fg = lbl == r
        e = jnp.abs(fg.astype(jnp.float32) - prow)
        bid = jnp.where(keep, bid_of(e), -1)
        hi = jnp.where(bid < 0, -1, bid // lo_n)
        comb = jnp.where(bid < 0, -1,
                         bid % lo_n + lo_n * fg.astype(jnp.int32))
        a2 = (hi == iota_h).astype(jnp.int8)
        b2t = (comb == iota_c).astype(jnp.int8)
        return a2, b2t

    quad = 4 * hi_n <= 128 and 4 * cols <= 128

    def single(r):
        a2, b2t = one_hots(r)
        acc = jax.lax.dot_general(
            a2, b2t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[pl.ds(r, 1), :, :] += acc[None]

    def pair_rows(r0):
        a0, b0 = one_hots(r0)
        a1, b1 = one_hots(r0 + 1)
        acc = jax.lax.dot_general(
            jnp.concatenate([a0, a1], axis=0),
            jnp.concatenate([b0, b1], axis=0),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[pl.ds(r0, 1), :, :] += acc[:hi_n, :cols][None]
        out_ref[pl.ds(r0 + 1, 1), :, :] += acc[hi_n:, cols:][None]

    if quad and n_cls >= 4:
        # hi_n <= 32 (B <= 512): four CLASSES per 128-wide MXU pass (see
        # the two-scale kernel's quad layout)
        def quad_body(p, _):
            r0 = 4 * p
            parts = [one_hots(r0 + i) for i in range(4)]
            acc = jax.lax.dot_general(
                jnp.concatenate([a for a, _ in parts], axis=0),
                jnp.concatenate([b for _, b in parts], axis=0),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)        # (4HI, 4cols)
            for i in range(4):
                out_ref[pl.ds(r0 + i, 1), :, :] += \
                    acc[i * hi_n:(i + 1) * hi_n, i * cols:(i + 1) * cols][None]
            return 0

        jax.lax.fori_loop(0, n_cls // 4, quad_body, 0)
        rem = n_cls % 4
        base = n_cls - rem
        if rem >= 2:
            pair_rows(base)
        if rem % 2:
            single(n_cls - 1)
    elif paired and n_cls >= 2:
        def pair(p, _):
            pair_rows(2 * p)
            return 0

        jax.lax.fori_loop(0, n_cls // 2, pair, 0)
        if n_cls % 2:
            single(n_cls - 1)
    else:
        def row(r, _):
            single(r)
            return 0

        jax.lax.fori_loop(0, n_cls, row, 0)


def _nchw1_bwd_kernel(lbl_ref, lg_ref, tbl_ref, dlg_ref, pscr, dscr, sscr,
                      lscr, *, n_cls, bh, w, w_real, hi_n, lo_n, edges):
    sscr[...] = _softmax_rows(lg_ref[0].astype(jnp.float32))
    for j in range(bh):
        pscr[0:n_cls, pl.ds(j * w, w)] = sscr[:, j, :]
        lscr[0:1, pl.ds(j * w, w)] = lbl_ref[0, j, :][None]
    _degrad_rows(pscr, dscr, lscr, tbl_ref, n_rows=n_cls, n_cls=n_cls,
                 bh=bh, w=w, w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges)
    for j in range(bh):
        dlg_ref[0, :, j, :] = dscr[0:n_cls, pl.ds(j * w, w)]


def _nchw1_histogram(logits, labels, bh: int, w_real: int, n_buckets: int,
                     edges: str = "uniform"):
    hi_n, lo_n = _bucket_split(n_buckets)
    n, c, h, w = logits.shape
    out = pl.pallas_call(
        functools.partial(_nchw1_fwd_kernel, n_cls=c, bh=bh, w=w,
                          w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, hi_n, 2 * lo_n), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hi_n, 2 * lo_n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((c, bh * w), jnp.float32),
                        pltpu.VMEM((c, bh, w), jnp.float32),
                        pltpu.VMEM((1, bh * w), jnp.int32)],
        interpret=_use_interpret(),
        compiler_params=_cparams(),
    )(labels, logits)
    out = out.reshape(c, hi_n, 2, lo_n).astype(jnp.float32)
    n_bg = out[:, :, 0].reshape(c, n_buckets)
    n_fg = out[:, :, 1].reshape(c, n_buckets)
    mid = _bucket_midpoints(n_buckets, edges)
    return jnp.stack([n_fg, n_bg, n_fg * mid, n_bg * mid], axis=-1)


def _nchw1_grad(logits, labels, tbl, bh: int, w_real: int, n_buckets: int,
                edges: str = "uniform"):
    hi_n, lo_n = _bucket_split(n_buckets)
    n, c, h, w = logits.shape
    return pl.pallas_call(
        functools.partial(_nchw1_bwd_kernel, n_cls=c, bh=bh, w=w,
                          w_real=w_real, hi_n=hi_n, lo_n=lo_n, edges=edges),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * lo_n, hi_n), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, bh, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(logits.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, bh * w), jnp.float32),
                        pltpu.VMEM((c, bh * w), jnp.float32),
                        pltpu.VMEM((c, bh, w), jnp.float32),
                        pltpu.VMEM((1, bh * w), jnp.int32)],
        interpret=_use_interpret(),
        compiler_params=_cparams(),
    )(labels, logits, tbl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def lovasz_single_nchw(logits, labels, bhs: tuple[int, int], w_real: int,
                       n_buckets: int = 2048, edges: str = "uniform"):
    """Single-scale bucket-Lovász core on an (N, C, H, W_pad) f32 logit grid.
    `bhs` = (forward, backward) block heights. Returns (per_class (C,),
    gts (C,))."""
    per_class, gts, _, _ = _losses_and_tables(
        _nchw1_histogram(logits, labels, bhs[0], w_real, n_buckets, edges))
    return per_class, gts


def _nchw1_fwd(logits, labels, bhs, w_real, n_buckets, edges):
    per_class, gts, g_fg, g_bg = _losses_and_tables(
        _nchw1_histogram(logits, labels, bhs[0], w_real, n_buckets, edges))
    return (per_class, gts), (logits, labels, g_fg, g_bg)


def _nchw1_bwd(bhs, w_real, n_buckets, edges, res, cts):
    bh = bhs[1]
    logits, labels, g_fg, g_bg = res
    hi_n, lo_n = _bucket_split(n_buckets)
    ct = cts[0]
    c = g_fg.shape[0]
    gf = (g_fg * ct[:, None]).reshape(c, hi_n, lo_n)
    gb = (g_bg * ct[:, None]).reshape(c, hi_n, lo_n)
    tbl = jnp.concatenate([gb, gf], axis=-1).transpose(0, 2, 1)
    dlg = _nchw1_grad(logits, labels, tbl, bh, w_real, n_buckets, edges)
    return dlg, None


lovasz_single_nchw.defvjp(_nchw1_fwd, _nchw1_bwd)


def fused_bucket_lovasz_s8(logits_s8, labels, classes_to_consider=None,
                           classes_to_ignore: int | None = None,
                           n_buckets: int = 2048,
                           align_corners: bool = True,
                           edges: str = "uniform",
                           dither_seed=None):
    """Single-scale bucket Lovász-Softmax from pre-upsample logits, with
    the model's final bilinear upsample fused into the NCHW pipeline.

    Semantics mirror losses.functional.lovasz_softmax (per_image=False):
    `classes_to_consider` None/'present' averages over classes present in
    the labels, 'all' over every channel, or an explicit id list.
    `align_corners` must match the model's own final upsample (True for
    OCR/DeepLab heads, False for UPerNet, models/*.py).
    `dither_seed`: see fused_two_scale_bucket_lovasz_s8."""
    n, h, w = labels.shape
    c = logits_s8.shape[-1]
    lbl = labels.astype(jnp.int32)
    if classes_to_ignore is not None:
        lbl = jnp.where(lbl == classes_to_ignore, -1, lbl)
    h_pad = -(-h // 8) * 8
    w_pad = -(-w // 128) * 128
    if w_pad != w or h_pad != h:
        lbl = jnp.pad(lbl, ((0, 0), (0, h_pad - h), (0, w_pad - w)),
                      constant_values=-1)
    seed, dither = _norm_dither_seed(dither_seed)
    if not _USE_V3:
        bhs = (_pick_bh(h_pad, _FU_FWD_BH_CAP), _pick_bh(h_pad, _FU_BWD_BH_CAP))
        if seed is None:
            seed = jnp.zeros((1,), jnp.int32)
        per_class, gts = lovasz_single_s8(logits_s8, lbl, seed, c, bhs,
                                          (h, w), n_buckets, align_corners,
                                          edges, dither)
    else:
        bhs = (_pick_bh(h_pad, _FWD_BH_CAP), _pick_bh(h_pad, _BWD1_BH_CAP))
        lg = upsample_nchw(logits_s8, (h, w), align_corners=align_corners,
                           w_pad=w_pad, h_pad=h_pad).astype(jnp.float32)
        per_class, gts = lovasz_single_nchw(lg, lbl, bhs, w, n_buckets, edges)
    if classes_to_consider in (None, "present", "all"):
        class_mask = jnp.ones(c)
    else:
        class_mask = jnp.zeros(c).at[jnp.asarray(classes_to_consider)].set(1.0)
    if classes_to_consider == "all":
        m = class_mask
    else:
        m = class_mask * (gts > 0).astype(jnp.float32)
    return jnp.sum(per_class * m) / jnp.maximum(jnp.sum(m), 1.0)
