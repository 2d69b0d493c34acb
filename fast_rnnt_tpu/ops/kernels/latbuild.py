"""Fused Pallas lattice-build kernels: (lm, am, symbols) -> (px, py) rows.

TPU-native replacement for the XLA simple-lattice build
(ops/lattice.py:get_rnnt_logprobs_rows, itself the TPU redesign of the
reference's rnnt_loss.py:63-223).  Motivation is pure HBM traffic: the
XLA build materializes exp(am - am_max) ([B, T, C], the step's largest
tensor) and then reads BOTH it and raw ``am`` again in the two einsums —
at the benchmark shape that is ~450 MB of traffic for a 545 µs stage
pinned at the bandwidth wall (BENCH.md roofline).  This kernel streams
each ``am`` tile through VMEM exactly ONCE and does everything in
registers while it is resident:

  * am_max and the shift exp                (VPU, f32 in-register)
  * normalizer = log(lm_probs @ am_probs^T) (MXU; the rnnt_loss.py:175-186
                                             memory trick, same precision
                                             knob as the XLA einsums)
  * the px symbol gather as a one-hot matmul (MXU, same resident tile)
  * the py blank column, the regular -inf pad column, fix_for_boundary,
    and the out-dtype cast all fused into the output stores

HBM traffic drops to read-am + write-px/py (~145 MB fp32, ~90 MB bf16).
The backward is a second fused kernel with the same structure: it
recomputes am_probs in-register (the forward stores NO residual beyond
what autodiff already keeps alive: lm, am, symbols), emits d_am tiles
directly, and accumulates d_lm in a VMEM scratch across the sequential
t-block grid dimension.

Layout note (round 4, BATCHED): the bblk batch rows ride every
contraction as a dot_general batch dimension — the kernel body is a
handful of large batched ops, not a per-b Python loop of small ones.
Per-(b, s) side quantities ship as (bblk, S?) B-major slabs consumed
directly (the round-3 lane-axis stacking + per-b one-hot extraction
matvecs are retired).  Measured same-process A/B at the headline shape
(B=30, T=1000, S=100, C=500, fp32): forward 384.5 -> 240.0 us at
bit-identical max error vs the XLA build (5.05e-5 on px/py for both) —
the per-row structure, not the math, was the round-3 cost.

Numerics match the XLA build: same formula and stability shifts (the
maxes are stop-gradient on both paths, so neither backward carries
max-VJP terms), same MXU precision (ops/lattice.py:matmul_precision()),
f32 accumulation throughout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..numerics import NEG_INF
from .wavefront import _interpret_default, _out_struct

__all__ = ["lattice_rows_fused"]

LANE = 128
SUBLANE = 8
_TINY = float(np.finfo(np.float32).tiny)

# Mosaic's default scoped-VMEM budget is 16 MB; at the headline shape
# (C=500, bblk=8) the fwd kernel's resident set (lmp block + am block +
# double-buffering) is ~17 MB, so raise the cap.  v5e has 128 MB of VMEM;
# 64 MB leaves Mosaic room to keep double-buffering every stream.
_VMEM_BYTES = 64 * 1024 * 1024
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BYTES)
# the forward kernel is embarrassingly parallel over both grid dims (the
# py/nd clamp duplicates write identical values, so any order is valid);
# the backward accumulates d_lm across t blocks and d_uni across the
# whole grid in VMEM scratch, so its dims stay "arbitrary" (sequential)
_PARAMS_FWD = pltpu.CompilerParams(
    vmem_limit_bytes=_VMEM_BYTES,
    dimension_semantics=("parallel", "parallel"),
)
_PARAMS_BWD = pltpu.CompilerParams(
    vmem_limit_bytes=_VMEM_BYTES,
    dimension_semantics=("arbitrary", "arbitrary"),
)

def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_lane(x: jax.Array) -> jax.Array:
    """Zero-pad the last axis to a multiple of LANE.

    The per-(s, b) side inputs put batch on the LANE axis; Mosaic only
    accepts lane block dims that are multiples of 128 (or the full array
    dim), so they ship in 128-wide lane blocks and the kernel picks the
    live column with an exact one-hot matvec (``_extract_col``).  Padded
    columns are zeros and only ever feed batch rows whose outputs pallas
    drops on store."""
    b = x.shape[-1]
    pad = _cdiv(b, LANE) * LANE - b
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _side_spec(nrows: int, bblk: int) -> pl.BlockSpec:
    """(nrows, LANE) lane-block over a (nrows, B_pad) side array; all
    bblk batch rows of grid step ib live in one lane block (bblk | LANE)."""
    return pl.BlockSpec(
        (nrows, LANE), lambda ib, it: (0, (ib * bblk) // LANE),
        memory_space=pltpu.VMEM,
    )


def _extract_col(side_ref, sel):
    """Column ib*bblk+i of a side array as an (nrows, 1) f32 vector: an
    exact one-hot contraction (f32 HIGHEST; products with 0/1 are exact)
    — Mosaic-safe where a lane slice at an unaligned offset is not."""
    return jax.lax.dot_general(
        side_ref[...], sel, dimension_numbers=((((1,), (0,)), ((), ()))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot(a, b, dims, precision):
    """dot_general with f32 accumulation; operands stay in their dtype so
    bf16 inputs ride the MXU natively while f32 inputs honor the
    precision knob (same contract as the XLA build's einsums).  Mosaic
    rejects an explicit contract precision on bf16 operands ("Bad lhs
    type": bf16 already IS the native one-pass mode), so the knob only
    applies to f32 operands."""
    if a.dtype == jnp.bfloat16 or b.dtype == jnp.bfloat16:
        precision = None
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot1(a, b, dims):
    """Single-pass MXU matmul (DEFAULT precision) with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _msplit(x32, n: int, f32: bool):
    """bf16 operand parts for a split matmul.

    f32 mode: n-term bf16 decomposition of the f32 array (x == sum(parts)
    to >= 8*n mantissa bits; n=3 reconstructs full f32 precision, so a
    split matmul against an EXACT operand — a 0/1 one-hot — reproduces
    HIGHEST-precision results in n one-MXU-pass matmuls instead of 6).
    bf16 mode: the plain cast, one part (the XLA build's bf16 numerics
    class).  On-chip attribution for this trick: benchmarks/
    latbuild_variants.py."""
    if not f32:
        return (x32.astype(jnp.bfloat16),)
    parts = []
    r = x32
    for _ in range(n - 1):
        p = r.astype(jnp.bfloat16)
        parts.append(p)
        r = r - p.astype(jnp.float32)
    parts.append(r.astype(jnp.bfloat16))
    return tuple(parts)


def _dotn(a_parts, b_parts, dims):
    """Split matmul: sum of one-pass dots over the leading-order part
    pairs (i == 0 or j == 0; cross terms of two low parts are below
    2^-16 relative and dropped).  With a single part on one side this is
    exact in the other side's parts."""
    out = None
    for i, a in enumerate(a_parts):
        for j, b in enumerate(b_parts):
            if i and j:
                continue
            t = _dot1(a, b, dims)
            out = t if out is None else out + t
    return out


def _bdot(a, b, dims, precision=None):
    """Batch-dim dot_general (batch axis 0 on both operands) with f32
    accumulation; same bf16-native rule as _dot."""
    if a.dtype == jnp.bfloat16 or b.dtype == jnp.bfloat16:
        precision = None
    contract, = (dims,) if isinstance(dims[0], int) else (dims,)
    return jax.lax.dot_general(
        a, b, dimension_numbers=((contract[0], contract[1]), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _bdotn(a_parts, b_parts, dims):
    """Batched split matmul (see _dotn): leading-order part pairs only."""
    out = None
    for i, a in enumerate(a_parts):
        for j, b in enumerate(b_parts):
            if i and j:
                continue
            t = _bdot(a, b, dims)
            out = t if out is None else out + t
    return out


def _build_fwd_kernel(
    *refs,
    S: int, C: int, T: int, modified: bool, blank: int, bblk: int,
    precision, mxu_dtype, parts: bool, save_d: bool = False,
):
    if save_d:
        *refs, d_ref = refs
    """BATCHED formulation (round 4): every contraction carries the
    bblk batch rows as a dot_general batch dim, so the kernel body is a
    handful of large ops instead of a per-b Python loop of small ones.
    Same-process A/B at the headline shape (B=30, T=1000, S=100, C=500,
    fp32): 384.5 -> 240.0 us at BIT-IDENTICAL error vs the XLA build
    (max abs 5.05e-5 on px/py for both) — the per-row structure, not
    the math, was the round-3 kernel's cost."""
    if parts:
        (lmp_ref, sym_ref, pxlm_ref, pylm_ref, lmmax_ref, te_ref, uni_ref,
         am_ref, px_ref, py_ref, nd_ref) = refs
    else:
        (lmp_ref, sym_ref, pxlm_ref, pylm_ref, lmmax_ref, te_ref,
         am_ref, px_ref, py_ref) = refs
    S1 = S + 1
    f32 = mxu_dtype != jnp.bfloat16
    it = pl.program_id(1)
    tg = it * LANE + jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    cf = c_iota.astype(jnp.float32)

    a32 = am_ref[...].astype(jnp.float32)      # (bblk, LANE, C)
    amax = jnp.max(a32, axis=2, keepdims=True)  # (bblk, LANE, 1)
    ashift = a32 - amax                         # (bblk, LANE, C) f32
    ash_parts = _msplit(ashift, 3, f32)         # exact in f32 mode
    amp = jnp.exp(ashift).astype(mxu_dtype)
    lmp = lmp_ref[...]                          # (bblk, S1, C)
    d = _bdot(lmp, amp, ((2,), (2,)), precision) + _TINY  # (bblk, S1, LANE)
    # norm == log(D) + lmmax + amax; the amax term is folded into the
    # shifted am-side gathers below so no per-t row vector is needed
    lognorm = jnp.log(d) + lmmax_ref[...][:, :, None]  # (bblk, S1, LANE)

    oh = (sym_ref[...][:, :, None] == cf).astype(jnp.bfloat16)  # (b, S, C)
    # px_am - amax: one-hot gather as a split matmul — the one-hot is
    # exact in bf16 and the 3-term split reconstructs all 24 mantissa
    # bits, matching a HIGHEST contraction at half the MXU passes
    px_am = _bdotn((oh,), ash_parts, ((2,), (2,)))  # (bblk, S, LANE)
    px = px_am + pxlm_ref[...][:, :, None] - lognorm[:, :S]
    if not modified:
        # the appended t = T column is -inf (no symbol on the one-past-
        # the-end frame) and fix_for_boundary's te column likewise;
        # te is -1 when no boundary was given (never matches)
        te = te_ref[...][:, :, None].astype(jnp.int32)  # (bblk, 1, 1)
        px = jnp.where((tg == T) | (tg == te), NEG_INF, px)

    # blank column of the shifted am (the XLA build takes an exact
    # slice here) — same exact split contraction, reusing the parts
    blank_b = jnp.broadcast_to(
        (c_iota == blank).astype(jnp.bfloat16), (bblk, 1, C)
    )
    blank_row = _bdotn((blank_b,), ash_parts, ((2,), (2,)))  # (bblk, 1, LANE)
    py = blank_row + pylm_ref[...][:, :, None] - lognorm

    px_ref[...] = jnp.transpose(px, (1, 0, 2)).astype(px_ref.dtype)
    py_ref[...] = jnp.transpose(py, (1, 0, 2)).astype(py_ref.dtype)

    if save_d:
        # f32 mode: persist the normalizer denominator D for the VJP —
        # the backward's D recompute is 3 one-pass split matmuls per tile
        # (~130 µs at the benchmark shape) vs ~30 µs of extra traffic for
        # this 12 MB residual; it also makes the gradient weights use the
        # forward's EXACT HIGHEST-precision D instead of the ~2^-16 split
        # approximation.  bf16 mode keeps the recompute (single-pass,
        # cheaper than the traffic).
        d_ref[...] = jnp.transpose(d, (1, 0, 2)).astype(d_ref.dtype)

    if parts:
        # normd[s, t] = norm[s, t] - amonly[t] — the only form the
        # smoothed interpolation needs; the am_max shifts cancel
        # exactly in the difference, so the whole am-only normalizer
        # reduces to one extra batched matvec on the resident tile
        uni_b = jnp.broadcast_to(uni_ref[...][None], (bblk, 1, C))
        duni = _bdot(uni_b, amp, ((2,), (2,)), precision)  # (bblk, 1, LANE)
        nd = lognorm - jnp.log(duni)
        nd_ref[...] = jnp.transpose(nd, (1, 0, 2)).astype(nd_ref.dtype)


def _build_bwd_kernel(
    *refs,
    S: int, C: int, T: int, modified: bool, blank: int, bblk: int,
    precision, mxu_dtype, nt_am: int, parts: bool, Btotal: int = 0,
    save_d: bool = False,
):
    """Batched backward (round 4, same rationale as _build_fwd_kernel):
    the bblk batch rows ride every contraction as a dot_general batch
    dim — no per-b Python loop.  With ``save_d`` the normalizer
    denominator arrives as a residual input (f32 mode; see the forward
    kernel) instead of being recomputed."""
    d_res_ref = None
    if save_d:
        lmp_ref, sym_ref, te_ref, d_res_ref, *refs = refs
        refs = (lmp_ref, sym_ref, te_ref, *refs)
    if parts:
        (lmp_ref, sym_ref, te_ref, uni_ref, am_ref, dpx_ref,
         dpy_ref, dnd_ref, dam_ref, dlm_ref, duni_ref,
         dlm_acc, duni_acc) = refs
    else:
        (lmp_ref, sym_ref, te_ref, am_ref, dpx_ref, dpy_ref,
         dam_ref, dlm_ref, dlm_acc) = refs
    S1 = S + 1
    f32 = mxu_dtype != jnp.bfloat16
    it = pl.program_id(1)
    ib = pl.program_id(0)
    nt = pl.num_programs(1)
    nb = pl.num_programs(0)
    tg = it * LANE + jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    cf = c_iota.astype(jnp.float32)
    tmask = tg < T  # (1, 1, LANE): pallas pads t-edge blocks with garbage
    blank_f32 = (c_iota == blank).astype(jnp.float32)  # (1, 1, C)

    # t mask in row orientation for the am tiles: padded t rows hold
    # garbage (possibly NaN) and 0 * NaN = NaN inside an MXU contraction,
    # so they must be zeroed BEFORE any dot over t
    trow = it * LANE + jax.lax.broadcasted_iota(jnp.int32, (1, LANE, 1), 1)

    a32 = am_ref[...].astype(jnp.float32)       # (bblk, LANE, C)
    amax = jnp.max(a32, axis=2, keepdims=True)
    amp32 = jnp.where(trow < T, jnp.exp(a32 - amax), 0.0)
    amp = amp32.astype(mxu_dtype)
    amp_parts = _msplit(amp32, 2, f32)
    lmp32 = lmp_ref[...].astype(jnp.float32)    # (bblk, S1, C)
    lmp_parts = _msplit(lmp32, 2, f32)
    if save_d:
        # f32 mode: the forward's exact D rides in as a residual (see
        # _build_fwd_kernel) — saves 3 one-pass matmuls per tile
        d = jnp.transpose(d_res_ref[...], (1, 0, 2)).astype(jnp.float32)
    else:
        # normalizer recompute: only ever used as the 1/D gradient weight
        # below, so a ~2^-16-relative split matmul replaces the forward's
        # HIGHEST contraction
        d = _bdotn(lmp_parts, amp_parts, ((2,), (2,))) + _TINY  # (b,S1,LANE)

    dpx = jnp.transpose(dpx_ref[...], (1, 0, 2)).astype(jnp.float32)
    dpy = jnp.transpose(dpy_ref[...], (1, 0, 2)).astype(jnp.float32)
    if not modified:
        # cotangents of the constant -inf columns don't flow anywhere
        te = te_ref[...][:, :, None].astype(jnp.int32)  # (bblk, 1, 1)
        dpx = jnp.where((tg == T) | (tg == te), 0.0, dpx)
    dpx = jnp.where(tmask, dpx, 0.0)  # (bblk, S, LANE)
    dpy = jnp.where(tmask, dpy, 0.0)  # (bblk, S1, LANE)

    # d norm[s, t] = -(dpx[s, t] (rows < S) + dpy[s, t]); w = d norm / D.
    # The t mask matters: at padded t columns D is garbage (possibly NaN)
    # and w feeds a contraction OVER t in the d_lm path.
    dnorm = -(jnp.concatenate([dpx, jnp.zeros_like(dpx[:, :1])], axis=1) + dpy)
    if parts:
        # normd = norm - amonly is a third primal output; its cotangent
        # adds to the norm path and subtracts (summed over s) from the
        # am-only normalizer path
        dnd = jnp.where(
            tmask, jnp.transpose(dnd_ref[...], (1, 0, 2)).astype(jnp.float32),
            0.0,
        )
        dnorm = dnorm + dnd
    w = jnp.where(tmask, dnorm / d, 0.0)  # (bblk, S1, LANE)
    w_parts = _msplit(w, 2, f32)

    # --- d_am tiles (bblk, LANE, C) -----------------------------------
    # normalizer path (exp chain; the maxes are stop-gradient):
    #   d_am[t, c] += amp[t, c] * sum_s lmp[s, c] * w[s, t]
    dam = amp32 * _bdotn(w_parts, lmp_parts, ((1,), (1,)))
    # px one-hot gather path: d_am[t, c] += sum_s oh[s, c] * dpx[s, t]
    # — the one-hot is exact in bf16, the 3-term dpx split is exact f32
    oh = (sym_ref[...][:, :, None] == cf).astype(jnp.bfloat16)  # (b, S, C)
    dam = dam + _bdotn(_msplit(dpx, 3, f32), (oh,), ((1,), (1,)))
    # py blank-column path: sum_s dpy[s, t] scattered to c == blank
    colsum = jnp.transpose(
        jnp.sum(dpy, axis=1, keepdims=True), (0, 2, 1)
    )  # (bblk, LANE, 1)
    dam = dam + colsum * blank_f32

    if parts:
        # am-only normalizer path: amonly[t] = log sum_c uni[c]*amp[t,c]
        # (+ amax, stop-grad), so d_am[t,c] += uni[c]*amp[t,c] * rd[t]
        # with rd = d_amonly / D_uni and d_amonly[t] = -sum_s dnd[s,t]
        uni = uni_ref[...]  # (1, C)
        uni_b = jnp.broadcast_to(uni[None], (bblk, 1, C))
        duni_row = _bdot(uni_b, amp, ((2,), (2,)), precision)  # (b, 1, LANE)
        rd_row = jnp.where(
            tmask, -jnp.sum(dnd, axis=1, keepdims=True) / duni_row, 0.0
        )  # (b, 1, LANE)
        rd_col = jnp.transpose(rd_row, (0, 2, 1))  # (b, LANE, 1)
        dam = dam + amp32 * (rd_col * uni.astype(jnp.float32)[None])
        # d_uni[c] = sum_{b,t} amp[t,c] * rd[t], accumulated across the
        # WHOLE grid in a scratch, flushed at the end.  Batch-padding
        # rows (>= B) hold garbage; per-row OUTPUTS are dropped on store,
        # but this accumulator crosses rows — mask them explicitly.
        duni_i = _bdot(rd_row.astype(mxu_dtype), amp, ((2,), (1,)),
                       precision)  # (b, 1, C)
        bvalid = (
            ib * bblk + jax.lax.broadcasted_iota(jnp.int32, (bblk, 1, 1), 0)
            < Btotal
        )
        duni_sum = jnp.sum(jnp.where(bvalid, duni_i, 0.0), axis=0)  # (1, C)
        prev_u = jnp.where((it > 0) | (ib > 0), duni_acc[...], 0.0)
        duni_acc[...] = prev_u + duni_sum

    @pl.when(it < nt_am)
    def _():
        dam_ref[...] = dam.astype(dam_ref.dtype)

    # --- d_lm accumulation (bblk, S1, C) over the sequential t blocks --
    dlm_i = lmp32 * _bdotn(w_parts, amp_parts, ((2,), (1,)))
    # px_lm gather path (rows < S) and py_lm blank path
    dlm_i = dlm_i + jnp.concatenate(
        [
            oh.astype(jnp.float32) * jnp.sum(dpx, axis=2, keepdims=True),
            jnp.zeros((bblk, 1, C), jnp.float32),
        ],
        axis=1,
    )
    dlm_i = dlm_i + blank_f32 * jnp.sum(dpy, axis=2, keepdims=True)

    prev = jnp.where(it > 0, dlm_acc[...], 0.0)
    dlm_acc[...] = prev + dlm_i

    @pl.when(it == nt - 1)
    def _():
        dlm_ref[...] = dlm_acc[...].astype(dlm_ref.dtype)

    if parts:

        @pl.when((it == nt - 1) & (ib == nb - 1))
        def _():
            duni_ref[...] = duni_acc[...].astype(duni_ref.dtype)


def _shape_params(B: int, T: int, modified: bool):
    wpx = T if modified else T + 1
    bblk = SUBLANE
    nb = _cdiv(B, bblk)
    nt = _cdiv(wpx, LANE)
    nt_am = _cdiv(T, LANE)
    return wpx, bblk, nb, nt, nt_am


def _stack_side_fwd(lmmax_t, pxlm_t, pylm_t, symbols, te_fix):
    """Stack the forward kernel's five per-(row, batch) side inputs into
    one lane-padded f32 array: [lmmax (S1) | pxlm (S) | pylm (S1) |
    sym (S) | te (1)].  The kernel slices the extracted column at the
    same static offsets."""
    te_row = te_fix.astype(jnp.float32)[None, :]
    return _pad_lane(jnp.concatenate(
        [lmmax_t, pxlm_t, pylm_t, symbols.astype(jnp.float32).T, te_row],
        axis=0,
    ))


def _stack_side_bwd(symbols, te_fix):
    """Backward side stack: [sym (S) | te (1)]."""
    te_row = te_fix.astype(jnp.float32)[None, :]
    return _pad_lane(jnp.concatenate(
        [symbols.astype(jnp.float32).T, te_row], axis=0,
    ))


def _lm_parts(lm, symbols, blank):
    """Tiny XLA precomputation shared by fwd and bwd: the lm softmax parts
    and the per-(b, s) lm gathers, B-major (batch on the sublane axis —
    the batched kernels consume (bblk, S?) blocks directly; the round-3
    lane-axis stacking + per-b extraction matvecs are retired)."""
    lm32 = lm.astype(jnp.float32)
    lmmax = jax.lax.stop_gradient(jnp.max(lm32, axis=2))  # (B, S1)
    lmp = jnp.exp(lm32 - lmmax[:, :, None])  # (B, S1, C)
    S = symbols.shape[1]
    oh = (
        symbols.astype(jnp.int32)[:, :, None]
        == jnp.arange(lm.shape[2], dtype=jnp.int32)
    )
    pxlm = jnp.sum(lm32[:, :S, :] * oh, axis=2)  # (B, S)
    pylm = lm32[:, :, blank]  # (B, S1)
    return lmmax, lmp, pxlm, pylm


def _mxu_dtype(am_dtype):
    # bf16 inputs ride the MXU natively (the XLA build's einsums contract
    # bf16 operands the same way); f32 inputs keep f32 operands + the
    # precision knob
    return jnp.bfloat16 if am_dtype == jnp.bfloat16 else jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _build(lm, am, symbols, te_fix, precision, blank, modified, out_dtype,
           interpret):
    return _build_fwd(
        lm, am, symbols, te_fix, precision, blank, modified, out_dtype,
        interpret,
    )[0]


@functools.lru_cache(maxsize=None)
def _build_fwd_partitioned(precision, blank, modified, out_dtype, interpret,
                           save_d=False):
    from .partition import batch_partitioned

    core = functools.partial(
        _build_core_fwd, precision=precision, blank=blank,
        modified=modified, out_dtype=out_dtype, interpret=interpret,
        save_d=save_d,
    )
    out_axes = (1, 1, 1) if save_d else (1, 1)
    out_ranks = (3, 3, 3) if save_d else (3, 3)
    return batch_partitioned(
        core, (0, 0, 0, 0), out_axes, (3, 3, 2, 1), out_ranks,
        name="latbuild_fwd",
    )


# f32 mode persists the normalizer denominator D for the VJP (see
# _build_fwd_kernel's save_d note); bf16 keeps the cheap recompute.
# Module switch for A/B measurement.
_SAVE_D = True


def _build_fwd(lm, am, symbols, te_fix, precision, blank, modified,
               out_dtype, interpret):
    save_d = _SAVE_D and _mxu_dtype(am.dtype) != jnp.bfloat16
    out = _build_fwd_partitioned(
        precision, blank, modified, jnp.dtype(out_dtype), bool(interpret),
        save_d,
    )(lm, am, symbols, te_fix)
    if save_d:
        px_rows, py_rows, d_rows = out
        return (px_rows, py_rows), (lm, am, symbols, te_fix, d_rows)
    return out, (lm, am, symbols, te_fix, None)


def _fwd_side_specs(bblk, S, S1):
    """BlockSpecs for the B-major side inputs (sym, pxlm, pylm, lmmax,
    te): per-batch-block 2-D slabs, lane dim = the full array dim."""
    row = lambda n: pl.BlockSpec(
        (bblk, n), lambda ib, it: (ib, 0), memory_space=pltpu.VMEM
    )
    return [row(S), row(S), row(S1), row(S1), row(1)]


def _build_core_fwd(lm, am, symbols, te_fix, *, precision, blank, modified,
                    out_dtype, interpret, save_d=False):
    """pallas_call body of the fused build (per-shard shapes under the
    GSPMD wrapper, ops/kernels/partition.py)."""
    B, T, C = am.shape
    S1 = lm.shape[1]
    S = S1 - 1
    wpx, bblk, nb, nt, nt_am = _shape_params(B, T, modified)
    lmmax, lmp, pxlm, pylm = _lm_parts(lm, symbols, blank)
    mxu_dtype = _mxu_dtype(am.dtype)

    lmp = lmp.astype(mxu_dtype)
    symf = symbols.astype(jnp.float32)  # ids < 2^24: exact in f32
    te2 = te_fix.astype(jnp.int32)[:, None]  # (B, 1)

    kernel = functools.partial(
        _build_fwd_kernel, S=S, C=C, T=T, modified=modified, blank=blank,
        bblk=bblk, precision=precision, mxu_dtype=mxu_dtype, parts=False,
        save_d=save_d,
    )
    clamp = lambda n: (lambda ib, it: (0, ib, jnp.minimum(it, n - 1)))
    out_specs = [
        pl.BlockSpec((S, bblk, LANE), lambda ib, it: (0, ib, it),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S1, bblk, LANE), clamp(nt_am),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        _out_struct((S, B, wpx), out_dtype, lm, am),
        _out_struct((S1, B, T), out_dtype, lm, am),
    ]
    if save_d:
        out_specs.append(
            pl.BlockSpec((S1, bblk, LANE), clamp(nt_am),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(_out_struct((S1, B, T), jnp.float32, lm, am))
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),  # lmp
            *_fwd_side_specs(bblk, S, S1),  # sym, pxlm, pylm, lmmax, te
            pl.BlockSpec((bblk, LANE, C),
                         lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                         memory_space=pltpu.VMEM),  # am
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_PARAMS_FWD,
    )(lmp, symf, pxlm, pylm, lmmax, te2, am)
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _build_bwd_partitioned(precision, blank, modified, interpret,
                           save_d=False):
    from .partition import batch_partitioned

    core = functools.partial(
        _build_core_bwd, precision=precision, blank=blank,
        modified=modified, interpret=interpret, save_d=save_d,
    )
    in_axes = (0, 0, 0, 0) + ((1,) if save_d else ()) + (1, 1)
    in_ranks = (3, 3, 2, 1) + ((3,) if save_d else ()) + (3, 3)
    return batch_partitioned(
        core, in_axes, (0, 0), in_ranks, (3, 3),
        name="latbuild_bwd",
    )


def _build_bwd(precision, blank, modified, out_dtype, interpret, res, cots):
    lm, am, symbols, te_fix, d_rows = res
    dpx, dpy = cots
    save_d = d_rows is not None
    rest = (d_rows, dpx, dpy) if save_d else (dpx, dpy)
    d_am, d_lm = _build_bwd_partitioned(
        precision, blank, modified, bool(interpret), save_d
    )(lm, am, symbols, te_fix, *rest)
    d_lm = d_lm.astype(lm.dtype)
    return (
        d_lm, d_am,
        np.zeros(symbols.shape, dtype=jax.dtypes.float0),
        np.zeros(te_fix.shape, dtype=jax.dtypes.float0),
    )


def _build_core_bwd(lm, am, symbols, te_fix, *rest, precision, blank,
                    modified, interpret, save_d=False):
    if save_d:
        d_rows, dpx, dpy = rest
    else:
        d_rows, (dpx, dpy) = None, rest
    B, T, C = am.shape
    S1 = lm.shape[1]
    S = S1 - 1
    wpx, bblk, nb, nt, nt_am = _shape_params(B, T, modified)
    _, lmp, _, _ = _lm_parts(lm, symbols, blank)
    mxu_dtype = _mxu_dtype(am.dtype)
    lmp = lmp.astype(mxu_dtype)
    symf = symbols.astype(jnp.float32)
    te2 = te_fix.astype(jnp.int32)[:, None]  # (B, 1)

    kernel = functools.partial(
        _build_bwd_kernel, S=S, C=C, T=T, modified=modified, blank=blank,
        bblk=bblk, precision=precision, mxu_dtype=mxu_dtype, nt_am=nt_am,
        parts=False, save_d=save_d,
    )
    row = lambda n: pl.BlockSpec(
        (bblk, n), lambda ib, it: (ib, 0), memory_space=pltpu.VMEM
    )
    clamp3 = lambda n: (lambda ib, it: (0, ib, jnp.minimum(it, n - 1)))
    in_specs = [
        pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                     memory_space=pltpu.VMEM),  # lmp
        row(S),  # sym (f32 ids)
        row(1),  # te
    ]
    inputs = [lmp, symf, te2]
    if save_d:
        in_specs.append(
            pl.BlockSpec((S1, bblk, LANE), clamp3(nt_am),
                         memory_space=pltpu.VMEM)  # D residual
        )
        inputs.append(d_rows)
    in_specs += [
        pl.BlockSpec((bblk, LANE, C),
                     lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                     memory_space=pltpu.VMEM),  # am
        pl.BlockSpec((S, bblk, LANE), lambda ib, it: (0, ib, it),
                     memory_space=pltpu.VMEM),  # dpx
        pl.BlockSpec((S1, bblk, LANE), clamp3(nt_am),
                     memory_space=pltpu.VMEM),  # dpy
    ]
    inputs += [am, dpx, dpy]
    d_am, d_lm = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bblk, LANE, C),
                         lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((B, T, C), am.dtype, lm, am, dpx, dpy),
            _out_struct((B, S1, C), jnp.float32, lm, am, dpx, dpy),
        ],
        scratch_shapes=[pltpu.VMEM((bblk, S1, C), jnp.float32)],
        interpret=interpret,
        compiler_params=_PARAMS_BWD,
    )(*inputs)

    return d_am, d_lm


_build.defvjp(_build_fwd, _build_bwd)


def lattice_rows_fused(
    lm: jax.Array,
    am: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    rnnt_type: str = "regular",
    boundary: Optional[jax.Array] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel equivalent of lattice.get_rnnt_logprobs_rows.

    Returns s-major ``(px_rows [S, B, T(+1)], py_rows [S1, B, T])``,
    differentiable w.r.t. (lm, am) via the fused backward kernel.
    ``out_dtype`` fuses the lattice-storage cast (the bf16 mixed-precision
    mode) into the kernel's output stores.
    """
    if interpret is None:
        interpret = _interpret_default()
    from .wavefront import vma_blocks_interpret

    if vma_blocks_interpret(interpret, lm, am):
        # interpret mode inside a vma-checked shard_map cannot evaluate
        # the kernel (see wavefront.vma_blocks_interpret) — the XLA einsum
        # build is the parity-tested equivalent
        from ..lattice import get_rnnt_logprobs_rows

        return get_rnnt_logprobs_rows(
            lm, am, symbols, termination_symbol, rnnt_type, boundary,
            out_dtype=out_dtype, impl="xla",
        )
    B, T, C = am.shape

    if rnnt_type == "constrained":
        # same composition AND cast order as the XLA path: build "modified"
        # in f32, px += py[1:], cast last (casting before the add would
        # add an extra rounding the einsum build does not have)
        px, py = lattice_rows_fused(
            lm, am, symbols, termination_symbol, "modified", None,
            None, interpret,
        )
        px = px + py[1:]
        if out_dtype is not None:
            px = px.astype(out_dtype)
            py = py.astype(out_dtype)
        return px, py

    modified = rnnt_type == "modified"
    if not modified and boundary is not None:
        te_fix = boundary[:, 3].astype(jnp.int32)
    else:
        te_fix = jnp.full((B,), -1, jnp.int32)
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else jnp.dtype(
        jnp.float32
    )
    from ..lattice import matmul_precision

    return _build(
        lm, am, symbols, te_fix, matmul_precision(), int(termination_symbol),
        modified, out_dtype, bool(interpret),
    )


# --- smoothed-lattice variant -------------------------------------------------
#
# The smoothed build (reference rnnt_loss.py:1132-1367) interpolates the
# combined, lm-only and am-only lattices.  Everything lm-side is tiny; the
# only am-heavy extra is the am-only normalizer log(sum_c unigram_c *
# am_probs[t, c]).  The kernels above compute it as a third output
# ``normd = norm - amonly`` (the exact difference the interpolation needs;
# the am_max shifts cancel) for one extra matvec on the resident tile, and
# the interpolation itself is cheap XLA arithmetic over (S, B, T) arrays.


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _build_parts(lm, am, symbols, te_fix, uni, precision, blank, modified,
                 interpret):
    return _build_parts_fwd(
        lm, am, symbols, te_fix, uni, precision, blank, modified, interpret
    )[0]


@functools.lru_cache(maxsize=None)
def _build_parts_fwd_partitioned(precision, blank, modified, interpret):
    from .partition import batch_partitioned

    core = functools.partial(
        _build_parts_core_fwd, precision=precision, blank=blank,
        modified=modified, interpret=interpret,
    )
    # uni is batch-free (replicated); the three outputs are s-major rows
    return batch_partitioned(
        core, (0, 0, 0, 0, None), (1, 1, 1), (3, 3, 2, 1, 1), (3, 3, 3),
        name="latbuild_parts_fwd",
    )


def _build_parts_fwd(lm, am, symbols, te_fix, uni, precision, blank,
                     modified, interpret):
    out = _build_parts_fwd_partitioned(
        precision, blank, modified, bool(interpret)
    )(lm, am, symbols, te_fix, uni)
    return out, (lm, am, symbols, te_fix, uni)


def _build_parts_core_fwd(lm, am, symbols, te_fix, uni, *, precision, blank,
                          modified, interpret):
    B, T, C = am.shape
    S1 = lm.shape[1]
    S = S1 - 1
    wpx, bblk, nb, nt, nt_am = _shape_params(B, T, modified)
    lmmax, lmp, pxlm, pylm = _lm_parts(lm, symbols, blank)
    mxu_dtype = _mxu_dtype(am.dtype)
    lmp = lmp.astype(mxu_dtype)
    uni_row = uni.reshape(1, C).astype(mxu_dtype)
    symf = symbols.astype(jnp.float32)
    te2 = te_fix.astype(jnp.int32)[:, None]

    kernel = functools.partial(
        _build_fwd_kernel, S=S, C=C, T=T, modified=modified, blank=blank,
        bblk=bblk, precision=precision, mxu_dtype=mxu_dtype, parts=True,
    )
    clamp = lambda n: (lambda ib, it: (0, ib, jnp.minimum(it, n - 1)))
    px_rows, py_rows, nd_rows = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),  # lmp
            *_fwd_side_specs(bblk, S, S1),  # sym, pxlm, pylm, lmmax, te
            pl.BlockSpec((1, C), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),  # uni
            pl.BlockSpec((bblk, LANE, C),
                         lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                         memory_space=pltpu.VMEM),  # am
        ],
        out_specs=[
            pl.BlockSpec((S, bblk, LANE), lambda ib, it: (0, ib, it),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S1, bblk, LANE), clamp(nt_am),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S1, bblk, LANE), clamp(nt_am),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((S, B, wpx), jnp.float32, lm, am, uni),
            _out_struct((S1, B, T), jnp.float32, lm, am, uni),
            _out_struct((S1, B, T), jnp.float32, lm, am, uni),
        ],
        interpret=interpret,
        compiler_params=_PARAMS_FWD,
    )(lmp, symf, pxlm, pylm, lmmax, te2, uni_row, am)
    return px_rows, py_rows, nd_rows


@functools.lru_cache(maxsize=None)
def _build_parts_bwd_partitioned(precision, blank, modified, interpret):
    from .partition import batch_partitioned

    core = functools.partial(
        _build_parts_core_bwd, precision=precision, blank=blank,
        modified=modified, interpret=interpret,
    )
    # d_uni is a reduction over the batch: summed across shards
    return batch_partitioned(
        core, (0, 0, 0, 0, None, 1, 1, 1), (0, 0, "sum"),
        (3, 3, 2, 1, 1, 3, 3, 3), (3, 3, 2),
        name="latbuild_parts_bwd",
    )


def _build_parts_bwd(precision, blank, modified, interpret, res, cots):
    lm, am, symbols, te_fix, uni = res
    dpx, dpy, dnd = cots
    d_am, d_lm, d_uni = _build_parts_bwd_partitioned(
        precision, blank, modified, bool(interpret)
    )(lm, am, symbols, te_fix, uni, dpx, dpy, dnd)
    return (
        d_lm.astype(lm.dtype), d_am,
        np.zeros(symbols.shape, dtype=jax.dtypes.float0),
        np.zeros(te_fix.shape, dtype=jax.dtypes.float0),
        d_uni.reshape(uni.shape).astype(uni.dtype),
    )


def _build_parts_core_bwd(lm, am, symbols, te_fix, uni, dpx, dpy, dnd, *,
                          precision, blank, modified, interpret):
    B, T, C = am.shape
    S1 = lm.shape[1]
    S = S1 - 1
    wpx, bblk, nb, nt, nt_am = _shape_params(B, T, modified)
    _, lmp, _, _ = _lm_parts(lm, symbols, blank)
    mxu_dtype = _mxu_dtype(am.dtype)
    lmp = lmp.astype(mxu_dtype)
    uni_row = uni.reshape(1, C).astype(mxu_dtype)
    symf = symbols.astype(jnp.float32)
    te2 = te_fix.astype(jnp.int32)[:, None]

    kernel = functools.partial(
        _build_bwd_kernel, S=S, C=C, T=T, modified=modified, blank=blank,
        bblk=bblk, precision=precision, mxu_dtype=mxu_dtype, nt_am=nt_am,
        parts=True, Btotal=B,
    )
    row = lambda n: pl.BlockSpec(
        (bblk, n), lambda ib, it: (ib, 0), memory_space=pltpu.VMEM
    )
    clamp3 = lambda n: (lambda ib, it: (0, ib, jnp.minimum(it, n - 1)))
    d_am, d_lm, d_uni = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),  # lmp
            row(S),  # sym (f32 ids)
            row(1),  # te
            pl.BlockSpec((1, C), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),  # uni
            pl.BlockSpec((bblk, LANE, C),
                         lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                         memory_space=pltpu.VMEM),  # am
            pl.BlockSpec((S, bblk, LANE), lambda ib, it: (0, ib, it),
                         memory_space=pltpu.VMEM),  # dpx
            pl.BlockSpec((S1, bblk, LANE), clamp3(nt_am),
                         memory_space=pltpu.VMEM),  # dpy
            pl.BlockSpec((S1, bblk, LANE), clamp3(nt_am),
                         memory_space=pltpu.VMEM),  # dnd
        ],
        out_specs=[
            pl.BlockSpec((bblk, LANE, C),
                         lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((B, T, C), am.dtype, lm, am, dpx, dpy, dnd),
            _out_struct((B, S1, C), jnp.float32, lm, am, dpx, dpy, dnd),
            _out_struct((1, C), jnp.float32, lm, am, dpx, dpy, dnd),
        ],
        scratch_shapes=[
            pltpu.VMEM((bblk, S1, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_PARAMS_BWD,
    )(lmp, symf, te2, uni_row, am, dpx, dpy, dnd)

    return d_am, d_lm, d_uni


_build_parts.defvjp(_build_parts_fwd, _build_parts_bwd)


def lattice_rows_fused_smoothed(
    lm: jax.Array,
    am: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    lm_only_scale: float = 0.1,
    am_only_scale: float = 0.1,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel equivalent of lattice.get_rnnt_logprobs_smoothed_rows.

    The kernels return (px, py, normd); the unigram-LM statistics and the
    three-way interpolation are cheap XLA arithmetic (differentiable end
    to end: the kernels' VJP covers the am-heavy paths including the
    unigram cotangent, XLA autodiff covers the lm-side plumbing).
    """
    if interpret is None:
        interpret = _interpret_default()
    from .wavefront import vma_blocks_interpret

    if vma_blocks_interpret(interpret, lm, am):
        from ..lattice import get_rnnt_logprobs_smoothed_rows

        return get_rnnt_logprobs_smoothed_rows(
            lm, am, symbols, termination_symbol, lm_only_scale,
            am_only_scale, boundary, rnnt_type, impl="xla",
        )
    B, T, C = am.shape
    S = lm.shape[1] - 1
    from ..lattice import matmul_precision

    if rnnt_type == "constrained":
        px, py = lattice_rows_fused_smoothed(
            lm, am, symbols, termination_symbol, lm_only_scale,
            am_only_scale, None, "modified", interpret,
        )
        return px + py[1:], py

    modified = rnnt_type == "modified"
    if not modified and boundary is not None:
        te_fix = boundary[:, 3].astype(jnp.int32)
    else:
        te_fix = jnp.full((B,), -1, jnp.int32)

    blank = int(termination_symbol)
    # NOTE: these lm statistics are recomputed inside _build_parts_fwd too;
    # both live in the same outer jaxpr so XLA CSEs them.  Only the
    # backward's recompute is real, and at (B, S1, C) scale recomputing
    # beats carrying a residual (same bytes either way, no residency).
    lm32 = lm.astype(jnp.float32)
    lmmax = jax.lax.stop_gradient(jnp.max(lm32, axis=2))  # (B, S1)
    lmp = jnp.exp(lm32 - lmmax[:, :, None])
    lmsum = jnp.sum(lmp, axis=2)  # (B, S1)
    # unigram LM: mean of normalized lm probs over (B, S+1), padding
    # included — matching the reference exactly (rnnt_loss.py:1279-1280)
    uni = jnp.mean(lmp / lmsum[:, :, None], axis=(0, 1)) + _TINY  # (C,)
    uni_log = jnp.log(uni)

    px, py, normd = _build_parts(
        lm, am, symbols, te_fix, uni, matmul_precision(), blank, modified,
        bool(interpret),
    )

    # per-(b, s) columns, s-major (S?, B, 1)
    oh = (
        symbols.astype(jnp.int32)[:, :, None]
        == jnp.arange(C, dtype=jnp.int32)
    )
    pxlm = jnp.sum(lm32[:, :S, :] * oh, axis=2).T[:, :, None]  # (S, B, 1)
    pylm = lm32[:, :, blank].T[:, :, None]  # (S1, B, 1)
    lmonly = (jnp.log(lmsum) + lmmax).T[:, :, None]  # (S1, B, 1)
    px_uni = jnp.sum(uni_log[None, None, :] * oh, axis=2).T[:, :, None]
    py_uni = uni_log[blank]

    c = 1.0 - lm_only_scale - am_only_scale
    l, a = lm_only_scale, am_only_scale
    # avoid 0 * -inf = NaN when any scale is exactly zero (same floor as
    # the reference, rnnt_loss.py:1344-1349)
    c = 1.0e-20 if c == 0.0 else c
    l = 1.0e-20 if l == 0.0 else l
    a = 1.0e-20 if a == 0.0 else a

    # px_amonly = px + normd + px_uni - pxlm ; px_lmonly = pxlm - lmonly
    nd_px = normd[:S]
    if not modified:  # the t = T pad column: norm and amonly are both 0
        nd_px = jnp.concatenate(
            [nd_px, jnp.zeros((S, B, 1), nd_px.dtype)], axis=2
        )
    px_i = (
        (c + a) * px
        + l * (pxlm - lmonly[:S])
        + a * (nd_px + px_uni - pxlm)
    )
    py_i = (c + a) * py + l * (pylm - lmonly) + a * (normd + py_uni - pylm)
    if not modified:
        # re-kill the -inf columns AFTER the interpolation so that no
        # cotangent flows through ANY term there.  Values are unchanged
        # (px is already -inf); this pins the gradient contract "killed
        # columns flow nothing", which is also what every real consumer
        # sees (occupancy gradients are exactly 0 on -inf arcs).  The XLA
        # smoothed build leaks some -inf-column cotangent into the lm
        # paths — an autodiff artifact of adding finite terms to -inf
        # constants, unobservable with real cotangents.
        t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T + 1), 2)
        kill = (t == T) | (t == te_fix[None, :, None])
        px_i = jnp.where(kill, NEG_INF, px_i)
    return px_i, py_i
