"""Pallas TPU kernels for the mutual-information lattice recursion.

TPU-native replacement for the reference CUDA wavefront kernels
(/root/reference/tf_fast_rnnt/csrc/mutual_information_cuda.cu:174-422
forward, :490-760 backward).  The design is NOT a port of the 32x32
anti-diagonal tiling — that shape fits a GPU warp, not an 8x128 VPU.
Instead (see ops/numerics.py for the math):

  * grid = (batch_blocks, S+1) — both dimensions sequential on the TPU
    core; the s dimension carries the previous lattice row in a VMEM
    scratch, so the WHOLE forward is ONE kernel launch (the reference
    launches the CUDA kernel (S+T)/32 times per direction, .cu:795-808).
  * within a row, the first-order recurrence over t is solved by an
    in-register Kogge-Stone scan: ceil(log2 T) rounds of shifted
    log-semiring composes, each a full-width (B_blk, T_pad) VPU op.
  * the backward runs the same structure with s descending, in ordinary
    (+, *) algebra, emitting px_grad / py_grad rows (the occupancy
    probabilities, eqs. 4a/4b of the reference derivation .cu:441-487).

Layouts: rows are staged as (S+1, B_pad, T_pad) so every block is a
(B_blk, T_pad) tile — sublane x lane aligned.  T is padded to a lane
multiple with -inf (forward) which produces exact zeros in the backward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..numerics import NEG_INF, logaddexp, safe_exp
from ..recursion import _apply_boundary_mask, register_impl

__all__ = ["forward_lattice_pallas", "backward_lattice_pallas", "register"]

LANE = 128
SUBLANE = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_bblk(Bp: int) -> int:
    """Largest batch block <= 4 sublanes' worth of rows that exactly divides
    the padded batch — the grid uses Bp // bblk blocks, so bblk must divide
    Bp or trailing batch rows would silently never be computed."""
    for m in (4 * SUBLANE, 3 * SUBLANE, 2 * SUBLANE, SUBLANE):
        if Bp % m == 0:
            return m
    return SUBLANE


def _out_struct(shape, dtype, *inputs):
    """ShapeDtypeStruct for a pallas output, propagating the union of the
    inputs' varying-mesh-axes (vma) so the kernels compose with
    jax.shard_map(check_vma=True) — outputs of a shard-local kernel vary
    over exactly the axes its inputs do."""
    vma = frozenset()
    for a in inputs:
        try:
            vma = vma | frozenset(getattr(jax.typeof(a), "vma", ()) or ())
        except Exception:
            pass
    if vma:
        try:
            return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
        except TypeError:  # older jax without the vma kwarg
            pass
    return jax.ShapeDtypeStruct(shape, dtype)


_USE_ROLL = True  # pltpu.roll (vector lane-rotate); False = concat fallback


def _shift_right(x, d, fill):
    if d == 0:
        return x
    b, w = x.shape
    if _USE_ROLL:
        rolled = pltpu.roll(x, d, axis=1)
        t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(t < d, fill, rolled)
    pad = jnp.full((b, d), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : w - d]], axis=1)


def _shift_left(x, d, fill):
    if d == 0:
        return x
    b, w = x.shape
    if _USE_ROLL:
        rolled = pltpu.roll(x, w - d, axis=1)
        t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(t >= w - d, fill, rolled)
    pad = jnp.full((b, d), fill, x.dtype)
    return jnp.concatenate([x[:, d:], pad], axis=1)


def _log_scan_row(coeff, bias):
    """Kogge-Stone inclusive scan solving x_t = logaddexp(coeff_t + x_{t-1},
    bias_t), x_{-1} = -inf, along the lane axis of a (B_blk, W) tile."""
    w = coeff.shape[1]
    a, b = coeff, bias
    d = 1
    while d < w:
        # compose earlier element e_{t-d} (shifted; identity (0, -inf) when
        # out of range) with the current one: (a1,b1)*(a2,b2) =
        # (a1+a2, logaddexp(b1+a2, b2))
        a_prev = _shift_right(a, d, 0.0)
        b_prev = _shift_right(b, d, NEG_INF)
        b = logaddexp(b_prev + a, b)
        a = a_prev + a
        d *= 2
    return b


def _rev_linear_scan_row(coeff, bias):
    """Kogge-Stone scan solving x_t = coeff_t * x_{t+1} + bias_t, x_W = 0."""
    w = coeff.shape[1]
    a, b = coeff, bias
    d = 1
    while d < w:
        # compose with the later element e_{t+d} (identity (1, 0) off-edge):
        # (m1 o m2)(x) = a1*a2*x + a1*b2 + b1
        a_next = _shift_left(a, d, 1.0)
        b_next = _shift_left(b, d, 0.0)
        b = a * b_next + b
        a = a * a_next
        d *= 2
    return b


# -----------------------------------------------------------------------------
# forward
# -----------------------------------------------------------------------------


def _fwd_kernel(
    sb_ref, se_ref, src_ref, te1h_ref, px_ref, py_ref,  # inputs
    p_ref, scores_ref,  # outputs
    prev_p,  # scratch
    *, S: int, modified: bool,
):
    s = pl.program_id(1)

    px_row = px_ref[0]  # (Bblk, Tp1); row s-1 (clamped at 0)
    py_row = py_ref[0]  # (Bblk, Tp1); -inf padded at t >= T

    prev = prev_p[:, :]
    if modified:
        # a[t] = p[s-1, t-1] + px[s-1, t-1]
        a = _shift_right(prev + px_row, 1, NEG_INF)
    else:
        a = prev + px_row
    neg = jnp.full_like(a, NEG_INF)
    a = jnp.where(s > 0, a, neg)

    # origin injection: p[s_begin, t_begin] = 0
    src = jnp.where((sb_ref[:, :] == s), src_ref[:, :], neg)
    b = logaddexp(a, src)

    coeff = _shift_right(py_row, 1, NEG_INF)  # coeff[t] = py[s, t-1]
    p_row = _log_scan_row(coeff, b)

    p_ref[0] = p_row
    prev_p[:, :] = p_row

    # scores[b] = p[s_end, t_end]: harvest when this row is the end row
    val = jnp.max(jnp.where(te1h_ref[:, :] > 0, p_row, NEG_INF), axis=1,
                  keepdims=True)

    @pl.when(s == 0)
    def _():
        scores_ref[:, :] = jnp.full_like(scores_ref[:, :], NEG_INF)

    hit = se_ref[:, :] == s
    scores_ref[:, :] = jnp.where(hit, val, scores_ref[:, :])


def forward_lattice_pallas(
    px: jax.Array, py: jax.Array, boundary: jax.Array, interpret: bool = False
) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array], jax.Array]:
    """Forward lattice on TPU.  Returns (res, scores[B]) where res =
    (p_internal, px_staged, py_staged) — the (S+1, B_pad, T_pad) stagings
    reused by the backward so px/py are masked/padded/transposed once."""
    B, S, T1 = px.shape
    T = py.shape[2]
    modified = T1 == T

    if S == 0:
        # empty transcripts: a zero-row px makes the row BlockSpec
        # degenerate; the single-row lattice is trivial for the XLA core
        from ..recursion import _forward_lattice_xla

        return _forward_lattice_xla(px, py, boundary)

    px, py = _apply_boundary_mask(px, py, boundary, modified)

    Tp1 = _ceil_to(T + 1, LANE)
    Bp = _ceil_to(B, SUBLANE)
    bblk = _pick_bblk(Bp)

    dt = px.dtype
    px_t = jnp.full((S, Bp, Tp1), NEG_INF, dt).at[:, :B, :T1].set(
        jnp.moveaxis(px, 1, 0)
    )
    py_t = jnp.full((S + 1, Bp, Tp1), NEG_INF, dt).at[:, :B, :T].set(
        jnp.moveaxis(py, 1, 0)
    )
    sb = jnp.zeros((Bp, 1), jnp.int32).at[:B].set(boundary[:, 0:1].astype(jnp.int32))
    se = jnp.zeros((Bp, 1), jnp.int32).at[:B].set(boundary[:, 2:3].astype(jnp.int32))
    t_iota = jnp.arange(Tp1, dtype=jnp.int32)[None, :]
    tb = jnp.zeros((Bp, 1), jnp.int32).at[:B].set(boundary[:, 1:2].astype(jnp.int32))
    te = jnp.zeros((Bp, 1), jnp.int32).at[:B].set(boundary[:, 3:4].astype(jnp.int32))
    src = jnp.where(t_iota == tb, 0.0, NEG_INF).astype(dt)  # (Bp, Tp1)
    te1h = (t_iota == te).astype(dt)  # (Bp, Tp1)

    nb = Bp // bblk
    grid = (nb, S + 1)

    row_spec = lambda imap: pl.BlockSpec((1, bblk, Tp1), imap, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((bblk, 1), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((bblk, Tp1), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, S=S, modified=modified)
    p_internal, scores_pad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vec_spec,  # sb
            vec_spec,  # se
            mat_spec,  # src
            mat_spec,  # te1h
            row_spec(lambda ib, s: (jnp.maximum(s - 1, 0), ib, 0)),  # px row s-1
            row_spec(lambda ib, s: (s, ib, 0)),  # py row s
        ],
        out_specs=[
            row_spec(lambda ib, s: (s, ib, 0)),  # p row s
            vec_spec,  # scores
        ],
        out_shape=[
            _out_struct((S + 1, Bp, Tp1), dt, px_t, py_t, boundary),
            _out_struct((Bp, 1), dt, px_t, py_t, boundary),
        ],
        scratch_shapes=[pltpu.VMEM((bblk, Tp1), dt)],
        interpret=interpret,
    )(sb, se, src, te1h, px_t, py_t)

    return (p_internal, px_t, py_t), scores_pad[:B, 0]


# -----------------------------------------------------------------------------
# backward
# -----------------------------------------------------------------------------


def _bwd_kernel(
    se_ref, te1h_ref, ag_ref, px_ref, py_ref, pcur_ref,  # inputs
    pxg_ref, pyg_ref,  # outputs
    g_scratch, pnext_scratch,  # scratch
    *, S: int, modified: bool,
):
    s = S - pl.program_id(1)  # descending

    px_row = px_ref[0]
    py_row = py_ref[0]
    p_cur = pcur_ref[0]
    # rows descend, so last iteration's p_cur is this iteration's p[s+1]
    # (carried in VMEM — streaming p twice from HBM would double the
    # backward's traffic for its largest operand)
    p_next = pnext_scratch[:, :]

    g_next = g_scratch[:, :]
    zeros = jnp.zeros_like(p_cur)
    g_next = jnp.where(s < S, g_next, zeros)
    p_next = jnp.where(s < S, p_next, zeros)

    if modified:
        # term1[t] = safe_exp(p[s,t] + px[s,t] - p[s+1,t+1])
        term1 = safe_exp(p_cur + px_row - _shift_left(p_next, 1, 0.0))
        h_px = term1 * _shift_left(g_next, 1, 0.0)
        h = h_px
    else:
        term1 = safe_exp(p_cur + px_row - p_next)
        h_px = term1 * g_next
        h = h_px
    h = jnp.where(s < S, h, zeros)
    h_px = jnp.where(s < S, h_px, zeros)

    seed = jnp.where(se_ref[:, :] == s, ag_ref[:, :], 0.0) * te1h_ref[:, :]
    b = h + seed

    # term2[t] = safe_exp(p[s,t] + py[s,t] - p[s,t+1]); py pad lanes are -inf
    term2 = safe_exp(p_cur + py_row - _shift_left(p_cur, 1, 0.0))
    g = _rev_linear_scan_row(term2, b)

    pxg_ref[0] = h_px
    pyg_ref[0] = term2 * _shift_left(g, 1, 0.0)
    g_scratch[:, :] = g
    pnext_scratch[:, :] = p_cur


def backward_lattice_pallas(
    px: jax.Array,
    py: jax.Array,
    res,
    boundary: jax.Array,
    ans_grad: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Occupancy/backward lattice on TPU; consumes the staged residuals from
    forward_lattice_pallas.  Returns (px_grad, py_grad) in public layout."""
    B, S, T1 = px.shape
    T = py.shape[2]
    modified = T1 == T

    if S == 0:
        # matches the S == 0 forward fallback (res is then the XLA-layout p)
        from ..recursion import _backward_lattice_xla

        p = res[0] if isinstance(res, tuple) else res
        return _backward_lattice_xla(px, py, p, boundary, ans_grad)

    if isinstance(res, tuple):
        p_internal, px_t, py_t = res
    else:  # direct call with a bare p staging: restage px/py here
        p_internal = res
        px_m, py_m = _apply_boundary_mask(px, py, boundary, modified)
        _, Bp0, Tp10 = p_internal.shape
        px_t = jnp.full((S, Bp0, Tp10), NEG_INF, px.dtype).at[:, :B, :T1].set(
            jnp.moveaxis(px_m, 1, 0)
        )
        py_t = jnp.full((S + 1, Bp0, Tp10), NEG_INF, py.dtype).at[:, :B, :T].set(
            jnp.moveaxis(py_m, 1, 0)
        )

    S1p, Bp, Tp1 = p_internal.shape
    bblk = _pick_bblk(Bp)

    dt = px.dtype
    se = jnp.zeros((Bp, 1), jnp.int32).at[:B].set(boundary[:, 2:3].astype(jnp.int32))
    te = jnp.zeros((Bp, 1), jnp.int32).at[:B].set(boundary[:, 3:4].astype(jnp.int32))
    t_iota = jnp.arange(Tp1, dtype=jnp.int32)[None, :]
    te1h = (t_iota == te).astype(dt)
    ag = jnp.zeros((Bp, 1), dt).at[:B, 0].set(ans_grad.astype(dt))

    nb = Bp // bblk
    grid = (nb, S + 1)

    row_spec = lambda imap: pl.BlockSpec((1, bblk, Tp1), imap, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((bblk, 1), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((bblk, Tp1), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_bwd_kernel, S=S, modified=modified)
    pxg_t, pyg_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vec_spec,  # se
            mat_spec,  # te one-hot
            vec_spec,  # ans_grad
            row_spec(lambda ib, s: (jnp.minimum(S - s, S - 1), ib, 0)),  # px row
            row_spec(lambda ib, s: (S - s, ib, 0)),  # py row
            row_spec(lambda ib, s: (S - s, ib, 0)),  # p row s
        ],
        out_specs=[
            row_spec(lambda ib, s: (jnp.minimum(S - s, S - 1), ib, 0)),  # px_grad
            row_spec(lambda ib, s: (S - s, ib, 0)),  # py_grad
        ],
        out_shape=[
            _out_struct((S, Bp, Tp1), dt, px_t, py_t, p_internal, ans_grad),
            _out_struct((S + 1, Bp, Tp1), dt, px_t, py_t, p_internal, ans_grad),
        ],
        scratch_shapes=[
            pltpu.VMEM((bblk, Tp1), dt),
            pltpu.VMEM((bblk, Tp1), dt),
        ],
        interpret=interpret,
    )(se, te1h, ag, px_t, py_t, p_internal)

    px_grad = jnp.moveaxis(pxg_t, 0, 1)[:B, :, :T1]
    py_grad = jnp.moveaxis(pyg_t, 0, 1)[:B, :, :T]
    return px_grad, py_grad


def register(default: bool = False, interpret: bool = False) -> None:
    """Register the Pallas kernels as the "pallas" implementation of
    mutual_information_recursion (see ops/recursion.py:register_impl)."""
    fwd = functools.partial(forward_lattice_pallas, interpret=interpret)
    bwd = functools.partial(backward_lattice_pallas, interpret=interpret)
    register_impl("pallas", fwd, bwd, default=default)
