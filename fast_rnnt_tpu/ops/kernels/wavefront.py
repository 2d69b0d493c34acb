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
    log-semiring composes, each a full-width (B_blk, W) VPU op.
  * the backward runs the same structure with s descending, in ordinary
    (+, *) algebra, emitting px_grad / py_grad rows (the occupancy
    probabilities, eqs. 4a/4b of the reference derivation .cu:441-487).

Round-2 rework — everything is masked INLINE and laid out s-major:

  * inputs are (S, B, T)-major rows, UNPADDED: Pallas pads boundary
    blocks implicitly and the kernels mask every lane from the boundary
    scalars, so there is no XLA-side staging pass (the round-1 design
    spent a full read+write over the lattice just transposing/padding
    px/py into kernel layout).
  * the boundary rectangle mask (the reference's -inf staging,
    .cu:282-304) and the PRUNING-BAND mask (lo[b,t] <= s < lo[b,t]+K)
    are computed in-register from (B,) scalars / a (B,T+1) int row —
    the pruned stage no longer materializes a band-masked copy of the
    lattice or pays its VJP select passes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..numerics import NEG_INF, logaddexp, safe_exp

__all__ = [
    "forward_rows_pallas",
    "backward_rows_pallas",
    "fused_rows_pallas",
    "forward_lattice_pallas",
    "backward_lattice_pallas",
    "register",
]

LANE = 128
SUBLANE = 8

# Process-default interpret mode, shared by every kernel family (latbuild
# and ranges import _interpret_default from here).  Tri-state:
#   None  — auto: interpret iff the live default backend is CPU
#   True  — force interpret (CPU test environments)
#   False — force compiled pallas_call even on a CPU host; this is the
#           seam the TPU cross-lowering gate uses to make
#           jit(...).lower(lowering_platforms=("tpu",)) emit Mosaic.
# Set via register(interpret=...); explicit interpret= args override it.
_INTERPRET: Optional[bool] = None


def _interpret_default() -> bool:
    """Per-call interpret default: the process flag if forced, else a live
    check that the active backend is CPU.  The live check matters when a
    process initializes on TPU (caching impl="pallas") and is then
    re-platformed to a virtual-CPU mesh — e.g. the driver's multi-chip
    dry-run — where a non-interpret pallas_call cannot lower."""
    if _INTERPRET is not None:
        return _INTERPRET
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


def vma_blocks_interpret(interpret: bool, *arrays) -> bool:
    """True when pallas INTERPRET mode cannot run here: inputs carry
    varying-manual-axes (inside a ``jax.shard_map`` with vma checking).

    jax >= 0.9's hlo interpreter re-evaluates the traced kernel jaxpr
    under the outer shard_map trace, where kernel-internal constants
    (iotas, identity matrices) have empty vma while the inputs vary —
    strict-vma primitives (dot_general, dynamic_slice) then reject the
    mix.  COMPILED pallas_calls are unaffected (Mosaic traces the kernel
    vma-free; the pallas_call boundary's vma comes from the out_shape
    structs).  Callers that get True must route to their XLA-equivalent
    implementation — numerically parity-tested, and interpret mode only
    exists on CPU hosts anyway."""
    if not interpret:
        return False
    for a in arrays:
        try:
            if getattr(jax.typeof(a), "vma", None):
                return True
        except Exception:
            pass
    return False


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


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


# Shift strategy for the in-kernel Kogge-Stone rounds, MEASURED round 3
# per direction (benchmarks/kernel_variants.py + /tmp/perf_matrix, v5e,
# B=30 T=1000 S=100, median-of-slopes):
#   forward (right shifts): concat 200.3 µs vs roll 209.8 µs -> concat
#   backward (left shifts): roll 135.5 µs vs concat 162.1 µs -> roll
_USE_ROLL_RIGHT = False  # pad+slice concat
_USE_ROLL_LEFT = True    # pltpu.roll lane-rotate


def _shift_right(x, d, fill):
    if d == 0:
        return x
    b, w = x.shape
    if _USE_ROLL_RIGHT:
        rolled = pltpu.roll(x, d, axis=1)
        t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(t < d, fill, rolled)
    pad = jnp.full((b, d), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : w - d]], axis=1)


def _shift_left(x, d, fill):
    if d == 0:
        return x
    b, w = x.shape
    if _USE_ROLL_LEFT:
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
        b_prev = _shift_right(b, d, NEG_INF)
        b = logaddexp(b_prev + a, b)
        if 2 * d < w:  # the final round's coefficient update is dead
            a = _shift_right(a, d, 0.0) + a
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
        b_next = _shift_left(b, d, 0.0)
        b = a * b_next + b
        if 2 * d < w:  # the final round's coefficient update is dead
            a = a * _shift_left(a, d, 1.0)
        d *= 2
    return b


def _row_masks(s_px, s_py, bvec, t, modified, lo, K):
    """In-register validity masks for the px arcs of row ``s_px`` and the
    py arcs of row ``s_py`` (the reference kernel's -inf staging +
    boundary rectangle, mutual_information_cuda.cu:232-304; band-mask
    semantics identical to lattice.band_mask_rows)."""
    sb = bvec[:, 0:1]
    tb = bvec[:, 1:2]
    se = bvec[:, 2:3]
    te = bvec[:, 3:4]
    t_hi = te - 1 if modified else te
    pxm = (s_px >= sb) & (s_px < se) & (t >= tb) & (t <= t_hi)
    pym = (s_py >= sb) & (s_py <= se) & (t >= tb) & (t < te)
    if lo is not None:
        pxm &= (lo <= s_px) & (s_px < lo + K)
        pym &= (lo <= s_py) & (s_py < lo + K)
    return pxm, pym


# -----------------------------------------------------------------------------
# forward
# -----------------------------------------------------------------------------


def _fwd_kernel(*refs, S: int, modified: bool, banded: bool, K: int):
    if banded:
        bvec_ref, lo_ref, px_ref, py_ref, p_ref, scores_ref, prev_p = refs
        lo = lo_ref[...]
    else:
        bvec_ref, px_ref, py_ref, p_ref, scores_ref, prev_p = refs
        lo = None

    s = pl.program_id(1)
    bvec = bvec_ref[...]  # (bblk, 4) int32
    # compute in f32 regardless of the storage dtype: sub-f32 lattices
    # (the bf16 mixed-precision mode) still recurse at full precision —
    # only the HBM copies are rounded
    pxr = px_ref[0].astype(jnp.float32)  # (bblk, W); row s-1 (clamped at 0)
    pyr = py_ref[0].astype(jnp.float32)  # (bblk, W); row s
    t = jax.lax.broadcasted_iota(jnp.int32, pxr.shape, 1)
    pxm, pym = _row_masks(s - 1, s, bvec, t, modified, lo, K)

    neg = jnp.full_like(pxr, NEG_INF)
    px_eff = jnp.where(pxm, pxr, neg)
    py_eff = jnp.where(pym, pyr, neg)

    prev = prev_p[:, :]
    if modified:
        # a[t] = p[s-1, t-1] + px[s-1, t-1]
        a = _shift_right(prev + px_eff, 1, NEG_INF)
    else:
        a = prev + px_eff
    # row 0 has no incoming px arcs, and the prev_p scratch is garbage there
    a = jnp.where(s > 0, a, neg)

    # origin injection: p[s_begin, t_begin] = 0 (.cu:340-352).  At the
    # origin cell `a` is necessarily -inf (row s_begin has no incoming px
    # arcs: row s_begin-1 is outside the boundary mask), so the logadd
    # degenerates to a select — one op instead of a full-width logaddexp.
    b = jnp.where(
        (bvec[:, 0:1] == s) & (t == bvec[:, 1:2]), jnp.zeros_like(a), a
    )

    coeff = _shift_right(py_eff, 1, NEG_INF)  # coeff[t] = py[s, t-1]
    p_row = _log_scan_row(coeff, b)

    p_ref[0] = p_row.astype(p_ref.dtype)
    prev_p[:, :] = p_row  # f32 carry even when p is stored narrower

    # scores[b] = p[s_end, t_end]: harvest when this row is the end row
    val = jnp.max(
        jnp.where(t == bvec[:, 3:4], p_row, neg), axis=1, keepdims=True
    )

    @pl.when(s == 0)
    def _():
        scores_ref[:, :] = jnp.full_like(scores_ref[:, :], NEG_INF)

    hit = bvec[:, 2:3] == s
    scores_ref[:, :] = jnp.where(hit, val, scores_ref[:, :])


def _fwd_core(px_rows, py_rows, bvec, *maybe_lo, K: int, interpret: bool):
    """pallas_call body of the forward (shapes may be PER-SHARD under the
    GSPMD wrapper — everything derives from the argument shapes)."""
    S, B, T1 = px_rows.shape
    T = py_rows.shape[2]
    modified = T1 == T
    # edge-pad to width T+1 so the regular px column t = T sees the last
    # frame's band (band_mask_rows does the same edge pad); done here so
    # the pad never sees sharded avals (explicit-sharding slice rules)
    lo_ext = (
        jnp.pad(maybe_lo[0].astype(jnp.int32), ((0, 0), (0, 1)), mode="edge")
        if maybe_lo else None
    )
    W = _ceil_to(T + 1, LANE)
    bblk = min(_ceil_to(B, SUBLANE), 4 * SUBLANE)
    nb = _cdiv(B, bblk)
    grid = (nb, S + 1)

    row_spec = lambda imap: pl.BlockSpec((1, bblk, W), imap, memory_space=pltpu.VMEM)
    bvec_spec = pl.BlockSpec((bblk, 4), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)
    score_spec = pl.BlockSpec((bblk, 1), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)

    banded = lo_ext is not None
    inputs = [bvec]
    in_specs = [bvec_spec]
    if banded:
        inputs.append(lo_ext)
        in_specs.append(
            pl.BlockSpec((bblk, W), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)
        )
    inputs += [px_rows, py_rows]
    in_specs += [
        row_spec(lambda ib, s: (jnp.maximum(s - 1, 0), ib, 0)),  # px row s-1
        row_spec(lambda ib, s: (s, ib, 0)),  # py row s
    ]

    kernel = functools.partial(
        _fwd_kernel, S=S, modified=modified, banded=banded, K=K
    )
    p_rows, scores_pad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            row_spec(lambda ib, s: (s, ib, 0)),  # p row s
            score_spec,
        ],
        out_shape=[
            # p is ALWAYS stored f32, even in the bf16 lattice mode: the
            # backward's terms are exp() of differences of NEIGHBORING p
            # values, and |p| grows like O(T) (≈ -4000 at T=1000), where
            # bf16's quantization step is 16 — rounded-p differences (and
            # with them every occupancy gradient) would be garbage at
            # production scale.  Found by the on-chip parity gate; costs
            # ~6 MB / ~8 µs at the benchmark shape.  The XLA core keeps
            # its p residual f32 the same way (_forward_rows_xla).
            _out_struct((S + 1, B, W), jnp.float32, px_rows, py_rows, bvec),
            _out_struct((B, 1), jnp.float32, px_rows, py_rows, bvec),
        ],
        scratch_shapes=[pltpu.VMEM((bblk, W), jnp.float32)],
        interpret=interpret,
        # the s dim is the sequential recursion; batch blocks are
        # independent (each re-seeds its scratch at s == 0), so megacore
        # parts may split them across cores
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*inputs)

    return p_rows, scores_pad


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(K: int, interpret: bool, banded: bool):
    from .partition import batch_partitioned

    core = functools.partial(_fwd_core, K=K, interpret=interpret)
    in_axes = (1, 1, 0) + ((0,) if banded else ())
    in_ranks = (3, 3, 2) + ((2,) if banded else ())
    return batch_partitioned(
        core, in_axes, (1, 0), in_ranks, (3, 2), name="mi_fwd"
    )


def forward_rows_pallas(
    px_rows: jax.Array,
    py_rows: jax.Array,
    boundary: jax.Array,
    lo: Optional[jax.Array] = None,
    K: int = 0,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward lattice on TPU, s-major.

    Args:
      px_rows: (S, B, T+1) regular / (S, B, T) modified — UNMASKED.
      py_rows: (S+1, B, T) — unmasked.
      boundary: (B, 4) int32.
      lo: optional (B, T) pruning-band lower bounds (ranges[:, :, 0]); with
        static width ``K`` the recursion sees the band-masked lattice
        without one ever being materialized.

    Composes with GSPMD: batch-sharded inputs under plain ``jit`` are
    detected by the ``batch_partitioned`` wrapper (ops/kernels/
    partition.py) and the kernel runs per-shard with no collectives.
    (Like the wrapper, this entry has no ``vmap`` batching rule.)

    Returns (p_rows, scores): p_rows is the (S+1, B, W) lane-padded
    internal lattice (the backward's residual), scores is [B].
    """
    S, B, T1 = px_rows.shape
    T = py_rows.shape[2]
    if interpret is None:
        interpret = _interpret_default()

    if S == 0 or vma_blocks_interpret(interpret, px_rows, py_rows):
        # S == 0: empty transcripts make the row BlockSpec degenerate;
        # vma: interpret mode cannot run inside a vma-checked shard_map
        # (see vma_blocks_interpret) — either way the XLA core is exact
        from ..recursion import _forward_rows_xla

        return _forward_rows_xla(px_rows, py_rows, boundary, lo=lo, K=K)

    bvec = boundary.astype(jnp.int32)
    args = [px_rows, py_rows, bvec]
    if lo is not None:
        args.append(lo)
    p_rows, scores_pad = _fwd_partitioned(
        int(K), bool(interpret), lo is not None
    )(*args)
    return p_rows, scores_pad[:, 0]


# -----------------------------------------------------------------------------
# backward
# -----------------------------------------------------------------------------


def _bwd_kernel(*refs, S: int, modified: bool, banded: bool, K: int):
    if banded:
        bvec_ref, lo_ref, ag_ref, px_ref, py_ref, pcur_ref, pxg_ref, pyg_ref, \
            g_scratch, pnext_scratch = refs
        lo = lo_ref[...]
    else:
        bvec_ref, ag_ref, px_ref, py_ref, pcur_ref, pxg_ref, pyg_ref, \
            g_scratch, pnext_scratch = refs
        lo = None

    s = S - pl.program_id(1)  # descending
    bvec = bvec_ref[...]
    # f32 compute regardless of storage dtype (see _fwd_kernel)
    pxr = px_ref[0].astype(jnp.float32)  # row min(s, S-1); masked when s == S
    pyr = py_ref[0].astype(jnp.float32)  # row s
    p_cur = pcur_ref[0].astype(jnp.float32)
    t = jax.lax.broadcasted_iota(jnp.int32, pxr.shape, 1)
    # px arcs OUT of row s (s -> s+1): valid iff s in [sb, se)
    pxm, pym = _row_masks(s, s, bvec, t, modified, lo, K)

    neg = jnp.full_like(pxr, NEG_INF)
    px_eff = jnp.where(pxm, pxr, neg)
    py_eff = jnp.where(pym, pyr, neg)

    # rows descend, so last iteration's p_cur is this iteration's p[s+1]
    # (carried in VMEM — streaming p twice from HBM would double the
    # backward's traffic for its largest operand)
    zeros = jnp.zeros_like(p_cur)
    g_next = jnp.where(s < S, g_scratch[:, :], zeros)
    p_next = jnp.where(s < S, pnext_scratch[:, :], zeros)

    if modified:
        # term1[t] = safe_exp(p[s,t] + px[s,t] - p[s+1,t+1])
        term1 = safe_exp(p_cur + px_eff - _shift_left(p_next, 1, 0.0))
        h_px = term1 * _shift_left(g_next, 1, 0.0)
    else:
        term1 = safe_exp(p_cur + px_eff - p_next)
        h_px = term1 * g_next

    seed = jnp.where(
        (bvec[:, 2:3] == s) & (t == bvec[:, 3:4]), ag_ref[:, :], 0.0
    )
    b = h_px + seed.astype(h_px.dtype)

    # term2[t] = safe_exp(p[s,t] + py[s,t] - p[s,t+1])
    term2 = safe_exp(p_cur + py_eff - _shift_left(p_cur, 1, 0.0))
    g = _rev_linear_scan_row(term2, b)

    pxg_ref[0] = h_px.astype(pxg_ref.dtype)
    pyg_ref[0] = (term2 * _shift_left(g, 1, 0.0)).astype(pyg_ref.dtype)
    g_scratch[:, :] = g
    pnext_scratch[:, :] = p_cur


def _bwd_core(px_rows, py_rows, p_rows, bvec, ag, *maybe_lo,
              K: int, interpret: bool):
    """pallas_call body of the backward (shapes may be PER-SHARD under
    the GSPMD wrapper)."""
    S, B, T1 = px_rows.shape
    T = py_rows.shape[2]
    modified = T1 == T
    lo_ext = (
        jnp.pad(maybe_lo[0].astype(jnp.int32), ((0, 0), (0, 1)), mode="edge")
        if maybe_lo else None
    )

    W = p_rows.shape[2]
    bblk = min(_ceil_to(B, SUBLANE), 4 * SUBLANE)
    nb = _cdiv(B, bblk)
    grid = (nb, S + 1)
    dt = px_rows.dtype

    ag = ag.astype(jnp.float32)[:, None]  # (B, 1)

    row_spec = lambda imap: pl.BlockSpec((1, bblk, W), imap, memory_space=pltpu.VMEM)
    bvec_spec = pl.BlockSpec((bblk, 4), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)
    ag_spec = pl.BlockSpec((bblk, 1), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)

    banded = lo_ext is not None
    inputs = [bvec]
    in_specs = [bvec_spec]
    if banded:
        inputs.append(lo_ext)
        in_specs.append(
            pl.BlockSpec((bblk, W), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM)
        )
    inputs += [ag, px_rows, py_rows, p_rows]
    in_specs += [
        ag_spec,
        row_spec(lambda ib, s: (jnp.minimum(S - s, S - 1), ib, 0)),  # px row
        row_spec(lambda ib, s: (S - s, ib, 0)),  # py row
        row_spec(lambda ib, s: (S - s, ib, 0)),  # p row s
    ]

    kernel = functools.partial(
        _bwd_kernel, S=S, modified=modified, banded=banded, K=K
    )
    pxg_rows, pyg_rows = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            # the s = S iteration writes an all-zero row into slot S-1,
            # overwritten by the s = S-1 iteration (grid is sequential)
            row_spec(lambda ib, s: (jnp.minimum(S - s, S - 1), ib, 0)),
            row_spec(lambda ib, s: (S - s, ib, 0)),
        ],
        out_shape=[
            _out_struct((S, B, T1), dt, px_rows, py_rows, p_rows, ag),
            _out_struct((S + 1, B, T), dt, px_rows, py_rows, p_rows, ag),
        ],
        scratch_shapes=[
            pltpu.VMEM((bblk, W), jnp.float32),
            pltpu.VMEM((bblk, W), jnp.float32),
        ],
        interpret=interpret,
        # batch blocks are independent (the s == S step masks the scratch
        # reads), so megacore parts may split them; s stays sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*inputs)

    return pxg_rows, pyg_rows


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(K: int, interpret: bool, banded: bool):
    from .partition import batch_partitioned

    core = functools.partial(_bwd_core, K=K, interpret=interpret)
    in_axes = (1, 1, 1, 0, 0) + ((0,) if banded else ())
    in_ranks = (3, 3, 3, 2, 1) + ((2,) if banded else ())
    return batch_partitioned(
        core, in_axes, (1, 1), in_ranks, (3, 3), name="mi_bwd"
    )


def backward_rows_pallas(
    px_rows: jax.Array,
    py_rows: jax.Array,
    p_rows: jax.Array,
    boundary: jax.Array,
    ans_grad: jax.Array,
    lo: Optional[jax.Array] = None,
    K: int = 0,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Occupancy/backward lattice on TPU, s-major; consumes the padded
    p_rows residual from forward_rows_pallas.  GSPMD-composable like the
    forward (see forward_rows_pallas).  Returns (px_grad_rows,
    py_grad_rows) in the unpadded s-major input shapes."""
    S, B, T1 = px_rows.shape
    T = py_rows.shape[2]
    if interpret is None:
        interpret = _interpret_default()

    if S == 0 or vma_blocks_interpret(interpret, px_rows, py_rows):
        from ..recursion import _backward_rows_xla

        return _backward_rows_xla(
            px_rows, py_rows, p_rows, boundary, ans_grad, lo=lo, K=K
        )

    bvec = boundary.astype(jnp.int32)
    args = [px_rows, py_rows, p_rows, bvec, ans_grad]
    if lo is not None:
        args.append(lo)
    return _bwd_partitioned(int(K), bool(interpret), lo is not None)(*args)


# -----------------------------------------------------------------------------
# fused two-phase kernel: forward + occupancy backward in ONE launch
# -----------------------------------------------------------------------------
#
# The calc_gradients=True path (ops/recursion.py:_rows_with_grads_impl —
# the workhorse of BOTH stages of the fused pruned pipelines) runs the
# forward and the occupancy backward back-to-back in the primal, exactly
# like the reference op computes its grads inside the forward Compute
# call (tf_fast_rnnt_op.cc:89-111).  Splitting that into two pallas_calls
# forces the p lattice through HBM (write S+1 rows, read them back) and
# reads px/py twice.  This kernel runs both phases in one launch over a
# grid (nb, 2*(S+1)): steps 0..S are the ascending forward rows, steps
# S+1..2S+1 the descending backward rows, with the p lattice carried in a
# VMEM scratch that never touches HBM.  Per stage this saves the p
# write+read (~25 MB at the benchmark shape) plus one kernel launch; the
# arithmetic is IDENTICAL to the split kernels (same op sequence, f32
# carries), so results are bit-equal.
#
# ans_grad is fixed at 1 (occupancy semantics); the custom_vjp rescales
# (recursion.py:_mi_rows_with_grads_bwd), so this needs no seed input.

# p scratch cap: (S+1, bblk, W) f32 must fit VMEM alongside the row
# blocks (headline shape: 101*32*1024*4 = 13.2 MB).  bblk steps down
# 32 -> 16 -> 8 to fit; shapes that exceed the cap even at bblk=8 fall
# back to the split kernels (e.g. T=12000/S=200: 77 MB).
_P_SCRATCH_CAP = 26 * 1024 * 1024
_FUSED_VMEM = pltpu.CompilerParams(
    vmem_limit_bytes=48 * 1024 * 1024,
    dimension_semantics=("parallel", "arbitrary"),
)


def _fused_kernel(*refs, S: int, modified: bool, banded: bool, K: int):
    if banded:
        (bvec_ref, lo_ref, px_ref, py_ref, scores_ref, pxg_ref, pyg_ref,
         p_store, c1, c2) = refs
        lo = lo_ref[...]
    else:
        (bvec_ref, px_ref, py_ref, scores_ref, pxg_ref, pyg_ref,
         p_store, c1, c2) = refs
        lo = None

    u = pl.program_id(1)
    bvec = bvec_ref[...]
    pxr = px_ref[0].astype(jnp.float32)
    pyr = py_ref[0].astype(jnp.float32)
    t = jax.lax.broadcasted_iota(jnp.int32, pxr.shape, 1)
    neg = jnp.full_like(pxr, NEG_INF)

    @pl.when(u <= S)
    def _fwd():
        # ascending phase: row s = u; bodies identical to _fwd_kernel
        s = u
        pxm, pym = _row_masks(s - 1, s, bvec, t, modified, lo, K)
        px_eff = jnp.where(pxm, pxr, neg)
        py_eff = jnp.where(pym, pyr, neg)
        prev = c1[:, :]
        if modified:
            a = _shift_right(prev + px_eff, 1, NEG_INF)
        else:
            a = prev + px_eff
        a = jnp.where(s > 0, a, neg)
        b = jnp.where(
            (bvec[:, 0:1] == s) & (t == bvec[:, 1:2]), jnp.zeros_like(a), a
        )
        coeff = _shift_right(py_eff, 1, NEG_INF)
        p_row = _log_scan_row(coeff, b)
        p_store[pl.ds(s, 1)] = p_row[None]
        c1[:, :] = p_row
        val = jnp.max(
            jnp.where(t == bvec[:, 3:4], p_row, neg), axis=1, keepdims=True
        )

        @pl.when(u == 0)
        def _():
            scores_ref[:, :] = jnp.full_like(scores_ref[:, :], NEG_INF)

        hit = bvec[:, 2:3] == s
        scores_ref[:, :] = jnp.where(hit, val, scores_ref[:, :])

    @pl.when(u > S)
    def _bwd():
        # descending phase: row s = 2S+1-u; bodies identical to _bwd_kernel
        # with ans_grad = 1.  c1 doubles as the g carry (its phase-A
        # leftover is masked at s == S), c2 as the p[s+1] carry.
        s = 2 * S + 1 - u
        p_cur = p_store[pl.ds(s, 1)][0]
        pxm, pym = _row_masks(s, s, bvec, t, modified, lo, K)
        px_eff = jnp.where(pxm, pxr, neg)
        py_eff = jnp.where(pym, pyr, neg)

        zeros = jnp.zeros_like(p_cur)
        g_next = jnp.where(s < S, c1[:, :], zeros)
        p_next = jnp.where(s < S, c2[:, :], zeros)

        if modified:
            term1 = safe_exp(p_cur + px_eff - _shift_left(p_next, 1, 0.0))
            h_px = term1 * _shift_left(g_next, 1, 0.0)
        else:
            term1 = safe_exp(p_cur + px_eff - p_next)
            h_px = term1 * g_next

        seed = jnp.where(
            (bvec[:, 2:3] == s) & (t == bvec[:, 3:4]), 1.0, 0.0
        )
        b = h_px + seed.astype(h_px.dtype)
        term2 = safe_exp(p_cur + py_eff - _shift_left(p_cur, 1, 0.0))
        g = _rev_linear_scan_row(term2, b)

        pxg_ref[0] = h_px.astype(pxg_ref.dtype)
        pyg_ref[0] = (term2 * _shift_left(g, 1, 0.0)).astype(pyg_ref.dtype)
        c1[:, :] = g
        c2[:, :] = p_cur


def _fused_core(px_rows, py_rows, bvec, *maybe_lo, K: int, interpret: bool,
                bblk: int):
    """pallas_call body of the fused two-phase recursion (per-shard shapes
    under the GSPMD wrapper)."""
    S, B, T1 = px_rows.shape
    T = py_rows.shape[2]
    modified = T1 == T
    lo_ext = (
        jnp.pad(maybe_lo[0].astype(jnp.int32), ((0, 0), (0, 1)), mode="edge")
        if maybe_lo else None
    )
    W = _ceil_to(T + 1, LANE)
    nb = _cdiv(B, bblk)
    grid = (nb, 2 * (S + 1))
    dt = px_rows.dtype

    # phase-aware block maps.  Input rows: ascending wants px row u-1 /
    # py row u, descending wants px row min(s, S-1) / py row s.  Output
    # rows: during the ascending phase pxg/pyg park on the same index the
    # first descending step writes (S-1 / S), so no flush of an unwritten
    # buffer ever lands on a row another step owns (sequential grid, the
    # s = S step's zeros and every parked block are overwritten in order).
    def px_map(ib, u):
        return (
            jnp.where(u <= S, jnp.maximum(u - 1, 0),
                      jnp.minimum(2 * S + 1 - u, S - 1)),
            ib, 0,
        )

    def py_map(ib, u):
        return (jnp.where(u <= S, u, 2 * S + 1 - u), ib, 0)

    def pxg_map(ib, u):
        return (
            jnp.where(u <= S, S - 1, jnp.minimum(2 * S + 1 - u, S - 1)),
            ib, 0,
        )

    def pyg_map(ib, u):
        return (jnp.where(u <= S, S, 2 * S + 1 - u), ib, 0)

    row_spec = lambda imap: pl.BlockSpec((1, bblk, W), imap, memory_space=pltpu.VMEM)
    bvec_spec = pl.BlockSpec((bblk, 4), lambda ib, u: (ib, 0), memory_space=pltpu.VMEM)
    score_spec = pl.BlockSpec((bblk, 1), lambda ib, u: (ib, 0), memory_space=pltpu.VMEM)

    banded = lo_ext is not None
    inputs = [bvec]
    in_specs = [bvec_spec]
    if banded:
        inputs.append(lo_ext)
        in_specs.append(
            pl.BlockSpec((bblk, W), lambda ib, u: (ib, 0), memory_space=pltpu.VMEM)
        )
    inputs += [px_rows, py_rows]
    in_specs += [row_spec(px_map), row_spec(py_map)]

    kernel = functools.partial(
        _fused_kernel, S=S, modified=modified, banded=banded, K=K
    )
    scores_pad, pxg_rows, pyg_rows = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[score_spec, row_spec(pxg_map), row_spec(pyg_map)],
        out_shape=[
            _out_struct((B, 1), jnp.float32, px_rows, py_rows, bvec),
            _out_struct((S, B, T1), dt, px_rows, py_rows, bvec),
            _out_struct((S + 1, B, T), dt, px_rows, py_rows, bvec),
        ],
        scratch_shapes=[
            pltpu.VMEM((S + 1, bblk, W), jnp.float32),  # the p lattice
            pltpu.VMEM((bblk, W), jnp.float32),  # fwd p carry / bwd g carry
            pltpu.VMEM((bblk, W), jnp.float32),  # bwd p[s+1] carry
        ],
        interpret=interpret,
        compiler_params=_FUSED_VMEM,
    )(*inputs)

    return scores_pad, pxg_rows, pyg_rows


@functools.lru_cache(maxsize=None)
def _fused_partitioned(K: int, interpret: bool, banded: bool, bblk: int):
    from .partition import batch_partitioned

    core = functools.partial(_fused_core, K=K, interpret=interpret, bblk=bblk)
    in_axes = (1, 1, 0) + ((0,) if banded else ())
    in_ranks = (3, 3, 2) + ((2,) if banded else ())
    return batch_partitioned(
        core, in_axes, (0, 1, 1), in_ranks, (2, 3, 3), name="mi_fused"
    )


def fused_rows_pallas(
    px_rows: jax.Array,
    py_rows: jax.Array,
    boundary: jax.Array,
    lo: Optional[jax.Array] = None,
    K: int = 0,
    interpret: Optional[bool] = None,
):
    """Fused forward + occupancy backward on TPU, s-major, ONE launch.

    Same contract as forward_rows_pallas followed by backward_rows_pallas
    with ``ans_grad = 1`` — returns ``(scores [B], px_grad_rows,
    py_grad_rows)`` — but the p lattice lives in VMEM scratch and never
    round-trips HBM, and px/py stream from HBM once per phase instead of
    being re-read by a second launch.  Bit-equal to the split pair (same
    op sequence, f32 carries).

    Returns None when this shape can't run fused (S == 0, vma-checked
    interpret mode, or a p scratch past the VMEM cap) — callers fall back
    to the split kernels.
    """
    S, B, T1 = px_rows.shape
    T = py_rows.shape[2]
    if interpret is None:
        interpret = _interpret_default()
    if S == 0 or vma_blocks_interpret(interpret, px_rows, py_rows):
        return None
    W = _ceil_to(T + 1, LANE)
    bblk = min(_ceil_to(B, SUBLANE), 4 * SUBLANE)
    while bblk > SUBLANE and (S + 1) * bblk * W * 4 > _P_SCRATCH_CAP:
        bblk //= 2
    if (S + 1) * bblk * W * 4 > _P_SCRATCH_CAP:
        return None

    bvec = boundary.astype(jnp.int32)
    args = [px_rows, py_rows, bvec]
    if lo is not None:
        args.append(lo)
    scores_pad, pxg, pyg = _fused_partitioned(
        int(K), bool(interpret), lo is not None, int(bblk)
    )(*args)
    return scores_pad[:, 0], pxg, pyg


# -----------------------------------------------------------------------------
# legacy (B, S, T)-major adapters + impl registration
# -----------------------------------------------------------------------------


def forward_lattice_pallas(
    px: jax.Array, py: jax.Array, boundary: jax.Array, interpret: Optional[bool] = None
):
    """(B, S, T)-major adapter: transpose in, run the s-major kernel.
    Returns (p_rows_residual, scores)."""
    p_rows, scores = forward_rows_pallas(
        jnp.moveaxis(px, 1, 0), jnp.moveaxis(py, 1, 0), boundary,
        interpret=interpret,
    )
    return p_rows, scores


def backward_lattice_pallas(
    px: jax.Array,
    py: jax.Array,
    res,
    boundary: jax.Array,
    ans_grad: jax.Array,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(B, S, T)-major adapter around backward_rows_pallas."""
    pxg_rows, pyg_rows = backward_rows_pallas(
        jnp.moveaxis(px, 1, 0), jnp.moveaxis(py, 1, 0), res, boundary,
        ans_grad, interpret=interpret,
    )
    return jnp.moveaxis(pxg_rows, 0, 1), jnp.moveaxis(pyg_rows, 0, 1)


def register(default: bool = False, interpret: Optional[bool] = None) -> None:
    """Register the Pallas kernels as the "pallas" implementation of
    mutual_information_recursion (see ops/recursion.py:register_impl).
    ``interpret`` sets the process-default interpret mode for the s-major
    entry points (CPU test environments pass True); None leaves the
    current process default untouched — the lazy registration path
    (recursion._register_pallas_lazy) may run mid-trace AFTER a caller
    already opted into interpret mode and must not clobber it."""
    global _INTERPRET
    if interpret is not None:
        _INTERPRET = interpret
    from ..recursion import register_impl

    fwd = functools.partial(forward_lattice_pallas, interpret=None)
    bwd = functools.partial(backward_lattice_pallas, interpret=None)
    register_impl("pallas", fwd, bwd, default=default)
