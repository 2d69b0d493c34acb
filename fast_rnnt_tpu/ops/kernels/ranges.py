"""Pallas TPU kernel for the pruning-window argmax (get_rnnt_prune_ranges).

The reference computes, per frame t, the window start maximizing

    final_grad[k] = sum_{j in [k, k+K)} py_grad[j, t]  -  px_grad[k-1, t]

via a padded cumulative sum + argmax (rnnt_loss.py:722-729).  In XLA that
is a multi-pass cumsum over the (S+1, B, T) occupancies plus argmax and
padding concats (~290 us in-graph at the benchmark shape).  Here it is ONE
streaming pass: a sequential grid over s keeps a rolling window sum and a
running (best, argbest) in VMEM, reading each occupancy row once (gy
twice: entering and leaving the window) — ~36 MB of traffic total.

Semantics pinned against the XLA path in tests/test_pruning.py (first-max
tie-breaking matches jnp.argmax).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_argmax_rows_pallas"]

LANE = 128
SUBLANE = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


_BIG = 2**30  # plain int: a jnp scalar here would be a captured constant


def _shift_left_int(x, d, fill):
    b, w = x.shape
    pad = jnp.full((b, d), fill, x.dtype)
    return jnp.concatenate([x[:, d:], pad], axis=1)


def _rev_cummin_lanes(x, valid):
    """Reverse cummin along the lane axis: out[t] = min(x[t], ..., x[-1]),
    with invalid (t >= T) lanes treated as +BIG so they never poison the
    minima.  Kogge-Stone: log2(W) rounds of shift-left + min."""
    x = jnp.where(valid, x, _BIG)
    w = x.shape[1]
    d = 1
    while d < w:
        x = jnp.minimum(x, _shift_left_int(x, d, _BIG))
        d *= 2
    return x


def _kernel(
    *refs,
    S1: int, K: int, T: int, adjust_step: int, fuse_post: bool,
):
    if fuse_post:
        (gy_in_ref, gy_out_ref, gx_ref, bvec_ref,
         sbegin_ref, acc, best, arg) = refs
    else:
        gy_in_ref, gy_out_ref, gx_ref, sbegin_ref, acc, best, arg = refs
    i = pl.program_id(1)

    if K == 1:
        # width-1 window: the sum IS the row — skip the rolling update
        # entirely (the add/subtract form accumulates ~1e-7*S float
        # drift, which flips near-tie argmaxes; at K=1 exactness is free)
        a = gy_in_ref[0].astype(jnp.float32)
    else:
        @pl.when(i == 0)
        def _():
            acc[:, :] = jnp.zeros_like(acc[:, :])

        # window gains row i (f32 accumulate even for bf16 occupancies)
        a = acc[:, :] + gy_in_ref[0].astype(jnp.float32)
        # ...and drops row i-K once the window is full
        a = jnp.where(i >= K, a - gy_out_ref[0].astype(jnp.float32), a)
        acc[:, :] = a

    # window [k, k+K) complete at i = k+K-1; score = acc - px_grad[k-1]
    # (the k = 0 window has no px term: px_grad_pad[0] = 0)
    k = i - (K - 1)
    score = jnp.where(k > 0, a - gx_ref[0].astype(jnp.float32), a)

    @pl.when(i == K - 1)
    def _():
        best[:, :] = score
        arg[:, :] = jnp.zeros_like(arg[:, :])

    @pl.when(i >= K)
    def _():
        hit = score > best[:, :]  # strict: first max wins (= jnp.argmax)
        best[:, :] = jnp.where(hit, score, best[:, :])
        arg[:, :] = jnp.where(hit, jnp.full_like(arg[:, :], k), arg[:, :])

    @pl.when(i == S1 - 1)
    def _():
        if not fuse_post:
            sbegin_ref[:, :] = arg[:, :]
            return
        # fused post-processing (pruning.py:get_rnnt_prune_ranges_rows +
        # adjust_pruning_lower_bound): the XLA version is ~20 launch-bound
        # micro-kernels on a (B, T) array (two 10-round reverse-cummin
        # associative scans + the magic transform) — ~3x the cost of this
        # whole kernel.  All of it is a few register ops on the tile we
        # already hold, so do it here.
        s = arg[:, :]
        t_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = t_iota < T
        te = bvec_ref[:, 3:4]  # (bblk, 1) t_end column
        se = bvec_ref[:, 2:3]  # (bblk, 1) s_end column
        # frames at/after t_end - 1 get the final window start
        pad_val = jnp.maximum(se - K + 1, 0)
        s = jnp.where(t_iota < te - 1, s, pad_val)
        # adjust_pruning_lower_bound, verbatim in int32 registers
        ramp = (adjust_step - 1) * t_iota
        s = _rev_cummin_lanes(s, valid)
        s = -(s - ramp)
        s = _rev_cummin_lanes(s, valid)
        s = jnp.maximum(s, 0)
        s = -(s - ramp)
        sbegin_ref[:, :] = s


def window_argmax_rows_pallas(
    py_grad_rows: jax.Array,
    px_grad_rows: jax.Array,
    K: int,
    interpret: Optional[bool] = None,
    boundary: Optional[jax.Array] = None,
    adjust_step: Optional[int] = None,
) -> jax.Array:
    """s_begin[b, t] = argmax_k ( window-sum of py_grad - px_grad entry ).

    Args:
      py_grad_rows: (S+1, B, T) blank occupancies (s-major).
      px_grad_rows: (S, B, T') symbol occupancies; only [:, :, :T] is read.
      K: static window width (1 <= K <= S+1).
      boundary: optional (B, 4) int32; when given (with ``adjust_step``)
        the kernel ALSO applies the whole get_rnnt_prune_ranges
        post-processing in-register (boundary padding + the monotone /
        step-bound repair) and returns the FINAL window starts.
      adjust_step: the adjust_pruning_lower_bound step (2 for modified /
        constrained, s_range for regular); required with ``boundary``.

    Returns (B, T) int32 window starts in [0, S+1-K] (raw argmax, or the
    repaired starts when ``boundary`` is given).
    """
    S1, B, T = py_grad_rows.shape
    if not 1 <= K <= S1:
        raise ValueError(f"K={K} out of range for S+1={S1}")
    fuse_post = boundary is not None
    if fuse_post and adjust_step is None:
        raise ValueError("adjust_step is required with boundary")
    from .wavefront import _interpret_default

    if interpret is None:
        interpret = _interpret_default()

    args = [py_grad_rows, px_grad_rows]
    if fuse_post:
        args.append(boundary.astype(jnp.int32))
    return _ranges_partitioned(
        int(K), bool(interpret), int(adjust_step or 0), fuse_post
    )(*args)[0]


@functools.lru_cache(maxsize=None)
def _ranges_partitioned(K: int, interpret: bool, adjust_step: int,
                        fuse_post: bool):
    from .partition import batch_partitioned

    core = functools.partial(
        _ranges_core, K=K, interpret=interpret, adjust_step=adjust_step,
    )
    in_axes = (1, 1) + ((0,) if fuse_post else ())
    in_ranks = (3, 3) + ((2,) if fuse_post else ())
    return batch_partitioned(
        core, in_axes, (0,), in_ranks, (2,), name="prune_ranges"
    )


def _ranges_core(py_grad_rows, px_grad_rows, *maybe_bvec,
                 K: int, interpret: bool, adjust_step: int):
    """pallas_call body (per-shard shapes under the GSPMD wrapper)."""
    from .wavefront import _out_struct

    S1, B, T = py_grad_rows.shape
    boundary = maybe_bvec[0] if maybe_bvec else None
    fuse_post = boundary is not None

    W = _ceil_to(T, LANE)
    bblk = min(_ceil_to(B, SUBLANE), 4 * SUBLANE)
    nb = _cdiv(B, bblk)
    grid = (nb, S1)

    row_spec = lambda imap: pl.BlockSpec(
        (1, bblk, W), imap, memory_space=pltpu.VMEM
    )
    # gx row k-1 = i-K (clamped; masked out for the k <= 0 steps).  A zero-
    # row px pad is never read: k > 0 is required before subtracting.
    kernel = functools.partial(
        _kernel, S1=S1, K=K, T=T,
        adjust_step=int(adjust_step or 0), fuse_post=fuse_post,
    )
    in_specs = [
        row_spec(lambda ib, i: (i, ib, 0)),  # gy row i
        row_spec(lambda ib, i: (jnp.maximum(i - K, 0), ib, 0)),  # gy row i-K
        row_spec(lambda ib, i: (jnp.clip(i - K, 0, S1 - 2), ib, 0)),  # gx row k-1
    ]
    inputs = [py_grad_rows, py_grad_rows, px_grad_rows]
    if fuse_post:
        in_specs.append(
            pl.BlockSpec((bblk, 4), lambda ib, i: (ib, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(boundary)
    sbegin = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bblk, W), lambda ib, i: (ib, 0), memory_space=pltpu.VMEM)
        ],
        out_shape=[
            _out_struct((B, T), jnp.int32, py_grad_rows, px_grad_rows)
        ],
        scratch_shapes=[
            pltpu.VMEM((bblk, W), jnp.float32),
            pltpu.VMEM((bblk, W), jnp.float32),
            pltpu.VMEM((bblk, W), jnp.int32),
        ],
        interpret=interpret,
        # batch blocks independent (scratch re-seeded at i == 0 / i == K-1
        # per block); the s dim carries the rolling window — sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*inputs)[0]
    return (sbegin,)
