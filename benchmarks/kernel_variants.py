"""On-chip kernel-variant experiments (VERDICT r2 item 3: MEASURE, don't
analyze).

Times the forward row-scan kernel against structural variants at the
benchmark shape, plus the isolated ranges kernel and a relayout probe.
Run on the TPU:  python benchmarks/kernel_variants.py

Variants (motivation in the code; all numerically checked against the
baseline before timing):
  ks_roll       the shipped Kogge-Stone scan (pltpu.roll shifts)
  ks_concat     same, shifts via pad+slice concat (is roll the cost?)
  subblock128   sequential 128-lane sub-blocks with carried prefix:
                8 x (7 rounds + 1 carry-inject) = ~20% less logaddexp
                VOLUME than 10 full-width rounds, but shorter vectors
                per op (latency risk)
  tworow        two rows per grid step (halve grid/DMA overhead)
"""

from __future__ import annotations

import functools
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_rnnt_tpu.ops.numerics import NEG_INF, logaddexp
from fast_rnnt_tpu.ops.kernels import wavefront as wf
from fast_rnnt_tpu.utils.profiling import benchmark_on_device

B, T, S = 30, 1000, 100


# --- variant scan implementations -------------------------------------------


_ORIG_SCAN = wf._log_scan_row  # pre-monkeypatch original


def _log_scan_row_concat(coeff, bias):
    old = wf._USE_ROLL_RIGHT
    wf._USE_ROLL_RIGHT = False
    try:
        return _ORIG_SCAN(coeff, bias)
    finally:
        wf._USE_ROLL_RIGHT = old


def _log_scan_row_subblock(coeff, bias, block=128):
    """Sequential 128-lane sub-blocks, each scanned with a local
    Kogge-Stone (7 rounds) plus one carry-injection compose."""
    w = coeff.shape[1]
    assert w % block == 0
    t_in_block = jax.lax.broadcasted_iota(jnp.int32, coeff.shape, 1) % block

    def local_shift(x, d, fill):
        rolled = pltpu.roll(x, d, axis=1)
        return jnp.where(t_in_block < d, fill, rolled)

    # local KS on every block at once (shifts never cross block edges)
    a, b = coeff, bias
    d = 1
    while d < block:
        b_prev = local_shift(b, d, NEG_INF)
        b = logaddexp(b_prev + a, b)
        a = local_shift(a, d, 0.0) + a  # full prefix-coefficient needed
        d *= 2

    # sequential carry across blocks: x = logaddexp(b, a + carry_in)
    nblk = w // block
    outs = []
    carry = None
    for k in range(nblk):
        sl = slice(k * block, (k + 1) * block)
        bk = b[:, sl]
        if carry is not None:
            bk = logaddexp(bk, a[:, sl] + carry)
        outs.append(bk)
        carry = bk[:, -1:]
    return jnp.concatenate(outs, axis=1)


# --- kernel wrappers ---------------------------------------------------------


def fwd_with_scan(scan_fn):
    """forward_rows_pallas with the row scan swapped out."""

    def run(px_rows, py_rows, boundary):
        old = wf._log_scan_row
        wf._log_scan_row = scan_fn
        # the kernel body references the module global at trace time
        try:
            return wf.forward_rows_pallas(px_rows, py_rows, boundary)
        finally:
            wf._log_scan_row = old

    return run


def _fwd_kernel_tworow(*refs, S, modified, K):
    """Two lattice rows per grid step (baseline mask/scan logic inlined)."""
    bvec_ref, px_ref, py_ref, p_ref, scores_ref, prev_p = refs
    s0 = pl.program_id(1) * 2
    bvec = bvec_ref[...]
    neg = None
    for r in range(2):
        s = s0 + r
        pxr = px_ref[r].astype(jnp.float32)
        pyr = py_ref[r].astype(jnp.float32)
        t = jax.lax.broadcasted_iota(jnp.int32, pxr.shape, 1)
        pxm, pym = wf._row_masks(s - 1, s, bvec, t, modified, None, K)
        neg = jnp.full_like(pxr, NEG_INF)
        px_eff = jnp.where(pxm & (s <= S), pxr, neg)
        py_eff = jnp.where(pym & (s <= S), pyr, neg)
        prev = prev_p[:, :]
        a = prev + px_eff
        a = jnp.where(s > 0, a, neg)
        b = jnp.where((bvec[:, 0:1] == s) & (t == bvec[:, 1:2]),
                      jnp.zeros_like(a), a)
        coeff = wf._shift_right(py_eff, 1, NEG_INF)
        p_row = wf._log_scan_row(coeff, b)
        p_ref[r] = p_row.astype(p_ref.dtype)
        prev_p[:, :] = p_row
        val = jnp.max(jnp.where(t == bvec[:, 3:4], p_row, neg), axis=1,
                      keepdims=True)

        @pl.when(s == 0)
        def _():
            scores_ref[:, :] = jnp.full_like(scores_ref[:, :], NEG_INF)

        hit = (bvec[:, 2:3] == s) & (s <= S)
        scores_ref[:, :] = jnp.where(hit, val, scores_ref[:, :])


def forward_tworow(px_rows, py_rows, boundary):
    S_, Bb, T1 = px_rows.shape
    T_ = py_rows.shape[2]
    modified = T1 == T_
    W = wf._ceil_to(T_ + 1, wf.LANE)
    bblk = min(wf._ceil_to(Bb, wf.SUBLANE), 4 * wf.SUBLANE)
    nb = wf._cdiv(Bb, bblk)
    half = wf._cdiv(S_ + 1, 2)
    grid = (nb, half)
    bvec = boundary.astype(jnp.int32)
    row2 = lambda imap: pl.BlockSpec((2, bblk, W), imap, memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel_tworow, S=S_, modified=modified, K=0)
    # px block r holds row s0+r-1 (clamped); py/p blocks hold rows s0+r
    p_rows, scores_pad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bblk, 4), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM),
            row2(lambda ib, s: (s, ib, 0)),  # px_staged rows 2s..2s+1 (= px[2s-1..2s])
            row2(lambda ib, s: (s, ib, 0)),  # py rows 2s..2s+1
        ],
        out_specs=[
            row2(lambda ib, s: (s, ib, 0)),
            pl.BlockSpec((bblk, 1), lambda ib, s: (ib, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * half, Bb, W), jnp.float32),
            jax.ShapeDtypeStruct((Bb, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bblk, W), jnp.float32)],
        interpret=wf._INTERPRET,
    )(
        bvec,
        # px staged with a leading pad row so block r of grid step s is
        # px[2s + r - 1] — one relayout-free concat
        jnp.concatenate(
            [jax.lax.full_like(px_rows, NEG_INF, shape=(1, Bb, T1)), px_rows,
             jax.lax.full_like(px_rows, NEG_INF,
                               shape=(2 * half - S_ - 1, Bb, T1))], axis=0
        ),
        jnp.concatenate(
            [py_rows, jax.lax.full_like(py_rows, NEG_INF,
                                        shape=(2 * half - S_ - 1, Bb, T_))],
            axis=0,
        ),
    )
    return p_rows[: S_ + 1], scores_pad[:, 0]


# --- harness ------------------------------------------------------------------


def main():
    rng = np.random.default_rng(0)
    px = jnp.asarray((rng.normal(size=(S, B, T + 1)) - 3.0).astype(np.float32))
    py = jnp.asarray((rng.normal(size=(S + 1, B, T)) - 3.0).astype(np.float32))
    se = np.clip(rng.integers(S // 2, S + 1, size=B), 2, S).astype(np.int32)
    te = np.clip(rng.integers(T // 2, T + 1, size=B), 4, T).astype(np.int32)
    boundary = jnp.asarray(
        np.stack([np.zeros(B, np.int32), np.zeros(B, np.int32), se, te], 1)
    )

    base = jax.jit(wf.forward_rows_pallas)
    p0, s0 = base(px, py, boundary)
    results = {}

    def check_and_time(name, fn):
        f = jax.jit(fn)
        try:
            p1, s1 = f(px, py, boundary)
            err = float(jnp.max(jnp.abs(s1 - s0)))
            if not err < 1e-3:
                results[name] = {"error": f"score mismatch {err}"}
                return
            dt = benchmark_on_device(
                lambda a, b, c: f(a, b, c)[1], px, py, boundary, iters=30
            )
            results[name] = {"us": round(dt * 1e6, 1), "max_err": err}
        except Exception as e:
            results[name] = {"error": repr(e)[:160]}

    check_and_time("ks_roll_baseline", wf.forward_rows_pallas)
    check_and_time("ks_concat", fwd_with_scan(_log_scan_row_concat))
    check_and_time("subblock128", fwd_with_scan(_log_scan_row_subblock))
    check_and_time("tworow", forward_tworow)

    # isolated ranges kernel + bound adjustment
    from fast_rnnt_tpu.ops.pruning import get_rnnt_prune_ranges_rows
    from fast_rnnt_tpu.ops.kernels.ranges import window_argmax_rows_pallas

    gx = jnp.asarray(rng.uniform(size=(S, B, T + 1)).astype(np.float32))
    gy = jnp.asarray(rng.uniform(size=(S + 1, B, T)).astype(np.float32))
    dt = benchmark_on_device(
        lambda a, b: window_argmax_rows_pallas(b, a, 5), gx, gy, iters=30
    )
    results["ranges_window_argmax"] = {"us": round(dt * 1e6, 1)}
    dt = benchmark_on_device(
        lambda a, b, c: get_rnnt_prune_ranges_rows(a, b, c, 5),
        gx, gy, boundary, iters=30,
    )
    results["ranges_full"] = {"us": round(dt * 1e6, 1)}

    # relayout probe: s-major <-> batch-major copy cost at lattice size
    x = jnp.asarray(rng.normal(size=(S + 1, B, T)).astype(np.float32))
    dt = benchmark_on_device(
        lambda a: jnp.moveaxis(a, 0, 1) + 0.0, x, iters=30
    )
    results["relayout_SBT_to_BST"] = {"us": round(dt * 1e6, 1)}

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
