"""On-chip ablation of the ROUND-3 (retired) fused lattice-build forward
kernel design — kept as the historical attribution record that motivated
the round-4 batched rewrite (see ops/kernels/latbuild.py docstring).

The round-3 A/B (benchmarks/components.py) measured the fused build
SLOWER than the XLA einsum build at the benchmark shape (fwd 590 vs
490 us, vjp 1527 vs 818 us) despite a ~3x HBM-traffic cut — so the
kernel is not bandwidth-bound and the time must be in compute or
structure.  This harness times stripped-down variants of the forward
kernel to attribute the cost:

  full        the shipped kernel body
  no_extract  per-row side-input one-hot matvecs replaced by constants
  default_pp  matmul precision DEFAULT instead of HIGHEST (6-pass f32)
  no_pxdot    the px one-hot gather matmul dropped
  no_exp      the exp() transcendental dropped (raw am in the dot)
  dot_only    ONLY the normalizer matmul + stores (lower bound w/ DMA)

Variants compute wrong values by design (except `full`); they are
timing probes, never dispatched.  Run:  python benchmarks/latbuild_variants.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_rnnt_tpu.ops.kernels.latbuild import (
    LANE,
    SUBLANE,
    _TINY,
    _VMEM_LIMIT,
    _cdiv,
    _dot,
    _extract_col,
    _lm_parts,
    _pad_lane,
    _side_spec,
)
from fast_rnnt_tpu.utils.profiling import benchmark_on_device

B, T, S, C = 30, 1000, 100, 500
NEG_INF = -1e30


def _lm_parts_lane_major(lm, symbols, blank):
    """The retired round-3 lane-stacked layout of the lm side quantities
    (batch on the LANE axis).  The live kernel's _lm_parts went B-major in
    round 4; this harness probes the RETIRED design, so re-transpose here
    — in ONE place, so a future _lm_parts layout change breaks loudly
    instead of silently skewing the historical baseline (ADVICE r4)."""
    lmmax, lmp, pxlm, pylm = _lm_parts(lm, symbols, blank)
    return lmmax.T, lmp, pxlm.T, pylm.T


def _variant_kernel(
    lmp_ref, lmmax_ref, pxlm_ref, pylm_ref, sym_ref, te_ref, am_ref,
    px_ref, py_ref,
    *, bblk, precision, extract, do_exp, px_dot, dot_only,
):
    ib = pl.program_id(0)
    it = pl.program_id(1)
    tg = it * LANE + jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    cf = c_iota.astype(jnp.float32)
    blank_oh = (c_iota == 0).astype(jnp.float32)
    lane0 = (ib * bblk) % LANE
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)

    for i in range(bblk):
        if extract:
            sel = (b_iota == lane0 + i).astype(jnp.float32)
            lmmax_col = _extract_col(lmmax_ref, sel)
            pxlm_col = _extract_col(pxlm_ref, sel)
            pylm_col = _extract_col(pylm_ref, sel)
            sym_col = _extract_col(sym_ref, sel)
            te_col = _extract_col(te_ref, sel)
        else:
            lmmax_col = jnp.full((S + 1, 1), 0.1, jnp.float32)
            pxlm_col = jnp.full((S, 1), 0.1, jnp.float32)
            pylm_col = jnp.full((S + 1, 1), 0.1, jnp.float32)
            sym_col = jnp.full((S, 1), 3.0, jnp.float32)
            te_col = jnp.full((1, 1), -1.0, jnp.float32)

        a32 = am_ref[i].astype(jnp.float32)
        amax = jnp.max(a32, axis=1, keepdims=True)
        ashift = a32 - amax
        amp = jnp.exp(ashift) if do_exp else ashift
        lmp_i = lmp_ref[i]
        d = _dot(lmp_i, amp, ((1,), (1,)), precision) + _TINY
        lognorm = jnp.log(d) + lmmax_col

        if dot_only:
            px_ref[:, i, :] = lognorm[:S].astype(px_ref.dtype)
            py_ref[:, i, :] = lognorm.astype(py_ref.dtype)
            continue

        if px_dot:
            oh = (sym_col == cf).astype(jnp.float32)
            px_am = _dot(oh, ashift, ((1,), (1,)), precision)
        else:
            px_am = lognorm[:S]
        px = px_am + pxlm_col - lognorm[:S]
        kill = (tg == T) | (tg.astype(jnp.float32) == te_col)
        px = jnp.where(kill, NEG_INF, px)

        blank_row = _dot(
            blank_oh, ashift, ((1,), (1,)), jax.lax.Precision.HIGHEST
        )
        py = blank_row + pylm_col - lognorm

        px_ref[:, i, :] = px.astype(px_ref.dtype)
        py_ref[:, i, :] = py.astype(py_ref.dtype)


def _split3(x):
    """Exact 3-term bf16 decomposition of f32: x == hi + mid + lo."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot1(a, b, dims):
    """One-pass bf16 matmul with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _v2_kernel(
    lmp_ref, side_ref, am_ref, px_ref, py_ref,
    *, bblk, norm_split,
):
    """Rewritten fwd: stacked side extraction + split-matmul gathers."""
    ib = pl.program_id(0)
    it = pl.program_id(1)
    tg = it * LANE + jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    cf = c_iota.astype(jnp.float32)
    blank_oh3 = (c_iota == 0).astype(jnp.bfloat16)
    lane0 = (ib * bblk) % LANE
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    S1 = S + 1

    for i in range(bblk):
        sel = (b_iota == lane0 + i).astype(jnp.float32)
        side = _extract_col(side_ref, sel)  # (2*S1+2*S+1, 1)
        lmmax_col = side[:S1]
        pxlm_col = side[S1:S1 + S]
        pylm_col = side[S1 + S:2 * S1 + S]
        sym_col = side[2 * S1 + S:2 * S1 + 2 * S]
        te_col = side[2 * S1 + 2 * S:]

        a32 = am_ref[i].astype(jnp.float32)
        amax = jnp.max(a32, axis=1, keepdims=True)
        ashift = a32 - amax
        sh, sm, sl = _split3(ashift)
        amp = jnp.exp(ashift)
        lmp_i = lmp_ref[i]
        if norm_split:
            # 3-matmul bf16 split: rel err ~2^-16 on the normalizer
            ah, amid, _ = _split3(amp)
            lh, lmid, _ = _split3(lmp_i.astype(jnp.float32))
            d = (
                _dot1(lh, ah, ((1,), (1,)))
                + _dot1(lh, amid, ((1,), (1,)))
                + _dot1(lmid, ah, ((1,), (1,)))
            ) + _TINY
        else:
            d = _dot(lmp_i, amp.astype(jnp.float32), ((1,), (1,)),
                     jax.lax.Precision.HIGHEST) + _TINY
        lognorm = jnp.log(d) + lmmax_col

        oh = (sym_col == cf).astype(jnp.bfloat16)
        px_am = (
            _dot1(oh, sh, ((1,), (1,)))
            + _dot1(oh, sm, ((1,), (1,)))
            + _dot1(oh, sl, ((1,), (1,)))
        )
        px = px_am + pxlm_col - lognorm[:S]
        kill = (tg == T) | (tg.astype(jnp.float32) == te_col)
        px = jnp.where(kill, NEG_INF, px)

        blank_row = (
            _dot1(blank_oh3, sh, ((1,), (1,)))
            + _dot1(blank_oh3, sm, ((1,), (1,)))
            + _dot1(blank_oh3, sl, ((1,), (1,)))
        )
        py = blank_row + pylm_col - lognorm

        px_ref[:, i, :] = px.astype(px_ref.dtype)
        py_ref[:, i, :] = py.astype(py_ref.dtype)


def build_v2(norm_split):
    bblk = SUBLANE
    nb = _cdiv(B, bblk)
    wpx = T + 1
    nt = _cdiv(wpx, LANE)
    nt_am = _cdiv(T, LANE)
    S1 = S + 1

    def fn(lm, am, symbols):
        lmmax_t, lmp, pxlm_t, pylm_t = _lm_parts_lane_major(lm, symbols, 0)
        te_row = jnp.full((1, B), -1.0, jnp.float32)
        side = _pad_lane(jnp.concatenate(
            [lmmax_t, pxlm_t, pylm_t, symbols.astype(jnp.float32).T, te_row],
            axis=0,
        ))
        nside = side.shape[0]
        kernel = functools.partial(_v2_kernel, bblk=bblk,
                                   norm_split=norm_split)
        clamp = lambda n: (lambda ib, it: (0, ib, jnp.minimum(it, n - 1)))
        return pl.pallas_call(
            kernel,
            grid=(nb, nt),
            in_specs=[
                pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
                _side_spec(nside, bblk),
                pl.BlockSpec((bblk, LANE, C),
                             lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S, bblk, LANE), lambda ib, it: (0, ib, it),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S1, bblk, LANE), clamp(nt_am),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S, B, wpx), jnp.float32),
                jax.ShapeDtypeStruct((S1, B, T), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel"),
            ),
        )(lmp, side, am)

    return fn


def build_variant(**kw):
    bblk = SUBLANE
    nb = _cdiv(B, bblk)
    wpx = T + 1
    nt = _cdiv(wpx, LANE)
    nt_am = _cdiv(T, LANE)
    S1 = S + 1

    def fn(lm, am, symbols):
        lmmax_t, lmp, pxlm_t, pylm_t = _lm_parts_lane_major(lm, symbols, 0)
        te_row = _pad_lane(jnp.full((1, B), -1.0, jnp.float32))
        kernel = functools.partial(_variant_kernel, bblk=bblk, **kw)
        clamp = lambda n: (lambda ib, it: (0, ib, jnp.minimum(it, n - 1)))
        return pl.pallas_call(
            kernel,
            grid=(nb, nt),
            in_specs=[
                pl.BlockSpec((bblk, S1, C), lambda ib, it: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
                _side_spec(S1, bblk),
                _side_spec(S, bblk),
                _side_spec(S1, bblk),
                _side_spec(S, bblk),
                _side_spec(1, bblk),
                pl.BlockSpec((bblk, LANE, C),
                             lambda ib, it: (ib, jnp.minimum(it, nt_am - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S, bblk, LANE), lambda ib, it: (0, ib, it),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S1, bblk, LANE), clamp(nt_am),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S, B, wpx), jnp.float32),
                jax.ShapeDtypeStruct((S1, B, T), jnp.float32),
            ],
            compiler_params=_VMEM_LIMIT,
        )(lmp, _pad_lane(lmmax_t), _pad_lane(pxlm_t), _pad_lane(pylm_t),
          _pad_lane(symbols.astype(jnp.float32).T), te_row, am)

    return fn


def main():
    rng = np.random.default_rng(0)
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))

    HI = jax.lax.Precision.HIGHEST
    variants = {
        "full": dict(precision=HI, extract=True, do_exp=True, px_dot=True,
                     dot_only=False),
        "no_extract": dict(precision=HI, extract=False, do_exp=True,
                           px_dot=True, dot_only=False),
        "default_pp": dict(precision=None, extract=True, do_exp=True,
                           px_dot=True, dot_only=False),
        "no_pxdot": dict(precision=HI, extract=True, do_exp=True,
                         px_dot=False, dot_only=False),
        "no_exp": dict(precision=HI, extract=True, do_exp=False,
                       px_dot=True, dot_only=False),
        "dot_only": dict(precision=HI, extract=True, do_exp=True,
                         px_dot=True, dot_only=True),
    }
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    full_fn = None
    for name, kw in variants.items():
        fn = build_variant(**kw)
        if name == "full":
            full_fn = fn
        t = benchmark_on_device(fn, lm, am, symbols, iters=20, trials=3)
        print(json.dumps({"variant": name, "us": round(t * 1e6, 1)}),
              flush=True)

    ref_px, ref_py = jax.jit(full_fn)(lm, am, symbols)
    for name, norm_split in (("v2_norm_highest", False),
                             ("v2_norm_split3", True)):
        fn = build_v2(norm_split)
        px, py = jax.jit(fn)(lm, am, symbols)
        err = max(
            float(jnp.max(jnp.abs(jnp.where(ref_px < -1e29, 0.0, px - ref_px)))),
            float(jnp.max(jnp.abs(py - ref_py))),
        )
        t = benchmark_on_device(fn, lm, am, symbols, iters=20, trials=3)
        print(json.dumps({"variant": name, "us": round(t * 1e6, 1),
                          "max_abs_err_vs_full": err}), flush=True)


if __name__ == "__main__":
    main()
