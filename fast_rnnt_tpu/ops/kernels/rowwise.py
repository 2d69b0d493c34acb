"""Fused row-wise logprob extraction kernel.

The pruned/joint lattice construction needs, per (b, t, k) row of the
joiner output logits[..., C]:

    lse  = logsumexp(logits)
    px   = logits[symbol] - lse
    py   = logits[blank]  - lse

Done with separate XLA ops this costs ~5 HBM passes over the (B, T,
s_range, C) tensor (max, exp-sum, symbol lookup, blank slice, subtracts) —
the dominant cost of rnnt_loss_pruned once the DP recursion is a Pallas
kernel.  This kernel reads the logits ONCE and emits (px, py); the custom
backward reads them once more and writes the gradient in a single pass:

    dlogits = gx * onehot(sym) + gy * onehot(blank) - (gx + gy) * softmax

(replaces the unfused TF graph around
/root/reference/tf_fast_rnnt/python/tf_fast_rnnt/rnnt_loss.py:942-996).

Zero-copy staging: rows are processed in the array's own layout — the row
block size is chosen as a divisor of N (padding to a block multiple only
when N is prime-ish), and the vocab tail past C is masked in-kernel, so no
host-side pad copy of the 300 MB logits is ever made.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rowwise_logprobs"]

# block rows capped so in+out+double-buffering stays within ~16MB VMEM for
# vocab sizes up to ~1k fp32
_MAX_BLK = 1024
_NEG = float("-inf")


def _pick_blk(n: int) -> int:
    """Largest multiple-of-8 divisor of n that is <= _MAX_BLK (0 if none)."""
    best = 0
    for d in range(8, min(n, _MAX_BLK) + 1, 8):
        if n % d == 0:
            best = d
    return best


def _mask_tail(x, C):
    c_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c_iota < C, x, _NEG), c_iota


def _fwd_kernel(sym_ref, x_ref, px_ref, py_ref, *, blank: int, C: int):
    x, c_iota = _mask_tail(x_ref[:, :], C)  # (rblk, C'), tail lanes -> -inf
    m = jnp.max(x, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))
    sym = sym_ref[:, :]  # (rblk, 1) int32
    pxv = jnp.sum(jnp.where(c_iota == sym, x, 0.0), axis=1, keepdims=True)
    pyv = jnp.sum(jnp.where(c_iota == blank, x, 0.0), axis=1, keepdims=True)
    px_ref[:, :] = pxv - lse
    py_ref[:, :] = pyv - lse


def _bwd_kernel(sym_ref, x_ref, gx_ref, gy_ref, dx_ref, *, blank: int, C: int):
    x, c_iota = _mask_tail(x_ref[:, :], C)
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    sm = e / jnp.sum(e, axis=1, keepdims=True)  # softmax; 0 at masked lanes
    sym = sym_ref[:, :]
    gx = gx_ref[:, :]
    gy = gy_ref[:, :]
    dx = jnp.where(c_iota == sym, gx, 0.0)
    dx = dx + jnp.where(c_iota == blank, gy, 0.0)
    dx_ref[:, :] = dx - (gx + gy) * sm


def _blocks(N: int):
    """(row_block, padded_N).  Prefer an exact divisor (no padding copy)."""
    blk = _pick_blk(N)
    if blk:
        return blk, N
    blk = min(_MAX_BLK, -(-N // 8) * 8)
    return blk, -(-N // blk) * blk


def _pad_rows(x, Np, fill):
    N = x.shape[0]
    if Np == N:
        return x
    return jnp.concatenate(
        [x, jnp.full((Np - N,) + x.shape[1:], fill, x.dtype)], axis=0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rowwise_logprobs(
    logits2d: jax.Array, sym: jax.Array, blank: int, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """For each row i: (logits2d[i, sym[i]] - lse_i, logits2d[i, blank] - lse_i).

    logits2d: (N, C) float; sym: (N,) int.  Differentiable w.r.t. logits2d.
    """
    return _rowwise_fwd_impl(logits2d, sym, blank, interpret)


def _rowwise_fwd_impl(logits2d, sym, blank, interpret):
    N, C = logits2d.shape
    blk, Np = _blocks(N)
    x = _pad_rows(logits2d, Np, 0.0)
    s = _pad_rows(sym.astype(jnp.int32)[:, None], Np, -1)
    grid = (Np // blk,)
    vec = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((blk, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    px, py = pl.pallas_call(
        functools.partial(_fwd_kernel, blank=blank, C=C),
        grid=grid,
        in_specs=[vec, mat],
        out_specs=[vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), logits2d.dtype),
            jax.ShapeDtypeStruct((Np, 1), logits2d.dtype),
        ],
        interpret=interpret,
    )(s, x)
    return px[:N, 0], py[:N, 0]


def _rowwise_vjp_fwd(logits2d, sym, blank, interpret):
    out = _rowwise_fwd_impl(logits2d, sym, blank, interpret)
    return out, (logits2d, sym)


def _rowwise_vjp_bwd(blank, interpret, res, cots):
    logits2d, sym = res
    gx, gy = cots
    N, C = logits2d.shape
    blk, Np = _blocks(N)
    x = _pad_rows(logits2d, Np, 0.0)
    s = _pad_rows(sym.astype(jnp.int32)[:, None], Np, -1)
    gxp = _pad_rows(gx[:, None], Np, 0.0)
    gyp = _pad_rows(gy[:, None], Np, 0.0)
    grid = (Np // blk,)
    vec = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((blk, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, blank=blank, C=C),
        grid=grid,
        in_specs=[vec, mat, vec, vec],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((Np, C), logits2d.dtype),
        interpret=interpret,
    )(s, x, gxp, gyp)
    return dx[:N], np.zeros(sym.shape, jax.dtypes.float0)


rowwise_logprobs.defvjp(_rowwise_vjp_fwd, _rowwise_vjp_bwd)
