"""Input validation for the loss API.

The reference wholesale-commented-out its input assertions (e.g.
rnnt_loss.py:158-171, 408-418, 926-940) because tf.function tracing choked
on them.  Here the static (shape/dtype/rank) checks are free at trace time,
and the value-dependent checks (boundary within range, symbols < C) are
available through jax.experimental.checkify so they can run under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["check_rnnt_inputs", "checkify_rnnt_inputs"]


def check_rnnt_inputs(
    lm: Optional[jax.Array] = None,
    am: Optional[jax.Array] = None,
    logits: Optional[jax.Array] = None,
    symbols: Optional[jax.Array] = None,
    termination_symbol: Optional[int] = None,
    boundary: Optional[jax.Array] = None,
    ranges: Optional[jax.Array] = None,
) -> None:
    """Static (trace-time) validation; raises ValueError with the offending
    shapes named.  Pass whichever arguments the calling loss uses."""
    B = None

    def _batch(x, name):
        nonlocal B
        if B is None:
            B = x.shape[0]
        elif x.shape[0] != B:
            raise ValueError(f"{name} batch dim {x.shape[0]} != {B}")

    if lm is not None:
        if lm.ndim != 3:
            raise ValueError(f"lm must be [B, S+1, C], got {lm.shape}")
        _batch(lm, "lm")
    if am is not None:
        if am.ndim != 3:
            raise ValueError(f"am must be [B, T, C], got {am.shape}")
        _batch(am, "am")
        if lm is not None and lm.shape[2] != am.shape[2]:
            raise ValueError(
                f"lm/am vocab mismatch: {lm.shape[2]} vs {am.shape[2]}"
            )
    if logits is not None:
        if logits.ndim != 4:
            raise ValueError(f"logits must be 4-D, got {logits.shape}")
        _batch(logits, "logits")
    if symbols is not None:
        if symbols.ndim != 2:
            raise ValueError(f"symbols must be [B, S], got {symbols.shape}")
        _batch(symbols, "symbols")
        if not jnp.issubdtype(symbols.dtype, jnp.integer):
            raise ValueError(f"symbols must be integer, got {symbols.dtype}")
        if lm is not None and symbols.shape[1] != lm.shape[1] - 1:
            raise ValueError(
                f"symbols S={symbols.shape[1]} != lm S+1-1={lm.shape[1] - 1}"
            )
    if termination_symbol is not None:
        C = None
        for x in (lm, am):
            if x is not None:
                C = x.shape[2]
        if logits is not None:
            C = logits.shape[3]
        if C is not None and not (0 <= int(termination_symbol) < C):
            raise ValueError(
                f"termination_symbol {termination_symbol} out of range [0, {C})"
            )
    if boundary is not None:
        if boundary.ndim != 2 or boundary.shape[1] != 4:
            raise ValueError(f"boundary must be [B, 4], got {boundary.shape}")
        _batch(boundary, "boundary")
        if not jnp.issubdtype(boundary.dtype, jnp.integer):
            raise ValueError(f"boundary must be integer, got {boundary.dtype}")
    if ranges is not None:
        if ranges.ndim != 3:
            raise ValueError(f"ranges must be [B, T, s_range], got {ranges.shape}")
        _batch(ranges, "ranges")


def checkify_rnnt_inputs(
    symbols: jax.Array,
    C: int,
    boundary: Optional[jax.Array] = None,
    S: Optional[int] = None,
    T: Optional[int] = None,
) -> None:
    """Value-dependent checks (run under jit via checkify.checkify):

        err, _ = checkify.checkify(lambda: checkify_rnnt_inputs(...))()
        err.throw()
    """
    checkify.check(jnp.all(symbols >= 0), "symbols must be >= 0")
    checkify.check(jnp.all(symbols < C), f"symbols must be < C={C}")
    if boundary is not None:
        sb, tb, se, te = (boundary[:, i] for i in range(4))
        checkify.check(jnp.all(sb >= 0) & jnp.all(tb >= 0), "begin must be >= 0")
        checkify.check(jnp.all(sb <= se), "s_begin must be <= s_end")
        checkify.check(jnp.all(tb <= te), "t_begin must be <= t_end")
        if S is not None:
            checkify.check(jnp.all(se <= S), f"s_end must be <= S={S}")
        if T is not None:
            checkify.check(jnp.all(te <= T), f"t_end must be <= T={T}")
