"""RNN-T loss functions (simple / smoothed / full / pruned).

Equivalent public surface to the reference
(/root/reference/tf_fast_rnnt/python/tf_fast_rnnt/rnnt_loss.py):

  rnnt_loss_simple    rnnt_loss.py:225-338
  rnnt_loss           rnnt_loss.py:454-551
  rnnt_loss_pruned    rnnt_loss.py:1022-1130
  rnnt_loss_smoothed  rnnt_loss.py:1369-1494

Reference bugs fixed (documented, deliberate):
  * reduction="mean" called torch.mean inside TF code (rnnt_loss.py:331,
    a NameError) — implemented as an actual batch mean here.
  * the boundary=None delay-penalty path constructed tf.Tensor(...) invalidly
    (rnnt_loss.py:312-314) — here it falls back to (T-1)/2 as documented.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .lattice import (
    band_mask_rows,
    get_rnnt_logprobs,
    get_rnnt_logprobs_joint,
    get_rnnt_logprobs_pruned,
    get_rnnt_logprobs_pruned_simple,
    get_rnnt_logprobs_smoothed,
)
from .pruning import get_rnnt_prune_ranges
from .recursion import mutual_information_recursion
from ..utils.validation import check_rnnt_inputs

__all__ = [
    "rnnt_loss_simple",
    "rnnt_loss",
    "rnnt_loss_pruned",
    "rnnt_loss_pruned_simple",
    "rnnt_loss_simple_pruned",
    "rnnt_loss_smoothed",
    "rnnt_loss_smoothed_pruned",
]

LossOrLossAndGrads = Union[
    jax.Array, Tuple[jax.Array, Tuple[jax.Array, jax.Array]]
]


def _apply_delay_penalty(
    px: jax.Array,
    boundary: Optional[jax.Array],
    rnnt_type: str,
    delay_penalty: float,
) -> jax.Array:
    """Add ``((t_end - 1)/2 - t) * delay_penalty`` to px (k2 issue #955;
    reference rnnt_loss.py:305-321)."""
    if delay_penalty <= 0.0:
        return px
    B, S, T0 = px.shape
    T = T0 if rnnt_type != "regular" else T0 - 1
    if boundary is None:
        offset = jnp.full((B, 1, 1), (T - 1) / 2.0, dtype=px.dtype)
    else:
        offset = ((boundary[:, 3].astype(px.dtype) - 1.0) / 2.0)[:, None, None]
    penalty = offset - jnp.arange(T0, dtype=px.dtype)[None, None, :]
    return px + penalty * delay_penalty


def _reduce(negated_loss: jax.Array, reduction: Optional[str]) -> jax.Array:
    if reduction == "none" or reduction is None:
        return -negated_loss
    if reduction == "mean":
        return -jnp.mean(negated_loss)
    if reduction == "sum":
        return -jnp.sum(negated_loss)
    raise ValueError(
        f"reduction should be ('none' | 'mean' | 'sum'), given {reduction}"
    )


def rnnt_loss_simple(
    lm: jax.Array,
    am: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    calc_gradients: bool = False,
    impl: Optional[str] = None,
) -> LossOrLossAndGrads:
    """Simple RNN-T loss (the joiner is just lm + am).

    Equivalent to rnnt_loss.py:225-338.  With ``calc_gradients=True`` also
    returns ``(px_grad, py_grad)`` — the occupancy probabilities (gradients
    of ``-loss.sum()`` with reduction "none") that feed
    :func:`get_rnnt_prune_ranges`.

    Returns loss of shape [B] for reduction "none", else a scalar; a tuple
    ``(loss, (px_grad, py_grad))`` when ``calc_gradients``.
    """
    check_rnnt_inputs(
        lm=lm, am=am, symbols=symbols,
        termination_symbol=termination_symbol, boundary=boundary,
    )
    px, py = get_rnnt_logprobs(
        lm=lm,
        am=am,
        symbols=symbols,
        termination_symbol=termination_symbol,
        rnnt_type=rnnt_type,
        boundary=boundary,
    )
    px = _apply_delay_penalty(px, boundary, rnnt_type, delay_penalty)
    out = mutual_information_recursion(
        px=px, py=py, boundary=boundary, calc_gradients=calc_gradients, impl=impl
    )
    if calc_gradients:
        negated_loss, grads = out
        return _reduce(negated_loss, reduction), grads
    return _reduce(out, reduction)


def rnnt_loss(
    logits: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    calc_gradients: bool = False,
    impl: Optional[str] = None,
) -> LossOrLossAndGrads:
    """Unpruned RNN-T loss from full joiner output [B, T, S+1, C].

    Equivalent to rnnt_loss.py:454-551.
    """
    check_rnnt_inputs(
        logits=logits, symbols=symbols,
        termination_symbol=termination_symbol, boundary=boundary,
    )
    px, py = get_rnnt_logprobs_joint(
        logits=logits,
        symbols=symbols,
        termination_symbol=termination_symbol,
        boundary=boundary,
        rnnt_type=rnnt_type,
    )
    px = _apply_delay_penalty(px, boundary, rnnt_type, delay_penalty)
    out = mutual_information_recursion(
        px=px, py=py, boundary=boundary, calc_gradients=calc_gradients, impl=impl
    )
    if calc_gradients:
        negated_loss, grads = out
        return _reduce(negated_loss, reduction), grads
    return _reduce(out, reduction)


def rnnt_loss_pruned(
    logits: jax.Array,
    symbols: jax.Array,
    ranges: jax.Array,
    termination_symbol: int,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    impl: Optional[str] = None,
) -> jax.Array:
    """Pruned RNN-T loss from pruned joiner output [B, T, s_range, C].

    Equivalent to rnnt_loss.py:1022-1130 (which likewise returns only the
    loss — its calc_gradients grads are discarded, rnnt_loss.py:1117).
    Fully differentiable w.r.t. ``logits`` through the px/py construction
    plus the recursion's custom VJP.
    """
    check_rnnt_inputs(
        logits=logits, symbols=symbols,
        termination_symbol=termination_symbol, boundary=boundary, ranges=ranges,
    )
    px, py = get_rnnt_logprobs_pruned(
        logits=logits,
        symbols=symbols,
        ranges=ranges,
        termination_symbol=termination_symbol,
        boundary=boundary,
        rnnt_type=rnnt_type,
    )
    px = _apply_delay_penalty(px, boundary, rnnt_type, delay_penalty)
    negated_loss = mutual_information_recursion(
        px=px, py=py, boundary=boundary, calc_gradients=False, impl=impl
    )
    return _reduce(negated_loss, reduction)


def rnnt_loss_pruned_simple(
    lm: jax.Array,
    am: jax.Array,
    symbols: jax.Array,
    ranges: jax.Array,
    termination_symbol: int,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    impl: Optional[str] = None,
) -> jax.Array:
    """Pruned RNN-T loss for the ADDITIVE joiner, band-native.

    TPU-native fast path with no reference equivalent: numerically equal to

        am_p, lm_p = do_rnnt_pruning(am, lm, ranges)
        rnnt_loss_pruned(am_p + lm_p, symbols, ranges, ...)

    but never materializes the [B, T, s_range, C] pruned logits — the band
    is masked directly in [B, S+1, T] lattice space (see
    :func:`get_rnnt_logprobs_pruned_simple`), cutting ~1 GB of HBM traffic
    per step at the benchmark shape.  Use :func:`rnnt_loss_pruned` when the
    joiner is a real network.
    """
    check_rnnt_inputs(
        lm=lm, am=am, symbols=symbols,
        termination_symbol=termination_symbol, boundary=boundary, ranges=ranges,
    )
    px, py = get_rnnt_logprobs_pruned_simple(
        lm=lm,
        am=am,
        symbols=symbols,
        ranges=ranges,
        termination_symbol=termination_symbol,
        boundary=boundary,
        rnnt_type=rnnt_type,
    )
    px = _apply_delay_penalty(px, boundary, rnnt_type, delay_penalty)
    negated_loss = mutual_information_recursion(
        px=px, py=py, boundary=boundary, calc_gradients=False, impl=impl
    )
    return _reduce(negated_loss, reduction)


def rnnt_loss_simple_pruned(
    lm: jax.Array,
    am: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    s_range: int,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    impl: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused two-stage pruned training pipeline for the additive joiner.

    Computes, building the (px, py) lattice ONCE:

      1. the simple loss with occupancy gradients,
      2. pruning ranges from the occupancies,
      3. the pruned loss on the band-masked lattice
         (== rnnt_loss_pruned_simple == the reference's do_rnnt_pruning ->
         rnnt_loss_pruned(am_p + lm_p, ...) pipeline, parity-tested).

    Sharing the lattice between the stages also shares its construction
    VJP, so the backward does ONE set of normalizer/gather matmul
    transposes instead of two — the fastest way to train with the
    two-stage recipe of the Pruned RNN-T paper (arXiv:2206.13236 §3) when
    stage 2's joiner is additive.

    Returns (simple_loss, pruned_loss, ranges); losses reduced per
    ``reduction``.
    """
    check_rnnt_inputs(
        lm=lm, am=am, symbols=symbols,
        termination_symbol=termination_symbol, boundary=boundary,
    )
    if boundary is None:
        # get_rnnt_prune_ranges needs explicit bounds; default [0, 0, S, T]
        B, S = symbols.shape
        T = am.shape[1]
        boundary = jnp.broadcast_to(
            jnp.array([0, 0, S, T], dtype=jnp.int32), (B, 4)
        )
    if rnnt_type == "constrained":
        # build the un-constrained base; the constrained px += py[1:] must
        # happen AFTER band masking for the pruned stage (matching
        # get_rnnt_logprobs_pruned, rnnt_loss.py:1015-1018)
        px0, py = get_rnnt_logprobs(
            lm, am, symbols, termination_symbol, "modified", boundary
        )
        px_simple = px0 + py[:, 1:, :]
        px_pruned_base = px0
    else:
        px_simple, py = get_rnnt_logprobs(
            lm, am, symbols, termination_symbol, rnnt_type, boundary
        )
        px_pruned_base = px_simple

    px_simple = _apply_delay_penalty(px_simple, boundary, rnnt_type, delay_penalty)
    neg_simple, (px_grad, py_grad) = mutual_information_recursion(
        px=px_simple, py=py, boundary=boundary, calc_gradients=True, impl=impl
    )
    ranges = get_rnnt_prune_ranges(px_grad, py_grad, boundary, s_range)

    px_b = band_mask_rows(px_pruned_base, ranges)
    py_b = band_mask_rows(py, ranges)
    if rnnt_type == "constrained":
        px_b = px_b + py_b[:, 1:, :]
    px_b = _apply_delay_penalty(px_b, boundary, rnnt_type, delay_penalty)
    neg_pruned = mutual_information_recursion(
        px=px_b, py=py_b, boundary=boundary, calc_gradients=False, impl=impl
    )
    return _reduce(neg_simple, reduction), _reduce(neg_pruned, reduction), ranges


def rnnt_loss_smoothed_pruned(
    lm: jax.Array,
    am: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    s_range: int,
    lm_only_scale: float = 0.1,
    am_only_scale: float = 0.1,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    impl: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused two-stage pipeline with a SMOOTHED first stage.

    The reference's own test pipeline (simple_rnnt_loss_test.py:108-143)
    runs rnnt_loss_smoothed(calc_gradients=True) -> get_rnnt_prune_ranges
    -> do_rnnt_pruning -> rnnt_loss_pruned; this computes the same thing
    for the additive joiner in one fused graph: the smoothed lattice
    drives the ranges, the pruned stage is the band-masked SIMPLE lattice
    (what the additive joiner produces), and the two constructions share
    their normalizer matmul under CSE.

    Returns (smoothed_loss, pruned_loss, ranges).
    """
    check_rnnt_inputs(
        lm=lm, am=am, symbols=symbols,
        termination_symbol=termination_symbol, boundary=boundary,
    )
    if boundary is None:
        B, S = symbols.shape
        T = am.shape[1]
        boundary = jnp.broadcast_to(
            jnp.array([0, 0, S, T], dtype=jnp.int32), (B, 4)
        )
    px_s, py_s = get_rnnt_logprobs_smoothed(
        lm, am, symbols, termination_symbol,
        lm_only_scale=lm_only_scale, am_only_scale=am_only_scale,
        boundary=boundary, rnnt_type=rnnt_type,
    )
    px_s = _apply_delay_penalty(px_s, boundary, rnnt_type, delay_penalty)
    neg_smoothed, (px_grad, py_grad) = mutual_information_recursion(
        px=px_s, py=py_s, boundary=boundary, calc_gradients=True, impl=impl
    )
    ranges = get_rnnt_prune_ranges(px_grad, py_grad, boundary, s_range)

    px_b, py_b = get_rnnt_logprobs_pruned_simple(
        lm, am, symbols, ranges, termination_symbol, boundary, rnnt_type
    )
    px_b = _apply_delay_penalty(px_b, boundary, rnnt_type, delay_penalty)
    neg_pruned = mutual_information_recursion(
        px=px_b, py=py_b, boundary=boundary, calc_gradients=False, impl=impl
    )
    return (
        _reduce(neg_smoothed, reduction),
        _reduce(neg_pruned, reduction),
        ranges,
    )


def rnnt_loss_smoothed(
    lm: jax.Array,
    am: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    lm_only_scale: float = 0.1,
    am_only_scale: float = 0.1,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    calc_gradients: bool = False,
    impl: Optional[str] = None,
) -> LossOrLossAndGrads:
    """Smoothed simple RNN-T loss with LM-only / AM-only interpolation.

    Equivalent to rnnt_loss.py:1369-1494.
    """
    check_rnnt_inputs(
        lm=lm, am=am, symbols=symbols,
        termination_symbol=termination_symbol, boundary=boundary,
    )
    px, py = get_rnnt_logprobs_smoothed(
        lm=lm,
        am=am,
        symbols=symbols,
        termination_symbol=termination_symbol,
        lm_only_scale=lm_only_scale,
        am_only_scale=am_only_scale,
        boundary=boundary,
        rnnt_type=rnnt_type,
    )
    px = _apply_delay_penalty(px, boundary, rnnt_type, delay_penalty)
    out = mutual_information_recursion(
        px=px, py=py, boundary=boundary, calc_gradients=calc_gradients, impl=impl
    )
    if calc_gradients:
        negated_loss, grads = out
        return _reduce(negated_loss, reduction), grads
    return _reduce(out, reduction)
