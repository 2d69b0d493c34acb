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
    band_mask_rows_smajor,
    get_rnnt_logprobs_joint,
    get_rnnt_logprobs_pruned,
    get_rnnt_logprobs_rows,
    get_rnnt_logprobs_smoothed_rows,
)
from .numerics import NEG_INF
from .pruning import get_rnnt_prune_ranges_rows
from .recursion import (
    _normalize_boundary,
    mutual_information_recursion,
    mutual_information_rows,
)
from ..utils.validation import check_rnnt_inputs

__all__ = [
    "rnnt_loss_simple",
    "rnnt_loss",
    "rnnt_loss_chunked",
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


def _apply_delay_penalty_rows(
    px_rows: jax.Array,
    boundary: Optional[jax.Array],
    rnnt_type: str,
    delay_penalty: float,
) -> jax.Array:
    """s-major :func:`_apply_delay_penalty` (px rows are (S, B, T'))."""
    if delay_penalty <= 0.0:
        return px_rows
    S, B, T0 = px_rows.shape
    T = T0 if rnnt_type != "regular" else T0 - 1
    if boundary is None:
        offset = jnp.full((1, 1, 1), (T - 1) / 2.0, dtype=px_rows.dtype)
    else:
        offset = ((boundary[:, 3].astype(px_rows.dtype) - 1.0) / 2.0)[
            None, :, None
        ]
    penalty = offset - jnp.arange(T0, dtype=px_rows.dtype)[None, None, :]
    return px_rows + penalty * delay_penalty


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
    # s-major end to end: the lattice einsums emit (S, B, T)-major rows and
    # the recursion consumes them directly — no transpose/staging pass
    # between build and kernels (see get_rnnt_logprobs_rows)
    px_rows, py_rows = get_rnnt_logprobs_rows(
        lm=lm,
        am=am,
        symbols=symbols,
        termination_symbol=termination_symbol,
        rnnt_type=rnnt_type,
        boundary=boundary,
        impl=impl,
    )
    px_rows = _apply_delay_penalty_rows(px_rows, boundary, rnnt_type, delay_penalty)
    B = am.shape[0]
    bnd = _normalize_boundary(boundary, B, symbols.shape[1], am.shape[1])
    out = mutual_information_rows(
        px_rows, py_rows, bnd, calc_gradients=calc_gradients, impl=impl
    )
    if calc_gradients:
        negated_loss, (gx_rows, gy_rows) = out
        grads = (jnp.moveaxis(gx_rows, 0, 1), jnp.moveaxis(gy_rows, 0, 1))
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


def rnnt_loss_chunked(
    joiner,
    am: jax.Array,
    lm: jax.Array,
    symbols: jax.Array,
    termination_symbol: int,
    boundary: Optional[jax.Array] = None,
    rnnt_type: str = "regular",
    delay_penalty: float = 0.0,
    reduction: Optional[str] = "mean",
    chunk: int = 64,
    calc_gradients: bool = False,
    impl: Optional[str] = None,
) -> LossOrLossAndGrads:
    """UNPRUNED full-joiner RNN-T loss WITHOUT materializing the joiner
    output.

    The reference's unpruned path (and :func:`rnnt_loss`) takes a
    materialized ``[B, T, S+1, C]`` logits tensor — 6+ GB at LibriSpeech
    scale (rnnt_loss.py:420 and README.md:165: 15.1 GB peak).  Here the
    joiner runs INSIDE a ``lax.map`` over T-chunks with rematerialization:
    each chunk's logits exist only transiently (forward AND backward —
    ``jax.checkpoint`` recomputes them in the VJP), so peak HBM is the
    encoder/predictor activations plus one chunk (~hundreds of MB), not
    the full joint tensor.

    Args:
      joiner: callable ``joiner(am_chunk [B, Tc, Da], lm [B, S+1, Dl]) ->
        logits [B, Tc, S+1, C]``.  For the additive joiner pass
        ``lambda a, l: a[:, :, None, :] + l[:, None, :, :]`` (but then
        prefer :func:`rnnt_loss_simple`, which exploits the factorization).
      am: [B, T, Da] encoder output (pre-joiner).
      lm: [B, S+1, Dl] predictor output (pre-joiner).
      chunk: frames per joiner invocation (static).
      calc_gradients: if True also return the occupancy probabilities
        ``(px_grad, py_grad)`` — the assembled px/py are only [B, S, T'],
        so the fused occupancy backward runs on them directly and the
        result feeds :func:`get_rnnt_prune_ranges`: a REAL-joiner pipeline
        can do chunked stage 1 -> ranges -> :func:`rnnt_loss_pruned`
        stage 2 without ever materializing [B, T, S+1, C] (composes the
        reference's rnnt_loss.py:454-551 with :647-761 minus the :420
        logsumexp memory hog).

    Other args and the result exactly match :func:`rnnt_loss`.
    """
    check_rnnt_inputs(
        symbols=symbols, termination_symbol=termination_symbol,
        boundary=boundary,
    )
    B, T, Da = am.shape
    S1 = lm.shape[1]
    S = S1 - 1
    nc = -(-T // chunk)
    Tp = nc * chunk
    am_pad = jnp.pad(am, ((0, 0), (0, Tp - T), (0, 0)))
    am_chunks = jnp.reshape(
        jnp.moveaxis(am_pad, 1, 0), (nc, chunk, B, Da)
    )  # (nc, chunk, B, Da)

    from .lattice import _symbol_onehot, matmul_precision

    def chunk_fn(am_c):
        # am_c: (chunk, B, Da) -> px/py columns for these frames
        logits_c = joiner(jnp.moveaxis(am_c, 0, 1), lm)  # (B, chunk, S+1, C)
        C = logits_c.shape[-1]
        normalizers = jax.nn.logsumexp(logits_c, axis=3)  # (B, chunk, S+1)
        onehot = _symbol_onehot(symbols, C, logits_c.dtype)  # (B, S, C)
        px_c = jnp.einsum(
            "btsc,bsc->bst", logits_c[:, :, :S, :], onehot,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(),
        )  # (B, S, chunk)
        px_c = px_c - jnp.swapaxes(normalizers, 1, 2)[:, :S, :]
        py_c = (
            jnp.swapaxes(logits_c[:, :, :, termination_symbol], 1, 2)
            - jnp.swapaxes(normalizers, 1, 2)
        )  # (B, S+1, chunk)
        return px_c, py_c

    px_cols, py_cols = jax.lax.map(jax.checkpoint(chunk_fn), am_chunks)
    # (nc, B, S, chunk) -> (B, S, T)
    px = jnp.moveaxis(px_cols, 0, 2).reshape(B, S, Tp)[:, :, :T]
    py = jnp.moveaxis(py_cols, 0, 2).reshape(B, S1, Tp)[:, :, :T]

    if rnnt_type == "regular":
        px = jnp.concatenate(
            [px, jnp.full((B, S, 1), NEG_INF, dtype=px.dtype)], axis=2
        )
        from .lattice import fix_for_boundary

        px = fix_for_boundary(px, boundary)
    elif rnnt_type == "constrained":
        px = px + py[:, 1:, :]

    px = _apply_delay_penalty(px, boundary, rnnt_type, delay_penalty)
    out = mutual_information_recursion(
        px=px, py=py, boundary=boundary, calc_gradients=calc_gradients,
        impl=impl,
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
    lattice_dtype=None,
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
    if rnnt_type == "constrained" and ranges.shape[2] < 2:
        # width-1 bands are provably infeasible for constrained RNN-T
        # (see lattice.get_rnnt_logprobs_pruned)
        raise ValueError("constrained RNN-T needs s_range >= 2")
    # s-major + in-kernel band masking: the simple lattice is built once in
    # rows layout and the band (lo = ranges[:, :, 0], width K) is masked
    # in-register by the recursion — no band-masked copy, no mask-VJP pass
    # (round 1 materialized band_mask_rows(px/py); see
    # get_rnnt_logprobs_pruned_simple for why band == pruned here)
    K = ranges.shape[2]
    lo = ranges[:, :, 0]
    base_type = "modified" if rnnt_type == "constrained" else rnnt_type
    # fuse the lattice-storage cast into the build when nothing is added
    # to px afterwards (otherwise cast after the add, exactly as before)
    _cast = (
        lattice_dtype
        if (delay_penalty <= 0.0 and rnnt_type != "constrained")
        else None
    )
    px_rows, py_rows = get_rnnt_logprobs_rows(
        lm, am, symbols, termination_symbol, base_type, boundary,
        out_dtype=_cast, impl=impl,
    )
    if rnnt_type == "constrained":
        # constrained adds the NEXT row's (band-masked) blank arc to px; the
        # in-kernel band re-mask of the sum is a no-op on the px part and
        # cannot resurrect the -inf of an out-of-band py[s+1] term
        py_banded = band_mask_rows_smajor(py_rows, lo, K)
        px_rows = px_rows + py_banded[1:]
    px_rows = _apply_delay_penalty_rows(px_rows, boundary, rnnt_type, delay_penalty)
    if lattice_dtype is not None:
        px_rows = px_rows.astype(lattice_dtype)
        py_rows = py_rows.astype(lattice_dtype)
    bnd = _normalize_boundary(boundary, am.shape[0], symbols.shape[1], am.shape[1])
    negated_loss = mutual_information_rows(
        px_rows, py_rows, bnd, lo=lo, s_range=K, calc_gradients=False, impl=impl
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
    lattice_dtype=None,
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
    if rnnt_type == "constrained" and s_range < 2:
        # a width-1 band makes every constrained px arc -inf (its
        # py[s+1, t+1] term is out-of-band) -> infinite loss for every
        # utterance; see get_rnnt_logprobs_pruned
        raise ValueError("constrained RNN-T needs s_range >= 2")
    # get_rnnt_prune_ranges needs explicit bounds; default [0, 0, S, T]
    boundary = _normalize_boundary(
        boundary, am.shape[0], symbols.shape[1], am.shape[1]
    )
    if rnnt_type == "constrained":
        # build the un-constrained base; the constrained px += py[1:] must
        # happen AFTER band masking for the pruned stage (matching
        # get_rnnt_logprobs_pruned, rnnt_loss.py:1015-1018)
        px0_rows, py_rows = get_rnnt_logprobs_rows(
            lm, am, symbols, termination_symbol, "modified", boundary,
            impl=impl,
        )
        px_simple_rows = px0_rows + py_rows[1:]
    else:
        px_simple_rows, py_rows = get_rnnt_logprobs_rows(
            lm, am, symbols, termination_symbol, rnnt_type, boundary,
            out_dtype=lattice_dtype if delay_penalty <= 0.0 else None,
            impl=impl,
        )
        px0_rows = px_simple_rows

    px_simple_rows = _apply_delay_penalty_rows(
        px_simple_rows, boundary, rnnt_type, delay_penalty
    )
    if lattice_dtype is not None:
        # bf16 mixed-precision mode: the lattice's HBM copies are stored
        # narrow (the casts fuse into the assembly writes) while every
        # recursion computes in f32 in-register — ~2x less lattice traffic
        # on the HBM-bound step at ~1e-3 relative loss error
        px_simple_rows = px_simple_rows.astype(lattice_dtype)
        px0_rows = px0_rows.astype(lattice_dtype)
        py_rows = py_rows.astype(lattice_dtype)
    neg_simple, (gx_rows, gy_rows) = mutual_information_rows(
        px_simple_rows, py_rows, boundary, calc_gradients=True, impl=impl
    )
    ranges = get_rnnt_prune_ranges_rows(
        gx_rows, gy_rows, boundary, s_range, impl=impl
    )
    K = ranges.shape[2]
    lo = ranges[:, :, 0]

    # stage 2: the SAME rows, band-masked in-register by the recursion —
    # round 1 materialized two band-masked lattice copies here and paid
    # their VJP select passes
    if rnnt_type == "constrained":
        py_banded = band_mask_rows_smajor(py_rows, lo, K)
        px_stage2 = px0_rows + py_banded[1:]
    else:
        px_stage2 = px0_rows
    px_stage2 = _apply_delay_penalty_rows(
        px_stage2, boundary, rnnt_type, delay_penalty
    )
    neg_pruned = mutual_information_rows(
        px_stage2, py_rows, boundary, lo=lo, s_range=K,
        calc_gradients=False, impl=impl,
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
    lattice_dtype=None,
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
    if rnnt_type == "constrained" and s_range < 2:
        raise ValueError("constrained RNN-T needs s_range >= 2")
    boundary = _normalize_boundary(
        boundary, am.shape[0], symbols.shape[1], am.shape[1]
    )
    px_sm_rows, py_sm_rows = get_rnnt_logprobs_smoothed_rows(
        lm, am, symbols, termination_symbol,
        lm_only_scale=lm_only_scale, am_only_scale=am_only_scale,
        boundary=boundary, rnnt_type=rnnt_type, impl=impl,
    )
    px_sm_rows = _apply_delay_penalty_rows(
        px_sm_rows, boundary, rnnt_type, delay_penalty
    )
    if lattice_dtype is not None:
        px_sm_rows = px_sm_rows.astype(lattice_dtype)
        py_sm_rows = py_sm_rows.astype(lattice_dtype)
    neg_smoothed, (gx_rows, gy_rows) = mutual_information_rows(
        px_sm_rows, py_sm_rows, boundary, calc_gradients=True, impl=impl
    )
    ranges = get_rnnt_prune_ranges_rows(
        gx_rows, gy_rows, boundary, s_range, impl=impl
    )
    K = ranges.shape[2]
    lo = ranges[:, :, 0]

    # stage 2 is the SIMPLE (un-smoothed) lattice — what the additive
    # joiner actually produces — band-masked in-register (the smoothed
    # lattice only steers the ranges; matches the reference's test
    # pipeline semantics, simple_rnnt_loss_test.py:108-143)
    base_type = "modified" if rnnt_type == "constrained" else rnnt_type
    # fuse the lattice-storage cast into the build when nothing is added
    # to px afterwards (otherwise cast after the add, exactly as before)
    _cast = (
        lattice_dtype
        if (delay_penalty <= 0.0 and rnnt_type != "constrained")
        else None
    )
    px_rows, py_rows = get_rnnt_logprobs_rows(
        lm, am, symbols, termination_symbol, base_type, boundary,
        out_dtype=_cast, impl=impl,
    )
    if rnnt_type == "constrained":
        py_banded = band_mask_rows_smajor(py_rows, lo, K)
        px_rows = px_rows + py_banded[1:]
    px_rows = _apply_delay_penalty_rows(px_rows, boundary, rnnt_type, delay_penalty)
    if lattice_dtype is not None:
        px_rows = px_rows.astype(lattice_dtype)
        py_rows = py_rows.astype(lattice_dtype)
    neg_pruned = mutual_information_rows(
        px_rows, py_rows, boundary, lo=lo, s_range=K,
        calc_gradients=False, impl=impl,
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
    px_rows, py_rows = get_rnnt_logprobs_smoothed_rows(
        lm=lm,
        am=am,
        symbols=symbols,
        termination_symbol=termination_symbol,
        lm_only_scale=lm_only_scale,
        am_only_scale=am_only_scale,
        boundary=boundary,
        rnnt_type=rnnt_type,
        impl=impl,
    )
    px_rows = _apply_delay_penalty_rows(px_rows, boundary, rnnt_type, delay_penalty)
    bnd = _normalize_boundary(boundary, am.shape[0], symbols.shape[1], am.shape[1])
    out = mutual_information_rows(
        px_rows, py_rows, bnd, calc_gradients=calc_gradients, impl=impl
    )
    if calc_gradients:
        negated_loss, (gx_rows, gy_rows) = out
        grads = (jnp.moveaxis(gx_rows, 0, 1), jnp.moveaxis(gy_rows, 0, 1))
        return _reduce(negated_loss, reduction), grads
    return _reduce(out, reduction)
