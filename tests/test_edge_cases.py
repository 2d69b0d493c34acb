"""Edge-case behavior of the loss API: empty transcripts, impossible
alignments, extreme logits.  (The reference tests none of these.)"""

import jax
import jax.numpy as jnp
import numpy as np

from fast_rnnt_tpu import (
    mutual_information_recursion,
    rnnt_loss_simple,
)


def test_empty_transcript_s0():
    """S = 0 (empty transcription, present in real data): the loss is the
    pure blank-path cost and stays finite/differentiable."""
    rng = np.random.default_rng(0)
    B, T, C = 2, 8, 10
    lm = jnp.asarray(rng.normal(size=(B, 1, C)).astype(np.float32))
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    symbols = jnp.zeros((B, 0), jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda lm, am: rnnt_loss_simple(
            lm, am, symbols, 0, None, reduction="sum"
        ),
        argnums=(0, 1),
    )(lm, am)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grads[0])))
    assert np.all(np.isfinite(np.asarray(grads[1])))
    # with S = 0 the lattice is a single row: loss = -sum_t py[0, t]
    from fast_rnnt_tpu import get_rnnt_logprobs

    px, py = get_rnnt_logprobs(lm, am, symbols, 0, "regular", None)
    expected = -np.asarray(py.sum(axis=(1, 2)))
    got = np.asarray(
        rnnt_loss_simple(lm, am, symbols, 0, None, reduction="none")
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_more_symbols_than_frames():
    """For rnnt_type='regular' multiple symbols per frame are legal, so
    t_end < s_end still has finite loss; for 'modified' (one symbol per
    frame) the alignment is impossible and the loss is +inf."""
    rng = np.random.default_rng(1)
    B, T, S, C = 2, 8, 6, 10
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
    boundary = jnp.asarray(
        np.stack(
            [np.zeros(B, np.int32), np.zeros(B, np.int32),
             np.full(B, S, np.int32), np.full(B, 3, np.int32)], 1
        )
    )
    l_reg = rnnt_loss_simple(
        lm, am, symbols, 0, boundary, rnnt_type="regular", reduction="none"
    )
    assert np.all(np.isfinite(np.asarray(l_reg)))
    l_mod = rnnt_loss_simple(
        lm, am, symbols, 0, boundary, rnnt_type="modified", reduction="none"
    )
    assert np.all(np.isposinf(np.asarray(l_mod))), l_mod


def test_extreme_logit_magnitudes():
    """1e4-scaled logits must not produce NaN anywhere (the -inf-safe
    logaddexp and max-shifted normalizers keep everything finite)."""
    rng = np.random.default_rng(2)
    B, T, S, C = 2, 8, 4, 10
    lm = jnp.asarray((rng.normal(size=(B, S + 1, C)) * 1e4).astype(np.float32))
    am = jnp.asarray((rng.normal(size=(B, T, C)) * 1e4).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
    loss, grads = jax.value_and_grad(
        lambda lm, am: rnnt_loss_simple(
            lm, am, symbols, 0, None, reduction="sum"
        ),
        argnums=(0, 1),
    )(lm, am)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grads[0])))
    assert np.all(np.isfinite(np.asarray(grads[1])))


def test_single_frame_single_symbol():
    """Minimal lattice T=1, S=1."""
    rng = np.random.default_rng(3)
    B, C = 2, 6
    lm = jnp.asarray(rng.normal(size=(B, 2, C)).astype(np.float32))
    am = jnp.asarray(rng.normal(size=(B, 1, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, 1)).astype(np.int32))
    loss = rnnt_loss_simple(lm, am, symbols, 0, None, reduction="none")
    assert np.all(np.isfinite(np.asarray(loss)))
    # exact: the only path is emit-symbol then blank (or blank then emit):
    # score = logaddexp over the 2 paths through the 2x2 lattice
    from fast_rnnt_tpu import get_rnnt_logprobs

    px, py = get_rnnt_logprobs(lm, am, symbols, 0, "regular", None)
    px, py = np.asarray(px, np.float64), np.asarray(py, np.float64)
    for b in range(B):
        p_emit_first = px[b, 0, 0] + py[b, 1, 0]
        p_blank_first = py[b, 0, 0] + px[b, 0, 1]  # px at t=T is -inf
        expected = -np.logaddexp(p_emit_first, p_blank_first)
        np.testing.assert_allclose(float(loss[b]), expected, rtol=1e-4)
