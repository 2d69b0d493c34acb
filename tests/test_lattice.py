"""Lattice-construction tests: shapes, normalization identities, and the
equivalences the reference relies on but never asserts (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu import (
    get_rnnt_logprobs,
    get_rnnt_logprobs_joint,
    get_rnnt_logprobs_pruned,
    get_rnnt_logprobs_smoothed,
)


def _inputs(rng, B=2, T=8, S=4, C=10):
    lm = rng.normal(size=(B, S + 1, C)).astype(np.float32)
    am = rng.normal(size=(B, T, C)).astype(np.float32)
    symbols = rng.integers(0, C, size=(B, S)).astype(np.int32)
    boundary = np.stack(
        [
            np.zeros(B, np.int32),
            np.zeros(B, np.int32),
            rng.integers(1, S + 1, size=B).astype(np.int32),
            np.full(B, T, np.int32),
        ],
        axis=1,
    )
    boundary[:, 3] = np.maximum(boundary[:, 2], rng.integers(S, T + 1, size=B))
    return jnp.asarray(lm), jnp.asarray(am), jnp.asarray(symbols), jnp.asarray(boundary)


@pytest.mark.parametrize("rnnt_type", ["regular", "modified", "constrained"])
def test_shapes(rnnt_type):
    rng = np.random.default_rng(0)
    lm, am, symbols, boundary = _inputs(rng)
    B, T, C = am.shape
    S = lm.shape[1] - 1
    px, py = get_rnnt_logprobs(lm, am, symbols, 0, rnnt_type, boundary)
    T1 = T + 1 if rnnt_type == "regular" else T
    assert px.shape == (B, S, T1)
    assert py.shape == (B, S + 1, T)
    assert not np.any(np.isnan(np.asarray(px)))
    assert not np.any(np.isnan(np.asarray(py)))


@pytest.mark.parametrize("rnnt_type", ["regular", "modified", "constrained"])
def test_simple_equals_joint_for_additive_joiner(rnnt_type):
    """The matmul-normalizer trick (rnnt_loss.py:175-186) must equal the
    naive full-logits path when logits[b,t,s,:] = lm[b,s,:] + am[b,t,:]."""
    rng = np.random.default_rng(1)
    lm, am, symbols, boundary = _inputs(rng)
    logits = lm[:, None, :, :] + am[:, :, None, :]  # (B, T, S+1, C)
    px1, py1 = get_rnnt_logprobs(lm, am, symbols, 3, rnnt_type, boundary)
    px2, py2 = get_rnnt_logprobs_joint(logits, symbols, 3, boundary, rnnt_type)
    # fp32: exp-matmul-log trick vs stable logsumexp differ at the ~1e-3 level
    np.testing.assert_allclose(px1, px2, rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(py1, py2, rtol=3e-3, atol=3e-3)


def test_px_py_are_normalized_logprobs():
    """exp(px) must equal softmax(lm+am) at the symbol; exp(py) at blank."""
    rng = np.random.default_rng(2)
    lm, am, symbols, boundary = _inputs(rng, B=1, T=5, S=3, C=7)
    px, py = get_rnnt_logprobs(lm, am, symbols, 0, "regular", None)
    logits = np.asarray(lm[:, None, :, :] + am[:, :, None, :])  # (B,T,S+1,C)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    sym = np.asarray(symbols)
    for s in range(3):
        for t in range(5):
            np.testing.assert_allclose(
                np.asarray(px)[0, s, t], logp[0, t, s, sym[0, s]], rtol=3e-3
            )
    for s in range(4):
        for t in range(5):
            np.testing.assert_allclose(
                np.asarray(py)[0, s, t], logp[0, t, s, 0], rtol=3e-3
            )


def test_invariance_to_per_frame_constants():
    """Adding any per-(b,t) constant to am or per-(b,s) constant to lm must
    not change px/py (the normalizer absorbs it) — the invariance the
    reference mentions but never tests (rnnt_loss.py:1259-1262)."""
    rng = np.random.default_rng(3)
    lm, am, symbols, boundary = _inputs(rng)
    px1, py1 = get_rnnt_logprobs(lm, am, symbols, 1, "regular", boundary)
    am_shift = am + jnp.asarray(rng.normal(size=(am.shape[0], am.shape[1], 1)) * 3)
    lm_shift = lm + jnp.asarray(rng.normal(size=(lm.shape[0], lm.shape[1], 1)) * 3)
    px2, py2 = get_rnnt_logprobs(lm_shift, am_shift, symbols, 1, "regular", boundary)
    np.testing.assert_allclose(px1, px2, rtol=3e-3, atol=5e-3)
    np.testing.assert_allclose(py1, py2, rtol=3e-3, atol=5e-3)


@pytest.mark.parametrize("rnnt_type", ["regular", "modified"])
def test_pruned_with_full_range_equals_joint(rnnt_type):
    """s_range = S+1 windows covering everything: pruned lattice must equal
    the joint lattice exactly."""
    rng = np.random.default_rng(4)
    B, T, S, C = 2, 6, 3, 8
    lm, am, symbols, boundary = _inputs(rng, B=B, T=T, S=S, C=C)
    logits = lm[:, None, :, :] + am[:, :, None, :]  # (B, T, S+1, C)
    ranges = jnp.broadcast_to(
        jnp.arange(S + 1, dtype=jnp.int32), (B, T, S + 1)
    )
    px1, py1 = get_rnnt_logprobs_pruned(logits, symbols, ranges, 2, boundary, rnnt_type)
    px2, py2 = get_rnnt_logprobs_joint(logits, symbols, 2, boundary, rnnt_type)
    np.testing.assert_allclose(px1, px2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(py1, py2, rtol=1e-4, atol=1e-5)


def test_smoothed_zero_scales_equals_simple():
    rng = np.random.default_rng(5)
    lm, am, symbols, boundary = _inputs(rng)
    px1, py1 = get_rnnt_logprobs(lm, am, symbols, 0, "regular", boundary)
    px2, py2 = get_rnnt_logprobs_smoothed(
        lm, am, symbols, 0, 0.0, 0.0, boundary, "regular"
    )
    np.testing.assert_allclose(px1, px2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(py1, py2, rtol=1e-4, atol=1e-4)


def test_smoothed_nonzero_scales_finite():
    rng = np.random.default_rng(6)
    lm, am, symbols, boundary = _inputs(rng)
    px, py = get_rnnt_logprobs_smoothed(
        lm, am, symbols, 0, 0.25, 0.5, boundary, "regular"
    )
    assert not np.any(np.isnan(np.asarray(px)))
    assert not np.any(np.isnan(np.asarray(py)))
    # all but the -inf positions are finite
    assert np.isfinite(np.asarray(py)).all()
