"""Parity tests for the fused rowwise-logprob kernel (interpret mode), and
for the fused lattice paths it powers when enabled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fast_rnnt_tpu.ops.lattice as lattice_mod
from fast_rnnt_tpu import get_rnnt_logprobs_joint, get_rnnt_logprobs_pruned
from fast_rnnt_tpu.ops.kernels.rowwise import rowwise_logprobs


def test_rowwise_matches_reference():
    rng = np.random.default_rng(0)
    N, C = 37, 19  # deliberately unaligned
    x = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 3)
    sym = jnp.asarray(rng.integers(0, C, size=N).astype(np.int32))
    blank = 4
    px, py = rowwise_logprobs(x, sym, blank, True)
    lse = jax.nn.logsumexp(x, axis=1)
    np.testing.assert_allclose(
        px, np.asarray(x)[np.arange(N), np.asarray(sym)] - lse, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        py, np.asarray(x)[:, blank] - lse, rtol=1e-5, atol=1e-6
    )


def test_rowwise_gradient():
    rng = np.random.default_rng(1)
    N, C = 16, 11
    x = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    sym = jnp.asarray(rng.integers(0, C, size=N).astype(np.int32))
    w1 = jnp.asarray(rng.normal(size=N).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=N).astype(np.float32))

    def f_kernel(x):
        px, py = rowwise_logprobs(x, sym, 2, True)
        return jnp.sum(px * w1) + jnp.sum(py * w2)

    def f_ref(x):
        lse = jax.nn.logsumexp(x, axis=1)
        px = jnp.take_along_axis(x, sym[:, None], axis=1)[:, 0] - lse
        py = x[:, 2] - lse
        return jnp.sum(px * w1) + jnp.sum(py * w2)

    g1 = jax.grad(f_kernel)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_fused_lattice_paths_match_xla(monkeypatch):
    rng = np.random.default_rng(2)
    B, T, S, C, K = 2, 6, 4, 10, 3
    logits4 = jnp.asarray(rng.normal(size=(B, T, S + 1, C)).astype(np.float32))
    logitsp = jnp.asarray(rng.normal(size=(B, T, K, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(0, C, size=(B, S)).astype(np.int32))
    ranges = jnp.asarray(
        np.minimum(np.arange(T)[None, :, None] // 2, S - K + 1) + np.arange(K)
    ).astype(jnp.int32) * jnp.ones((B, 1, 1), jnp.int32)
    boundary = jnp.asarray([[0, 0, S, T]] * B, dtype=jnp.int32)

    ref_j = get_rnnt_logprobs_joint(logits4, symbols, 0, boundary, "regular")
    ref_p = get_rnnt_logprobs_pruned(logitsp, symbols, ranges, 0, boundary, "regular")

    monkeypatch.setattr(lattice_mod, "_FUSED_ROWWISE", True)
    # interpret mode for the underlying kernel on CPU
    import fast_rnnt_tpu.ops.kernels.rowwise as rw

    orig = rw._rowwise_fwd_impl
    monkeypatch.setattr(
        rw, "_rowwise_fwd_impl", lambda l, s, b, i: orig(l, s, b, True)
    )
    fus_j = get_rnnt_logprobs_joint(logits4, symbols, 0, boundary, "regular")
    fus_p = get_rnnt_logprobs_pruned(logitsp, symbols, ranges, 0, boundary, "regular")

    for a, b in zip(ref_j, fus_j):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    for a, b in zip(ref_p, fus_p):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
