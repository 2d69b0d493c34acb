"""Tests for the fused two-phase recursion kernel (wavefront.fused_rows_pallas).

The fused kernel runs the forward and the occupancy backward in ONE
pallas_call with the p lattice in VMEM scratch (never in HBM); it must be
BIT-EQUAL to the split forward_rows_pallas + backward_rows_pallas pair
(identical op sequence, f32 carries) — see wavefront.py.  These tests pin
that equality, the dispatch/fallback seams, and the autodiff paths that
now route through it (recursion._mi_rows_scores_fwd / _rows_with_grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu.ops import recursion
from fast_rnnt_tpu.ops.kernels import wavefront as wf


def _case(rng, B, T, S, modified=False, dtype=np.float32, ragged=True):
    T1 = T if modified else T + 1
    px = jnp.asarray(rng.normal(size=(S, B, T1)).astype(dtype))
    py = jnp.asarray(rng.normal(size=(S + 1, B, T)).astype(dtype))
    if ragged:
        t_end = np.clip(rng.integers(S + 2, T + 1, size=B), S + 2, T)
        s_end = np.clip(rng.integers(1, S + 1, size=B), 1, S)
    else:
        t_end = np.full(B, T)
        s_end = np.full(B, S)
    bnd = jnp.asarray(
        np.stack([np.zeros(B), np.zeros(B), s_end, t_end], 1).astype(np.int32)
    )
    return px, py, bnd


def _feasible_lo(rng, B, T, S, K):
    """A monotone, in-range band that keeps (s_end, t_end) reachable for
    full-boundary utterances is hard to draw randomly; tests that need
    finite scores use ranges from the real pruning path instead.  Here a
    monotone random band suffices — parity must hold bit-for-bit on
    -inf patterns too."""
    lo = rng.integers(0, max(S - K, 1), size=(B, T)).astype(np.int32)
    lo = np.minimum.accumulate(lo[:, ::-1], axis=1)[:, ::-1]
    lo = np.maximum.accumulate(lo, axis=1)
    return jnp.asarray(np.minimum(lo, S + 1 - K))


@pytest.mark.parametrize("modified", [False, True])
@pytest.mark.parametrize("banded", [False, True])
def test_fused_bitequal_to_split_pair(modified, banded):
    rng = np.random.default_rng(0)
    B, T, S, K = 4, 50, 9, 3
    px, py, bnd = _case(rng, B, T, S, modified)
    lo = _feasible_lo(rng, B, T, S, K) if banded else None
    p, sc = wf.forward_rows_pallas(px, py, bnd, lo=lo, K=K, interpret=True)
    gx, gy = wf.backward_rows_pallas(
        px, py, p, bnd, jnp.ones_like(sc), lo=lo, K=K, interpret=True
    )
    out = wf.fused_rows_pallas(px, py, bnd, lo=lo, K=K, interpret=True)
    assert out is not None
    sc2, gx2, gy2 = out
    a, b = np.asarray(sc), np.asarray(sc2)
    assert (np.isneginf(a) == np.isneginf(b)).all()
    fin = np.isfinite(a)
    np.testing.assert_array_equal(a[fin], b[fin])
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(gx2))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(gy2))


def test_fused_bf16_storage():
    rng = np.random.default_rng(1)
    B, T, S = 3, 40, 7
    px, py, bnd = _case(rng, B, T, S)
    px16, py16 = px.astype(jnp.bfloat16), py.astype(jnp.bfloat16)
    p, sc = wf.forward_rows_pallas(px16, py16, bnd, interpret=True)
    gx, gy = wf.backward_rows_pallas(
        px16, py16, p, bnd, jnp.ones_like(sc), interpret=True
    )
    sc2, gx2, gy2 = wf.fused_rows_pallas(px16, py16, bnd, interpret=True)
    assert gx2.dtype == jnp.bfloat16 and gy2.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc2))
    np.testing.assert_array_equal(
        np.asarray(gx, np.float32), np.asarray(gx2, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(gy, np.float32), np.asarray(gy2, np.float32)
    )


def test_fused_fallback_seams(monkeypatch):
    rng = np.random.default_rng(2)
    px, py, bnd = _case(rng, 2, 20, 4)
    # S == 0 is not fusable
    assert wf.fused_rows_pallas(px[:0], py[:1], bnd, interpret=True) is None
    # p scratch past the VMEM cap falls back (monkeypatched cap)
    monkeypatch.setattr(wf, "_P_SCRATCH_CAP", 1)
    assert wf.fused_rows_pallas(px, py, bnd, interpret=True) is None


def test_fused_bblk_steps_down_to_fit(monkeypatch):
    """bblk halves (32 -> 16 -> 8) until the p scratch fits the cap."""
    rng = np.random.default_rng(3)
    px, py, bnd = _case(rng, 16, 30, 5)
    seen = {}
    real = wf._fused_core

    def spy(*args, **kw):
        seen["bblk"] = kw["bblk"]
        return real(*args, **kw)

    monkeypatch.setattr(wf, "_fused_core", spy)
    wf._fused_partitioned.cache_clear()
    # cap sized so bblk=16 fits but 32 would not: (S+1)*bblk*W*4
    W = 128
    monkeypatch.setattr(wf, "_P_SCRATCH_CAP", 6 * 16 * W * 4)
    out = wf.fused_rows_pallas(px, py, bnd, interpret=True)
    wf._fused_partitioned.cache_clear()
    assert out is not None and seen["bblk"] == 16


def test_grad_path_routes_through_fused_and_matches_xla(monkeypatch):
    """value_and_grad through mutual_information_rows(calc_gradients=False)
    with _FUSE_SCORES_VJP on uses the fused kernel (occ residual +
    rescale) and must match the XLA scan core."""
    monkeypatch.setattr(recursion, "_FUSE_SCORES_VJP", True)
    rng = np.random.default_rng(4)
    B, T, S = 3, 30, 6
    px, py, bnd = _case(rng, B, T, S)
    weights = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))

    def loss(px_, py_, impl):
        sc = recursion.mutual_information_rows(px_, py_, bnd, impl=impl)
        return jnp.sum(weights * sc)

    v_p, g_p = jax.value_and_grad(loss, argnums=(0, 1))(px, py, "pallas")
    v_x, g_x = jax.value_and_grad(loss, argnums=(0, 1))(px, py, "xla")
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_p[0]), np.asarray(g_x[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_p[1]), np.asarray(g_x[1]), atol=1e-5
    )


def test_calc_gradients_path_uses_fused(monkeypatch):
    """mutual_information_rows(calc_gradients=True, impl='pallas') with
    _FUSE_WITH_GRADS on routes through fused_rows_pallas (and matches the
    split-pair math)."""
    monkeypatch.setattr(recursion, "_FUSE_WITH_GRADS", True)
    rng = np.random.default_rng(5)
    px, py, bnd = _case(rng, 3, 30, 6)
    calls = []
    real = wf.fused_rows_pallas

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(wf, "fused_rows_pallas", spy)
    sc, (gx, gy) = recursion.mutual_information_rows(
        px, py, bnd, calc_gradients=True, impl="pallas"
    )
    assert calls, "pallas calc_gradients path did not use the fused kernel"
    sc_x, (gx_x, gy_x) = recursion.mutual_information_rows(
        px, py, bnd, calc_gradients=True, impl="xla"
    )
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc_x), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_x), atol=2e-5)
