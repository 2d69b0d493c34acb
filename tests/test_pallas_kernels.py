"""Pallas wavefront-kernel parity tests (interpreter mode on CPU — the
TPU-compiled path is exercised by bench.py and the TPU drive scripts).

Interpreter-mode runs double as the sanitizer pass: they catch OOB reads
the way compute-sanitizer would for the reference CUDA kernels
(SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu import mutual_information_recursion
from fast_rnnt_tpu.ops.kernels import register

from .oracle import mi_loop
from .test_recursion import _random_boundary, _random_pxpy

register(default=False, interpret=True)


@pytest.mark.parametrize("modified", [False, True])
@pytest.mark.parametrize("ragged", [False, True])
def test_pallas_matches_oracle(modified, ragged):
    rng = np.random.default_rng(42)
    B, S, T = 3, 4, 9
    px, py = _random_pxpy(rng, B, S, T, modified=modified)
    boundary = _random_boundary(rng, B, S, T, ragged=ragged)

    ref_scores, ref_pxg, ref_pyg, _ = mi_loop(px, py, boundary)
    scores, (pxg, pyg) = mutual_information_recursion(
        jnp.asarray(px),
        jnp.asarray(py),
        jnp.asarray(boundary),
        calc_gradients=True,
        impl="pallas",
    )
    np.testing.assert_allclose(scores, ref_scores, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(pxg, ref_pxg, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(pyg, ref_pyg, rtol=2e-4, atol=2e-5)


def test_pallas_matches_xla_impl():
    rng = np.random.default_rng(7)
    B, S, T = 5, 6, 12
    px, py = _random_pxpy(rng, B, S, T, neg_inf_frac=0.2)
    boundary = _random_boundary(rng, B, S, T)
    a = mutual_information_recursion(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(boundary),
        calc_gradients=True, impl="xla",
    )
    b = mutual_information_recursion(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(boundary),
        calc_gradients=True, impl="pallas",
    )
    np.testing.assert_allclose(a[0], b[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(a[1][0], b[1][0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a[1][1], b[1][1], rtol=1e-4, atol=1e-5)


def test_pallas_grad_composes():
    rng = np.random.default_rng(9)
    B, S, T = 2, 3, 6
    px, py = _random_pxpy(rng, B, S, T)
    b = jnp.asarray(_random_boundary(rng, B, S, T))

    def total(px, py):
        return mutual_information_recursion(px, py, b, impl="pallas").sum()

    gx, gy = jax.grad(total, argnums=(0, 1))(jnp.asarray(px), jnp.asarray(py))
    _, (pxg, pyg) = mutual_information_recursion(
        jnp.asarray(px), jnp.asarray(py), b, calc_gradients=True, impl="pallas"
    )
    np.testing.assert_allclose(gx, pxg, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gy, pyg, rtol=1e-5, atol=1e-6)


def test_pallas_nonzero_begin():
    rng = np.random.default_rng(11)
    B, S, T = 2, 6, 10
    px, py = _random_pxpy(rng, B, S, T)
    boundary = np.array([[1, 2, 5, 9], [0, 0, 6, 10]], dtype=np.int32)
    ref_scores, ref_pxg, ref_pyg, _ = mi_loop(px, py, boundary)
    scores, (pxg, pyg) = mutual_information_recursion(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(boundary),
        calc_gradients=True, impl="pallas",
    )
    np.testing.assert_allclose(scores, ref_scores, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(pxg, ref_pxg, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(pyg, ref_pyg, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("B", [33, 40, 56])
def test_pallas_large_nondivisible_batch(B):
    """Regression: batch sizes whose 8-padded count is not a multiple of the
    batch block used to drop trailing rows (scores/grads uninitialized)."""
    rng = np.random.default_rng(B)
    S, T = 6, 20
    px = jnp.asarray(rng.normal(size=(B, S, T + 1)).astype(np.float32)) - 2.0
    py = jnp.asarray(rng.normal(size=(B, S + 1, T)).astype(np.float32)) - 2.0
    s_p, (gx_p, gy_p) = mutual_information_recursion(
        px, py, None, calc_gradients=True, impl="pallas"
    )
    s_x, (gx_x, gy_x) = mutual_information_recursion(
        px, py, None, calc_gradients=True, impl="xla"
    )
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_x), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gy_p), np.asarray(gy_x), rtol=1e-3, atol=1e-5
    )


def test_pallas_empty_transcript_s0():
    """S = 0 must not crash the kernels (they delegate the degenerate
    single-row lattice to the XLA core)."""
    rng = np.random.default_rng(5)
    B, T = 3, 9
    px = jnp.zeros((B, 0, T + 1), jnp.float32)
    py = jnp.asarray(rng.normal(size=(B, 1, T)).astype(np.float32))
    s_p, (gx, gy) = mutual_information_recursion(
        px, py, None, calc_gradients=True, impl="pallas"
    )
    s_x = mutual_information_recursion(px, py, None, impl="xla")
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gy.sum((1, 2))), T, rtol=1e-4)


def test_out_of_range_boundary_clamped_consistently():
    """Out-of-range boundary values (e.g. t_end = T + 1) are clamped to the
    lattice, so the XLA and Pallas implementations agree instead of one
    silently clamping a gather and the other returning -inf."""
    rng = np.random.default_rng(6)
    B, S, T = 2, 4, 7
    px = jnp.asarray(rng.normal(size=(B, S, T + 1)).astype(np.float32))
    py = jnp.asarray(rng.normal(size=(B, S + 1, T)).astype(np.float32))
    bad = jnp.asarray(
        np.array([[0, 0, S, T + 1], [-1, 0, S + 3, T]], np.int32)
    )
    good = jnp.asarray(np.array([[0, 0, S, T], [0, 0, S, T]], np.int32))
    for impl in ("xla", "pallas"):
        s_bad = mutual_information_recursion(px, py, bad, impl=impl)
        s_good = mutual_information_recursion(px, py, good, impl=impl)
        np.testing.assert_allclose(
            np.asarray(s_bad), np.asarray(s_good), rtol=1e-5,
            err_msg=f"impl={impl}",
        )


@pytest.mark.parametrize(
    "modified", [False, pytest.param(True, marks=pytest.mark.slow)]
)
def test_pallas_banded_matches_masked(modified):
    """In-kernel band masking (the pruned stage-2 fast path) must equal
    band-masking the lattice in XLA and running the plain recursion —
    for scores AND for the gradients through the custom VJP."""
    from fast_rnnt_tpu.ops.lattice import band_mask_rows_smajor
    from fast_rnnt_tpu.ops.recursion import mutual_information_rows

    rng = np.random.default_rng(99)
    B, S, T, K = 3, 7, 12, 3
    px, py = _random_pxpy(rng, B, S, T, modified=modified)
    boundary = _random_boundary(rng, B, S, T)
    # a valid monotone band: lo steps by < K, starts at 0
    steps = rng.integers(0, K, size=(B, T))
    steps[:, 0] = 0
    lo = jnp.asarray(
        np.minimum(np.cumsum(steps, axis=1), max(S - K + 1, 0)).astype(np.int32)
    )
    px_r = jnp.moveaxis(jnp.asarray(px), 1, 0)
    py_r = jnp.moveaxis(jnp.asarray(py), 1, 0)
    bnd = jnp.asarray(boundary)

    for impl in ("xla", "pallas"):
        def banded(px_r, py_r):
            return jnp.sum(
                mutual_information_rows(
                    px_r, py_r, bnd, lo=lo, s_range=K, impl=impl
                )
            )

        def masked(px_r, py_r):
            return jnp.sum(
                mutual_information_rows(
                    band_mask_rows_smajor(px_r, lo, K),
                    band_mask_rows_smajor(py_r, lo, K),
                    bnd,
                    impl=impl,
                )
            )

        vb, gb = jax.value_and_grad(banded, argnums=(0, 1))(px_r, py_r)
        vm, gm = jax.value_and_grad(masked, argnums=(0, 1))(px_r, py_r)
        np.testing.assert_allclose(float(vb), float(vm), rtol=1e-5,
                                   err_msg=f"impl={impl}")
        # outside-band cotangents are exactly zero either way (occupancies
        # of -inf arcs); inside-band must match
        np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gm[0]),
                                   rtol=1e-4, atol=1e-6, err_msg=f"impl={impl}")
        np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gm[1]),
                                   rtol=1e-4, atol=1e-6, err_msg=f"impl={impl}")


def test_pallas_banded_with_occupancies():
    """calc_gradients=True through the banded path: occupancy flow still
    sums to s_end + t_end (paths are confined to the band but flow
    conservation holds as long as the band admits a path)."""
    from fast_rnnt_tpu.ops.recursion import mutual_information_rows

    rng = np.random.default_rng(5)
    B, S, T, K = 2, 5, 9, 3
    px, py = _random_pxpy(rng, B, S, T)
    boundary = np.tile(np.array([0, 0, S, T], np.int32), (B, 1))
    # a band that provably admits a path: lo ramps 0 -> S-K+1
    lo = jnp.asarray(
        np.minimum((np.arange(T)[None, :]).astype(np.int32), S - K + 1)
        * np.ones((B, 1), np.int32)
    )
    scores, (gx, gy) = mutual_information_rows(
        jnp.moveaxis(jnp.asarray(px), 1, 0),
        jnp.moveaxis(jnp.asarray(py), 1, 0),
        jnp.asarray(boundary),
        lo=lo, s_range=K, calc_gradients=True, impl="pallas",
    )
    assert np.all(np.isfinite(np.asarray(scores)))
    occ = np.asarray(gx.sum((0, 2)) + gy.sum((0, 2)))
    np.testing.assert_allclose(occ, S + T, rtol=1e-3)


def test_bf16_storage_occupancies_at_scale():
    """Regression for the round-3 on-chip finding: the p residual must be
    stored f32 even in the bf16 lattice mode.  |p| grows like O(T), and
    the backward exponentiates DIFFERENCES of neighboring p values — a
    bf16-stored p (quantization step 4 at |p|≈700) destroys every
    occupancy gradient at scale while the f32 score carry keeps losses
    looking healthy.  T here is large enough that bf16-p occupancies are
    ~50%+ wrong, so this fails loudly on any regression."""
    from fast_rnnt_tpu.ops.kernels.wavefront import (
        backward_rows_pallas,
        forward_rows_pallas,
    )

    rng = np.random.default_rng(123)
    B, S, T = 2, 6, 192
    px = (rng.normal(size=(B, S, T + 1)) - 3.0).astype(np.float32)
    py = (rng.normal(size=(B, S + 1, T)) - 3.0).astype(np.float32)
    boundary = np.array([[0, 0, S, T], [0, 0, S - 1, T - 30]], np.int32)

    px_rows = jnp.moveaxis(jnp.asarray(px), 1, 0).astype(jnp.bfloat16)
    py_rows = jnp.moveaxis(jnp.asarray(py), 1, 0).astype(jnp.bfloat16)
    b = jnp.asarray(boundary)

    p_rows, scores = forward_rows_pallas(px_rows, py_rows, b, interpret=True)
    assert p_rows.dtype == jnp.float32, "p residual must stay f32"
    gx, gy = backward_rows_pallas(
        px_rows, py_rows, p_rows, b, jnp.ones((B,)), interpret=True
    )

    # conservation: total occupancy == s_end - s_begin + t_end - t_begin
    tot = np.asarray(
        gx.astype(jnp.float32).sum((0, 2)) + gy.astype(jnp.float32).sum((0, 2))
    )
    expect = (boundary[:, 2] - boundary[:, 0] + boundary[:, 3] - boundary[:, 1])
    np.testing.assert_allclose(tot, expect, rtol=2e-2)

    # parity with the XLA core on the same bf16-rounded inputs
    from fast_rnnt_tpu.ops.recursion import _backward_rows_xla, _forward_rows_xla

    p_x, s_x = _forward_rows_xla(px_rows, py_rows, b)
    gx_x, gy_x = _backward_rows_xla(px_rows, py_rows, p_x, b, jnp.ones((B,)))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(s_x), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx.astype(jnp.float32)),
        np.asarray(gx_x.astype(jnp.float32)), atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(gy.astype(jnp.float32)),
        np.asarray(gy_x.astype(jnp.float32)), atol=5e-3,
    )
