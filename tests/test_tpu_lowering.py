"""TPU cross-lowering gate for every Pallas kernel.

``jax.jit(f).trace(...).lower(lowering_platforms=("tpu",))`` runs the
Pallas→Mosaic TPU lowering (BlockSpec legality, kernel tracing, Mosaic
MLIR generation) on a CPU host, with no TPU attached.  This catches the
class of bug interpret-mode tests cannot: block shapes Mosaic rejects,
unsupported constructs at lowering time — exactly what round 3 found in
the fused lattice-build kernels (lane-axis block dims of 8 over B=30).
It does NOT execute anything; on-chip numerics are certified separately
by bench.py's parity gate.

Covers all 7 pallas_call sites: wavefront fwd/bwd, latbuild plain
fwd/bwd, latbuild smoothed (parts) fwd/bwd, ranges window-argmax — each
reached through the real public pipelines, plus the exact driver-bench
program at its production shape.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fast_rnnt_tpu as frt
from fast_rnnt_tpu.ops import lattice, recursion
from fast_rnnt_tpu.ops.kernels import latbuild, register, wavefront


@pytest.fixture
def compiled_pallas_env(monkeypatch):
    """Make this CPU process dispatch exactly like a TPU one: pallas is
    the default impl, the fused build auto-enables, and every kernel is
    registered compiled (interpret=False — the wavefront._INTERPRET
    force-compiled seam, shared by latbuild and ranges via
    _interpret_default) so lowering emits Mosaic."""
    monkeypatch.setattr(recursion, "_DEFAULT_IMPL", "pallas")
    old_interpret = wavefront._INTERPRET
    register(default=False, interpret=False)
    assert wavefront._interpret_default() is False  # seam is live
    old_build = lattice._LATTICE_BUILD_IMPL
    # "fused", not "auto": the gate shapes sit below the auto-dispatch
    # size crossover (lattice._FUSED_BUILD_MIN_BT) and would silently
    # route the pipelines to the XLA einsum build, lowering nothing from
    # latbuild.  Forcing the fused build keeps all 7 kernel sites covered.
    lattice.set_lattice_build_impl("fused")
    yield
    lattice.set_lattice_build_impl(old_build)
    wavefront._INTERPRET = old_interpret


def _lower_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _inputs(B, T, S, C, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(dtype))
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(dtype))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
    boundary = jnp.stack(
        [
            jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.full(B, S, jnp.int32),
            jnp.full(B, T, jnp.int32),
        ],
        axis=1,
    )
    return lm, am, symbols, boundary


def _fused_pipeline_step(s_range, lattice_dtype):
    def step(lm, am, symbols, boundary):
        def loss_fn(lm_, am_):
            simple, pruned, _ = frt.rnnt_loss_simple_pruned(
                lm_, am_, symbols, 0, s_range, boundary, reduction="sum",
                lattice_dtype=lattice_dtype,
            )
            return 0.5 * simple + pruned

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(lm, am)

    return step


@pytest.mark.parametrize("dtype", [np.float32, "bf16"])
def test_lower_fused_pipeline(compiled_pallas_env, dtype):
    """wavefront fwd/bwd + latbuild fwd/bwd + ranges, through the
    production two-stage pipeline (the bench.py program), small shape."""
    lattice_dtype = jnp.bfloat16 if dtype == "bf16" else None
    npdtype = np.float32
    lm, am, symbols, boundary = _inputs(3, 140, 5, 37, npdtype)
    if dtype == "bf16":
        lm, am = lm.astype(jnp.bfloat16), am.astype(jnp.bfloat16)
    step = _fused_pipeline_step(3, lattice_dtype)
    _lower_tpu(step, lm, am, symbols, boundary)


@pytest.mark.parametrize("rnnt_type", ["regular", "modified"])
def test_lower_latbuild_direct(compiled_pallas_env, rnnt_type):
    """lattice_rows_fused fwd + VJP in isolation (both rnnt shapes)."""
    lm, am, symbols, boundary = _inputs(3, 140, 5, 37)

    def f(lm_, am_):
        px, py = latbuild.lattice_rows_fused(
            lm_, am_, symbols, 0, rnnt_type, boundary, None, False
        )
        return (
            jnp.sum(jnp.where(jnp.isfinite(px), px, 0.0))
            + jnp.sum(jnp.where(jnp.isfinite(py), py, 0.0))
        )

    _lower_tpu(jax.value_and_grad(f, argnums=(0, 1)), lm, am)


def test_lower_smoothed_pipeline(compiled_pallas_env):
    """latbuild smoothed (parts) fwd + VJP through rnnt_loss_smoothed."""
    lm, am, symbols, boundary = _inputs(3, 140, 5, 37)

    def f(lm_, am_):
        return frt.rnnt_loss_smoothed(
            lm_, am_, symbols, 0, lm_only_scale=0.1, am_only_scale=0.1,
            boundary=boundary, reduction="sum",
        )

    _lower_tpu(jax.value_and_grad(f, argnums=(0, 1)), lm, am)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fp32", "production"])
def test_lower_bench_program_full_shape(compiled_pallas_env, mode):
    """The exact driver-bench program (B=30, T=1000, S=100, C=500, K=5)
    lowers for TPU in both benched modes — so BENCH runs never discover a
    lowering failure the suite could have caught."""
    lm, am, symbols, boundary = _inputs(30, 1000, 100, 500)
    lattice_dtype = None
    if mode == "production":
        lm, am = lm.astype(jnp.bfloat16), am.astype(jnp.bfloat16)
        lattice_dtype = jnp.bfloat16
    step = _fused_pipeline_step(5, lattice_dtype)
    _lower_tpu(step, lm, am, symbols, boundary)
