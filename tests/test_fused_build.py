"""Parity tests for the fused Pallas lattice-build kernels
(ops/kernels/latbuild.py) against the XLA einsum build
(ops/lattice.py:get_rnnt_logprobs_rows) — values AND gradients.

Interpreter mode on CPU (the compiled path is exercised on-chip by
bench.py's parity gate, which runs the fused pipeline — and with it this
build — against impl="xla" on the real device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu.ops import lattice
from fast_rnnt_tpu.ops.kernels import register
from fast_rnnt_tpu.ops.kernels.latbuild import lattice_rows_fused

register(default=False, interpret=True)


def _inputs(rng, B, T, S, C, dtype=np.float32):
    lm = rng.normal(size=(B, S + 1, C)).astype(dtype)
    am = rng.normal(size=(B, T, C)).astype(dtype)
    symbols = rng.integers(1, C, size=(B, S)).astype(np.int32)
    t_end = np.clip(rng.integers(max(2, T // 2), T + 1, size=B), 2, T)
    s_end = np.clip(rng.integers(max(1, S // 2), S + 1, size=B), 1, S)
    boundary = np.stack(
        [np.zeros(B, np.int32), np.zeros(B, np.int32),
         s_end.astype(np.int32), t_end.astype(np.int32)], axis=1
    )
    return jnp.asarray(lm), jnp.asarray(am), jnp.asarray(symbols), jnp.asarray(boundary)


def _xla_build(lm, am, symbols, rnnt_type, boundary, out_dtype=None):
    old = lattice._LATTICE_BUILD_IMPL
    lattice.set_lattice_build_impl("xla")
    try:
        return lattice.get_rnnt_logprobs_rows(
            lm, am, symbols, 0, rnnt_type, boundary, out_dtype=out_dtype
        )
    finally:
        lattice.set_lattice_build_impl(old)


@pytest.mark.parametrize("rnnt_type", ["regular", "modified", "constrained"])
@pytest.mark.parametrize("with_boundary", [True, False])
def test_fused_build_matches_xla_values(rnnt_type, with_boundary):
    rng = np.random.default_rng(0)
    # odd sizes on purpose: B not a multiple of 8, T crossing a lane
    # block, C not a multiple of 128
    B, T, S, C = 3, 140, 5, 37
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    boundary = boundary if with_boundary else None

    px_ref, py_ref = _xla_build(lm, am, symbols, rnnt_type, boundary)
    px, py = lattice_rows_fused(
        lm, am, symbols, 0, rnnt_type, boundary, interpret=True
    )
    assert px.shape == px_ref.shape and py.shape == py_ref.shape
    np.testing.assert_allclose(px, px_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(py, py_ref, rtol=1e-5, atol=1e-5)


def test_fused_build_lane_multiple_edge():
    # T an exact multiple of the 128 lane width: the regular px needs one
    # more t block than am/py have — exercises the clamped index maps
    rng = np.random.default_rng(1)
    B, T, S, C = 2, 128, 4, 16
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    for rnnt_type in ("regular", "modified"):
        px_ref, py_ref = _xla_build(lm, am, symbols, rnnt_type, boundary)
        px, py = lattice_rows_fused(
            lm, am, symbols, 0, rnnt_type, boundary, interpret=True
        )
        np.testing.assert_allclose(px, px_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(py, py_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rnnt_type", ["regular", "modified", "constrained"])
def test_fused_build_gradients_match_xla(rnnt_type):
    rng = np.random.default_rng(2)
    B, T, S, C = 3, 70, 6, 25
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    # random cotangents make the VJP comparison cover every output entry
    px_ref, py_ref = _xla_build(lm, am, symbols, rnnt_type, boundary)
    cpx = jnp.asarray(rng.normal(size=px_ref.shape).astype(np.float32))
    cpy = jnp.asarray(rng.normal(size=py_ref.shape).astype(np.float32))

    def scalar(build):
        def f(lm_, am_):
            px, py = build(lm_, am_)
            return jnp.sum(px * cpx) + jnp.sum(py * cpy)

        return jax.grad(f, argnums=(0, 1))(lm, am)

    g_ref = scalar(lambda l, a: _xla_build(l, a, symbols, rnnt_type, boundary))
    g_fused = scalar(
        lambda l, a: lattice_rows_fused(
            l, a, symbols, 0, rnnt_type, boundary, interpret=True
        )
    )
    np.testing.assert_allclose(g_fused[0], g_ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_fused[1], g_ref[1], rtol=1e-4, atol=1e-5)


def test_fused_build_bf16_mode():
    """bf16 inputs + bf16 lattice storage: values within bf16 tolerance of
    the f32 XLA build; gradients finite and bf16-typed."""
    rng = np.random.default_rng(3)
    B, T, S, C = 2, 96, 4, 20
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    px_ref, py_ref = _xla_build(lm, am, symbols, "regular", boundary)

    lm16, am16 = lm.astype(jnp.bfloat16), am.astype(jnp.bfloat16)
    px, py = lattice_rows_fused(
        lm16, am16, symbols, 0, "regular", boundary,
        out_dtype=jnp.bfloat16, interpret=True,
    )
    assert px.dtype == jnp.bfloat16 and py.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        px.astype(np.float32), px_ref, rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        py.astype(np.float32), py_ref, rtol=0.05, atol=0.05
    )

    def f(lm_, am_):
        px, py = lattice_rows_fused(
            lm_, am_, symbols, 0, "regular", boundary,
            out_dtype=jnp.bfloat16, interpret=True,
        )
        return (
            jnp.sum(px.astype(jnp.float32) ** 2)
            + jnp.sum(py.astype(jnp.float32) ** 2)
        )

    glm, gam = jax.grad(f, argnums=(0, 1))(lm16, am16)
    assert glm.dtype == jnp.bfloat16 and gam.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(glm, dtype=np.float32)).all()
    assert np.isfinite(np.asarray(gam, dtype=np.float32)).all()


@pytest.mark.parametrize("rnnt_type", ["regular", "modified"])
def test_fused_build_bmajor_dispatch(rnnt_type):
    """get_rnnt_logprobs (B-major) dispatches to the fused build + a
    transpose; values must match the einsum build."""
    rng = np.random.default_rng(8)
    B, T, S, C = 3, 70, 5, 21
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    lattice.set_lattice_build_impl("xla")
    try:
        px_ref, py_ref = lattice.get_rnnt_logprobs(
            lm, am, symbols, 0, rnnt_type, boundary
        )
    finally:
        lattice.set_lattice_build_impl("auto")
    lattice.set_lattice_build_impl("fused")
    try:
        px, py = lattice.get_rnnt_logprobs(lm, am, symbols, 0, rnnt_type, boundary)
    finally:
        lattice.set_lattice_build_impl("auto")
    np.testing.assert_allclose(px, px_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(py, py_ref, rtol=1e-5, atol=1e-5)


def _xla_smoothed(lm, am, symbols, rnnt_type, boundary, lms, ams):
    old = lattice._LATTICE_BUILD_IMPL
    lattice.set_lattice_build_impl("xla")
    try:
        return lattice.get_rnnt_logprobs_smoothed_rows(
            lm, am, symbols, 0, lms, ams, boundary, rnnt_type
        )
    finally:
        lattice.set_lattice_build_impl(old)


@pytest.mark.parametrize("scales", [(0.1, 0.1), (0.25, 0.0), (0.0, 0.3)])
@pytest.mark.parametrize("rnnt_type", ["regular", "modified", "constrained"])
def test_fused_smoothed_matches_xla(rnnt_type, scales):
    from fast_rnnt_tpu.ops.kernels.latbuild import lattice_rows_fused_smoothed

    lms, ams = scales
    rng = np.random.default_rng(5)
    B, T, S, C = 3, 140, 5, 37
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)

    px_ref, py_ref = _xla_smoothed(lm, am, symbols, rnnt_type, boundary, lms, ams)
    px, py = lattice_rows_fused_smoothed(
        lm, am, symbols, 0, lms, ams, boundary, rnnt_type, interpret=True
    )
    np.testing.assert_allclose(px, px_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(py, py_ref, rtol=1e-4, atol=1e-5)


def test_fused_smoothed_gradients_match_xla():
    """Covers the unigram-LM global coupling: d_lm flows through the
    batch-global mean via the kernel's d_uni accumulator.

    Cotangents are zeroed on the -inf px positions (the pad column and
    fix_for_boundary's te column) — the gradient contract both builds
    share for every REAL consumer (occupancy gradients are exactly 0 on
    -inf arcs).  With nonzero cotangents there the XLA build leaks an
    autodiff artifact (finite + -inf constant still propagates the
    cotangent into the finite term) that the fused build deliberately
    does not reproduce."""
    from fast_rnnt_tpu.ops.kernels.latbuild import lattice_rows_fused_smoothed

    rng = np.random.default_rng(6)
    B, T, S, C = 3, 70, 6, 25
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    px_ref, py_ref = _xla_smoothed(lm, am, symbols, "regular", boundary, 0.2, 0.1)
    cpx = jnp.asarray(rng.normal(size=px_ref.shape).astype(np.float32))
    cpy = jnp.asarray(rng.normal(size=py_ref.shape).astype(np.float32))
    cpx = jnp.where(jnp.isneginf(px_ref), 0.0, cpx)

    def scalar(build):
        def f(lm_, am_):
            px, py = build(lm_, am_)
            return jnp.sum(px * cpx) + jnp.sum(py * cpy)

        return jax.grad(f, argnums=(0, 1))(lm, am)

    g_ref = scalar(
        lambda l, a: _xla_smoothed(l, a, symbols, "regular", boundary, 0.2, 0.1)
    )
    g_fused = scalar(
        lambda l, a: lattice_rows_fused_smoothed(
            l, a, symbols, 0, 0.2, 0.1, boundary, "regular", interpret=True
        )
    )

    def serr(x, y):
        return np.max(np.abs(np.asarray(x) - np.asarray(y))) / max(
            np.max(np.abs(np.asarray(y))), 1e-6
        )

    assert serr(g_fused[0], g_ref[0]) < 1e-4, "lm grads differ"
    assert serr(g_fused[1], g_ref[1]) < 1e-4, "am grads differ"


def test_fused_smoothed_losses_path():
    """rnnt_loss_smoothed_pruned with the fused smoothed build must match
    the XLA-build pipeline (values + grads)."""
    from fast_rnnt_tpu import rnnt_loss_smoothed_pruned

    rng = np.random.default_rng(7)
    B, T, S, C = 3, 80, 6, 30
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)

    def pipeline(lm_, am_):
        sm, pr, _ = rnnt_loss_smoothed_pruned(
            lm_, am_, symbols, 0, 3, 0.2, 0.1, boundary, reduction="sum",
            impl="pallas",
        )
        return sm + pr

    lattice.set_lattice_build_impl("xla")
    try:
        ref, gref = jax.value_and_grad(pipeline, argnums=(0, 1))(lm, am)
    finally:
        lattice.set_lattice_build_impl("auto")
    lattice.set_lattice_build_impl("fused")
    try:
        out, gout = jax.value_and_grad(pipeline, argnums=(0, 1))(lm, am)
    finally:
        lattice.set_lattice_build_impl("auto")
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def serr(x, y):
        return np.max(np.abs(np.asarray(x) - np.asarray(y))) / max(
            np.max(np.abs(np.asarray(y))), 1e-6
        )

    assert serr(gout[0], gref[0]) < 1e-4
    assert serr(gout[1], gref[1]) < 1e-4


def test_fused_build_under_shard_map():
    """The fused build composes with shard_map: sharded values and
    gradients equal single-device.  check_vma=False here because the
    interpret-mode pallas lowering cannot thread varying-mesh-axes
    through its per-block dynamic_slice fetches (a jax hlo_interpreter
    limitation — its own error message prescribes this flag); the
    compiled TPU path carries vma at the pallas-call level via
    _out_struct, same as the wavefront kernels."""
    from jax.sharding import PartitionSpec as P
    from fast_rnnt_tpu.parallel import make_mesh, shard_batch
    import fast_rnnt_tpu as frt

    rng = np.random.default_rng(11)
    B, T, S, C = 8, 40, 4, 16
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    mesh = make_mesh()

    def local_loss(lm, am, symbols, boundary):
        s, p, _ = frt.rnnt_loss_simple_pruned(
            lm, am, symbols, 0, 3, boundary, reduction="sum", impl="pallas"
        )
        return jax.lax.psum(s + p, "data")

    lattice.set_lattice_build_impl("fused")
    try:
        mapped = jax.jit(
            jax.shard_map(
                local_loss,
                mesh=mesh,
                in_specs=(P("data"),) * 4,
                out_specs=P(),
                check_vma=False,
            )
        )
        args = shard_batch((lm, am, symbols, boundary), mesh)
        out = float(mapped(*args))
        s_ref, p_ref, _ = frt.rnnt_loss_simple_pruned(
            lm, am, symbols, 0, 3, boundary, reduction="sum", impl="pallas"
        )
        np.testing.assert_allclose(out, float(s_ref + p_ref), rtol=1e-4)

        # gradients survive the sharded VJP (the fused backward kernel):
        # differentiate THROUGH the shard_map (grad inside a
        # check_vma=False shard_map mistransposes the psum — a known
        # footgun unrelated to the kernels)
        g = jax.jit(
            jax.grad(
                lambda lm_, am_: jax.shard_map(
                    local_loss,
                    mesh=mesh,
                    in_specs=(P("data"),) * 4,
                    out_specs=P(),
                    check_vma=False,
                )(lm_, am_, args[2], args[3]),
                argnums=(0, 1),
            )
        )(args[0], args[1])
        def ref_loss(lm_, am_):
            s, p, _ = frt.rnnt_loss_simple_pruned(
                lm_, am_, symbols, 0, 3, boundary, reduction="sum",
                impl="pallas",
            )
            return s + p

        g_ref = jax.grad(ref_loss, argnums=(0, 1))(lm, am)
        np.testing.assert_allclose(
            np.asarray(g[0]), np.asarray(g_ref[0]), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(g[1]), np.asarray(g_ref[1]), rtol=1e-3, atol=1e-4
        )
    finally:
        lattice.set_lattice_build_impl("auto")


def test_fused_build_out_dtype_and_losses_path():
    """The fused build slots into the fused pipeline: forcing impl="fused"
    must reproduce the XLA-build pipeline's losses and gradients."""
    from fast_rnnt_tpu import rnnt_loss_simple_pruned

    rng = np.random.default_rng(4)
    B, T, S, C = 3, 80, 6, 30
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)

    def pipeline(lm_, am_):
        simple, pruned, _ = rnnt_loss_simple_pruned(
            lm_, am_, symbols, 0, 3, boundary, reduction="sum", impl="pallas"
        )
        return simple + pruned

    lattice.set_lattice_build_impl("xla")
    try:
        ref, gref = jax.value_and_grad(pipeline, argnums=(0, 1))(lm, am)
    finally:
        lattice.set_lattice_build_impl("auto")
    lattice.set_lattice_build_impl("fused")
    try:
        out, gout = jax.value_and_grad(pipeline, argnums=(0, 1))(lm, am)
    finally:
        lattice.set_lattice_build_impl("auto")
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gout[0], gref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gout[1], gref[1], rtol=1e-4, atol=1e-5)


def test_fused_build_nonzero_blank_matches_xla():
    """termination_symbol != 0: the kernel's blank column reads and the
    lm/am blank gathers must follow the id (ref rnnt_loss.py passes
    termination_symbol through to the [..., blank] gathers)."""
    rng = np.random.default_rng(11)
    B, T, S, C = 3, 96, 5, 33
    blank = 7
    lm, am, _, boundary = _inputs(rng, B, T, S, C)
    # symbols anywhere in the vocab except the blank id
    symbols = rng.integers(0, C - 1, size=(B, S)).astype(np.int32)
    symbols = jnp.asarray(np.where(symbols >= blank, symbols + 1, symbols))

    for rnnt_type in ("regular", "modified"):
        old = lattice._LATTICE_BUILD_IMPL
        lattice.set_lattice_build_impl("xla")
        try:
            px_ref, py_ref = lattice.get_rnnt_logprobs_rows(
                lm, am, symbols, blank, rnnt_type, boundary
            )
        finally:
            lattice.set_lattice_build_impl(old)
        px, py = lattice_rows_fused(
            lm, am, symbols, blank, rnnt_type, boundary, interpret=True
        )
        np.testing.assert_allclose(px, px_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(py, py_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("build_impl", ["xla", "fused"])
def test_nonzero_blank_relabel_invariance(build_impl):
    """Relabeling the vocabulary (swap ids 0 <-> k everywhere: logits
    columns, symbols, blank id) must leave loss and gradients unchanged —
    pins the build's blank handling against itself rather than against
    another implementation."""
    from fast_rnnt_tpu import rnnt_loss_simple

    rng = np.random.default_rng(12)
    B, T, S, C = 2, 72, 5, 21
    k = 9
    lm, am, _, boundary = _inputs(rng, B, T, S, C)
    symbols_np = rng.integers(1, C, size=(B, S)).astype(np.int32)
    symbols = jnp.asarray(symbols_np)

    swap = np.arange(C)
    swap[0], swap[k] = k, 0
    lm2 = lm[:, :, swap]
    am2 = am[:, :, swap]
    symbols2 = jnp.asarray(swap[symbols_np].astype(np.int32))

    def loss(lm_, am_, sym, blank):
        return rnnt_loss_simple(
            lm_, am_, sym, blank, boundary, reduction="sum",
            impl="pallas" if build_impl == "fused" else "xla",
        )

    old = lattice._LATTICE_BUILD_IMPL
    lattice.set_lattice_build_impl(build_impl)
    try:
        ref, (glm, gam) = jax.value_and_grad(loss, argnums=(0, 1))(
            lm, am, symbols, 0
        )
        out, (glm2, gam2) = jax.value_and_grad(loss, argnums=(0, 1))(
            lm2, am2, symbols2, k
        )
    finally:
        lattice.set_lattice_build_impl(old)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # gradients relabel with the same permutation
    np.testing.assert_allclose(glm2, glm[:, :, swap], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gam2, gam[:, :, swap], rtol=1e-4, atol=1e-6)


def test_auto_dispatch_size_crossover():
    """"auto" picks the XLA build below the measured B*T crossover and the
    fused kernels at/above it (BENCH.md "Fused lattice-build kernels");
    explicit "fused"/"xla" still force either way."""
    import jax.numpy as jnp

    from fast_rnnt_tpu.ops import lattice

    small = (jnp.zeros((2, 3, 8), jnp.float32),   # lm (B, S+1, C)
             jnp.zeros((2, 100, 8), jnp.float32),  # am: B*T = 200
             jnp.zeros((2, 2), jnp.int32))
    big = (jnp.zeros((64, 3, 8), jnp.float32),
           jnp.zeros((64, 1000, 8), jnp.float32),  # B*T = 64k
           jnp.zeros((64, 2), jnp.int32))
    # auto: size decides.  The CPU test process resolves the recursion
    # default to "xla", which would mask the size arm — stub the memo to
    # "pallas" so BOTH sides of the crossover are genuinely exercised
    # against the dispatch code.
    from fast_rnnt_tpu.ops import recursion

    prev = lattice._LATTICE_BUILD_IMPL
    prev_impl = recursion._DEFAULT_IMPL
    try:
        recursion._DEFAULT_IMPL = "pallas"
        lattice.set_lattice_build_impl("auto")
        assert not lattice._use_fused_build(*small)   # below crossover
        assert lattice._use_fused_build(*big)         # at/above crossover
        # forced modes ignore the threshold entirely
        lattice.set_lattice_build_impl("fused")
        assert lattice._use_fused_build(*small)
        lattice.set_lattice_build_impl("xla")
        assert not lattice._use_fused_build(*big)
    finally:
        lattice.set_lattice_build_impl(prev)
        recursion._DEFAULT_IMPL = prev_impl


def test_register_interpret_none_preserves_flag():
    """register(interpret=None) — the lazy registration path — must not
    clobber a previously selected interpret default (the multi-chip
    dry-run bug: a TPU-initialized process re-registering mid-trace
    silently flipped CPU-interpret back off)."""
    from fast_rnnt_tpu.ops.kernels import wavefront

    prev = wavefront._INTERPRET
    try:
        wavefront.register(default=False, interpret=True)
        assert wavefront._INTERPRET is True
        assert wavefront._interpret_default() is True  # shared by latbuild
        wavefront.register(default=False)  # lazy path: interpret=None
        assert wavefront._INTERPRET is True
        wavefront.register(default=False, interpret=False)
        assert wavefront._INTERPRET is False
        # False now FORCES compiled even on a CPU host (the TPU
        # cross-lowering gate's seam); None restores the auto backend check
        assert wavefront._interpret_default() is False
    finally:
        # direct restore: register(interpret=None) means "leave untouched",
        # so it cannot round-trip a saved None
        wavefront._INTERPRET = prev


def test_save_d_residual_parity_and_dispatch(monkeypatch):
    """f32 mode persists the normalizer D as a VJP residual (latbuild
    _SAVE_D); gradients must match the recompute path to the split-matmul
    approximation class (~2^-16: the residual is the forward's EXACT D,
    the recompute is the 2-part split), and bf16 mode must NOT take the
    residual path (single-pass recompute is cheaper than the traffic)."""
    from fast_rnnt_tpu.ops.kernels import latbuild as lb

    rng = np.random.default_rng(9)
    B, T, S, C = 3, 60, 5, 20
    lm, am, symbols, boundary = _inputs(rng, B, T, S, C)
    cpx_shape = (S, B, T + 1)
    cpy_shape = (S + 1, B, T)
    cpx = jnp.asarray(rng.normal(size=cpx_shape).astype(np.float32))
    cpy = jnp.asarray(rng.normal(size=cpy_shape).astype(np.float32))

    def grads(flag, a):
        monkeypatch.setattr(lb, "_SAVE_D", flag)
        def f(lm_, am_):
            px, py = lattice_rows_fused(
                lm_, am_, symbols, 0, "regular", boundary, interpret=True
            )
            return jnp.sum(px * cpx) + jnp.sum(py * cpy)
        return jax.grad(f, argnums=(0, 1))(lm, a)

    g_on = grads(True, am)
    g_off = grads(False, am)
    np.testing.assert_allclose(g_on[0], g_off[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_on[1], g_off[1], rtol=1e-4, atol=1e-5)

    # dispatch seam: f32 saves D, bf16 does not
    seen = {}
    real = lb._build_fwd_partitioned

    def spy(*args):
        seen[args[-1]] = True  # save_d is the last cache key
        return real(*args)

    monkeypatch.setattr(lb, "_SAVE_D", True)
    monkeypatch.setattr(lb, "_build_fwd_partitioned", spy)
    lattice_rows_fused(lm, am, symbols, 0, "regular", boundary,
                       interpret=True)
    assert seen.pop(True, False), "f32 build did not persist D"
    lattice_rows_fused(
        lm.astype(jnp.bfloat16), am.astype(jnp.bfloat16), symbols, 0,
        "regular", boundary, interpret=True,
    )
    assert seen.pop(False, False) and not seen, "bf16 build must recompute D"
