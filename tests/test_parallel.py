"""Data-parallel tests on the virtual 8-device CPU mesh (conftest sets
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fast_rnnt_tpu as frt
from fast_rnnt_tpu.parallel import (
    data_parallel,
    data_parallel_value_and_grad,
    make_mesh,
    shard_batch,
)


def _inputs(rng, B=8, T=10, S=4, C=12):
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(0, C, size=(B, S)).astype(np.int32))
    boundary = jnp.asarray(
        np.stack(
            [
                np.zeros(B, np.int32),
                np.zeros(B, np.int32),
                np.full(B, S, np.int32),
                np.full(B, T, np.int32),
            ],
            axis=1,
        )
    )
    return lm, am, symbols, boundary


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_data_parallel_loss_matches_single_device():
    rng = np.random.default_rng(0)
    lm, am, symbols, boundary = _inputs(rng)
    mesh = make_mesh()

    def loss_fn(lm, am, symbols, boundary):
        return frt.rnnt_loss_simple(
            lm, am, symbols, 0, boundary, reduction="none"
        )

    ref = loss_fn(lm, am, symbols, boundary)
    dp_fn = data_parallel(loss_fn, mesh)
    args = shard_batch((lm, am, symbols, boundary), mesh)
    out = dp_fn(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_data_parallel_sum_reduction():
    rng = np.random.default_rng(1)
    lm, am, symbols, boundary = _inputs(rng)
    mesh = make_mesh()

    def loss_fn(lm, am, symbols, boundary):
        return frt.rnnt_loss_simple(lm, am, symbols, 0, boundary, reduction="sum")

    ref = loss_fn(lm, am, symbols, boundary)
    dp_fn = data_parallel(loss_fn, mesh, reduce_outputs=True)
    args = shard_batch((lm, am, symbols, boundary), mesh)
    out = dp_fn(*args)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4)


def test_data_parallel_value_and_grad_matches():
    """Toy trainable model: params scale am/lm; grads must psum to the same
    values as single-device value_and_grad."""
    rng = np.random.default_rng(2)
    lm, am, symbols, boundary = _inputs(rng)
    mesh = make_mesh()
    params = {
        "w_am": jnp.ones((am.shape[2],), jnp.float32),
        "w_lm": jnp.ones((lm.shape[2],), jnp.float32),
    }

    def loss_fn(params, lm, am, symbols, boundary):
        return frt.rnnt_loss_simple(
            lm * params["w_lm"], am * params["w_am"], symbols, 0, boundary,
            reduction="sum",
        )

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
        params, lm, am, symbols, boundary
    )
    step = data_parallel_value_and_grad(loss_fn, mesh)
    batch = shard_batch((lm, am, symbols, boundary), mesh)
    loss, grads = step(params, *batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_grads[k]), rtol=1e-3, atol=1e-4
        )


def test_pruned_pipeline_under_pjit_sharding():
    """The whole pruned pipeline jit-compiles with batch-sharded inputs
    (GSPMD propagation through scans, gathers and the recursion)."""
    rng = np.random.default_rng(3)
    lm, am, symbols, boundary = _inputs(rng)
    mesh = make_mesh()

    @jax.jit
    def pipeline(lm, am, symbols, boundary):
        _, (pxg, pyg) = frt.rnnt_loss_simple(
            lm, am, symbols, 0, boundary, reduction="none", calc_gradients=True
        )
        ranges = frt.get_rnnt_prune_ranges(pxg, pyg, boundary, 3)
        am_p, lm_p = frt.do_rnnt_pruning(am, lm, ranges)
        return frt.rnnt_loss_pruned(
            am_p + lm_p, symbols, ranges, 0, boundary, reduction="none"
        )

    ref = pipeline(lm, am, symbols, boundary)
    args = shard_batch((lm, am, symbols, boundary), mesh)
    out = pipeline(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_primal_scan_paths_under_shard_map():
    """The scores-only recursion (carry-harvest scan) and viterbi_scores
    must run under shard_map and match single-device.  Regression test for
    the scan carry init: a carry built with jnp.full loses the operands'
    varying-mesh-axes and fails shard_map carry-structure checking."""
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(12)
    B, S, T = 8, 5, 9
    px = jnp.asarray(rng.normal(size=(B, S, T + 1)).astype(np.float32))
    py = jnp.asarray(rng.normal(size=(B, S + 1, T)).astype(np.float32))
    boundary = jnp.stack(
        [
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.asarray(rng.integers(1, S + 1, size=B), jnp.int32),
            jnp.asarray(rng.integers(1, T + 1, size=B), jnp.int32),
        ],
        axis=1,
    )
    mesh = make_mesh()
    specs = (P("data"), P("data"), P("data"))

    for fn in (
        lambda a, b, c: frt.mutual_information_recursion(a, b, c),
        lambda a, b, c: frt.viterbi_scores(a, b, c),
    ):
        ref = fn(px, py, boundary)
        out = jax.jit(
            jax.shard_map(fn, mesh=mesh, in_specs=specs, out_specs=P("data"))
        )(*shard_batch((px, py, boundary), mesh))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_fused_pipeline_under_shard_map():
    """The flagship fused pipeline (rnnt_loss_simple_pruned) under an
    explicit shard_map over the 8-device mesh matches single-device, and
    its gradients survive the psum path."""
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(9)
    lm, am, symbols, boundary = _inputs(rng, B=8)
    mesh = make_mesh()

    def local_loss(lm, am, symbols, boundary):
        s, p, _ = frt.rnnt_loss_simple_pruned(
            lm, am, symbols, 0, 3, boundary, reduction="sum"
        )
        total = 0.5 * s + p
        return jax.lax.psum(total, "data")

    mapped = jax.jit(
        jax.shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data")),
            out_specs=P(),
        )
    )
    args = shard_batch((lm, am, symbols, boundary), mesh)
    out = float(mapped(*args))
    s_ref, p_ref, _ = frt.rnnt_loss_simple_pruned(
        lm, am, symbols, 0, 3, boundary, reduction="sum"
    )
    np.testing.assert_allclose(out, float(0.5 * s_ref + p_ref), rtol=1e-4)

    # gradients through the sharded pipeline
    g = jax.jit(
        jax.shard_map(
            jax.grad(local_loss, argnums=(0, 1)),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
        )
    )(*args)
    def ref_loss(lm, am):
        s, p, _ = frt.rnnt_loss_simple_pruned(
            lm, am, symbols, 0, 3, boundary, reduction="sum"
        )
        return 0.5 * s + p

    g_ref = jax.grad(ref_loss, argnums=(0, 1))(lm, am)
    np.testing.assert_allclose(
        np.asarray(g[0]), np.asarray(g_ref[0]), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g[1]), np.asarray(g_ref[1]), rtol=1e-3, atol=1e-4
    )


def test_fused_pipeline_bf16_lattice_under_shard_map():
    """The production mode (bf16 lattice storage) must shard like fp32:
    data-parallel value == single-device value."""
    import fast_rnnt_tpu as frt
    from fast_rnnt_tpu.parallel import data_parallel, make_mesh, shard_batch

    rng = np.random.default_rng(123)
    B, T, S, C = 8, 12, 5, 16
    am = rng.normal(size=(B, T, C)).astype(np.float32)
    lm = rng.normal(size=(B, S + 1, C)).astype(np.float32)
    symbols = rng.integers(1, C, size=(B, S)).astype(np.int32)
    boundary = np.tile(np.array([0, 0, S, T], np.int32), (B, 1))

    def loss(lm, am, symbols, boundary):
        s, p, _ = frt.rnnt_loss_simple_pruned(
            lm, am, symbols, 0, 3, boundary, reduction="none",
            lattice_dtype=jnp.bfloat16,
        )
        return s + p

    single = np.asarray(loss(*map(jnp.asarray, (lm, am, symbols, boundary))))

    mesh = make_mesh()
    fn = data_parallel(loss, mesh)
    batch = shard_batch((lm, am, symbols, boundary), mesh)
    sharded = np.asarray(fn(*batch))
    np.testing.assert_allclose(sharded, single, rtol=2e-2, atol=2e-2)
