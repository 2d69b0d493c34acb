"""Pruned-transducer model + training-step tests (BASELINE config #5 shape,
tiny dims), single-device and data-parallel on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fast_rnnt_tpu.models import (
    LossConfig,
    TransducerConfig,
    init_model,
    make_train_step,
    pruned_transducer_loss,
)
from fast_rnnt_tpu.parallel import make_mesh, shard_batch

CFG = TransducerConfig(
    vocab_size=32,
    feature_dim=8,
    d_model=16,
    d_joiner=16,
    num_layers=1,
    num_heads=2,
    conv_kernel=7,
    dtype=jnp.float32,
)


def _batch(rng, B=8, T_in=32, S=6):
    feats = jnp.asarray(rng.normal(size=(B, T_in, CFG.feature_dim)).astype(np.float32))
    feat_lens = jnp.asarray(
        np.clip(rng.integers(T_in // 2, T_in + 1, size=B), 28, T_in).astype(np.int32)
    )
    syms = jnp.asarray(rng.integers(1, CFG.vocab_size, size=(B, S)).astype(np.int32))
    sym_lens = jnp.asarray(rng.integers(2, S + 1, size=B).astype(np.int32))
    return feats, feat_lens, syms, sym_lens


def test_model_init_and_loss():
    rng = np.random.default_rng(0)
    model, params = init_model(jax.random.PRNGKey(0), CFG)
    batch = _batch(rng)
    loss, metrics = pruned_transducer_loss(
        params, model, *batch, LossConfig(s_range=3)
    )
    assert np.isfinite(float(loss))
    assert float(metrics["pruned_loss"]) > 0
    assert float(metrics["simple_loss"]) > 0
    # every submodule got params
    names = set(params["params"].keys())
    assert {"encoder", "predictor", "am_proj", "lm_proj", "joiner"} <= names


def test_train_step_single_device_decreases_loss():
    rng = np.random.default_rng(1)
    model, params = init_model(jax.random.PRNGKey(1), CFG)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, mesh=None, loss_cfg=LossConfig(s_range=3))
    batch = _batch(rng)
    _, _, m0 = step(params, opt_state, batch)
    p, s = params, opt_state
    for _ in range(5):
        p, s, m = step(p, s, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_train_step_data_parallel_matches_single():
    rng = np.random.default_rng(2)
    model, params = init_model(jax.random.PRNGKey(2), CFG)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    batch = _batch(rng)

    step1 = make_train_step(model, opt, mesh=None, loss_cfg=LossConfig(s_range=3))
    p1, s1, m1 = step1(params, opt_state, batch)

    mesh = make_mesh()
    stepN = make_train_step(model, opt, mesh=mesh, loss_cfg=LossConfig(s_range=3))
    pN, sN, mN = stepN(params, opt_state, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]), rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(p1)
    flatN = jax.tree_util.tree_leaves(pN)
    for a, b in zip(flat1, flatN):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
