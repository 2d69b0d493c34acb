"""End-to-end model test: overfit one batch, then greedy-decode it back.

This is the strongest correctness statement the framework can make about
itself: the two-stage pruned loss trains a real (tiny) conformer
transducer to memorize a batch, and batched greedy search recovers the
exact target symbol sequences.  (The reference has no model or decoding
layer at all — loss-only; SURVEY.md §2.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fast_rnnt_tpu.models import (
    LossConfig,
    TransducerConfig,
    greedy_search,
    init_model,
    make_train_step,
    modified_beam_search,
)
from fast_rnnt_tpu.parallel import make_mesh, shard_batch


@pytest.mark.slow
def test_overfit_then_greedy_decode_recovers_targets():
    # 200 optimizer steps on the one slow CI core; the default suite covers
    # decode mechanics (below) and training convergence (test_models)
    cfg = TransducerConfig(
        vocab_size=16, feature_dim=8, d_model=32, d_joiner=32,
        num_layers=1, num_heads=2, conv_kernel=7, dtype=jnp.float32,
    )
    model, params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T_in, S = 2, 32, 4
    feats = jnp.asarray(rng.normal(size=(B, T_in, cfg.feature_dim)).astype(np.float32))
    flens = jnp.full((B,), T_in, jnp.int32)
    syms = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, S)).astype(np.int32))
    slens = jnp.full((B,), S, jnp.int32)

    mesh = make_mesh(jax.devices()[:1])
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, mesh=mesh, loss_cfg=LossConfig(s_range=3))
    batch = shard_batch((feats, flens, syms, slens), mesh)

    first = None
    for i in range(201):
        params, opt_state, metrics = step(params, opt_state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.05 * first, f"no convergence: {first} -> {last}"

    hyps, hlens = jax.jit(
        lambda f, l: greedy_search(model, params, f, l, max_len=8)
    )(feats, flens)
    np.testing.assert_array_equal(np.asarray(hlens), [S, S])
    np.testing.assert_array_equal(np.asarray(hyps)[:, :S], np.asarray(syms))

    # modified beam search must also recover the targets (and agree with
    # greedy on an overfit model)
    bh, bl = jax.jit(
        lambda f, l: modified_beam_search(model, params, f, l, beam=4, max_len=8)
    )(feats, flens)
    np.testing.assert_array_equal(np.asarray(bl), [S, S])
    np.testing.assert_array_equal(np.asarray(bh)[:, :S], np.asarray(syms))


def test_greedy_search_static_shapes_and_jit():
    cfg = TransducerConfig(
        vocab_size=12, feature_dim=6, d_model=16, d_joiner=16,
        num_layers=1, num_heads=2, conv_kernel=7, dtype=jnp.float32,
    )
    model, params = init_model(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(3, 24, 6)).astype(np.float32))
    lens = jnp.asarray([24, 16, 8], jnp.int32)
    hyps, hlens = greedy_search(model, params, feats, lens, max_len=10)
    assert hyps.shape == (3, 10) and hlens.shape == (3,)
    assert int(hlens.max()) <= 10 and int(hlens.min()) >= 0
    hj, lj = jax.jit(lambda f, l: greedy_search(model, params, f, l, max_len=10))(
        feats, lens
    )
    np.testing.assert_array_equal(np.asarray(hyps), np.asarray(hj))
    np.testing.assert_array_equal(np.asarray(hlens), np.asarray(lj))
