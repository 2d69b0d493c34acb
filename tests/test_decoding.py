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


# --- beam search pinned against exhaustive hypothesis enumeration ------------
#
# VERDICT r3 item 7: pin modified_beam_search the way viterbi is pinned
# (tests/test_alignment.py's brute-force enumerator).  The semantics being
# pinned: per frame each hypothesis extends with blank (stay) or ONE symbol,
# scored by log_softmax of the joiner; identical symbol sequences merge
# their path mass with logsumexp (icefall modified_beam_search).  With
# beam >= the number of distinct sequences the search is exhaustive and
# must return the exact posterior-merged argmax.


def _tiny_beam_model(seed=0):
    cfg = TransducerConfig(
        vocab_size=4, feature_dim=4, d_model=8, d_joiner=8,
        num_layers=1, num_heads=2, conv_kernel=3, dtype=jnp.float32,
    )
    model, params = init_model(jax.random.PRNGKey(seed), cfg)
    return cfg, model, params


def _enumerate_all_hypotheses(model, params, am, blank):
    """Exhaustive DP over every per-frame emission choice, merging equal
    symbol sequences with (f64) logsumexp.  Returns {seq tuple: score}."""
    from fast_rnnt_tpu.models.decoding import _predictor_last

    cfg = model.cfg
    k = max(cfg.predictor_context, 1)
    C = cfg.vocab_size
    T = am.shape[0]

    lm_cache = {}

    def logp_row(prefix, t):
        ctx = (((blank,) * k) + prefix)[-k:]
        if ctx not in lm_cache:
            ctx_arr = jnp.asarray(np.array(ctx, np.int32)[None, :])
            lm_cache[ctx] = _predictor_last(model, params, ctx_arr)[0]
        lm_row = lm_cache[ctx]
        logits = model.apply(
            params,
            am[t].reshape(1, 1, 1, -1),
            lm_row.reshape(1, 1, 1, -1),
            method=type(model).join,
        )[0, 0, 0]
        return np.asarray(jax.nn.log_softmax(logits), np.float64)

    alive = {(): 0.0}
    for t in range(T):
        new = {}
        for prefix, score in alive.items():
            lp = logp_row(prefix, t)
            exts = [(prefix, lp[blank])] + [
                (prefix + (c,), lp[c]) for c in range(C) if c != blank
            ]
            for seq, inc in exts:
                s = score + inc
                new[seq] = np.logaddexp(new[seq], s) if seq in new else s
        alive = new
    return alive


def _run_beam(model, params, am, beam):
    from fast_rnnt_tpu.models.decoding import (
        beam_best,
        beam_init_state,
        beam_over_frames,
    )

    T = am.shape[0]
    state = beam_init_state(model.cfg, 1, beam, max_len=T)
    scores, ctx, hyps, lens = beam_over_frames(
        model, params, am[None], jnp.ones((1, T), bool), *state
    )
    best_hyps, best_lens = beam_best(scores, hyps, lens)
    L = int(best_lens[0])
    return (
        tuple(np.asarray(best_hyps[0][:L]).tolist()),
        float(jnp.max(scores)),
    )


def test_modified_beam_search_exhaustive_small():
    """beam >= #distinct sequences => the search must return the exact
    posterior-merged best sequence AND its merged score."""
    cfg, model, params = _tiny_beam_model(seed=2)
    rng = np.random.default_rng(2)
    T, C = 3, cfg.vocab_size
    # scaled-up am so per-frame decisions are not near-ties
    am = jnp.asarray(3.0 * rng.normal(size=(T, cfg.d_joiner)).astype(np.float32))
    blank = cfg.blank_id

    exhaustive = _enumerate_all_hypotheses(model, params, am, blank)
    n_seqs = len(exhaustive)  # sum_{l<=T} (C-1)^l = 40 for T=3, C=4
    assert n_seqs == sum((C - 1) ** l for l in range(T + 1))
    best_seq = max(exhaustive, key=exhaustive.get)
    best_score = exhaustive[best_seq]

    got_seq, got_score = _run_beam(model, params, am, beam=n_seqs)
    assert got_seq == best_seq, (got_seq, best_seq)
    np.testing.assert_allclose(got_score, best_score, rtol=1e-5, atol=1e-5)


def test_modified_beam_search_monotone_in_beam_width():
    """Narrow beams return valid (enumerator-scored) sequences whose score
    never exceeds the exhaustive optimum, and the returned score is
    self-consistent: it must match a logsumexp over SOME subset of that
    sequence's paths, hence <= the enumerator's merged score for it."""
    cfg, model, params = _tiny_beam_model(seed=5)
    rng = np.random.default_rng(5)
    T = 3
    am = jnp.asarray(3.0 * rng.normal(size=(T, cfg.d_joiner)).astype(np.float32))
    blank = cfg.blank_id

    exhaustive = _enumerate_all_hypotheses(model, params, am, blank)
    opt = max(exhaustive.values())
    eps = 1e-4

    prev = -np.inf
    for beam in (1, 2, 4, 8, len(exhaustive)):
        seq, score = _run_beam(model, params, am, beam)
        assert seq in exhaustive, f"beam={beam} returned impossible seq {seq}"
        assert score <= exhaustive[seq] + eps, (
            f"beam={beam}: merged score {score} exceeds the full posterior "
            f"{exhaustive[seq]} for {seq}"
        )
        assert score <= opt + eps
        assert score >= prev - eps, (
            f"beam={beam}: best score {score} dropped below narrower-beam "
            f"result {prev}"
        )
        prev = score
    np.testing.assert_allclose(prev, opt, rtol=1e-5, atol=1e-5)
