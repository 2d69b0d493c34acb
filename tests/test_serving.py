"""Continuous-batching stream server: EXACT parity with offline decoding.

The server multiplexes streams of different lengths onto a fixed slot
batch, admitting queued streams into slots freed mid-run
(models/serving.py).  Because a slot reset restores the exact
streaming_init leaves and the per-stream counters (encoder ``seen``
warmup, ``decoded_t``) are slot-local, every stream must decode to
EXACTLY the tokens offline decoding produces — regardless of which slot
it lands in, what decoded there before, or when it was admitted.
(No reference equivalent: the reference ships no inference; SURVEY.md §2.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu.models import (
    StreamServer,
    StreamingConfig,
    TransducerConfig,
    greedy_search,
    init_model,
    modified_beam_search,
    streaming_init,
    streaming_reset,
    streaming_step,
)


def _causal_cfg(**kw):
    base = dict(
        vocab_size=12, feature_dim=6, d_model=16, d_joiner=16,
        num_layers=2, num_heads=2, conv_kernel=7, dtype=jnp.float32,
        causal=True, attention_left_context=4,
    )
    base.update(kw)
    return TransducerConfig(**base)


def _utts(cfg, lengths, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.normal(size=(L, cfg.feature_dim)).astype(np.float32)
        for L in lengths
    ]


def _offline_greedy(model, params, utts, max_len=64):
    T = max(len(u) for u in utts)
    feats = np.zeros((len(utts), T, utts[0].shape[1]), np.float32)
    for i, u in enumerate(utts):
        feats[i, : len(u)] = u
    flens = jnp.asarray([len(u) for u in utts], jnp.int32)
    hyps, lens = jax.jit(
        lambda f, l: greedy_search(model, params, f, l, max_len=max_len)
    )(jnp.asarray(feats), flens)
    h, l = np.asarray(hyps), np.asarray(lens)
    return {i: h[i, : l[i]] for i in range(len(utts))}


def test_server_matches_offline_with_slot_churn():
    """7 ragged streams through 2 slots: every slot is reused (some twice),
    admissions land mid-run in slots at arbitrary decode positions."""
    cfg = _causal_cfg()
    model, params = init_model(jax.random.PRNGKey(0), cfg)
    lengths = [96, 40, 64, 24, 88, 56, 32]
    utts = _utts(cfg, lengths)
    want = _offline_greedy(model, params, utts)

    server = StreamServer(
        model, params, StreamingConfig(chunk=16, max_len=64), capacity=2
    )
    for i, u in enumerate(utts):
        server.submit(i, u)
    got = server.run()

    assert set(got) == set(want)
    total = 0
    for i in want:
        np.testing.assert_array_equal(got[i], want[i])
        total += len(want[i])
    assert total > 0, "degenerate test: nothing was emitted"


def test_server_beam_matches_offline():
    cfg = _causal_cfg()
    model, params = init_model(jax.random.PRNGKey(1), cfg)
    lengths = [64, 32, 48]
    utts = _utts(cfg, lengths, seed=1)

    T = max(lengths)
    feats = np.zeros((len(utts), T, cfg.feature_dim), np.float32)
    for i, u in enumerate(utts):
        feats[i, : len(u)] = u
    off_hyps, off_lens = jax.jit(
        lambda f, l: modified_beam_search(model, params, f, l, beam=2, max_len=48)
    )(jnp.asarray(feats), jnp.asarray(lengths, jnp.int32))
    oh, ol = np.asarray(off_hyps), np.asarray(off_lens)

    server = StreamServer(
        model, params,
        StreamingConfig(chunk=16, max_len=48, beam=2), capacity=2,
    )
    for i, u in enumerate(utts):
        server.submit(i, u)
    got = server.run()
    for i in range(len(utts)):
        np.testing.assert_array_equal(got[i], oh[i, : ol[i]])


def test_feed_as_you_go_stream_is_exact():
    """final=False + extend(): audio arrives in odd-sized pieces (incl.
    sub-chunk stalls, which must freeze the slot, not pollute it with
    padding); tokens still match offline exactly."""
    cfg = _causal_cfg()
    model, params = init_model(jax.random.PRNGKey(2), cfg)
    (utt,) = _utts(cfg, [70], seed=2)
    want = _offline_greedy(model, params, [utt])[0]

    server = StreamServer(
        model, params, StreamingConfig(chunk=16, max_len=64), capacity=2
    )
    # a second, finite stream keeps the batch busy while stream "live"
    # stalls — exercises frozen-slot neighbors making progress
    (other,) = _utts(cfg, [60], seed=3)
    want_other = _offline_greedy(model, params, [other])[0]
    server.submit("live", utt[:10], final=False)
    server.submit("other", other)

    pieces = [utt[10:22], utt[22:23], utt[23:61], utt[61:]]
    done = {}
    for p in pieces:
        done.update(server.step())
        server.extend("live", p)
    server.finish("live")
    done.update(server.run())

    np.testing.assert_array_equal(done["live"], want)
    np.testing.assert_array_equal(done["other"], want_other)
    assert len(want) > 0


def test_run_raises_instead_of_spinning_on_open_stream():
    cfg = _causal_cfg(num_layers=1)
    model, params = init_model(jax.random.PRNGKey(3), cfg)
    server = StreamServer(
        model, params, StreamingConfig(chunk=8, max_len=16), capacity=1
    )
    server.submit("open", np.zeros((4, cfg.feature_dim), np.float32),
                  final=False)
    with pytest.raises(RuntimeError, match="final=False"):
        server.run()


def test_server_step_shards_over_mesh():
    """Serving scales horizontally like training: the server's device
    program (slot reset + streaming step) under shard_map with slots
    sharded over the 8-device mesh produces exactly the single-device
    states/tokens (slots are independent; there is no cross-slot math)."""
    from fast_rnnt_tpu.parallel import data_parallel, make_mesh, shard_batch

    cfg = _causal_cfg(num_layers=1)
    model, params = init_model(jax.random.PRNGKey(5), cfg)
    scfg = StreamingConfig(chunk=8, max_len=16)
    B = 8
    rng = np.random.default_rng(5)
    state = streaming_init(model, scfg, B)
    reset = jnp.asarray(np.arange(B) % 3 == 0)
    feats = jnp.asarray(rng.normal(size=(B, 8, cfg.feature_dim)), jnp.float32)
    lens = jnp.asarray(rng.integers(0, 9, size=(B,)).astype(np.int32))

    def fn(st, rs, fc, cl):
        st = streaming_reset(model, scfg, st, rs)
        return streaming_step(model, params, scfg, st, fc, cl)

    ref_state, (ref_hyps, ref_lens) = jax.jit(fn)(state, reset, feats, lens)

    mesh = make_mesh()
    sharded = data_parallel(fn, mesh)
    args = shard_batch((state, reset, feats, lens), mesh)
    got_state, (got_hyps, got_lens) = sharded(*args)

    np.testing.assert_array_equal(np.asarray(got_hyps), np.asarray(ref_hyps))
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(ref_lens))
    for ref, got in zip(
        jax.tree_util.tree_leaves(ref_state),
        jax.tree_util.tree_leaves(got_state),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=0
        )


def test_streaming_reset_restores_fresh_state_per_slot():
    """Direct unit check of the primitive: run a few chunks, reset slot 0,
    and compare every leaf — slot 0 equals streaming_init, slot 1 equals
    the advanced state."""
    cfg = _causal_cfg(num_layers=1)
    model, params = init_model(jax.random.PRNGKey(4), cfg)
    scfg = StreamingConfig(chunk=8, max_len=16)
    B = 2
    state = streaming_init(model, scfg, B)
    rng = np.random.default_rng(4)
    for _ in range(3):
        fc = jnp.asarray(rng.normal(size=(B, 8, cfg.feature_dim)), jnp.float32)
        state, _ = streaming_step(
            model, params, scfg, state, fc, jnp.full((B,), 8, jnp.int32)
        )
    reset = jnp.asarray([True, False])
    out = streaming_reset(model, scfg, state, reset)
    fresh = streaming_init(model, scfg, B)

    flat_out = jax.tree_util.tree_leaves_with_path(out)
    flat_fresh = dict(jax.tree_util.tree_leaves_with_path(fresh))
    flat_old = dict(jax.tree_util.tree_leaves_with_path(state))
    assert len(flat_out) == len(flat_fresh) == len(flat_old)
    for path, leaf in flat_out:
        np.testing.assert_array_equal(
            np.asarray(leaf[0]), np.asarray(flat_fresh[path][0]),
            err_msg=f"slot 0 not fresh at {path}",
        )
        np.testing.assert_array_equal(
            np.asarray(leaf[1]), np.asarray(flat_old[path][1]),
            err_msg=f"slot 1 was disturbed at {path}",
        )
    # sanity: the advanced state actually differs from fresh somewhere
    assert any(
        not np.array_equal(np.asarray(l[1]), np.asarray(flat_fresh[p][1]))
        for p, l in flat_out
    )
