"""Chunked streaming inference: EXACT parity with offline decoding.

With a causal encoder (causal subsampling + conv modules, attention
limited to a left window), an output frame's receptive field is bounded;
once the streaming buffer keeps at least that many frames of history,
chunk-by-chunk decoding must reproduce offline greedy decoding EXACTLY —
token for token — not approximately.  (No reference equivalent: the
reference ships no inference; SURVEY.md §2.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu.models import (
    StreamingConfig,
    TransducerConfig,
    greedy_search,
    init_model,
    streaming_init,
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


def test_streaming_matches_offline_exactly():
    cfg = _causal_cfg()
    model, params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 3, 152
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.feature_dim)).astype(np.float32))
    # ragged stream lengths, one ending mid-chunk
    flens = jnp.asarray(np.array([T, T - 20, T - 39], np.int32))

    off_hyps, off_lens = jax.jit(
        lambda f, l: greedy_search(model, params, f, l, max_len=64)
    )(feats, flens)

    # receptive field per conformer layer <= 4*(attn_left + conv_k - 1)
    # input frames; left=128 covers 2 layers comfortably
    scfg = StreamingConfig(chunk=16, left=128, max_len=64)
    state = streaming_init(model, scfg, B)
    step = jax.jit(
        lambda st, fc, cl: streaming_step(model, params, scfg, st, fc, cl)
    )
    n_chunks = -(-T // scfg.chunk)
    Tp = n_chunks * scfg.chunk
    feats_pad = jnp.pad(feats, ((0, 0), (0, Tp - T), (0, 0)))
    for i in range(n_chunks):
        fc = feats_pad[:, i * scfg.chunk : (i + 1) * scfg.chunk]
        cl = jnp.clip(flens - i * scfg.chunk, 0, scfg.chunk)
        state, (hyps, lens) = step(state, fc, cl)

    np.testing.assert_array_equal(np.asarray(lens), np.asarray(off_lens))
    np.testing.assert_array_equal(np.asarray(hyps), np.asarray(off_hyps))
    assert int(off_lens.max()) > 0, "degenerate test: nothing was emitted"


def test_streaming_one_compile_many_chunks():
    """All chunks run through ONE jitted step (static shapes; traced
    scalars carry the buffer fill level)."""
    cfg = _causal_cfg(num_layers=1)
    model, params = init_model(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B = 2
    scfg = StreamingConfig(chunk=8, left=48, max_len=32)
    state = streaming_init(model, scfg, B)

    compiled = {"n": 0}

    def stepper(st, fc, cl):
        compiled["n"] += 1
        return streaming_step(model, params, scfg, st, fc, cl)

    step = jax.jit(stepper)
    for _ in range(7):
        fc = jnp.asarray(rng.normal(size=(B, 8, cfg.feature_dim)).astype(np.float32))
        state, _ = step(state, fc, jnp.full((B,), 8, jnp.int32))
    assert compiled["n"] == 1, f"retraced {compiled['n']} times"


def test_streaming_requires_causal_encoder():
    cfg = TransducerConfig(
        vocab_size=8, feature_dim=4, d_model=8, d_joiner=8,
        num_layers=1, num_heads=1, dtype=jnp.float32, causal=False,
    )
    model, _ = init_model(jax.random.PRNGKey(2), cfg)
    with pytest.raises(ValueError, match="causal"):
        streaming_init(model, StreamingConfig(chunk=8, left=32), 1)


def test_streaming_config_validation():
    with pytest.raises(ValueError, match="multiple of 4"):
        StreamingConfig(chunk=10)
    # `left` is a deprecated no-op (the stateful encoder carries exact
    # history) — any value is accepted and ignored
    StreamingConfig(chunk=16, left=40)


@pytest.mark.parametrize("chunk", [8, 32, 4])
def test_streaming_parity_config_sweep(chunk):
    """Parity must hold for ANY chunk size — the stateful encoder carries
    exact per-layer history, so there is no receptive-field condition."""
    cfg = _causal_cfg(num_layers=1, attention_left_context=3)
    model, params = init_model(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(chunk)
    B, T = 2, 96
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.feature_dim)).astype(np.float32))
    flens = jnp.asarray(np.array([T, T - 11], np.int32))

    off_hyps, off_lens = greedy_search(model, params, feats, flens, max_len=48)

    scfg = StreamingConfig(chunk=chunk, max_len=48)
    state = streaming_init(model, scfg, B)
    step = jax.jit(
        lambda st, fc, cl: streaming_step(model, params, scfg, st, fc, cl)
    )
    n_chunks = -(-T // scfg.chunk)
    Tp = n_chunks * scfg.chunk
    feats_pad = jnp.pad(feats, ((0, 0), (0, Tp - T), (0, 0)))
    hyps = lens = None
    for i in range(n_chunks):
        fc = feats_pad[:, i * scfg.chunk : (i + 1) * scfg.chunk]
        cl = jnp.clip(flens - i * scfg.chunk, 0, scfg.chunk)
        state, (hyps, lens) = step(state, fc, cl)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(off_lens))
    np.testing.assert_array_equal(np.asarray(hyps), np.asarray(off_hyps))


def test_streaming_exact_with_large_receptive_field_and_tiny_chunks():
    """The round-2 design needed `left >= receptive field` for parity;
    the stateful encoder must be exact even when a single chunk is far
    smaller than the receptive field (deep stack, wide attention, long
    conv kernels, chunk=4)."""
    cfg = _causal_cfg(num_layers=2, attention_left_context=16, conv_kernel=15)
    model, params = init_model(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    B, T = 2, 64
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.feature_dim)).astype(np.float32))
    flens = jnp.asarray(np.array([T, T - 9], np.int32))
    off_hyps, off_lens = greedy_search(model, params, feats, flens, max_len=32)

    scfg = StreamingConfig(chunk=4, max_len=32)
    state = streaming_init(model, scfg, B)
    step = jax.jit(
        lambda st, fc, cl: streaming_step(model, params, scfg, st, fc, cl)
    )
    hyps = lens = None
    for i in range(T // scfg.chunk):
        fc = feats[:, i * scfg.chunk : (i + 1) * scfg.chunk]
        cl = jnp.clip(flens - i * scfg.chunk, 0, scfg.chunk)
        state, (hyps, lens) = step(state, fc, cl)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(off_lens))
    np.testing.assert_array_equal(np.asarray(hyps), np.asarray(off_hyps))


def test_streaming_beam_matches_offline_beam():
    """StreamingConfig(beam=H): the streamed modified beam search must
    reproduce offline modified_beam_search exactly (the beam state —
    scores, contexts, hypotheses — is carried across chunk boundaries)."""
    from fast_rnnt_tpu.models import modified_beam_search

    cfg = _causal_cfg()
    model, params = init_model(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    B, T = 2, 128
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.feature_dim)).astype(np.float32))
    flens = jnp.asarray(np.array([T, T - 17], np.int32))

    off_hyps, off_lens = jax.jit(
        lambda f, l: modified_beam_search(model, params, f, l, beam=4, max_len=48)
    )(feats, flens)

    scfg = StreamingConfig(chunk=16, left=96, max_len=48, beam=4)
    state = streaming_init(model, scfg, B)
    step = jax.jit(
        lambda st, fc, cl: streaming_step(model, params, scfg, st, fc, cl)
    )
    hyps = lens = None
    for i in range(T // scfg.chunk):
        fc = feats[:, i * scfg.chunk : (i + 1) * scfg.chunk]
        cl = jnp.clip(flens - i * scfg.chunk, 0, scfg.chunk)
        state, (hyps, lens) = step(state, fc, cl)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(off_lens))
    np.testing.assert_array_equal(np.asarray(hyps), np.asarray(off_hyps))


def test_causal_without_left_context_is_still_causal():
    """causal=True with attention_left_context=None must apply a pure
    causal (kk <= q) attention mask — never attend to the future (ADVICE
    r2: transducer.py).  Perturbing future input frames must not change
    earlier encoder outputs."""
    cfg = _causal_cfg(attention_left_context=None)
    model, params = init_model(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    B, T = 2, 32
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.feature_dim)).astype(np.float32))
    flens = jnp.full((B,), T, jnp.int32)

    def encode(f):
        enc, _ = model.apply(
            params, f, flens, method=lambda m, x, l: m.encoder(x, l)
        )
        return enc

    enc_a = encode(feats)
    # perturb input frames >= t0; encoder frame j depends on inputs <= 4j
    t0 = 24
    feats_b = feats.at[:, t0:].set(
        jnp.asarray(rng.normal(size=(B, T - t0, cfg.feature_dim)).astype(np.float32))
    )
    enc_b = encode(feats_b)
    unaffected = [j for j in range(enc_a.shape[1]) if 4 * j < t0]
    np.testing.assert_allclose(
        np.asarray(enc_a[:, unaffected]), np.asarray(enc_b[:, unaffected]),
        rtol=1e-5, atol=1e-5,
    )


def test_streaming_init_rejects_unbounded_attention():
    """attention_left_context=None means unbounded causal attention: its
    per-layer state cannot be carried in O(1) memory, so streaming_init
    must refuse (ADVICE r2: streaming.py)."""
    cfg = _causal_cfg(attention_left_context=None)
    model, _ = init_model(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="attention_left_context"):
        streaming_init(model, StreamingConfig(chunk=16), 1)
