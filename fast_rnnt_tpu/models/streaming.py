"""Chunked streaming inference for the pruned transducer.

Production RNN-T serving decodes audio INCREMENTALLY — the reference
library has no inference at all, and most research stacks only decode
full utterances.  This module streams:

  * The encoder must be built streaming-capable:
    ``TransducerConfig(causal=True, attention_left_context=L)`` — causal
    subsampling + conv modules (zero right context) and attention limited
    to L past encoder frames.
  * The decoder keeps a rolling buffer of the last ``left + chunk`` input
    frames.  Each :func:`streaming_step` appends a chunk, re-encodes the
    buffer (one fixed-shape jit — XLA compiles it once), extracts the
    NEW frames' encoder rows, and advances the shared frame loop with
    the carried decode state — greedy (:func:`decoding.greedy_over_frames`)
    or modified beam search (``StreamingConfig(beam=H)``,
    :func:`decoding.beam_over_frames`).

Exactness: with a causal encoder, an output frame depends only on input
frames at most R behind it (R = receptive field: num_layers *
4*(attention_left_context + conv_kernel - 1) + subsampling kernels,
in input frames).  While the buffer is still filling it IS the utterance
prefix, and once it slides, the extracted frames keep >= ``left`` input
frames of true history — so for ``left >= R`` streaming outputs equal
offline outputs EXACTLY (no approximation; pinned by
tests/test_streaming.py against :func:`decoding.greedy_search`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .decoding import beam_best, beam_init_state, beam_over_frames, greedy_over_frames
from .transducer import PrunedTransducer, TransducerConfig

__all__ = ["StreamingConfig", "streaming_init", "streaming_step"]


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    """chunk: input frames consumed per step; left: history frames kept.
    Both must be multiples of 4 (the subsampling factor) and ``left`` a
    multiple of ``chunk`` (so the buffer slides by whole chunks)."""

    chunk: int = 32
    left: int = 128
    max_symbols_per_frame: int = 4
    max_len: int = 256
    beam: int = 0  # 0 = greedy; >= 2 = streamed modified beam search

    def __post_init__(self):
        if self.chunk % 4 or self.left % 4:
            raise ValueError("chunk and left must be multiples of 4")
        if self.left % self.chunk:
            raise ValueError("left must be a multiple of chunk")

    @property
    def window(self) -> int:
        return self.left + self.chunk


def streaming_init(
    model: PrunedTransducer, scfg: StreamingConfig, batch_size: int
) -> dict:
    """Fresh per-stream state for ``batch_size`` parallel streams."""
    cfg: TransducerConfig = model.cfg
    if not cfg.causal:
        raise ValueError(
            "streaming needs a causal encoder: build the model with "
            "TransducerConfig(causal=True, attention_left_context=...)"
        )
    if cfg.attention_left_context is None:
        # causal=True without a left-context window = pure causal attention
        # (unbounded left receptive field): exact only while the rolling
        # buffer still holds the whole utterance prefix; once it slides,
        # streamed outputs deviate from offline decoding no matter how
        # large ``left`` is
        import warnings

        warnings.warn(
            "attention_left_context is None (unbounded causal attention): "
            "streaming is only exact while the utterance fits in the "
            "rolling buffer; set attention_left_context to bound the "
            "receptive field for exact sliding-window streaming",
            RuntimeWarning,
        )
    else:
        # receptive field of the causal stack, in input frames: each layer
        # reaches attention_left_context + (conv_kernel - 1) encoder frames
        # back (4 input frames each), plus the subsampling convs
        rf = 4 * cfg.num_layers * (
            cfg.attention_left_context + cfg.conv_kernel - 1
        ) + 8
        if scfg.left < rf:
            import warnings

            warnings.warn(
                f"StreamingConfig.left={scfg.left} is smaller than the "
                f"encoder's receptive field (~{rf} input frames): streamed "
                "outputs will deviate from offline decoding once the "
                "buffer slides",
                RuntimeWarning,
            )
    k = max(cfg.predictor_context, 1)
    B = batch_size
    state = {
        "buf": jnp.zeros((B, scfg.window, cfg.feature_dim), jnp.float32),
        "filled": jnp.zeros((), jnp.int32),  # frames currently in buf
        "stream_len": jnp.zeros((B,), jnp.int32),  # real frames seen
        "decoded_t": jnp.zeros((), jnp.int32),  # encoder frames decoded
    }
    if scfg.beam:
        scores, ctx, hyps, lens = beam_init_state(
            cfg, B, scfg.beam, scfg.max_len
        )
        state.update(scores=scores, ctx=ctx, hyps=hyps, lens=lens)
    else:
        state.update(
            ctx=jnp.full((B, k), cfg.blank_id, jnp.int32),
            hyps=jnp.full((B, scfg.max_len), cfg.blank_id, jnp.int32),
            lens=jnp.zeros((B,), jnp.int32),
        )
    return state


def streaming_step(
    model: PrunedTransducer,
    params: Any,
    scfg: StreamingConfig,
    state: dict,
    chunk_feats: jax.Array,
    chunk_lens: jax.Array,
) -> Tuple[dict, Tuple[jax.Array, jax.Array]]:
    """Consume one chunk of audio for every stream; returns the updated
    state and the cumulative (hyps, lens).

    Args:
      chunk_feats: (B, chunk, feature_dim); pad the final partial chunk
        with anything and pass the real count in ``chunk_lens``.
      chunk_lens: (B,) int32 in [0, chunk] — 0 for ended streams (their
        state passes through unchanged).

    Jit-friendly: every shape is static, ``filled``/``decoded_t`` are
    traced scalars, so one compilation serves the whole stream.
    """
    cfg: TransducerConfig = model.cfg
    C_in = scfg.chunk
    W = scfg.window
    buf, filled = state["buf"], state["filled"]
    B = buf.shape[0]

    # append the chunk: grow in place while warming up, slide afterwards
    grown = jax.lax.dynamic_update_slice(
        buf, chunk_feats, (0, filled, 0)
    )
    slid = jnp.concatenate([buf[:, C_in:], chunk_feats], axis=1)
    overflow = filled + C_in > W
    buf = jnp.where(overflow, slid, grown)
    new_filled = jnp.minimum(filled + C_in, W)

    # encode the buffer (fixed shape); only the NEW chunk's frames are
    # extracted — their receptive field stays inside the buffer
    full_lens = jnp.full((B,), new_filled, jnp.int32)
    am, _ = model.apply(
        params,
        buf,
        full_lens,
        method=lambda m, f, fl: (
            lambda enc_lens: (m.am_proj(enc_lens[0]), enc_lens[1])
        )(m.encoder(f, fl)),
    )
    n_new = C_in // 4
    start_sub = new_filled // 4 - n_new
    am_new = jax.lax.dynamic_slice(
        am, (0, start_sub, 0), (B, n_new, am.shape[2])
    )

    # frame activity from the per-stream total length (ends mid-chunk)
    stream_len = state["stream_len"] + chunk_lens
    total_sub = (stream_len + 3) // 4  # matches Encoder out_lens
    t0 = state["decoded_t"]
    frame_active = (
        t0 + jax.lax.broadcasted_iota(jnp.int32, (B, n_new), 1)
    ) < total_sub[:, None]

    new_state = {
        "buf": buf,
        "filled": new_filled,
        "stream_len": stream_len,
        "decoded_t": t0 + n_new,
    }
    if scfg.beam:
        scores, ctx, hyps, lens = beam_over_frames(
            model, params, am_new, frame_active,
            state["scores"], state["ctx"], state["hyps"], state["lens"],
        )
        new_state.update(scores=scores, ctx=ctx, hyps=hyps, lens=lens)
        return new_state, beam_best(scores, hyps, lens)
    ctx, hyps, lens = greedy_over_frames(
        model, params, am_new, frame_active,
        state["ctx"], state["hyps"], state["lens"],
        max_symbols_per_frame=scfg.max_symbols_per_frame,
    )
    new_state.update(ctx=ctx, hyps=hyps, lens=lens)
    return new_state, (hyps, lens)
