"""Pruned-transducer model family (conformer encoder + stateless predictor +
pruned joiner) for the LibriSpeech-scale training-step benchmark
(BASELINE.json config #5).

The reference library ships no models (it is loss-only; its README sketches
the intended usage flow at /root/reference/README.md:101-154).  This module
provides that usage as a first-class, TPU-first model family:

  * Encoder: conv subsampling (4x) + conformer blocks (MHSA + depthwise-conv
    module) — all MXU-friendly static-shape ops, bfloat16-ready.
  * Predictor: embedding + causal depthwise conv ("stateless" predictor) —
    no LSTM scan, so the whole model is a single fused feed-forward graph.
  * Joiner: pruned joiner over (B, T, s_range) pairs only — the memory win
    of the Pruned RNN-T paper (arXiv:2206.13236).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["TransducerConfig", "Encoder", "Predictor", "Joiner", "PrunedTransducer"]


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int = 500
    feature_dim: int = 80
    d_model: int = 256
    d_joiner: int = 512
    num_layers: int = 6
    num_heads: int = 4
    ff_mult: int = 4
    conv_kernel: int = 15
    predictor_context: int = 2
    blank_id: int = 0
    dtype: jnp.dtype = jnp.bfloat16  # compute dtype; params stay fp32
    # Streaming-capable encoder variant (models/streaming.py): causal
    # convolutions (left-padded subsampling + conv modules) and attention
    # restricted to [q - attention_left_context, q] encoder frames.  With
    # causal=True the encoder has ZERO right context, so chunked streaming
    # inference reproduces the offline outputs exactly once the rolling
    # buffer covers the receptive field (tested in test_streaming.py).
    causal: bool = False
    attention_left_context: Optional[int] = None  # encoder frames; None = all


class FeedForward(nn.Module):
    cfg: TransducerConfig

    @nn.compact
    def __call__(self, x):
        d = self.cfg.d_model
        x = nn.LayerNorm(dtype=self.cfg.dtype)(x)
        x = nn.Dense(d * self.cfg.ff_mult, dtype=self.cfg.dtype)(x)
        x = nn.swish(x)
        return nn.Dense(d, dtype=self.cfg.dtype)(x)


class ConvModule(nn.Module):
    """Conformer convolution module: pointwise-GLU -> depthwise -> pointwise."""

    cfg: TransducerConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        d = self.cfg.d_model
        x = nn.LayerNorm(dtype=self.cfg.dtype)(x)
        x = nn.Dense(2 * d, dtype=self.cfg.dtype)(x)
        x = nn.glu(x, axis=-1)
        # zero padded frames so the depthwise conv cannot leak across padding
        x = jnp.where(pad_mask[:, :, None], x, 0.0)
        x = nn.Conv(
            features=d,
            kernel_size=(self.cfg.conv_kernel,),
            feature_group_count=d,
            # causal: depthwise conv sees left context only (zero right
            # context -> chunk-streamable); offline: centered SAME
            padding=(
                [(self.cfg.conv_kernel - 1, 0)] if self.cfg.causal else "SAME"
            ),
            dtype=self.cfg.dtype,
        )(x)
        x = nn.LayerNorm(dtype=self.cfg.dtype)(x)
        x = nn.swish(x)
        return nn.Dense(d, dtype=self.cfg.dtype)(x)


class ConformerBlock(nn.Module):
    cfg: TransducerConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        attn_mask = pad_mask[:, None, None, :]  # (B, 1, 1, T) keys mask
        if self.cfg.attention_left_context is not None or self.cfg.causal:
            # causal window: query q attends keys in [q - L, q]; with
            # attention_left_context=None but causal=True, a pure kk <= q
            # mask — causal ALWAYS means zero right context (a causal
            # encoder silently attending to the future would break the
            # streaming-parity guarantee in models/streaming.py)
            T = x.shape[1]
            q = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            win = kk <= q
            if self.cfg.attention_left_context is not None:
                win &= kk >= q - self.cfg.attention_left_context
            attn_mask = attn_mask & win[None, None, :, :]
        x = x + 0.5 * FeedForward(self.cfg)(x)
        y = nn.LayerNorm(dtype=self.cfg.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.num_heads, dtype=self.cfg.dtype
        )(y, y, mask=attn_mask)
        x = x + y
        x = x + ConvModule(self.cfg)(x, pad_mask)
        x = x + 0.5 * FeedForward(self.cfg)(x)
        return nn.LayerNorm(dtype=self.cfg.dtype)(x)


class Encoder(nn.Module):
    """Conv-subsampling (stride 4) + conformer stack.

    Input (B, T_in, feature_dim) -> (B, T_in // 4, d_model); frame lengths
    shrink by the same factor.
    """

    cfg: TransducerConfig

    @nn.compact
    def __call__(self, features, feature_lens):
        c = self.cfg
        x = features.astype(c.dtype)[:, :, :, None]  # (B, T, F, 1)
        # causal: left-pad the time axis so each subsampled frame depends
        # only on past input frames (out length stays ceil(L/2) per conv)
        sub_pad = [(2, 0), (1, 1)] if c.causal else "SAME"
        x = nn.Conv(features=c.d_model // 4, kernel_size=(3, 3), strides=(2, 2),
                    padding=sub_pad, dtype=c.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(features=c.d_model // 4, kernel_size=(3, 3), strides=(2, 2),
                    padding=sub_pad, dtype=c.dtype)(x)
        x = nn.relu(x)
        B, T, F, C2 = x.shape
        x = nn.Dense(c.d_model, dtype=c.dtype)(x.reshape(B, T, F * C2))
        # SAME-padded stride-2 convs produce ceil(L/2) frames each, so the
        # valid frame count is ceil(L/4) — flooring would mask the final
        # partial frame and zero out utterances shorter than 4 frames
        out_lens = (feature_lens + 3) // 4
        pad_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (B, T), 1) < out_lens[:, None]
        )
        for _ in range(c.num_layers):
            x = ConformerBlock(c)(x, pad_mask)
        x = jnp.where(pad_mask[:, :, None], x, 0.0)
        return x.astype(jnp.float32), out_lens


class Predictor(nn.Module):
    """Stateless predictor: embedding + left-context causal conv.

    Input symbols (B, S) -> (B, S+1, d_model); position 0 is the BOS/blank
    context (prediction before any symbol).
    """

    cfg: TransducerConfig

    @nn.compact
    def __call__(self, symbols):
        c = self.cfg
        B, S = symbols.shape
        # prepend k blanks (an infinite-blank history): the context window
        # for position s is the last k tokens of [blank*k, symbols[:s]].
        # Padding with blank EMBEDDINGS (not zero vectors) makes the
        # position-0 state identical to what greedy decoding reconstructs
        # from its blank-initialized rolling context buffer (decoding.py).
        k = max(c.predictor_context, 1)
        y = jnp.concatenate(
            [jnp.full((B, k), c.blank_id, dtype=symbols.dtype), symbols], axis=1
        )  # (B, S+k)
        x = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype)(y)
        # causal conv over the symbol axis (left context only)
        x = nn.Conv(features=c.d_model, kernel_size=(k,), padding="VALID",
                    dtype=c.dtype)(x)
        x = nn.relu(x)
        x = nn.LayerNorm(dtype=c.dtype)(x)
        return x.astype(jnp.float32)  # (B, S+1, d_model)


class Joiner(nn.Module):
    """Pruned joiner: operates on (B, T, s_range, d_joiner) pairs only."""

    cfg: TransducerConfig

    @nn.compact
    def __call__(self, am_pruned, lm_pruned):
        c = self.cfg
        x = jnp.tanh(am_pruned + lm_pruned).astype(c.dtype)
        logits = nn.Dense(c.vocab_size, dtype=c.dtype)(x)
        return logits.astype(jnp.float32)


class PrunedTransducer(nn.Module):
    """Full model, two-stage (the pruning ranges sit between the stages):

      stage 1  ``__call__``: (features, feature_lens, symbols) ->
               (am, lm, simple_am, simple_lm, out_lens)
        am        (B, T, d_joiner)   joiner-space encoder projection
        lm        (B, S+1, d_joiner) joiner-space predictor projection
        simple_am (B, T, C)          vocab-space proj for the simple loss
        simple_lm (B, S+1, C)
      stage 2  ``join`` (apply with method="join"): pruned pairs -> logits.
    """

    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.predictor = Predictor(c)
        self.am_proj = nn.Dense(c.d_joiner)
        self.lm_proj = nn.Dense(c.d_joiner)
        self.simple_am_proj = nn.Dense(c.vocab_size)
        self.simple_lm_proj = nn.Dense(c.vocab_size)
        self.joiner = Joiner(c)

    def __call__(self, features, feature_lens, symbols):
        enc, out_lens = self.encoder(features, feature_lens)
        pred = self.predictor(symbols)
        return (
            self.am_proj(enc),
            self.lm_proj(pred),
            self.simple_am_proj(enc),
            self.simple_lm_proj(pred),
            out_lens,
        )

    def join(self, am_pruned, lm_pruned):
        return self.joiner(am_pruned, lm_pruned)

    def init_all(self, features, feature_lens, symbols):
        """Initialization path touching every submodule (flax only creates
        params for modules reached by the traced method)."""
        am, lm, s_am, s_lm, out_lens = self(features, feature_lens, symbols)
        _ = self.joiner(am[:, :1, None, :], lm[:, :1, None, :])
        return am, lm, s_am, s_lm, out_lens
