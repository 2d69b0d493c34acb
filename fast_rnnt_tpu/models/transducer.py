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

Streaming (causal=True): every stateful sub-module pairs its offline
``__call__`` with a ``step`` method over the SAME parameters that consumes
one chunk plus carried per-layer state (conv left-tails + the attention
key/value window) and produces bit-equivalent outputs — see
:class:`Encoder` and models/streaming.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

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
    # inference reproduces the offline outputs exactly (tested in
    # test_streaming.py).  attention_left_context=None means unbounded
    # (pure kk <= q) causal attention — still causal, but not streamable
    # with a bounded per-layer state.
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
    """Conformer convolution module: pointwise-GLU -> depthwise -> pointwise.

    causal=True uses explicit left zero-padding + a VALID depthwise conv so
    the SAME parameters serve both the offline ``__call__`` and the
    streaming ``step`` (which replaces the zero pad with the carried
    (k-1)-frame tail of real history)."""

    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        self.ln_in = nn.LayerNorm(dtype=c.dtype)
        self.pw_in = nn.Dense(2 * c.d_model, dtype=c.dtype)
        self.dw = nn.Conv(
            features=c.d_model,
            kernel_size=(c.conv_kernel,),
            feature_group_count=c.d_model,
            padding="VALID" if c.causal else "SAME",
            dtype=c.dtype,
        )
        self.ln_out = nn.LayerNorm(dtype=c.dtype)
        self.pw_out = nn.Dense(c.d_model, dtype=c.dtype)

    def _pre(self, x, pad_mask):
        x = self.ln_in(x)
        x = self.pw_in(x)
        x = nn.glu(x, axis=-1)
        if pad_mask is not None:
            # zero padded frames so the depthwise conv cannot leak across
            # padding
            x = jnp.where(pad_mask[:, :, None], x, 0.0)
        return x

    def _post(self, x):
        x = self.ln_out(x)
        x = nn.swish(x)
        return self.pw_out(x)

    def __call__(self, x, pad_mask):
        g = self._pre(x, pad_mask)
        if self.cfg.causal:
            # causal: depthwise conv sees left context only (zero right
            # context -> chunk-streamable); offline: centered SAME
            g = jnp.pad(g, ((0, 0), (self.cfg.conv_kernel - 1, 0), (0, 0)))
        return self._post(self.dw(g))

    def step(self, x_new, tail):
        """One streaming chunk: ``tail`` is the (B, k-1, d) post-GLU
        activations of the previous k-1 frames (zeros at stream start —
        identical to the offline causal zero pad)."""
        g = self._pre(x_new, None)
        gw = jnp.concatenate([tail, g], axis=1)
        y = self._post(self.dw(gw))
        return y, gw[:, -(self.cfg.conv_kernel - 1):]


class ConformerBlock(nn.Module):
    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        self.ff1 = FeedForward(c)
        self.ln_attn = nn.LayerNorm(dtype=c.dtype)
        self.attn = nn.MultiHeadDotProductAttention(
            num_heads=c.num_heads, dtype=c.dtype
        )
        self.conv = ConvModule(c)
        self.ff2 = FeedForward(c)
        self.ln_out = nn.LayerNorm(dtype=c.dtype)

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
        x = x + 0.5 * self.ff1(x)
        y = self.ln_attn(x)
        x = x + self.attn(y, y, mask=attn_mask)
        x = x + self.conv(x, pad_mask)
        x = x + 0.5 * self.ff2(x)
        return self.ln_out(x)

    def step(self, x_new, att_cache, conv_tail, seen):
        """One streaming chunk over the same parameters as ``__call__``.

        Args:
          x_new: (B, n, d) the chunk's n new encoder frames.
          att_cache: (B, L, d) the previous L attention INPUTS (post
            ln_attn) — the key/value window.  L = attention_left_context.
          conv_tail: (B, k-1, d) the conv module's post-GLU tail.
          seen: traced int32 — encoder frames already consumed; a scalar
            (all streams aligned) or a per-stream (B,) vector (continuous
            batching: slots admitted at different times, models/serving.py).
            Masks the not-yet-filled cache slots during warmup.

        Returns (out (B, n, d), new_att_cache, new_conv_tail).
        """
        L = self.cfg.attention_left_context
        n = x_new.shape[1]
        x = x_new + 0.5 * self.ff1(x_new)
        y = self.ln_attn(x)
        window = jnp.concatenate([att_cache, y], axis=1)  # (B, L+n, d)
        # cache slot i holds absolute frame (seen - L + i); query j is
        # absolute frame seen + j.  Window [q - L, q] => i in [j, j + L];
        # warmup validity (absolute >= 0) => i >= L - min(seen, L).
        j = jax.lax.broadcasted_iota(jnp.int32, (n, L + n), 0)
        i = jax.lax.broadcasted_iota(jnp.int32, (n, L + n), 1)
        # scalar seen -> (1, 1, 1); per-stream (B,) seen -> (B, 1, 1)
        lo = (L - jnp.minimum(jnp.asarray(seen), L)).reshape(-1, 1, 1)
        mask = ((i >= j) & (i <= j + L))[None] & (i[None] >= lo)
        x = x + self.attn(y, window, mask=mask[:, None])
        c_out, new_tail = self.conv.step(x, conv_tail)
        x = x + c_out
        x = x + 0.5 * self.ff2(x)
        return self.ln_out(x), window[:, -L:], new_tail


class Encoder(nn.Module):
    """Conv-subsampling (stride 4) + conformer stack.

    Input (B, T_in, feature_dim) -> (B, T_in // 4, d_model); frame lengths
    shrink by the same factor.

    With causal=True the subsampling convs left-pad the time axis, so the
    whole encoder streams chunk-by-chunk via :meth:`step` with carried
    state and NO recomputation — each chunk's per-layer cost is O(chunk),
    independent of the stream history (round-2 streaming re-encoded a
    rolling window every chunk; VERDICT r2 item 2)."""

    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        pad = "VALID" if c.causal else "SAME"
        self.sub1 = nn.Conv(
            features=c.d_model // 4, kernel_size=(3, 3), strides=(2, 2),
            padding=pad, dtype=c.dtype,
        )
        self.sub2 = nn.Conv(
            features=c.d_model // 4, kernel_size=(3, 3), strides=(2, 2),
            padding=pad, dtype=c.dtype,
        )
        self.proj = nn.Dense(c.d_model, dtype=c.dtype)
        self.blocks = [ConformerBlock(c) for _ in range(c.num_layers)]

    def _sub1(self, x):
        # freq axis always pads (1, 1); causal time padding is explicit
        # (offline: zeros; streaming: the carried input tail)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        return nn.relu(self.sub1(x))

    def _sub2(self, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        return nn.relu(self.sub2(x))

    def __call__(self, features, feature_lens):
        c = self.cfg
        x = features.astype(c.dtype)[:, :, :, None]  # (B, T, F, 1)
        if c.causal:
            # left-pad the time axis so each subsampled frame depends only
            # on past input frames (out length stays ceil(L/2) per conv)
            x = self._sub1(jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0))))
            x = self._sub2(jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0))))
        else:
            x = nn.relu(self.sub1(x))
            x = nn.relu(self.sub2(x))
        B, T, F, C2 = x.shape
        x = self.proj(x.reshape(B, T, F * C2))
        # SAME-padded stride-2 convs produce ceil(L/2) frames each, so the
        # valid frame count is ceil(L/4) — flooring would mask the final
        # partial frame and zero out utterances shorter than 4 frames
        out_lens = (feature_lens + 3) // 4
        pad_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (B, T), 1) < out_lens[:, None]
        )
        for blk in self.blocks:
            x = blk(x, pad_mask)
        x = jnp.where(pad_mask[:, :, None], x, 0.0)
        return x.astype(jnp.float32), out_lens

    def step(
        self, chunk: jax.Array, state: Dict[str, Any]
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Encode ONE chunk of (B, C_in, F) input frames (C_in % 4 == 0)
        with carried state; returns ((B, C_in // 4, d_model), new_state).

        Output frames are exactly the offline ``__call__`` rows for the
        same absolute positions (causal=True and a bounded
        attention_left_context required) — pinned by test_streaming.py.
        State layout: see :func:`models.streaming.encoder_stream_state`.
        """
        c = self.cfg
        if not c.causal or c.attention_left_context is None:
            raise ValueError(
                "Encoder.step needs causal=True and a bounded "
                "attention_left_context"
            )
        x = chunk.astype(c.dtype)[:, :, :, None]  # (B, C_in, F, 1)
        x = jnp.concatenate([state["in_tail"], x], axis=1)
        mid = self._sub1(x)  # (B, C_in/2, ceil(F/2), d/4)
        x = jnp.concatenate([state["mid_tail"], mid], axis=1)
        x = self._sub2(x)  # (B, C_in/4, F2, d/4)
        B, n, F, C2 = x.shape
        x = self.proj(x.reshape(B, n, F * C2))

        seen = state["seen"]
        att_caches, conv_tails = [], []
        for li, blk in enumerate(self.blocks):
            x, att_c, conv_t = blk.step(
                x, state["att"][li], state["conv"][li], seen
            )
            att_caches.append(att_c)
            conv_tails.append(conv_t)
        new_state = {
            "in_tail": chunk.astype(c.dtype)[:, -2:, :, None],
            "mid_tail": mid[:, -2:],
            "att": att_caches,
            "conv": conv_tails,
            "seen": seen + n,
        }
        return x.astype(jnp.float32), new_state


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

    def encode_stream(self, chunk, enc_state):
        """Streaming stage 1 for one chunk: (am_new, new_enc_state)."""
        enc_new, new_state = self.encoder.step(chunk, enc_state)
        return self.am_proj(enc_new), new_state

    def init_all(self, features, feature_lens, symbols):
        """Initialization path touching every submodule (flax only creates
        params for modules reached by the traced method)."""
        am, lm, s_am, s_lm, out_lens = self(features, feature_lens, symbols)
        _ = self.joiner(am[:, :1, None, :], lm[:, :1, None, :])
        return am, lm, s_am, s_lm, out_lens
