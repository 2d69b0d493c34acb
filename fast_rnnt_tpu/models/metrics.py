"""Evaluation metrics: batched token error rate (Levenshtein) on device.

The reference ships no evaluation tooling (loss-only; SURVEY.md §5).
Training a transducer needs WER/TER tracking, so this provides a fully
batched, jit-compatible edit distance: one ``lax.scan`` over hypothesis
positions carrying the (S_ref+1) DP column, vectorized over the batch —
no Python loops, static shapes, shardable over the batch axis like
everything else in the framework.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["edit_distance", "token_error_rate"]


def edit_distance(
    refs: jax.Array,
    ref_lens: jax.Array,
    hyps: jax.Array,
    hyp_lens: jax.Array,
) -> jax.Array:
    """Levenshtein distance per utterance (substitution/insert/delete = 1).

    Args:
      refs: (B, S_ref) int token ids, padded arbitrarily past ``ref_lens``.
      ref_lens: (B,) int valid lengths.
      hyps: (B, S_hyp) int, padded arbitrarily past ``hyp_lens``.
      hyp_lens: (B,) int valid lengths.

    Returns (B,) int32 edit distances.  Jit/vmap/shard_map-compatible.
    """
    B, S_ref = refs.shape
    refs = refs.astype(jnp.int32)
    hyps = hyps.astype(jnp.int32)
    ref_lens = ref_lens.astype(jnp.int32)
    hyp_lens = hyp_lens.astype(jnp.int32)

    # DP over the (S_ref + 1) column; row j handles hypothesis token j.
    # Classic recurrence, vectorized over batch lanes:
    #   col[i] = min(prev[i] + 1,                       (insertion)
    #                col[i-1] + 1,                      (deletion)
    #                prev[i-1] + (ref[i-1] != hyp_j))   (substitution)
    # The col[i-1] dependency is a running min over (col0 - i): with
    # m[i] = col[i] - i,  col[i-1] + 1 - i = m[i-1], so
    # col[i] = min(best_without_del[i], i + cummin(m)[i-1]).
    iota = jnp.arange(S_ref + 1, dtype=jnp.int32)  # (S_ref+1,)
    col0 = jnp.broadcast_to(iota, (B, S_ref + 1))

    def step(carry, hyp_j):
        prev = carry  # (B, S_ref+1): DP row for j tokens consumed
        sub = prev[:, :-1] + (refs != hyp_j[:, None]).astype(jnp.int32)
        ins = prev[:, 1:] + 1
        body = jnp.minimum(sub, ins)  # col[1:] before deletions
        head = prev[:, :1] + 1  # col[0] = j+1
        nodel = jnp.concatenate([head, body], axis=1)
        # deletions: col[i] = min over k <= i of (nodel[k] + (i - k))
        m = jax.lax.associative_scan(jnp.minimum, nodel - iota, axis=1)
        col = jnp.minimum(nodel, m + iota)
        return col, col

    _, rows = jax.lax.scan(step, col0, jnp.moveaxis(hyps, 1, 0))
    rows = jnp.concatenate([col0[None], rows], axis=0)  # (S_hyp+1, B, S_ref+1)

    bidx = jnp.arange(B)
    return rows[hyp_lens, bidx, ref_lens[bidx]]


def token_error_rate(
    refs: jax.Array,
    ref_lens: jax.Array,
    hyps: jax.Array,
    hyp_lens: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Corpus token error rate = total edits / total reference tokens.

    Returns (ter, {"edits": (B,), "ref_tokens": scalar}).
    """
    edits = edit_distance(refs, ref_lens, hyps, hyp_lens)
    total_ref = jnp.maximum(jnp.sum(ref_lens), 1)
    return jnp.sum(edits) / total_ref, {
        "edits": edits,
        "ref_tokens": total_ref,
    }
