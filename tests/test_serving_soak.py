"""Randomized serving soak (VERDICT r4 item 7): hundreds of steps of
Poisson-ish arrivals and finishes through a small slot batch.

The slot-churn tests in test_serving.py pin exactness for hand-picked
schedules; this soak drives the server the way production traffic would —
random-length streams arriving at random times, including held-open
feed-as-you-go streams extended in odd-sized pieces — and asserts:

  * EXACT offline parity for every stream (token-for-token),
  * no starvation (every submitted stream completes),
  * bounded step count (work-conserving: the server never spins).

(No reference equivalent: the reference ships no inference; this is the
repo's own serving bar, SURVEY.md §5.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from fast_rnnt_tpu.models import (
    StreamServer,
    StreamingConfig,
    TransducerConfig,
    greedy_search,
    init_model,
)

CHUNK = 16


def _cfg():
    return TransducerConfig(
        vocab_size=12, feature_dim=6, d_model=16, d_joiner=16,
        num_layers=2, num_heads=2, conv_kernel=7, dtype=jnp.float32,
        causal=True, attention_left_context=4,
    )


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


def test_serving_soak_random_arrivals():
    rng = np.random.default_rng(0)
    cfg = _cfg()
    model, params = init_model(jax.random.PRNGKey(0), cfg)

    N, CAPACITY = 40, 4
    lengths = rng.integers(8, 121, size=N)
    utts = [
        rng.normal(size=(L, cfg.feature_dim)).astype(np.float32)
        for L in lengths
    ]
    want = _offline_greedy(model, params, utts)

    # Poisson-ish arrivals: exponential gaps in units of server steps.
    arrivals = np.floor(np.cumsum(rng.exponential(1.5, size=N))).astype(int)
    # every 8th stream is held open and fed in odd-sized pieces
    open_ids = [i for i in range(N) if i % 8 == 3]
    pieces = {}
    for i in open_ids:
        u = utts[i]
        cuts = np.unique(rng.integers(1, len(u), size=min(3, len(u) - 1)))
        pieces[i] = list(np.split(u, cuts))  # segs concatenate back to u

    server = StreamServer(
        model, params, StreamingConfig(chunk=CHUNK, max_len=64),
        capacity=CAPACITY,
    )

    total_chunks = int(sum(-(-len(u) // CHUNK) for u in utts))
    # work-conserving bound: every step with any active stream feeds at
    # least one chunk (or admits / finishes); held-open streams may stall
    # their own slot between extends but each stalls O(#pieces) steps
    step_budget = 4 * (total_chunks + N + sum(map(len, pieces.values()))) + 50

    done = {}
    steps = 0
    next_arrival = 0
    remaining = {i: list(p) for i, p in pieces.items()}
    finished = set()
    while len(done) < N:
        assert steps < step_budget, (
            f"server exceeded its step budget ({step_budget}): "
            f"{len(done)}/{N} streams done after {steps} steps"
        )
        # admit everything scheduled for this step
        while next_arrival < N and arrivals[next_arrival] <= steps:
            i = next_arrival
            if i in pieces:
                server.submit(i, remaining[i].pop(0), final=False)
            else:
                server.submit(i, utts[i])
            next_arrival += 1
        # feed held-open streams one piece every few steps
        for i in open_ids:
            if i < next_arrival and i not in finished and steps % 3 == 0:
                if remaining[i]:
                    server.extend(i, remaining[i].pop(0))
                else:
                    server.finish(i)
                    finished.add(i)
        for sid, toks in server.step():
            done[sid] = toks
        steps += 1

    assert server.idle
    assert set(done) == set(range(N)), "starved streams"
    mismatches = []
    for i in range(N):
        if not np.array_equal(done[i], want[i]):
            mismatches.append(i)
    assert not mismatches, (
        f"streams {mismatches} diverged from offline decoding"
    )
    # the soak must actually have emitted text and churned slots
    assert sum(len(v) for v in done.values()) > 0
    assert steps > total_chunks / CAPACITY
