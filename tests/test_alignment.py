"""Viterbi scoring / forced-alignment tests (ops/alignment.py) against a
brute-force path enumerator."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from fast_rnnt_tpu import (
    mutual_information_recursion,
    viterbi_alignment,
    viterbi_scores,
)


def _brute_best(px, py, b, S, T):
    best = -np.inf
    best_frames = None
    for frames in itertools.product(range(T), repeat=S):
        if any(frames[i] > frames[i + 1] for i in range(S - 1)):
            continue
        score, s, t = 0.0, 0, 0
        for sidx, tf in enumerate(frames):
            while t < tf:
                score += py[b, s, t]
                t += 1
            score += px[b, sidx, tf]
            s += 1
        while t < T:
            score += py[b, s, t]
            t += 1
        if score > best:
            best, best_frames = score, frames
    return best, best_frames


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(0)
    B, S, T = 3, 3, 6
    px = rng.normal(size=(B, S, T + 1)).astype(np.float32) - 1.0
    px[:, :, T] = -np.inf
    py = rng.normal(size=(B, S + 1, T)).astype(np.float32) - 1.0
    scores, frames, ind = jax.jit(
        lambda px, py: viterbi_alignment(px, py, None)
    )(jnp.asarray(px), jnp.asarray(py))
    for b in range(B):
        bs, bf = _brute_best(px, py, b, S, T)
        np.testing.assert_allclose(float(scores[b]), bs, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(frames)[b], bf)
    # path indicator: exactly one emission frame per symbol, monotone
    i = np.asarray(ind)
    assert np.all(i.sum(axis=2) == 1.0)
    assert np.all(np.diff(np.asarray(frames), axis=1) >= 0)


def test_viterbi_bounded_by_total_score():
    """max-path score <= logsumexp-over-paths score, and close to it when
    one path dominates."""
    rng = np.random.default_rng(1)
    B, S, T = 2, 4, 8
    px = jnp.asarray(rng.normal(size=(B, S, T + 1)).astype(np.float32)) - 2.0
    px = px.at[:, :, T].set(-np.inf)
    py = jnp.asarray(rng.normal(size=(B, S + 1, T)).astype(np.float32)) - 2.0
    v = viterbi_scores(px, py, None)
    total = mutual_information_recursion(px, py, None)
    assert np.all(np.asarray(v) <= np.asarray(total) + 1e-4)

    # sharpen the distribution: scaled logprobs concentrate on one path
    v30 = viterbi_scores(px * 30, py * 30, None)
    t30 = mutual_information_recursion(px * 30, py * 30, None)
    np.testing.assert_allclose(np.asarray(v30), np.asarray(t30), rtol=1e-3)


def test_viterbi_respects_boundary():
    rng = np.random.default_rng(2)
    B, S, T = 2, 3, 8
    px = jnp.asarray(rng.normal(size=(B, S, T + 1)).astype(np.float32))
    px = px.at[:, :, T].set(-np.inf)
    py = jnp.asarray(rng.normal(size=(B, S + 1, T)).astype(np.float32))
    boundary = jnp.asarray(
        np.array([[0, 0, 3, 5], [0, 0, 2, 8]], np.int32)
    )
    scores, frames, _ = viterbi_alignment(px, py, boundary)
    f = np.asarray(frames)
    # emissions only inside [t_begin, t_end); symbols beyond s_end get -1
    assert np.all(f[0, :3] < 5) and np.all(f[0, :3] >= 0)
    assert np.all(f[1, :2] >= 0) and f[1, 2] == -1
    assert np.all(np.isfinite(np.asarray(scores)))
