"""Native (C++) component tests: the oracle triangle (C++ vs numpy vs JAX)
for the recursion, cummin parity, and the ragged-batch planner."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu import cummin, mutual_information_recursion
from fast_rnnt_tpu.csrc import (
    cummin_cpu,
    mi_backward_cpu,
    mi_forward_cpu,
    plan_batches_cpu,
)
from fast_rnnt_tpu.data import RaggedBatcher, collate_batch

from .oracle import mi_loop
from .test_recursion import _random_boundary, _random_pxpy


@pytest.mark.parametrize("modified", [False, True])
def test_cpp_oracle_triangle(modified):
    rng = np.random.default_rng(0)
    B, S, T = 3, 5, 9
    px, py = _random_pxpy(rng, B, S, T, modified=modified)
    boundary = _random_boundary(rng, B, S, T)

    p_cpp, scores_cpp = mi_forward_cpu(px, py, boundary)
    pxg_cpp, pyg_cpp = mi_backward_cpu(px, py, p_cpp, boundary, np.ones(B, np.float32))

    scores_np, pxg_np, pyg_np, _ = mi_loop(px, py, boundary)
    np.testing.assert_allclose(scores_cpp, scores_np, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(pxg_cpp, pxg_np, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(pyg_cpp, pyg_np, rtol=2e-4, atol=2e-5)

    scores_jax, (pxg_jax, pyg_jax) = mutual_information_recursion(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(boundary), calc_gradients=True
    )
    np.testing.assert_allclose(scores_cpp, scores_jax, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(pxg_cpp, pxg_jax, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(pyg_cpp, pyg_jax, rtol=2e-4, atol=2e-5)


def test_cpp_cummin():
    rng = np.random.default_rng(1)
    x = rng.integers(-50, 50, size=(4, 17)).astype(np.int32)
    np.testing.assert_array_equal(
        cummin_cpu(x), np.minimum.accumulate(x, axis=1)
    )
    np.testing.assert_array_equal(cummin_cpu(x), np.asarray(cummin(jnp.asarray(x))))


def test_plan_batches_properties():
    rng = np.random.default_rng(2)
    n = 100
    frame_lens = rng.integers(50, 900, size=n).astype(np.int32)
    sym_lens = rng.integers(1, 80, size=n).astype(np.int32)
    max_frames, max_batch, quantum = 4000, 8, 32
    plans = plan_batches_cpu(frame_lens, sym_lens, max_frames, max_batch, quantum)

    seen = np.concatenate([idx for idx, _, _ in plans])
    assert sorted(seen.tolist()) == list(range(n)), "every utterance exactly once"
    for idx, t_pad, s_pad in plans:
        assert len(idx) <= max_batch
        assert t_pad % quantum == 0 and s_pad % quantum == 0
        assert frame_lens[idx].max() <= t_pad
        assert sym_lens[idx].max() <= s_pad
        # frame budget respected (single oversized utterances exempt)
        if len(idx) > 1:
            assert len(idx) * t_pad <= max_frames


def test_ragged_batcher_end_to_end():
    rng = np.random.default_rng(3)
    n, F = 20, 8
    feats = [rng.normal(size=(int(t), F)).astype(np.float32)
             for t in rng.integers(40, 200, size=n)]
    syms = [rng.integers(1, 30, size=int(s)).astype(np.int32)
            for s in rng.integers(2, 12, size=n)]
    batcher = RaggedBatcher(max_frames=1024, max_batch=4, quantum=32, pad_batch_to=4)
    total = 0
    shapes = set()
    for b_feats, b_flens, b_syms, b_slens in batcher.batches(feats, syms):
        assert b_feats.shape[0] == 4  # static batch dim
        shapes.add(b_feats.shape)
        real = b_flens > 0
        total += int(real.sum())
        # padded content intact
        assert np.all(b_flens[real] <= b_feats.shape[1])
        assert np.all(b_slens[real] <= b_syms.shape[1])
    assert total == n
    assert len(shapes) <= 6  # quantized shape set stays small


def test_prefetch_iterator():
    """Background prefetch preserves order and propagates exceptions."""
    from fast_rnnt_tpu.data import prefetch

    assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom(), depth=1)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_prefetch_abandoned_consumer_releases_producer():
    """Breaking out of a prefetch loop early must not leak the producer
    thread blocked on a full queue (ADVICE r2: data/loader.py)."""
    import threading
    import time

    from fast_rnnt_tpu.data import prefetch

    produced = []

    def src():
        for i in range(100_000):
            produced.append(i)
            yield i

    before = set(threading.enumerate())
    it = prefetch(src(), depth=2)
    assert next(it) == 0
    it.close()  # GeneratorExit -> stop event + queue drain

    deadline = time.time() + 5.0
    extra = True
    while time.time() < deadline:
        extra = [
            t for t in threading.enumerate() if t not in before and t.is_alive()
        ]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer thread leaked: {extra}"
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n  # producer stopped consuming the source


def test_fbank_rejects_invalid_n_fft():
    """Radix-2 FFT precondition is validated instead of producing garbage
    (ADVICE r2: csrc/__init__.py)."""
    from fast_rnnt_tpu.csrc import fbank_cpu

    wav = np.zeros(1600, np.float32)
    with pytest.raises(ValueError, match="power of two"):
        fbank_cpu(wav, n_fft=400)
    with pytest.raises(ValueError, match="win_len"):
        fbank_cpu(wav, win_len=400, n_fft=256)
