"""Native fbank extractor vs an independent numpy/np.fft reference."""

import numpy as np
import pytest

csrc = pytest.importorskip("fast_rnnt_tpu.csrc")


def _fbank_numpy(wav, sample_rate=16000, win_len=400, hop=160, n_fft=512,
                 n_mels=80, low_hz=20.0, high_hz=None, preemph=0.97):
    """Same pipeline, written independently on np.fft (float64)."""
    wav = wav.astype(np.float64)
    if high_hz is None:
        high_hz = sample_rate / 2.0
    n_frames = (len(wav) - win_len) // hop + 1
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_len) / (win_len - 1))

    def mel(hz):
        return 1127.0 * np.log1p(np.asarray(hz) / 700.0)

    mel_pts = np.linspace(mel(low_hz), mel(high_hz), n_mels + 2)
    bins_hz = np.arange(n_fft // 2 + 1) * sample_rate / n_fft
    mel_bins = mel(bins_hz)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        l, c, r = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (mel_bins - l) / (c - l)
        down = (r - mel_bins) / (r - c)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None) * (
            (mel_bins > l) & (mel_bins < r)
        )

    out = np.zeros((n_frames, n_mels))
    for f in range(n_frames):
        fr = wav[f * hop : f * hop + win_len].copy()
        prev = np.empty_like(fr)
        prev[1:] = fr[:-1]
        prev[0] = wav[f * hop - 1] if f * hop > 0 else fr[0]
        fr = (fr - preemph * prev) * window
        spec = np.abs(np.fft.rfft(fr, n_fft)) ** 2
        out[f] = np.log(np.maximum(fb @ spec, 1e-10))
    return out.astype(np.float32)


def test_fbank_matches_numpy_reference():
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=16000) * 0.1).astype(np.float32)  # 1 s @ 16 kHz
    try:
        got = csrc.fbank_cpu(wav)
    except OSError:
        pytest.skip("no C++ toolchain available")
    want = _fbank_numpy(wav)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fbank_edge_cases():
    try:
        short = csrc.fbank_cpu(np.zeros(100, np.float32))  # shorter than win
    except OSError:
        pytest.skip("no C++ toolchain available")
    assert short.shape[0] == 0
    # pure tone lands energy in the right mel band
    sr, f0 = 16000, 1000.0
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    feats = csrc.fbank_cpu(tone)
    peak_band = int(feats[10].argmax())
    # expected band: where 1 kHz falls among 80 HTK-mel bands over 20..8000 Hz
    ref_band = int(_fbank_numpy(tone)[10].argmax())
    assert peak_band == ref_band


def test_streaming_fbank_exact_parity():
    """Chunked extraction == one offline call, bit for bit, across ragged
    chunk sizes (incl. chunks smaller than the window and a 1-sample
    chunk straddling the pre-emphasis context)."""
    from fast_rnnt_tpu.csrc import fbank_cpu
    from fast_rnnt_tpu.data import StreamingFbank

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=16000) * 0.1).astype(np.float32)
    ref = fbank_cpu(wav)

    for chunks in (
        [160] * 100,                      # steady hop-sized chunks
        [37, 1, 500, 399, 2048, 16000],   # ragged, incl. tiny pieces
        [16000],                          # everything at once
    ):
        sf = StreamingFbank()
        outs, pos = [], 0
        for c in chunks:
            take = wav[pos : pos + c]
            pos += len(take)
            outs.append(sf.process(take))
            if pos >= len(wav):
                break
        got = np.concatenate(outs, axis=0)
        np.testing.assert_array_equal(got, ref)


def test_streaming_fbank_reset_and_validation():
    from fast_rnnt_tpu.data import StreamingFbank

    with np.testing.assert_raises(ValueError):
        StreamingFbank(n_fft=400)
    sf = StreamingFbank()
    rng = np.random.default_rng(1)
    a = (rng.normal(size=2000) * 0.1).astype(np.float32)
    out1 = sf.process(a)
    sf.reset()
    out2 = sf.process(a)
    np.testing.assert_array_equal(out1, out2)
