"""The bench parity gate itself (utils/parity.py): runs the four checks
at reduced shapes with the Pallas (interpret) implementation forced as
the process default, so the default-vs-xla comparison is a real
two-implementation cross-check even on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_rnnt_tpu.ops import recursion as rec
from fast_rnnt_tpu.ops.kernels import register
from fast_rnnt_tpu.utils.parity import TOLERANCES, enforce_parity, onchip_parity_gate


def test_parity_gate_passes():
    register(default=False, interpret=True)
    rng = np.random.default_rng(0)
    B, T, S, C = 4, 64, 12, 32
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
    t_end = np.clip(rng.integers(T // 2, T + 1, size=B), S + 2, T).astype(np.int32)
    s_end = np.clip(rng.integers(S // 2, S + 1, size=B), 2, S).astype(np.int32)
    boundary = jnp.asarray(
        np.stack([np.zeros(B, np.int32), np.zeros(B, np.int32), s_end, t_end], 1)
    )
    old = rec._DEFAULT_IMPL
    try:
        rec._DEFAULT_IMPL = "pallas"
        parity = onchip_parity_gate(am, lm, symbols, boundary, s_range=4)
    finally:
        rec._DEFAULT_IMPL = old
    assert set(TOLERANCES) <= set(parity)
    assert parity["golden_cases"] == 5
    enforce_parity(parity)  # must not raise


def test_enforce_parity_fails_loudly():
    good = {k: 0.0 for k in TOLERANCES}
    enforce_parity(good)
    bad = dict(good, golden_grads_max_abs_err=1.0)
    with pytest.raises(FloatingPointError, match="golden_grads_max_abs_err"):
        enforce_parity(bad)
    nan = dict(good, roundtrip_max_abs_err=float("nan"))
    with pytest.raises(FloatingPointError, match="roundtrip"):
        enforce_parity(nan)
