"""On-device compiled-kernel parity gate.

The reference runs its backward round-trip self-check on EVERY production
call, on the real device (tf_fast_rnnt_op.cc:110 enabling
mutual_information_cuda.cu:510-514,756-758).  The TPU analogue cannot be
always-on (a host check per step would stall the pipeline through remote
tunnels), so this module packages the equivalent evidence as a gate the
benchmark harness runs ON THE BENCH DEVICE, compiled, before timing:

  1. ``fused_vs_xla`` — the fused band-native pipeline under the default
     (Pallas-on-TPU) implementation vs the independent XLA scan core on
     identical inputs, losses AND input gradients.
  2. ``roundtrip`` — the occupancy backward's conservation identity at the
     full bench shape (the reference's .cu:510-514 check).
  3. ``golden`` — the path-enumeration golden vectors (tests/golden/,
     f64 first-principles, no DP recursion in their derivation) through
     the compiled kernels, including the banded (pruned) variant.
  4. ``bf16`` — the production bf16-lattice mode vs fp32 (loss tracking
     + occupancy conservation; this check is what exposed the bf16
     p-residual quantization bug in round 3).

Every number is produced by jit-compiled code on the queried device — if
the compiled Mosaic lowering is wrong (layouts, roll semantics, scratch
aliasing), these fail; interpret-mode tests alone cannot catch that class
of bug.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["onchip_parity_gate", "enforce_parity"]


def _rel_err(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-6)
    return float(np.max(np.abs(a - b) / denom))


def _abs_err(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


def _scaled_err(a, b) -> float:
    """max |a - b| normalized by the global magnitude of b — the right
    metric for gradient tensors, whose entries cross zero (pointwise
    relative error at a zero crossing is noise, not signal)."""
    b = np.asarray(b, np.float64)
    return _abs_err(a, b) / max(float(np.max(np.abs(b))), 1e-6)


def onchip_parity_gate(
    am: jax.Array,
    lm: jax.Array,
    symbols: jax.Array,
    boundary: jax.Array,
    s_range: int,
    golden_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Run the four compiled parity checks (module docstring) on the
    default device with the given bench-shape inputs.  Returns a flat
    dict of error metrics; see :func:`enforce_parity` for the pass/fail
    thresholds."""
    import fast_rnnt_tpu as frt
    from fast_rnnt_tpu.ops.recursion import (
        mutual_information_rows,
        occupancy_roundtrip_check,
    )

    out: Dict[str, float] = {}
    B = am.shape[0]

    # --- 1. fused pipeline: default impl vs the XLA scan core ------------
    def fused(impl, lattice_dtype, am_, lm_):
        def loss_fn(a, l):
            simple, pruned, ranges = frt.rnnt_loss_simple_pruned(
                l, a, symbols, 0, s_range, boundary, reduction="none",
                impl=impl, lattice_dtype=lattice_dtype,
            )
            return (simple, pruned), ranges

        (simple, pruned), vjp, ranges = jax.vjp(
            loss_fn, am_, lm_, has_aux=True
        )
        g_am, g_lm = vjp((jnp.ones_like(simple), jnp.ones_like(pruned)))
        return simple, pruned, g_am, g_lm, ranges

    # force the FUSED lattice build on the test side (the size-crossover
    # auto dispatch may resolve small shapes to the XLA build, which
    # would make this check vacuous), and the XLA build + XLA scan core
    # on the reference side, so the fused Pallas build (+ its VJP
    # kernel) is checked against a fully independent compiled path,
    # losses AND gradients
    from fast_rnnt_tpu.ops import lattice as _lattice

    run = jax.jit(fused, static_argnums=(0, 1))
    _prev_build = _lattice._LATTICE_BUILD_IMPL
    _lattice.set_lattice_build_impl("fused")
    try:
        s_d, p_d, ga_d, gl_d, r_d = run(None, None, am, lm)
    finally:
        _lattice.set_lattice_build_impl(_prev_build)
    _lattice.set_lattice_build_impl("xla")
    try:
        s_x, p_x, ga_x, gl_x, r_x = run("xla", None, am, lm)
    finally:
        _lattice.set_lattice_build_impl(_prev_build)

    # Tie-robust comparison (round-5 finding, caught by the salted seeds):
    # the two sides' stage-1 occupancies differ at the cross-impl f32
    # class (~1e-4), so the window argmax may legitimately flip where two
    # windows' scores near-tie (measured: every flip's raw score gap
    # <= 3.3e-4), and the monotone repair then CASCADES one flip into a
    # run of different-but-equally-valid bands — whole-pipeline gradients
    # on such utterances genuinely differ.  Compare losses and gradients
    # only on utterances whose final ranges agree exactly, and gate on
    # the agreement fraction staying high (a kernel bug would crater it;
    # tie-aware RAW-argmax certification lives in benchmarks/fuzz_onchip).
    agree = np.asarray(
        (jnp.asarray(r_d) == jnp.asarray(r_x)).reshape(r_d.shape[0], -1).all(
            axis=1
        )
    )
    out["range_agree_frac"] = float(agree.mean())
    if agree.any():
        m = agree
        out["fused_vs_xla_loss_rel_err"] = max(
            _rel_err(np.asarray(s_d)[m], np.asarray(s_x)[m]),
            _rel_err(np.asarray(p_d)[m], np.asarray(p_x)[m]),
        )
        out["fused_vs_xla_grad_rel_err"] = max(
            _scaled_err(np.asarray(ga_d)[m], np.asarray(ga_x)[m]),
            _scaled_err(np.asarray(gl_d)[m], np.asarray(gl_x)[m]),
        )
    else:  # 0% agreement is itself a failure (range_agree_frac gate)
        out["fused_vs_xla_loss_rel_err"] = float("inf")
        out["fused_vs_xla_grad_rel_err"] = float("inf")

    # --- 2. occupancy round-trip at the bench shape -----------------------
    @jax.jit
    def roundtrip(am_, lm_):
        px, py = frt.get_rnnt_logprobs(lm_, am_, symbols, 0, "regular", boundary)
        _, (gx, gy) = frt.mutual_information_recursion(
            px, py, boundary, calc_gradients=True
        )
        return occupancy_roundtrip_check(gx, gy, boundary, jnp.ones((B,)))

    out["roundtrip_max_abs_err"] = float(jnp.max(roundtrip(am, lm)))

    # --- 3. golden path-enumeration vectors ------------------------------
    if golden_dir is None:
        golden_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "tests", "golden",
        )
    golden_score_err = 0.0
    golden_grad_err = 0.0
    files = sorted(glob.glob(os.path.join(golden_dir, "*.npz")))

    @jax.jit
    def run_plain(px, py, bnd):
        return frt.mutual_information_recursion(px, py, bnd, calc_gradients=True)

    def run_banded(px, py, bnd, lo, K):
        f = jax.jit(
            lambda px, py, bnd, lo: mutual_information_rows(
                jnp.moveaxis(px, 1, 0), jnp.moveaxis(py, 1, 0), bnd,
                lo=lo, s_range=K, calc_gradients=True,
            )
        )
        s, (gx, gy) = f(px, py, bnd, lo)
        return s, (jnp.moveaxis(gx, 0, 1), jnp.moveaxis(gy, 0, 1))

    for path in files:
        z = np.load(path)
        px = jnp.asarray(z["px"], jnp.float32)
        py = jnp.asarray(z["py"], jnp.float32)
        bnd = jnp.asarray(z["boundary"])
        if "lo" in z.files:
            s, (gx, gy) = run_banded(px, py, bnd, jnp.asarray(z["lo"]), int(z["K"]))
        else:
            s, (gx, gy) = run_plain(px, py, bnd)
        golden_score_err = max(golden_score_err, _abs_err(s, z["scores"]))
        golden_grad_err = max(
            golden_grad_err,
            _abs_err(gx, z["px_grad"]),
            _abs_err(gy, z["py_grad"]),
        )
    out["golden_scores_max_abs_err"] = golden_score_err
    out["golden_grads_max_abs_err"] = golden_grad_err
    out["golden_cases"] = len(files)

    # --- 4. production bf16-lattice mode ---------------------------------
    # force the FUSED build here too: the size-crossover auto dispatch
    # would otherwise route small gate shapes to the XLA build and stop
    # exercising the fused kernels' bf16 output stores (the exact bug
    # class this arm exists to catch)
    _lattice.set_lattice_build_impl("fused")
    try:
        s_b, p_b, _, _, _ = run(None, jnp.bfloat16, am, lm)
    finally:
        _lattice.set_lattice_build_impl(_prev_build)
    out["bf16_loss_rel_err"] = max(_rel_err(s_b, s_d), _rel_err(p_b, p_d))

    @jax.jit
    def conservation_bf16(am_, lm_):
        px, py = frt.get_rnnt_logprobs(lm_, am_, symbols, 0, "regular", boundary)
        _, (gx, gy) = frt.mutual_information_recursion(
            px.astype(jnp.bfloat16), py.astype(jnp.bfloat16), boundary,
            calc_gradients=True,
        )
        tot = gx.astype(jnp.float32).sum((1, 2)) + gy.astype(jnp.float32).sum((1, 2))
        expect = (boundary[:, 2] + boundary[:, 3]).astype(jnp.float32)
        return jnp.max(jnp.abs(tot - expect) / expect)

    out["bf16_occupancy_rel_err"] = float(conservation_bf16(am, lm))
    return out


# pass/fail thresholds.  Loss/grad comparisons are RELATIVE (per-utterance
# losses are O(1000) at the bench shape; two f32 evaluation orders differ
# in the last few ulps of that magnitude).  The round-trip error is
# naturally scaled (seed = 1); golden shapes are tiny so absolute error is
# the sharp criterion there.
TOLERANCES = {
    "fused_vs_xla_loss_rel_err": 1e-4,
    "fused_vs_xla_grad_rel_err": 5e-3,  # grads include ~0-crossing cells
    "roundtrip_max_abs_err": 1e-2,      # fp32, T=1000 lattices
    "golden_scores_max_abs_err": 1e-4,
    # occupancy grads chain safe_exp() terms: the TPU VPU's f32 exp is a
    # few ulp looser than host libm, measured ~1.1e-4 on the golden grads
    # (3e-6 on CPU) — precision, not correctness; scores stay under 1e-4
    "golden_grads_max_abs_err": 5e-4,
    "bf16_loss_rel_err": 2e-2,          # bf16 storage rounding (~0.4%/arc)
    "bf16_occupancy_rel_err": 2e-2,
}

# metrics that must stay ABOVE their threshold (see the tie-robust
# comparison in onchip_parity_gate: near-tie argmax flips between the two
# sides are legitimate in small numbers; a kernel bug craters agreement)
MINIMUMS = {
    # measured r5 (salted seed): 21/30 utterances agree; each utterance
    # makes ~1000 argmax decisions against ~1e-4 cross-impl noise, so a
    # fair fraction catching >= 1 near-tie is expected (binomial sd at
    # B=30 is ~0.08 around ~0.7) — 0.5 stays > 2 sd clear of the healthy
    # band while any real kernel bug (wrong occupancies) craters this to
    # ~0 AND blows the grad tolerance on agreeing rows
    "range_agree_frac": 0.5,
}


def enforce_parity(parity: Dict[str, float]) -> None:
    """Raise FloatingPointError if any gate metric exceeds its tolerance
    (NaN counts as failure)."""
    bad = {
        k: v
        for k, tol in TOLERANCES.items()
        if k in parity and not (float(v := parity[k]) <= tol)
    }
    bad.update(
        {
            k: v
            for k, tol in MINIMUMS.items()
            if k in parity and not (float(v := parity[k]) >= tol)
        }
    )
    if bad:
        lims = {k: TOLERANCES.get(k, MINIMUMS.get(k)) for k in bad}
        raise FloatingPointError(
            f"on-chip parity gate FAILED: {bad} (limits: {lims}) — "
            "compiled kernels are producing wrong numbers; benchmark "
            "results are not certified"
        )
