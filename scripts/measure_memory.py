"""Measured-memory cross-check for the compile-time peak estimator
(VERDICT r2 item 5).

``utils.profiling.compiled_memory_mb`` reports XLA's compile-time
allocation sizes (args + outputs + temps - aliased) — an UPPER BOUND on
the true in-use peak.  The TPU tunnel exposes no ``memory_stats()`` and
this jaxlib's CPU backend returns None too, so this script MEASURES the
execution peak on the CPU backend directly from the OS:

  1. compile the program and materialize its inputs;
  2. reset the process RSS high-water mark (``/proc/self/clear_refs``);
  3. execute once and read ``VmHWM`` — the measured peak RSS during
     execution;
  4. measured_peak = (VmHWM - RSS_before_run) + argument_bytes
     (arguments are already resident before the run; temps + outputs
     allocate during it).

Each config runs in a FRESH subprocess so allocator history can't
pollute the high-water mark.  Results (estimate vs measured, ratio) go
into BENCH.md's memory-validation table.

Run:  python scripts/measure_memory.py            # all configs, JSON lines
      python scripts/measure_memory.py <name>     # one config (subprocess)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _proc_status_mb(key: str) -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(key + ":"):
                return int(line.split()[1]) / 1024.0  # kB -> MB
    raise KeyError(key)


def _reset_hwm() -> None:
    # "5" resets the peak RSS high-water mark to the current RSS
    with open("/proc/self/clear_refs", "w") as f:
        f.write("5")


def _make_config(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fast_rnnt_tpu as frt

    def fused_step(B, T, S, C, s_range, lattice_dtype=None):
        rng = np.random.default_rng(0)
        am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
        symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
        boundary = jnp.asarray(
            np.stack([np.zeros(B, np.int32), np.zeros(B, np.int32),
                      np.full(B, S, np.int32), np.full(B, T, np.int32)], 1)
        )

        def step(am, lm):
            def loss_fn(am, lm):
                simple, pruned, _ = frt.rnnt_loss_simple_pruned(
                    lm, am, symbols, 0, s_range, boundary, reduction="sum",
                    lattice_dtype=lattice_dtype,
                )
                return 0.5 * simple + pruned

            return jax.value_and_grad(loss_fn, argnums=(0, 1))(am, lm)

        return step, (am, lm)

    def unpruned_step(B, T, S, C):
        rng = np.random.default_rng(0)
        am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
        symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))

        def step(am, lm):
            def loss_fn(am, lm):
                logits = lm[:, None, :, :] + am[:, :, None, :]
                return frt.rnnt_loss(logits, symbols, 0, None, reduction="sum")

            return jax.value_and_grad(loss_fn, argnums=(0, 1))(am, lm)

        return step, (am, lm)

    configs = {
        # the [B,T,S+1,C] materialized path: temps dominate, sharpest check
        "unpruned_B4_T200_S40_C128": lambda: unpruned_step(4, 200, 40, 128),
        # fused band-native step at half bench scale
        "fused_B16_T500_S50_C256": lambda: fused_step(16, 500, 50, 256, 5),
        # the headline bench shape (fp32, XLA impl on CPU)
        "fused_B30_T1000_S100_C500": lambda: fused_step(30, 1000, 100, 500, 5),
        # production bf16 lattice mode at the bench shape
        "fused_bf16_B30_T1000_S100_C500": lambda: fused_step(
            30, 1000, 100, 500, 5, lattice_dtype=jnp.bfloat16
        ),
    }
    return configs[name]()


def run_one(name: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from fast_rnnt_tpu.utils.profiling import compiled_memory_mb

    step, args = _make_config(name)
    est = compiled_memory_mb(step, *args)
    compiled = jax.jit(step).lower(*args).compile()

    import gc

    gc.collect()
    rss_before = _proc_status_mb("VmRSS")
    _reset_hwm()
    out = compiled(*args)
    jax.block_until_ready(out)
    hwm = _proc_status_mb("VmHWM")
    measured = (hwm - rss_before) + est["argument_mb"]
    print(json.dumps({
        "config": name,
        "estimate_peak_mb": round(est["peak_mb"], 1),
        "xla_buffer_assignment_peak_mb": round(est.get("xla_peak_mb", 0.0), 1),
        "measured_peak_mb": round(measured, 1),
        "estimate_over_measured": round(est["peak_mb"] / measured, 3)
        if measured > 0 else None,
        "argument_mb": round(est["argument_mb"], 1),
        "exec_delta_mb": round(hwm - rss_before, 1),
    }), flush=True)


CONFIG_NAMES = [
    "unpruned_B4_T200_S40_C128",
    "fused_B16_T500_S50_C256",
    "fused_B30_T1000_S100_C500",
    "fused_bf16_B30_T1000_S100_C500",
]


def main() -> None:
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    for name in CONFIG_NAMES:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), name], check=True
        )


if __name__ == "__main__":
    main()
