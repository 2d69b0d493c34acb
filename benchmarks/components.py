"""Component-level TPU timings for the fused pruned pipeline.

Run on the TPU (leave JAX_PLATFORMS unset):  python benchmarks/components.py
Prints one JSON line per component (slope-timed; see utils/profiling.py).

Optional args: ``python benchmarks/components.py [B] [bf16]`` — override
the batch size (the B-scaling investigation) and/or run the production
bf16 mixed-precision mode.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

import fast_rnnt_tpu as frt
from fast_rnnt_tpu.ops import lattice, recursion
from fast_rnnt_tpu.utils.profiling import benchmark_on_device, compiled_memory_mb

B, T, S, C = 30, 1000, 100, 500
S_RANGE = 5
BF16 = "bf16" in sys.argv[1:]
for _a in sys.argv[1:]:
    if _a.isdigit():
        B = int(_a)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
    t_end = np.clip(rng.integers(T // 2, T + 1, size=B), S + 2, T).astype(np.int32)
    s_end = np.clip(rng.integers(S // 2, S + 1, size=B), 2, S).astype(np.int32)
    boundary = jnp.asarray(
        np.stack([np.zeros(B, np.int32), np.zeros(B, np.int32), s_end, t_end], axis=1)
    )
    return am, lm, symbols, boundary


def report(name, fn, *args, mem=False):
    t = benchmark_on_device(fn, *args, iters=20, trials=3)
    row = {"component": name, "us": round(t * 1e6, 1)}
    if mem:
        try:
            row["peak_mb"] = round(compiled_memory_mb(fn, *args)["peak_mb"], 1)
        except Exception:
            pass
    print(json.dumps(row), flush=True)
    return t


def main():
    am, lm, symbols, boundary = make_inputs()
    lattice_dtype = None
    if BF16:
        am, lm = am.astype(jnp.bfloat16), lm.astype(jnp.bfloat16)
        lattice_dtype = jnp.bfloat16
    print(
        json.dumps(
            {"device": str(jax.devices()[0]), "B": B, "bf16": BF16}
        ),
        flush=True,
    )

    # full fused step (the bench.py headline)
    def fused_step(am, lm):
        def loss_fn(am, lm):
            s, p, _ = frt.rnnt_loss_simple_pruned(
                lm, am, symbols, 0, S_RANGE, boundary, reduction="sum",
                lattice_dtype=lattice_dtype,
            )
            return 0.5 * s + p

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(am, lm)

    report("fused_step_value_and_grad", fused_step, am, lm, mem=True)

    # stage 1 alone: forward-only simple loss + occupancies
    def stage1(am, lm):
        return frt.rnnt_loss_simple(
            lm, am, symbols, 0, boundary, reduction="none", calc_gradients=True
        )

    report("stage1_simple_with_occupancies_fwd", stage1, am, lm)

    # lattice build alone (rows layout)
    def build(am, lm):
        return lattice.get_rnnt_logprobs_rows(lm, am, symbols, 0, "regular", boundary)

    report("lattice_build_rows_fwd", build, am, lm)

    # A/B the build implementations (round 3): einsum vs fused kernel,
    # forward and forward+VJP (clean cotangents: zero on -inf positions)
    def build_vjp(am, lm):
        def f(a, l):
            px, py = lattice.get_rnnt_logprobs_rows(
                l, a, symbols, 0, "regular", boundary
            )
            return (
                jnp.sum(jnp.where(jnp.isinf(px), 0.0, px))
                + jnp.sum(jnp.where(jnp.isinf(py), 0.0, py))
            )

        return jax.value_and_grad(f, argnums=(0, 1))(am, lm)

    for impl_name in ("xla", "fused"):
        try:
            lattice.set_lattice_build_impl(impl_name)
            report(f"lattice_build_rows_fwd[{impl_name}]", build, am, lm)
            report(f"lattice_build_rows_vjp[{impl_name}]", build_vjp, am, lm)
        finally:
            lattice.set_lattice_build_impl("auto")

    px_rows, py_rows = build(am, lm)
    px_rows = jax.block_until_ready(px_rows)

    # recursion kernels alone on prebuilt rows
    def rec_fwd(px_rows, py_rows):
        return recursion.mutual_information_rows(
            px_rows, py_rows, boundary, calc_gradients=False
        )

    report("recursion_rows_scores_only", rec_fwd, px_rows, py_rows)

    def rec_wg(px_rows, py_rows):
        return recursion.mutual_information_rows(
            px_rows, py_rows, boundary, calc_gradients=True
        )

    report("recursion_rows_with_occupancies", rec_wg, px_rows, py_rows)

    # banded recursion (stage-2 kernel) on the same rows
    lo = jnp.asarray(
        np.minimum(
            (np.arange(T)[None, :] * (S - S_RANGE + 1) // T).astype(np.int32),
            S - S_RANGE + 1,
        )
        * np.ones((B, 1), np.int32)
    )

    def rec_banded(px_rows, py_rows, lo):
        return recursion.mutual_information_rows(
            px_rows, py_rows, boundary, lo=lo, s_range=S_RANGE,
            calc_gradients=False,
        )

    report("recursion_rows_banded_scores", rec_banded, px_rows, py_rows, lo)

    def rec_banded_grad(px_rows, py_rows, lo):
        f = lambda a, b: jnp.sum(
            recursion.mutual_information_rows(
                a, b, boundary, lo=lo, s_range=S_RANGE, calc_gradients=False
            )
        )
        return jax.value_and_grad(f, argnums=(0, 1))(px_rows, py_rows)

    report("recursion_rows_banded_value_and_grad", rec_banded_grad,
           px_rows, py_rows, lo)

    # prune ranges alone
    _, (gx, gy) = rec_wg(px_rows, py_rows)
    gx = jax.block_until_ready(gx)

    def ranges_fn(gx, gy):
        return frt.get_rnnt_prune_ranges_rows(gx, gy, boundary, S_RANGE)

    report("prune_ranges_rows", ranges_fn, gx, gy)


if __name__ == "__main__":
    main()
