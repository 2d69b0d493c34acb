"""Tracing / profiling / benchmarking utilities.

The reference has no observability at all (SURVEY.md §5: prints in tests
only).  Here: jax.profiler trace annotations around the hot ops, a device
memory probe, and an honest step-timing helper (remote-tunnel device
runtimes can return early from block_until_ready for results that were
never transferred, so timing must amortize dispatches and force a final
device_get)."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax

__all__ = [
    "annotate",
    "trace_to",
    "device_memory_stats",
    "compiled_memory_mb",
    "benchmark_fn",
    "benchmark_on_device",
    "benchmark_carried_on_device",
    "collective_census",
]

_COLLECTIVE_KINDS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
)


def collective_census(compiled_text: str, lattice_dims=()) -> Dict[str, Any]:
    """Count collective ops in an optimized HLO module and flag any that
    move lattice-sized tensors.

    ``lattice_dims`` are dimension extents (e.g. T and T+1) that only
    occur in lattice-shaped arrays; a collective whose RESULT or any
    OPERAND shape contains one of them is recorded in
    ``census["lattice_moves"]``.  Covers reduce-scatter too — a
    reduce-scatter whose large operand shrinks in the result would evade
    a result-shape-only scan (ADVICE r4).  Counts op definitions
    (``<name> = <shape> <kind>(...)``) including ``-start`` forms, not
    ``-done`` bookkeeping."""
    import re

    census: Dict[str, Any] = {k: 0 for k in _COLLECTIVE_KINDS}
    census["lattice_moves"] = []
    dims = {str(int(d)) for d in lattice_dims}
    for line in compiled_text.splitlines():
        s = line.strip()
        for kind in _COLLECTIVE_KINDS:
            if f" {kind}(" in s or f" {kind}-start(" in s:
                census[kind] += 1
                if dims:
                    # every shape on the line: result (lhs) and operands
                    for shape in re.findall(r"\[([0-9,]+)\]", s):
                        if dims & set(shape.split(",")):
                            census["lattice_moves"].append(s[:160])
                            break
    return census


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the jax profiler timeline (no-op overhead otherwise)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a full device trace to ``log_dir`` (view with TensorBoard or
    xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Best-effort device memory stats in MB (empty dict if the backend
    doesn't expose them, e.g. remote tunnels)."""
    dev = device or jax.devices()[0]
    stats = {}
    try:
        raw = dev.memory_stats() or {}
    except Exception:
        raw = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in raw:
            stats[key.replace("bytes", "mb")] = raw[key] / (1024 * 1024)
    return stats


def benchmark_fn(
    fn: Callable[..., Any],
    *args: Any,
    iters: int = 20,
    warmup: int = 3,
) -> float:
    """Average seconds per call of a jitted ``fn`` on its device.

    Dispatches ``iters`` calls back-to-back and synchronizes once at the
    end (device execution is serial per device, so the amortized time is
    the true step time; per-call block_until_ready would instead measure
    host round-trips on tunneled devices)."""

    def _sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            jax.device_get(leaves[0])
        jax.block_until_ready(out)

    for _ in range(warmup):
        out = fn(*args)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def compiled_memory_mb(fn: Callable[..., Any], *args: Any) -> Dict[str, float]:
    """Compile-time peak-HBM UPPER BOUND from XLA's memory analysis
    (available even on remote tunnels where ``device.memory_stats()`` is
    empty).  ``peak_mb`` = arguments + outputs + temporaries - aliased:
    these are XLA's actual allocation sizes for the program, but summing
    them is an upper bound on the measured in-use peak (buffers whose live
    ranges don't overlap aren't double-counted *within* the temp segment,
    while argument/output buffers are counted whole).  Cross-check against
    ``device_memory_stats()`` where the backend reports it."""
    comp = jax.jit(fn).lower(*args).compile()
    ma = comp.memory_analysis()
    mb = 1.0 / (1024 * 1024)
    out = {
        "argument_mb": ma.argument_size_in_bytes * mb,
        "output_mb": ma.output_size_in_bytes * mb,
        "temp_mb": ma.temp_size_in_bytes * mb,
        "code_mb": ma.generated_code_size_in_bytes * mb,
    }
    out["peak_mb"] = (
        out["argument_mb"] + out["output_mb"] + out["temp_mb"] - (
            ma.alias_size_in_bytes * mb
        )
    )
    # XLA's buffer-assignment peak (live-range aware) where the backend
    # fills it; 0 on backends that don't (e.g. this jaxlib's CPU client).
    # Cross-checked against an OS-measured execution peak in
    # scripts/measure_memory.py (BENCH.md memory-validation table).
    peak = getattr(ma, "peak_memory_in_bytes", 0) or 0
    if peak:
        out["xla_peak_mb"] = peak * mb
    return out


def benchmark_on_device(
    step: Callable[..., Any],
    *args: Any,
    iters: int = 20,
    trials: int = 3,
    perturb: Optional[Callable[..., Any]] = None,
) -> float:
    """True device seconds/step: run ``iters`` steps inside ONE dispatched
    ``lax.fori_loop`` program, so host->device dispatch latency (~0.5 ms per
    call through remote tunnels) doesn't pollute the measurement.

    The loop body is made loop-variant (``perturb(i, *args)`` — by default a
    tiny i-scaled bump on the first float argument) so XLA cannot hoist it,
    and every output leaf's first element is folded into the carried
    accumulator so nothing is dead-code-eliminated.

    Each dispatch also carries a LARGE fixed cost on tunneled devices
    (~30 ms round-trip, independent of the program), so a single
    total/iters estimate is still polluted.  We therefore time the same
    program at ``iters`` and ``3*iters`` loop trips (trip count is a
    runtime scalar — one compile) and report the MEDIAN over ``trials``
    of the slope (t_3n - t_n) / (2n), which cancels every per-dispatch
    constant and is robust to one-off tunnel hiccups."""
    import jax.numpy as jnp

    def default_perturb(i, *a):
        a = list(a)
        for k, x in enumerate(a):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                a[k] = x + (1e-12 * i).astype(x.dtype)
                break
        return tuple(a)

    pert = perturb or default_perturb

    def looped(n, *a):
        def body(i, acc):
            out = step(*pert(i, *a))
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + jnp.ravel(leaf)[0].astype(jnp.float32)
            return acc

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(looped)
    n1 = jnp.int32(iters)
    n3 = jnp.int32(3 * iters)
    float(jax.device_get(f(n1, *args)))  # compile + warm
    float(jax.device_get(f(n3, *args)))

    def run(n):
        t0 = time.perf_counter()
        out = f(n, *args)
        float(jax.device_get(out))
        return time.perf_counter() - t0

    slopes = []
    for _ in range(trials):
        t_n = run(n1)
        t_3n = run(n3)
        slopes.append(max(t_3n - t_n, 0.0) / (2 * iters))
    slopes.sort()
    mid = len(slopes) // 2
    if len(slopes) % 2:
        return slopes[mid]
    return 0.5 * (slopes[mid - 1] + slopes[mid])


def benchmark_carried_on_device(
    step: Callable[..., Any],
    carry: Any,
    *args: Any,
    iters: int = 20,
    trials: int = 3,
) -> float:
    """:func:`benchmark_on_device` for STATEFUL steps:
    ``step(carry, *args) -> new_carry`` (e.g. a streaming decode step).
    The carry chains every iteration to the previous one, so the loop is
    inherently sequential and nothing can be hoisted or dead-code
    eliminated.  Same median-of-slopes estimator (per-dispatch constants
    cancel)."""
    import jax.numpy as jnp

    def looped(n, carry, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, c: step(c, *a), carry
        )

    f = jax.jit(looped)
    n1 = jnp.int32(iters)
    n3 = jnp.int32(3 * iters)

    def run(n):
        t0 = time.perf_counter()
        out = f(n, carry, *args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    run(n1)  # compile + warm
    run(n3)
    slopes = []
    for _ in range(trials):
        t_n = run(n1)
        t_3n = run(n3)
        slopes.append(max(t_3n - t_n, 0.0) / (2 * iters))
    slopes.sort()
    mid = len(slopes) // 2
    if len(slopes) % 2:
        return slopes[mid]
    return 0.5 * (slopes[mid - 1] + slopes[mid])
