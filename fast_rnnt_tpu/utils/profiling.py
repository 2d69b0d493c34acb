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

__all__ = ["annotate", "trace_to", "device_memory_stats", "benchmark_fn"]


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
