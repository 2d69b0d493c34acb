"""Minimal repro: the batched fused lattice-build kernel with a batch
block (bblk) of 16 or 32 crashes the Mosaic REMOTE compile service with
an opaque HTTP 500 (round-4 finding, BENCH.md); bblk=8 compiles and runs.

The round-4 batched rewrite rides the bblk rows as dot_general batch
dimensions; raising bblk would amortize the per-tile side-input loads
further, but the remote compiler rejects the program before any Mosaic
diagnostic is produced, so the headroom is stuck behind an infra error
we cannot see into from this environment.

Run on the TPU:  python benchmarks/repro_bblk_mosaic500.py [bblk ...]
(defaults to trying 8, 16, 32).  Prints one line per bblk: OK (timing)
or the exception class + first line.  File this output with the repro
when reporting upstream.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from fast_rnnt_tpu.ops.kernels import latbuild
from fast_rnnt_tpu.ops import lattice


def try_bblk(bblk: int, B=32, T=1000, S=100, C=500):
    """Force the build kernel's batch block to ``bblk`` and compile+run
    the forward at the benchmark shape."""
    rng = np.random.default_rng(0)
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))

    orig = latbuild._shape_params

    def patched(B_, T_, modified):
        wpx, _, _, nt, nt_am = orig(B_, T_, modified)
        nb = -(-B_ // bblk)
        return wpx, bblk, nb, nt, nt_am

    latbuild._shape_params = patched
    # fresh trace caches: the partitioned wrappers memoize per static key,
    # and bblk is not part of the key (it is derived inside the core)
    latbuild._build_fwd_partitioned.cache_clear()
    try:
        f = jax.jit(
            lambda l, a: latbuild.lattice_rows_fused(
                l, a, symbols, 0, "regular", None
            )
        )
        t0 = time.perf_counter()
        px, py = f(lm, am)
        jax.block_until_ready(py)
        dt = time.perf_counter() - t0
        # timed re-run (compiled)
        t0 = time.perf_counter()
        jax.block_until_ready(f(lm, am)[1])
        return f"OK  compile+run {dt:.1f}s, warm call {time.perf_counter()-t0:.4f}s"
    except Exception as e:
        first = repr(e).splitlines()[0][:160]
        return f"{type(e).__name__}: {first}"
    finally:
        latbuild._shape_params = orig
        latbuild._build_fwd_partitioned.cache_clear()


if __name__ == "__main__":
    blks = [int(x) for x in sys.argv[1:]] or [8, 16, 32]
    print(f"device: {jax.devices()[0]}")
    for bblk in blks:
        print(f"bblk={bblk}: {try_bblk(bblk)}", flush=True)
