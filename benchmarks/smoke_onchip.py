"""Tiny on-chip compile-and-correctness smoke for the Pallas kernels.

Run FIRST when TPU time is scarce: compiles the fused two-stage pipeline
(fused lattice build + wavefront fwd/bwd + ranges kernel) at a small
shape, executes one step, and checks values/grads against impl="xla"
with the XLA build — so a Mosaic backend-compile or numerics bug is
isolated here in ~a minute instead of mid-bench.  Exit code 0 = kernels
compile and agree on hardware.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fast_rnnt_tpu as frt  # noqa: E402
from fast_rnnt_tpu.ops import lattice  # noqa: E402


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    rng = np.random.default_rng(0)
    B, T, S, C, K = 4, 300, 17, 80, 5
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
    boundary = jnp.asarray(
        np.stack(
            [
                np.zeros(B, np.int32),
                np.zeros(B, np.int32),
                rng.integers(S // 2, S + 1, size=B).astype(np.int32),
                rng.integers(T // 2, T + 1, size=B).astype(np.int32),
            ],
            1,
        )
    )

    def step(lm_, am_, impl):
        def loss_fn(lm__, am__):
            simple, pruned, _ = frt.rnnt_loss_simple_pruned(
                lm__, am__, symbols, 0, K, boundary, reduction="sum",
                impl=impl,
            )
            return 0.5 * simple + pruned

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(lm_, am_)

    failures = 0
    ref = (None, None, None)
    for name, build, impl in (
        ("fused+pallas", "fused", None),
        ("xla-build+pallas", "xla", None),
        ("xla-build+xla", "xla", "xla"),
    ):
        lattice.set_lattice_build_impl(build)
        try:
            v, (glm, gam) = jax.jit(
                lambda lm_, am_: step(lm_, am_, impl)
            )(lm, am)
            v = float(v)
            print(
                f"{name}: loss={v:.6f} |glm|={float(jnp.abs(glm).max()):.6f}"
                f" |gam|={float(jnp.abs(gam).max()):.6f}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            failures += 1
            v, glm, gam = None, None, None
        if name == "fused+pallas":
            ref = (v, glm, gam)
        elif v is not None and ref[0] is not None:
            err = abs(v - ref[0]) / max(1.0, abs(v))
            gerr = max(
                float(jnp.max(jnp.abs(glm - ref[1])))
                / (1.0 + float(jnp.max(jnp.abs(ref[1])))),
                float(jnp.max(jnp.abs(gam - ref[2])))
                / (1.0 + float(jnp.max(jnp.abs(ref[2])))),
            )
            print(f"  vs fused: rel-loss-err={err:.2e} grad-rel-err={gerr:.2e}")
            if err > 1e-4 or gerr > 1e-3:
                print("  MISMATCH")
                failures += 1
    lattice.set_lattice_build_impl("auto")

    print("SMOKE", "FAILED" if failures else "PASSED")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
