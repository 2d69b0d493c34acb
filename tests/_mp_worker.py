"""Worker for the true multi-process distributed test (test_multiprocess.py).

Each process:
  1. calls fast_rnnt_tpu.parallel.initialize_distributed (the subsystem
     under test — 0% covered by single-process tests),
  2. joins a GLOBAL 1-D data mesh spanning both processes' CPU devices,
  3. builds its shard of a deterministic batch and runs the data-parallel
     value_and_grad of the simple RNN-T loss,
  4. process 0 compares against the single-device computation and writes
     the verdict file the parent asserts on.

Run (by the test):  python -m tests._mp_worker <pid> <nproc> <port> <outfile>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # site hook pre-imports jax

import numpy as np  # noqa: E402


def main():
    pid, nproc, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import fast_rnnt_tpu as frt
    from fast_rnnt_tpu.parallel.sharding import (
        batch_sharding,
        data_parallel_value_and_grad,
        initialize_distributed,
        make_mesh,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    mesh = make_mesh()  # all global devices
    ndev = len(jax.devices())

    rng = np.random.default_rng(7)
    B, T, S, C = ndev * 2, 12, 4, 8
    am = rng.normal(size=(B, T, C)).astype(np.float32)
    lm = rng.normal(size=(B, S + 1, C)).astype(np.float32)
    symbols = rng.integers(1, C, size=(B, S)).astype(np.int32)
    boundary = np.tile(np.array([0, 0, S, T], np.int32), (B, 1))
    params = {"w": np.float32(1.25)}

    sharding = batch_sharding(mesh)

    def make_global(x):
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    batch = tuple(make_global(x) for x in (lm, am, symbols, boundary))
    params_g = jax.device_put(
        params, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )

    def loss_fn(params, lm, am, symbols, boundary):
        return frt.rnnt_loss_simple(
            lm * params["w"], am, symbols, 0, boundary, reduction="sum"
        )

    step = data_parallel_value_and_grad(loss_fn, mesh)
    loss, grads = step(params_g, *batch)
    loss = float(np.asarray(loss))
    gw = float(np.asarray(grads["w"]))

    if pid == 0:
        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
            params,
            *(np.asarray(x) for x in (lm, am, symbols, boundary)),
        )
        ok = (
            abs(loss - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))
            and abs(gw - float(ref_grads["w"]))
            < 1e-3 * max(1.0, abs(float(ref_grads["w"])))
        )
        with open(outfile, "w") as f:
            f.write(
                f"{'OK' if ok else 'MISMATCH'} {loss} {float(ref_loss)} "
                f"{gw} {float(ref_grads['w'])} ndev={ndev}"
            )
    # all processes must reach shutdown together (collectives are global)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
