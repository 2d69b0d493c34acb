"""Benchmark: pruned RNN-T loss training step on the transducer-loss-
benchmarking workload (BASELINE.md; B=30, T=1000, S=100, C=500, s_range=5).

Measures what the reference's published 38,112 µs covers: forward + backward
of the full pruned pipeline (simple loss w/ occupancy grads -> prune ranges
-> pruning gathers -> additive joiner -> pruned loss) w.r.t. (am, lm).

Prints ONE JSON line:
  {"metric": ..., "value": <avg step µs>, "unit": "us", "vs_baseline": <x>}
vs_baseline > 1 means faster than the reference's GPU number.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

import fast_rnnt_tpu as frt

BASELINE_US = 38112.0  # /root/reference/README.md:166
BASELINE_MB = 2647.8

B, T, S, C = 30, 1000, 100, 500
S_RANGE = 5
TRIALS = 3  # timed n/3n slope-trial pairs (see utils.profiling)
ITERS = 20


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    am = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    lm = jnp.asarray(rng.normal(size=(B, S + 1, C)).astype(np.float32))
    symbols = jnp.asarray(rng.integers(1, C, size=(B, S)).astype(np.int32))
    # ragged lengths like the benchmarking workload
    t_end = np.clip(rng.integers(T // 2, T + 1, size=B), S + 2, T).astype(np.int32)
    s_end = np.clip(rng.integers(S // 2, S + 1, size=B), 2, S).astype(np.int32)
    boundary = jnp.asarray(
        np.stack([np.zeros(B, np.int32), np.zeros(B, np.int32), s_end, t_end], axis=1)
    )
    return am, lm, symbols, boundary


def _round_salt():
    """Per-round parity salt (VERDICT r4 item 6): derive the parity-gate
    input seed from git HEAD (override: FRT_BENCH_SALT env var) so each
    round's parity numbers provably come from FRESH inputs — a gate whose
    constants cannot move across kernel rewrites is a gate that cannot
    fail loudly.  The golden-vector arm keeps its committed fixed inputs
    for cross-round continuity; the TIMED workload also stays at seed 0
    so step times remain comparable across rounds."""
    import hashlib
    import os
    import subprocess

    salt = os.environ.get("FRT_BENCH_SALT", "")
    if not salt:
        try:
            salt = subprocess.run(
                ["git", "rev-parse", "--short=12", "HEAD"],
                capture_output=True, text=True, timeout=10,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip()
        except Exception:
            salt = ""
    if not salt:
        import time

        salt = time.strftime("%Y%m%d")  # still fresh per day
    seed = int(hashlib.sha256(salt.encode()).hexdigest()[:8], 16)
    return salt, seed


def _input_hash(arrays) -> str:
    import hashlib

    h = hashlib.sha256()
    for a in arrays:
        h.update(np.asarray(a).tobytes())
    return h.hexdigest()[:12]


def step_fn(am, lm, symbols, boundary):
    lattice_dtype = jnp.bfloat16 if am.dtype == jnp.bfloat16 else None

    def loss_fn(am, lm):
        # The benchmark workload's joiner is additive (logits = am_p + lm_p),
        # so the fused band-native pipeline applies: numerically equal to
        # rnnt_loss_simple(calc_gradients=True) -> get_rnnt_prune_ranges ->
        # do_rnnt_pruning -> rnnt_loss_pruned(am_p + lm_p, ...) (parity-
        # tested in tests/test_losses.py), but the lattice is built once,
        # band-masked in-register, and the [B, T, s_range, C] logits are
        # never materialized.  bf16 inputs also store the lattice bf16
        # (recursion still computes f32 in-register).
        simple_loss, pruned_loss, _ranges = frt.rnnt_loss_simple_pruned(
            lm, am, symbols, 0, S_RANGE, boundary, reduction="sum",
            lattice_dtype=lattice_dtype,
        )
        return 0.5 * simple_loss + pruned_loss

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(am, lm)
    return loss, grads


def main():
    from fast_rnnt_tpu.utils.parity import enforce_parity, onchip_parity_gate
    from fast_rnnt_tpu.utils.profiling import benchmark_on_device, compiled_memory_mb

    dev = jax.devices()[0]
    inputs = make_inputs()

    # On-chip COMPILED correctness gate before any timing (the reference
    # self-checks on every call, tf_fast_rnnt_op.cc:110; here the
    # equivalent evidence is produced once per bench run on the real
    # device): fused-vs-XLA, occupancy round-trip, golden vectors, bf16
    # production mode.  Enforced after the JSON is printed so the driver
    # records the numbers either way; a failure exits nonzero.
    parity_failed = None
    salt, parity_seed = _round_salt()
    parity_inputs = make_inputs(seed=parity_seed)
    try:
        parity = onchip_parity_gate(*parity_inputs, s_range=S_RANGE)
        try:
            enforce_parity(parity)
        except FloatingPointError as e:
            parity_failed = str(e)
        parity = {
            k: (round(v, 8) if isinstance(v, float) else v)
            for k, v in parity.items()
        }
        parity["ok"] = parity_failed is None
    except Exception as e:  # infra failure != parity failure; keep timing
        parity = {"ok": None, "error": repr(e)[:200]}
    parity["salt"] = salt
    parity["input_hash"] = _input_hash(parity_inputs)

    # device-side timing loop: one dispatch runs ITERS full steps, so host
    # dispatch latency (~0.5 ms/call through remote tunnels) is excluded —
    # this measures what a saturated input pipeline would see.
    #
    # Safety net: if the auto dispatch's Mosaic compile ever fails on a
    # new runtime, fall back to the XLA einsum build rather than losing
    # the whole bench run — the JSON then carries build_impl=
    # "xla_fallback" so the regression is visible.  Report what the auto
    # dispatch ACTUALLY resolves to for this workload (the real dispatch
    # predicate, not a re-derivation: it also accounts for the size
    # crossover, dtype gates, and Pallas availability).
    from fast_rnnt_tpu.ops import lattice as _lat

    build_impl = (
        "fused"
        if _lat._use_fused_build(inputs[1], inputs[0], inputs[2])
        else "xla_by_dispatch"
    )
    try:
        avg_s = benchmark_on_device(step_fn, *inputs, iters=ITERS, trials=TRIALS)
    except Exception:
        from fast_rnnt_tpu.ops import lattice as _lattice

        _lattice.set_lattice_build_impl("xla")
        build_impl = "xla_fallback"
        avg_s = benchmark_on_device(step_fn, *inputs, iters=ITERS, trials=TRIALS)
    avg_us = float(avg_s * 1e6)

    # peak HBM from XLA's compiled allocation analysis (exact; the remote
    # tunnel's device.memory_stats() is empty)
    try:
        peak_mb = compiled_memory_mb(step_fn, *inputs)["peak_mb"]
    except Exception:
        stats = dev.memory_stats() or {}
        peak_mb = stats.get("peak_bytes_in_use", 0) / (1024 * 1024)

    # audio throughput: benchmark frames are 4x-subsampled 10 ms hops
    audio_seconds = float(np.asarray(inputs[3])[:, 3].sum()) * 0.04
    result = {
        "metric": "pruned_rnnt_train_step",
        "value": round(avg_us, 1),
        "unit": "us",
        "vs_baseline": round(BASELINE_US / avg_us, 3),
        "peak_hbm_mb": round(peak_mb, 1),
        "peak_hbm_vs_baseline": round(BASELINE_MB / peak_mb, 3) if peak_mb else None,
        "audio_seconds_per_s": round(audio_seconds / avg_s, 1),
        "device": str(dev),
        "workload": {"B": B, "T": T, "S": S, "C": C, "s_range": S_RANGE},
        "build_impl": build_impl,
        "parity": parity,
    }
    print(json.dumps(result), flush=True)

    # bf16 mixed-precision mode (am/lm inputs bf16; lattice accumulation and
    # the recursion stay fp32) — the recommended production setting
    am, lm, symbols, boundary = inputs
    bf16_inputs = (
        am.astype(jnp.bfloat16), lm.astype(jnp.bfloat16), symbols, boundary
    )
    avg_s16 = benchmark_on_device(step_fn, *bf16_inputs, iters=ITERS, trials=TRIALS)
    avg_us16 = float(avg_s16 * 1e6)
    try:
        peak_mb16 = compiled_memory_mb(step_fn, *bf16_inputs)["peak_mb"]
    except Exception:
        peak_mb16 = 0.0
    print(
        json.dumps(
            {
                "metric": "pruned_rnnt_train_step_bf16_inputs",
                "value": round(avg_us16, 1),
                "unit": "us",
                "vs_baseline": round(BASELINE_US / avg_us16, 3),
                "peak_hbm_mb": round(peak_mb16, 1),
                "audio_seconds_per_s": round(audio_seconds / avg_s16, 1),
                "parity_ok": parity["ok"],
            }
        ),
        flush=True,
    )

    # --- training convergence (fourth JSON line; VERDICT r4 item 2b) -----
    # Tiny conformer transducer overfit ON-CHIP in one dispatch (the whole
    # adamw loop is a lax.scan); certifies that the fused pruned pipeline
    # actually TRAINS on hardware: loss must drop >= 20x and greedy decode
    # must recover the targets.  A timing is not a convergence certificate
    # (BENCH.md round-4 verdict) — this is the certificate.
    try:
        conv = training_convergence_bench()
        print(json.dumps(conv), flush=True)
        if not conv.get("converged", False):
            parity_failed = (parity_failed or "") + " TRAINING DID NOT CONVERGE"
    except Exception as e:
        print(
            json.dumps({"metric": "training_convergence", "error": repr(e)[:200]}),
            flush=True,
        )

    # --- streaming serving (third JSON line; VERDICT r2 item 7) ----------
    # Causal conformer (6L/256d, bf16 compute, 32-frame attention window),
    # 320 ms chunks, STATEFUL encoder (per-layer carried state; each step
    # encodes only the chunk) + batched greedy decode.  No reference
    # baseline exists (the reference ships no inference).
    try:
        stream = streaming_bench()
        print(json.dumps(stream), flush=True)
    except Exception as e:  # never lose the training-step rows over this
        print(
            json.dumps({"metric": "streaming_serving", "error": repr(e)[:200]}),
            flush=True,
        )

    if parity_failed is not None:
        raise SystemExit(f"PARITY GATE FAILED: {parity_failed}")


def training_convergence_bench(steps=300, B=16, S=6, frames_per_sym=8):
    """Overfit a tiny conformer transducer on a synthetic copy task, fully
    on-chip: the entire adamw training loop is ONE ``lax.scan`` dispatch.
    Returns a JSON row asserting loss drop >= 20x AND >= 95% greedy token
    accuracy on the trained batch (the targets are recoverable: each
    symbol is painted into ``frames_per_sym`` feature frames)."""
    import time

    import optax

    from fast_rnnt_tpu.models import (
        LossConfig,
        TransducerConfig,
        greedy_search,
        init_model,
    )
    from fast_rnnt_tpu.models.training import pruned_transducer_loss

    VOCAB = FEAT = 16
    T_in = S * frames_per_sym
    rng = np.random.default_rng(0)
    syms = rng.integers(1, VOCAB, size=(B, S)).astype(np.int32)
    frames = np.repeat(
        np.eye(FEAT, dtype=np.float32)[syms], frames_per_sym, axis=1
    )
    frames = frames + 0.1 * rng.normal(size=frames.shape).astype(np.float32)
    feats = jnp.asarray(frames)
    flens = jnp.full((B,), T_in, jnp.int32)
    symbols = jnp.asarray(syms)
    slens = jnp.full((B,), S, jnp.int32)

    cfg = TransducerConfig(
        vocab_size=VOCAB, feature_dim=FEAT, d_model=64, d_joiner=64,
        num_layers=2, num_heads=2, conv_kernel=7, dtype=jnp.float32,
    )
    model, params = init_model(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(3e-3)
    loss_cfg = LossConfig(s_range=4)

    def loss_fn(p):
        total, _ = pruned_transducer_loss(
            p, model, feats, flens, symbols, slens, loss_cfg
        )
        return total

    def one_step(carry, _):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    @jax.jit
    def train(p, o):
        return jax.lax.scan(one_step, (p, o), None, length=steps)

    t0 = time.perf_counter()
    (params_f, _), losses = train(params, opt.init(params))
    losses = np.asarray(jax.block_until_ready(losses))
    wall = time.perf_counter() - t0

    hyps, hlens = jax.jit(
        lambda p, f, l: greedy_search(model, p, f, l, max_len=S + 2)
    )(params_f, feats, flens)
    hyps, hlens = np.asarray(hyps), np.asarray(hlens)
    hits = total = 0
    for b in range(B):
        total += S
        m = min(int(hlens[b]), S)
        hits += int((hyps[b, :m] == syms[b, :m]).sum())
    acc = hits / total
    drop = float(losses[0] / max(float(losses[-10:].min()), 1e-9))
    return {
        "metric": "training_convergence",
        "value": round(acc, 4),
        "unit": "greedy_token_accuracy",
        "vs_baseline": None,  # the reference ships no trainer
        "loss_first": round(float(losses[0]), 2),
        "loss_last": round(float(losses[-1]), 2),
        "loss_drop_x": round(drop, 1),
        "steps": steps,
        "onchip_loop": "lax.scan (single dispatch)",
        "wall_s_incl_compile": round(wall, 1),
        "converged": bool(drop >= 20.0 and acc >= 0.95),
    }


def streaming_bench(chunk=32, batch_sizes=(8, 32, 128)):
    from fast_rnnt_tpu.models import (
        StreamingConfig,
        TransducerConfig,
        init_model,
        streaming_init,
        streaming_step,
    )
    from fast_rnnt_tpu.utils.profiling import benchmark_carried_on_device

    cfg = TransducerConfig(causal=True, attention_left_context=32)
    model, params = init_model(jax.random.PRNGKey(0), cfg)
    scfg = StreamingConfig(chunk=chunk, max_len=256)
    chunk_audio_s = chunk * 0.01  # 10 ms input frames

    rng = np.random.default_rng(0)

    def measure(Bs, sc):
        feats = jnp.asarray(
            rng.normal(size=(Bs, chunk, cfg.feature_dim)).astype(np.float32)
        )
        lens = jnp.full((Bs,), chunk, jnp.int32)
        state = streaming_init(model, sc, Bs)

        def step(st, fc, cl):
            new_state, _ = streaming_step(model, params, sc, st, fc, cl)
            return new_state

        # sub-ms steps need many loop trips for the slope to clear the
        # ~30 ms/dispatch tunnel noise
        dt = benchmark_carried_on_device(step, state, feats, lens, iters=150)
        if dt <= 0:
            dt = benchmark_carried_on_device(
                step, state, feats, lens, iters=600
            )
        return {
            "step_us": round(dt * 1e6, 1),
            "rtf": round(dt / chunk_audio_s, 5) if dt > 0 else None,
            "streams_at_rt": int(Bs * chunk_audio_s / dt) if dt > 0 else None,
        }

    rows = {Bs: measure(Bs, scfg) for Bs in batch_sizes}
    top = max(batch_sizes)
    # streamed modified beam search (beam=4) at the top batch — the
    # quality-tier serving mode (exact offline parity, tests/test_streaming)
    try:
        import dataclasses

        beam_row = measure(top, dataclasses.replace(scfg, beam=4))
    except Exception as e:
        beam_row = {"error": repr(e)[:120]}
    return {
        "metric": "streaming_serving",
        "value": rows[top]["step_us"],
        "unit": "us_per_chunk_step",
        "vs_baseline": None,  # the reference has no inference path
        "streams_at_rt": rows[top]["streams_at_rt"],
        "rtf": rows[top]["rtf"],
        "per_batch": {str(k): v for k, v in rows.items()},
        "beam4_at_top_batch": beam_row,
        "geometry": {
            "chunk_ms": int(chunk_audio_s * 1000),
            "model": "causal-conformer-6L-256d-L32",
            "encoder": "stateful (O(chunk)/step)",
        },
    }


if __name__ == "__main__":
    main()
