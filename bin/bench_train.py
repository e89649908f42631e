"""Training-step throughput on the real chip.

Sampling has a headline (bench.py); this gives training one too: the
flagship `make_train_step` (AdamW + clip + importance-sampled loss,
`train/step.py`) at several batch sizes, with an analytic FLOP estimate
(fwd + backward ~= 3x the denoiser forward GEMMs, plus the posterior
route matmuls which are differentiated through) and the same measured
same-shape GEMM ceiling bench.py uses, so the printed MFU is comparable
across the two benches.

Timing methodology differs from the sampler bench ON PURPOSE: wrapping
the already-jitted train step in an outer jit(lax.scan(...)) measures
16x SLOWER than the step actually runs (measured 2218 vs 134 ms at
B=1024) — the inner pjit inside a scan body defeats donation, so the
full f32 param+opt+Lt carry is copied every iteration and the giant
program starves the rest of the device.  Instead we time N sequential
dispatches of the real jitted step with one terminal block: the axon
~30 ms invocation floor pipelines away under async dispatch, and what
is measured is exactly the program a real epoch loop runs.

Usage: python bin/bench_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import build_flagship, flops_per_layout, measure_gemm_ceiling
from layoutdm_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def train_flops_per_sample(model) -> float:
    """Dense-FLOP estimate of one training sample: one denoiser forward
    plus its backward (2x), with the posterior routes in the grad path."""
    return 3.0 * flops_per_layout(model, num_timesteps=1)


def main():
    model = build_flagship(dtype=jnp.bfloat16)
    optimizer = make_optimizer()
    state0 = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer)
    V, S = model.num_classes, model.seq_len

    rows = []
    for B in (64, 256, 1024):
        tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, V)
        state = state0
        # rbg keys = the train loop's production default
        # (TrainingConfig.rng_impl, docs/DESIGN.md §6 RNG entry)
        keys = [jax.random.key(i, impl="rbg") for i in range(21)]
        state, m = step(state, keys[20], tokens)  # compile
        jax.block_until_ready(m["loss"])

        best = float("inf")
        n = 20
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n):
                state, m = step(state, keys[i], tokens)
            jax.block_until_ready(m["loss"])
            best = min(best, (time.perf_counter() - t0) / n)
        state0 = init_train_state(model, optimizer, jax.random.PRNGKey(0))

        ms = best * 1000
        tfs = train_flops_per_sample(model) * B / best / 1e12
        rows.append({
            "batch": B,
            "ms_per_step": round(ms, 2),
            "samples_per_sec": round(B / best, 1),
            "achieved_tflops": round(tfs, 1),
        })
        print(rows[-1])

    ceiling = measure_gemm_ceiling(1024, model)
    best_row = max(rows, key=lambda r: r["samples_per_sec"])
    print(json.dumps({
        "metric": "rico25_train_samples_per_sec_chip",
        "value": best_row["samples_per_sec"],
        "unit": "samples/s",
        "batch": best_row["batch"],
        "achieved_tflops": best_row["achieved_tflops"],
        "gemm_ceiling_tflops": round(ceiling, 1),
        "mfu_vs_gemm_ceiling": round(
            best_row["achieved_tflops"] / ceiling, 3
        ),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
