"""Decompose the flagship sampler's per-step time on the current chip.

Times three chained scans at the headline bench shapes (bf16 activations,
B=1024, T-step bodies with a data dependence and a final scalar fetch —
the async-dispatch-proof methodology of docs/DESIGN.md §6):

  1. denoiser-only      — predict_start (embed + 4-layer transformer + head
                          + log_softmax)
  2. posterior+sample   — q_posterior_ids + gumbel sampling on a FIXED
                          log_x_recon (chained through the ids)
  3. full sampler step  — the real `sample_chain` body

full - (denoiser + posterior) exposes scheduling/fusion overhead; the
split says where the remaining MFU gap lives (docs/DESIGN.md §5).

Usage: python bin/bench_decompose.py [--batch 1024] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import build_flagship
from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.ops.samplers import sample_tokens


def timed(fn, *args, n=2):
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=50)
    a = p.parse_args()

    model = build_flagship(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    q = model.q
    V, S = q.num_classes, model.seq_len
    B, n_it = a.batch, a.iters
    predict_start = model._predict_start
    sampling = SamplingConfig(name="random")

    ids0 = jnp.full((B, S), V - 1, jnp.int32)
    t_b = jnp.full((B,), 50, jnp.int32)

    @jax.jit
    def denoiser_only(params, ids):
        def body(ids, _):
            lp = predict_start(params, ids, t_b, None)
            return jnp.argmax(lp, axis=-1).astype(jnp.int32), None

        ids, _ = jax.lax.scan(body, ids, None, length=n_it)
        return jnp.sum(ids)

    # fixed recon: isolates the posterior+sampling tail
    lp0 = jax.jit(lambda p, i: predict_start(p, i, t_b, None))(params, ids0)

    @jax.jit
    def posterior_sample_only(lp0, ids, rng):
        def body(carry, _):
            ids, rng = carry
            rng, r = jax.random.split(rng)
            mlp = q.q_posterior_ids(lp0, ids, t_b)
            nxt = sample_tokens(r, mlp, name=sampling.name).astype(jnp.int32)
            return (nxt, rng), None

        (ids, _), _ = jax.lax.scan(body, (ids, rng), None, length=n_it)
        return jnp.sum(ids)

    @jax.jit
    def full_step(params, ids, rng):
        def body(carry, _):
            ids, rng = carry
            rng, r = jax.random.split(rng)
            lp = predict_start(params, ids, t_b, None)
            mlp = q.q_posterior_ids(lp, ids, t_b)
            nxt = sample_tokens(r, mlp, name=sampling.name).astype(jnp.int32)
            return (nxt, rng), None

        (ids, _), _ = jax.lax.scan(body, (ids, rng), None, length=n_it)
        return jnp.sum(ids)

    rng = jax.random.PRNGKey(1)
    d = timed(denoiser_only, params, ids0) / n_it * 1e3
    ps = timed(posterior_sample_only, lp0, ids0, rng) / n_it * 1e3
    f = timed(full_step, params, ids0, rng) / n_it * 1e3

    print(f"batch={B}  iters={n_it}  (ms per step)")
    print(f"  denoiser only        : {d:7.2f}")
    print(f"  posterior + sampling : {ps:7.2f}")
    print(f"  full step            : {f:7.2f}")
    print(f"  overlap/overhead     : {f - d - ps:7.2f} (full - parts)")
    print(f"  implied layouts/s at T=100: {B / (f * 0.1):.1f}")


if __name__ == "__main__":
    main()
