"""Microbenchmark: fused LN-FFN-residual kernel vs the XLA chain at the
flagship token count, sweeping rows_per_block.

Usage: python bin/bench_ffn.py [--m 128000] [--d 512] [--f 2048]
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
import numpy as np

from layoutdm_tpu.ops.ffn import fused_ln_ffn_residual


def timed(fn, *args, n=2):
    float(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=128000)
    p.add_argument("--d", type=int, default=512)
    p.add_argument("--f", type=int, default=2048)
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args()
    M, D, F, n_it = a.m, a.d, a.f, a.iters

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(M, D), jnp.bfloat16)
    g = jnp.asarray(r.uniform(0.5, 1.5, D), jnp.float32)
    b = jnp.asarray(r.randn(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(r.randn(D, F) / np.sqrt(D), jnp.float32)
    b1 = jnp.asarray(r.randn(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(r.randn(F, D) / np.sqrt(F), jnp.float32)
    b2 = jnp.asarray(r.randn(D) * 0.1, jnp.float32)

    def xla_chain(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
        ln = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(x.dtype)
        h = ln @ w1.astype(x.dtype) + b1.astype(x.dtype)
        h = h * jax.nn.sigmoid(1.702 * h)
        return x + (h @ w2.astype(x.dtype) + b2.astype(x.dtype))

    @jax.jit
    def loop_xla(x):
        def body(x, _):
            o = xla_chain(x)
            return (o * jnp.bfloat16(0.1)).astype(x.dtype), None

        x, _ = jax.lax.scan(body, x, None, length=n_it)
        return jnp.sum(x[0].astype(jnp.float32))

    gflop = 2 * M * D * F * 2 * n_it / 1e9

    t = timed(loop_xla, x)
    print(f"XLA chain : {t / n_it * 1e3:7.2f} ms  ({gflop / t / 1e3:6.1f} TF/s)")

    for R in (0, 128, 256, 512, 1024, 2048):
        def make(R):
            @jax.jit
            def loop_fused(x):
                def body(x, _):
                    o = fused_ln_ffn_residual(
                        x, g, b, w1, b1, w2, b2,
                        activation="gelu2", rows_per_block=R,
                    )
                    return (o * jnp.bfloat16(0.1)).astype(x.dtype), None

                x, _ = jax.lax.scan(body, x, None, length=n_it)
                return jnp.sum(x[0].astype(jnp.float32))

            return loop_fused

        try:
            t = timed(make(R), x)
            print(
                f"fused R={R or 'auto':>5}: {t / n_it * 1e3:7.2f} ms  "
                f"({gflop / t / 1e3:6.1f} TF/s)"
            )
        except Exception as e:
            print(f"fused R={R:>5}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
