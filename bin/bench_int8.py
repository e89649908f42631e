"""Is int8 worth a quantized serving mode on this chip?

Slope-times fully-consumed two-GEMM chains (the DCE-proof methodology of
docs/DESIGN.md §5) at the flagship FFN shape in bf16 vs int8 (int8 x int8
-> int32 accumulate, the MXU's native 2x-rate path), plus the dynamic
per-tensor quantize/dequantize overhead a real serving path would pay.

Usage: python bin/bench_int8.py
"""

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


def timed(fn, *args, n=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make, *args):
    t_lo, t_hi = timed(make(10), *args), timed(make(40), *args)
    return max((t_hi - t_lo) / 30, 1e-9)


def main():
    M, K, N = 128000, 464, 1856
    r = np.random.RandomState(0)

    # bf16 reference pair
    a = jnp.asarray(r.randn(M, K) * 0.1, jnp.bfloat16)
    b1 = jnp.asarray(r.randn(K, N) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(r.randn(N, K) * 0.05, jnp.bfloat16)

    def make_bf16(it):
        @jax.jit
        def loop(a, b1, b2):
            def body(a, _):
                h = a @ b1
                return jnp.tanh(h @ b2), None

            a, _ = jax.lax.scan(body, a, None, length=it)
            return jnp.sum(a[0].astype(jnp.float32))

        return loop

    s = slope(make_bf16, a, b1, b2)
    fl = 2.0 * 2 * M * K * N
    print(f"bf16 pair              : {s*1e3:6.3f} ms  {fl/s/1e12:6.1f} TF/s")

    # pure int8 pair (weights + activations already int8; int32 accum)
    ai = jnp.asarray(r.randint(-127, 127, (M, K)), jnp.int8)
    b1i = jnp.asarray(r.randint(-127, 127, (K, N)), jnp.int8)
    b2i = jnp.asarray(r.randint(-127, 127, (N, K)), jnp.int8)

    def make_int8(it):
        @jax.jit
        def loop(ai, b1i, b2i):
            def body(ai, _):
                h = jax.lax.dot(ai, b1i, preferred_element_type=jnp.int32)
                h8 = (h >> 9).astype(jnp.int8)  # cheap requantize
                o = jax.lax.dot(h8, b2i, preferred_element_type=jnp.int32)
                return (o >> 9).astype(jnp.int8), None

            ai, _ = jax.lax.scan(body, ai, None, length=it)
            return jnp.sum(ai[0].astype(jnp.int32)).astype(jnp.float32)

        return loop

    s = slope(make_int8, ai, b1i, b2i)
    print(f"int8 pair (pre-quant)  : {s*1e3:6.3f} ms  {fl/s/1e12:6.1f} TOP/s")

    # realistic serving step: bf16 activations, int8 weights, dynamic
    # per-tensor activation quantization around each GEMM
    def make_dyn(it):
        @jax.jit
        def loop(a, b1i, b2i):
            def body(a, _):
                sa = jnp.max(jnp.abs(a)).astype(jnp.float32) / 127.0
                q = jnp.clip(
                    jnp.round(a.astype(jnp.float32) / sa), -127, 127
                ).astype(jnp.int8)  # round-to-nearest like _int8_dense
                h = jax.lax.dot(q, b1i, preferred_element_type=jnp.int32)
                hf = h.astype(jnp.bfloat16)
                sh = jnp.max(jnp.abs(hf)).astype(jnp.float32) / 127.0
                q2 = jnp.clip(
                    (hf.astype(jnp.float32) / sh), -127, 127
                ).astype(jnp.int8)
                o = jax.lax.dot(q2, b2i, preferred_element_type=jnp.int32)
                return jnp.tanh(o.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)), None

            a, _ = jax.lax.scan(body, a, None, length=it)
            return jnp.sum(a[0].astype(jnp.float32))

        return loop

    s = slope(make_dyn, a, b1i, b2i)
    print(f"int8 pair (dyn quant)  : {s*1e3:6.3f} ms  {fl/s/1e12:6.1f} TOP/s")


if __name__ == "__main__":
    main()
