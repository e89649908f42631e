"""Per-component microbenchmark of the denoiser forward at bench shapes
(d=464 flagship, bf16, B=1024, S=125) — locates the sub-36-TF/s work.

Usage: python bin/bench_parts.py
"""

import math
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

from layoutdm_tpu.ops.attention import fused_attention_qkv


def timed_scan(build_body, x0, n_it=20, n=2):
    @jax.jit
    def loop(x):
        def body(x, _):
            return build_body(x), None

        x, _ = jax.lax.scan(body, x, None, length=n_it)
        return jnp.sum(x[0].astype(jnp.float32))

    float(loop(x0))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / n_it * 1e3


def main():
    B, S, D, F, H, V = 1024, 125, 464, 1856, 8, 155
    hd = D // H
    M = B * S
    r = np.random.RandomState(0)
    dt = jnp.bfloat16

    x = jnp.asarray(r.randn(B, S, D), dt)
    w_qkv = jnp.asarray(r.randn(D, 3 * D) / math.sqrt(D), dt)
    w_out = jnp.asarray(r.randn(D, D) / math.sqrt(D), dt)
    w_head = jnp.asarray(r.randn(D, V) / math.sqrt(D), dt)

    # 1. qkv projection GEMM
    g = 2 * M * D * 3 * D
    t = timed_scan(lambda x: ((x @ w_qkv)[..., :D] * dt(0.1)).astype(dt), x)
    print(f"qkv GEMM (M,{D})x({D},{3*D})  : {t:6.2f} ms  {g/t/1e9:6.1f} TF/s")

    # 2. out-proj GEMM
    g = 2 * M * D * D
    t = timed_scan(lambda x: (x @ w_out * dt(0.1)).astype(dt), x)
    print(f"out GEMM (M,{D})x({D},{D})   : {t:6.2f} ms  {g/t/1e9:6.1f} TF/s")

    # 3. head GEMM (V=155, lane-padded)
    g = 2 * M * D * V
    t = timed_scan(
        lambda x: ((x @ w_head)[..., :D] @ jnp.ones((V, D), dt)[:D] * dt(0.1)).astype(dt)
        if False
        else (jnp.pad((x @ w_head), ((0, 0), (0, 0), (0, D - V))) * dt(0.1)).astype(dt),
        x,
    )
    print(f"head GEMM (M,{D})x({D},{V})   : {t:6.2f} ms  {g/t/1e9:6.1f} TF/s")

    # 4. fused pallas attention on the packed slab
    qkv = jnp.asarray(r.randn(B, S, 3 * D), dt)
    g = 2 * B * H * S * S * hd * 2
    t = timed_scan(
        lambda q: jnp.concatenate(
            [fused_attention_qkv(q, num_heads=H)] * 3, axis=-1
        ).astype(dt) * dt(0.1),
        qkv,
    )
    print(f"pallas attention (hd={hd})    : {t:6.2f} ms  {g/t/1e9:6.1f} TF/s")

    # 5. XLA attention (split + einsum + f32 softmax)
    def xla_attn(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, hd)
        k = k.reshape(B, S, H, hd)
        v = v.reshape(B, S, H, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(dt)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, D)
        return jnp.concatenate([o] * 3, -1) * dt(0.1)

    t = timed_scan(xla_attn, qkv)
    print(f"XLA attention (hd={hd})       : {t:6.2f} ms  {g/t/1e9:6.1f} TF/s")

    # 6. embedding + AdaLN-ish elementwise: gather + scale/shift + residual
    emb = jnp.asarray(r.randn(V, D), dt)
    ids = jnp.asarray(r.randint(0, V, (B, S)), jnp.int32)

    def embed(ids):
        h = emb[ids]
        return (jnp.argmax(h, -1) + ids) % V

    t = timed_scan(embed, ids)
    print(f"token-embed gather + argmax : {t:6.2f} ms")


if __name__ == "__main__":
    main()
