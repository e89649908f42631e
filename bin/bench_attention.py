"""Measure the XLA-vs-pallas fused-attention crossover across sequence
lengths (round-1 VERDICT item 10).

Times the FULL denoiser forward (the honest end-to-end criterion — the
fused kernel wins in isolation even where it loses end-to-end, see
docs/DESIGN.md §6) at the Rico25/PubLayNet-scale token lengths, with and
without LAYOUTDM_TPU_FUSED_ATTN, and prints a markdown table.

Usage:  python bin/bench_attention.py [--batch 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig
from layoutdm_tpu.models.nn import CategoricalTransformer


def time_forward(net, params, seq, t, n_iters=30):
    """ms per forward, measured as ONE jitted scan of n_iters chained
    forwards ending in a scalar fetch.

    The remote-TPU path queues small dispatches asynchronously and
    `block_until_ready` can return before execution completes, so
    per-dispatch host timing under-reads; chaining the iterations in-graph
    (each step consumes the previous argmax) forces sequential execution
    and the final float() forces a real sync."""

    @jax.jit
    def loop(params, seq, t):
        def body(s, _):
            out = net.apply({"params": params}, s, t, deterministic=True)
            nxt = jnp.argmax(out, axis=-1).astype(jnp.int32)
            return nxt, None

        s, _ = jax.lax.scan(body, seq, None, length=n_iters)
        return jnp.sum(s)

    float(loop(params, seq, t))  # compile + warm
    t0 = time.perf_counter()
    float(loop(params, seq, t))
    return (time.perf_counter() - t0) / n_iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    a = p.parse_args()
    dtype = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32

    V = 155
    rows = []
    for max_elems in (25, 50, 100):
        S = max_elems * 5
        # keep B*S roughly constant so each point is MXU-saturated
        B = max(a.batch * 125 // S // 8 * 8, 8)
        backbone = BackboneConfig(
            d_model=464, nhead=8, dim_feedforward=1856, num_layers=4,
            dropout=0.0, timestep_type="adalayernorm", diffusion_step=100,
        )
        net = CategoricalTransformer(
            backbone=backbone, num_classes=V, max_token_length=S,
            pos_emb="elem_attr", n_attr_per_elem=5, dtype=dtype,
        )
        params = net.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, S), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        seq = jnp.zeros((B, S), jnp.int32)
        t = jnp.zeros((B,), jnp.int32)

        ms = {}
        for mode, env in (("xla", "0"), ("fused", "1")):
            os.environ["LAYOUTDM_TPU_FUSED_ATTN"] = env
            try:
                ms[mode] = time_forward(net, params, seq, t)
            except Exception as e:
                print(f"max{max_elems} {mode}: FAILED {str(e)[:100]}")
                ms[mode] = float("nan")
        rows.append((max_elems, S, B, ms["xla"], ms["fused"]))
        print(
            f"max{max_elems}: S={S} B={B}  xla {ms['xla']:.1f} ms  "
            f"fused {ms['fused']:.1f} ms  "
            f"({'fused' if ms['fused'] < ms['xla'] else 'xla'} wins)"
        )

    print("\n| max_elems | S tokens | B | XLA ms/fwd | fused ms/fwd | winner |")
    print("|---|---|---|---|---|---|")
    for me, S, B, x, f in rows:
        print(
            f"| {me} | {S} | {B} | {x:.1f} | {f:.1f} | "
            f"{'fused' if f < x else 'xla'} |"
        )


if __name__ == "__main__":
    main()
