"""Capture + summarize a TPU profile of the flagship sampler.

The round-3 optimization pass ran on exactly this workflow: trace the
compiled T=100 reverse chain with `jax.profiler`, then attribute DEVICE
time to LEAF ops by containment (an event's self-time = duration minus
its children's) — the only honest per-op breakdown on this machine,
where microbenches of isolated parts over-count non-overlapped time
(docs/DESIGN.md §5).  It is what exposed the 2.5 ms embed gather, the
f32 residual stream, and the qkv layout copies.

Usage:
    python bin/profile_trace.py [--batch 256] [--steps 100] [--top 30]
    python bin/profile_trace.py --summarize /tmp/jaxtrace  # parse only

The summary prints total-ms over the whole trace (divide by --steps for
per-step) plus the instance count per op.  Signatures for the top ops
follow so fusions can be identified by their operand/result shapes.
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def capture(trace_dir: str, batch: int, steps: int) -> None:
    from bench import build_flagship
    from layoutdm_tpu.configs import SamplingConfig

    model = build_flagship(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    sampling = SamplingConfig(name="random")
    fn = jax.jit(
        lambda rng: model.sample_ids(
            params, rng, batch, sampling=sampling, num_timesteps=steps
        )
    )
    ids = fn(jax.random.PRNGKey(1))
    ids.block_until_ready()  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        ids = fn(jax.random.PRNGKey(2))
        int(jnp.sum(ids))  # real sync (block_until_ready can return early
        # on the remote-TPU path — docs/DESIGN.md §6)


def capture_train(trace_dir: str, batch: int, steps: int) -> None:
    """Trace `steps` pipelined dispatches of the flagship train step
    (fwd + bwd + AdamW + clip + Lt update) — the round-5 train-MFU
    investigation's capture path.  Divide the summary's total-ms by
    --steps for per-step numbers."""
    from bench import build_flagship
    from layoutdm_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    model = build_flagship(dtype=jnp.bfloat16)
    optimizer = make_optimizer()
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer)
    V, S = model.num_classes, model.seq_len
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, S), 0, V)
    # rbg keys = the train loop's production default (TrainingConfig.rng_impl)
    keys = [jax.random.key(2 + i, impl="rbg") for i in range(steps + 1)]
    state, m = step(state, keys[-1], tokens)  # compile
    jax.block_until_ready(m["loss"])
    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            state, m = step(state, keys[i], tokens)
        float(m["loss"])  # scalar fetch = real sync


def summarize(trace_dir: str, top: int) -> None:
    # the xplane proto ships inside tensorflow's tsl tree in this image
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(
                line.events, key=lambda e: (e.offset_ps, -e.duration_ps)
            )
            self_t = collections.Counter()
            cnt = collections.Counter()
            sigs = {}
            # containment stack: pop everything that ended before this
            # event starts, charging each its duration minus its children
            stack = []  # [end_ps, name, child_sum_ps, duration_ps]
            for e in evs:
                s, t = e.offset_ps, e.offset_ps + e.duration_ps
                full = ev_meta.get(e.metadata_id, "?")
                name = full.split(" = ")[0]
                sigs.setdefault(name, full)
                while stack and s >= stack[-1][0]:
                    end, nm, childsum, dur = stack.pop()
                    self_t[nm] += (dur - childsum) / 1e9
                    cnt[nm] += 1
                if stack:
                    stack[-1][2] += e.duration_ps
                stack.append([t, name, 0, e.duration_ps])
            while stack:
                end, nm, childsum, dur = stack.pop()
                self_t[nm] += (dur - childsum) / 1e9
                cnt[nm] += 1

            total = sum(self_t.values())
            print(f"== {plane.name} / XLA Ops: {total:.1f} ms total ==")
            print("LEAF SELF-TIME (ms over whole trace):")
            shown = []
            for name, ms in self_t.most_common(top):
                print(f"  {ms:9.2f} ms x{cnt[name]:<6} {name}")
                shown.append(name)
            print("\nSIGNATURES:")
            for name in shown[:12]:
                print(f"  {sigs[name][:200]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--trace_dir", default="/tmp/jaxtrace")
    p.add_argument(
        "--train",
        action="store_true",
        help="trace the train step (N pipelined dispatches) instead of "
        "the sampler; --steps becomes the dispatch count",
    )
    p.add_argument(
        "--summarize",
        nargs="?",
        const="/tmp/jaxtrace",
        default=None,
        help="skip capture; parse an existing trace dir",
    )
    a = p.parse_args()
    if a.summarize:
        summarize(a.summarize, a.top)
        return
    import shutil

    shutil.rmtree(a.trace_dir, ignore_errors=True)
    if a.train:
        capture_train(a.trace_dir, a.batch, a.steps)
    else:
        capture(a.trace_dir, a.batch, a.steps)
    summarize(a.trace_dir, a.top)


if __name__ == "__main__":
    main()
