"""Sampling-throughput zoo: every model family on the real chip.

One table, one methodology: unconditional `sample_ids` at B=256 for each
experiment overlay, timed as pipelined sequential dispatches (compile
excluded; the axon ~30 ms invocation floor overlaps away, docs/DESIGN.md
§5).  Untrained weights — throughput does not depend on weight values —
so this runs with zero assets.  Also prints the flagship's skip-step
ladder (T_eval = 25/50/100, `timestep_ladder` semantics of the
reference's `base.py:310-315`): the serving-side quality/latency knob.

Usage: python bin/bench_zoo.py
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

from layoutdm_tpu.configs import SamplingConfig, build_train_config
from layoutdm_tpu.factory import build_model, build_tokenizer

EXPERIMENTS = (
    "layoutdm",
    "vqdiffusion",
    "maskgit_cvpr2022",
    "blt_eccv2022",
    "layout_transformer_iccv2021",
    "bart",
    "ruite",
    "diffusionlm_neurips2022",
    "bitdiffusion",
)

B = int(os.environ.get("ZOO_BATCH", "256"))
N_ITERS = int(os.environ.get("ZOO_ITERS", "10"))


def timed_sample(fn, rng, n=N_ITERS):
    out = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(jax.random.fold_in(rng, i))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    sampling = SamplingConfig(name="random")
    rows = []
    for name in EXPERIMENTS:
        try:
            cfg = build_train_config(experiment=name, dataset="synthetic")
            tokenizer = build_tokenizer(cfg)
            model = build_model(cfg, tokenizer)
            params = model.init(jax.random.PRNGKey(0))
            if name == "ruite":
                # one-shot refiner: unconditional is a constant dummy
                # (`ruite.py:91-97`) — time the real denoise pass instead
                from layoutdm_tpu.models.diffusion.sampler import SamplerCond

                cond = SamplerCond.empty(B, model.seq_len, model.num_classes)
                cond = cond.replace(
                    seq=jax.random.randint(
                        jax.random.PRNGKey(9),
                        (B, model.seq_len), 0, model.num_classes,
                    )
                )
                fn = jax.jit(
                    lambda r: model.sample_ids(
                        params, r, B, cond=cond, sampling=sampling
                    )
                )
            else:
                fn = jax.jit(
                    lambda r: model.sample_ids(params, r, B, sampling=sampling)
                )
            sec = timed_sample(fn, jax.random.PRNGKey(1))
            rows.append({
                "experiment": name,
                "ms_per_batch": round(sec * 1000, 1),
                "layouts_per_sec": round(B / sec, 1),
            })
        except Exception as e:  # report, keep going
            rows.append({"experiment": name, "error": f"{type(e).__name__}: {e}"[:200]})
        print(rows[-1])

    # flagship skip-step ladder
    cfg = build_train_config(experiment="layoutdm", dataset="synthetic")
    tokenizer = build_tokenizer(cfg)
    model = build_model(cfg, tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    ladder = []
    for t_eval in (25, 50, 100):
        fn = jax.jit(
            lambda r, te=t_eval: model.sample_ids(
                params, r, B, sampling=sampling, num_timesteps_eval=te
            )
        )
        sec = timed_sample(fn, jax.random.PRNGKey(1))
        ladder.append({
            "t_eval": t_eval,
            "ms_per_batch": round(sec * 1000, 1),
            "layouts_per_sec": round(B / sec, 1),
        })
        print(ladder[-1])

    # relation-guided flagship: CLG-LO gradient guidance inside the scan
    # (3 SGD steps x 4 coords per reverse step) — the overhead vs the
    # unconditional T=100 row above is the cost of constraint steering
    import numpy as np

    from layoutdm_tpu.data.transforms import compose_transform
    from layoutdm_tpu.relation.guidance import (
        RelationData, make_relation_guidance,
    )
    from layoutdm_tpu.tasks import get_cond, to_sampler_cond

    S = tokenizer.max_elements
    rng_np = np.random.RandomState(0)
    n_el = rng_np.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n_el[:, None]
    label = rng_np.randint(0, tokenizer.num_categories, (B, S)).astype(np.int32)
    label *= mask
    bbox = np.stack(
        [
            rng_np.uniform(0.2, 0.8, (B, S)),
            rng_np.uniform(0.2, 0.8, (B, S)),
            rng_np.uniform(0.05, 0.4, (B, S)),
            rng_np.uniform(0.05, 0.4, (B, S)),
        ],
        axis=-1,
    ).astype(np.float32)
    batch = {"label": label, "bbox": bbox, "mask": mask}
    cond = get_cond(jax.random.PRNGKey(3), batch, tokenizer, "relation")
    sc = to_sampler_cond(cond, tokenizer, sampling)
    transform = compose_transform(
        ["AddCanvasElement", "AddRelationConstraints(edge_ratio=0.1, seed=0)"]
    )
    bw = transform(rng_np, dict(batch))
    sc = sc.replace(relation=tuple(RelationData.from_batch(bw)))
    guidance = make_relation_guidance(tokenizer, sampling)
    fn = jax.jit(
        lambda r: model.sample_ids(
            params, r, B, cond=sc, sampling=sampling, guidance_fn=guidance
        )
    )
    sec = timed_sample(fn, jax.random.PRNGKey(1))
    relation_row = {
        "experiment": "layoutdm+relation_guidance",
        "ms_per_batch": round(sec * 1000, 1),
        "layouts_per_sec": round(B / sec, 1),
    }
    print(relation_row)

    print(json.dumps({
        "zoo": rows, "flagship_skip_step": ladder, "relation": relation_row,
    }))


if __name__ == "__main__":
    main()
