"""Conditional sampling CLI — the `src/trainer/trainer/test.py` equivalent.

Loads a trained job (config.json + best params), builds the requested task
condition over the test split, runs the compiled sampler (timed, printing
``ms per sample`` like `test.py:270-271`), and dumps
``{results, train_cfg, test_cfg}`` pickles per seed for `eval_cli`/
`render_cli`.  Multi-seed job dirs (``seed_*`` subdirectories) are
auto-discovered like `test.py:71-88`.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import pickle
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import (
    SamplingConfig,
    TestConfig,
    build_sampling_config,
    to_dict,
)
from layoutdm_tpu.data.datasets import load_dataset
from layoutdm_tpu.data.loader import batch_iterator, split_num_samples
from layoutdm_tpu.data.transforms import compose_transform
from layoutdm_tpu.eval.metrics import compute_violation
from layoutdm_tpu.factory import build_model, build_tokenizer
from layoutdm_tpu.relation.guidance import RelationData, make_relation_guidance
from layoutdm_tpu.tasks import get_cond, to_sampler_cond
from layoutdm_tpu.train import checkpoint as ckpt

logger = logging.getLogger(__name__)


def resolve_seed_dirs(job_dir: str) -> List[str]:
    if os.path.exists(os.path.join(job_dir, "config.json")):
        return [job_dir]
    subs = sorted(glob.glob(os.path.join(job_dir, "seed_*")))
    if subs:
        return subs
    raise FileNotFoundError(f"no config.json under {job_dir}")


def _filter_invalid(layouts: Dict[str, np.ndarray]):
    """Decoded batch -> list of (bbox, label) keeping valid elements
    (`test.py:42-49`)."""
    out = []
    bbox, label, mask = (
        np.asarray(layouts["bbox"]),
        np.asarray(layouts["label"]),
        np.asarray(layouts["mask"]),
    )
    for i in range(bbox.shape[0]):
        m = mask[i]
        out.append((bbox[i][m], label[i][m]))
    return out


def run_sampling(test_cfg: TestConfig, seed_dir: str) -> Dict:
    train_cfg = ckpt.load_config(seed_dir)
    if test_cfg.dataset_dir:
        train_cfg.dataset.dir = test_cfg.dataset_dir
    train_cfg.data.pad_until_max = True  # `test.py:100`

    tokenizer = build_tokenizer(train_cfg)
    model = build_model(train_cfg, tokenizer)
    template = model.init(jax.random.PRNGKey(0))
    params = ckpt.load_params(template, seed_dir, "best")
    # trained aux state (seq-length EMA for MaskGIT/BLT unconditional,
    # Lt buffers for diffusion) saved alongside the weights
    model_state = model.init_state()
    aux_path = os.path.join(seed_dir, "aux_state.msgpack")
    if os.path.exists(aux_path):
        from flax import serialization

        with open(aux_path, "rb") as f:
            model_state = serialization.from_bytes(model_state, f.read())
        model_state = jax.tree.map(jnp.asarray, model_state)

    sampling = build_sampling_config(test_cfg, train_cfg)

    split = "val" if test_cfg.is_validation else "test"
    train_cfg.dataset.ensure_registered()
    data = load_dataset(
        train_cfg.dataset.name, train_cfg.dataset.dir, split,
        train_cfg.dataset.max_seq_length,
    )
    if test_cfg.debug_num_samples > 0:
        data = type(data)(
            data.name,
            data.bbox[: test_cfg.debug_num_samples],
            data.label[: test_cfg.debug_num_samples],
            data.mask[: test_cfg.debug_num_samples],
            data.labels,
        )

    rng = jax.random.PRNGKey(train_cfg.seed)
    rng_np = np.random.RandomState(train_cfg.seed)
    B = test_cfg.max_batch_size
    results, violations = [], []
    inputs = []
    t_total, n_total = 0.0, 0

    from layoutdm_tpu.utils.profiling import maybe_trace

    trace_ctx = maybe_trace(test_cfg.trace_dir)
    trace_ctx.__enter__()

    if test_cfg.cond == "unconditional":
        sizes = split_num_samples(test_cfg.num_uncond_samples, B)
        if test_cfg.warmup and sizes:
            # compile outside the timed region (the remote TPU compile can
            # dominate a single-batch `ms per sample` otherwise)
            w = model.sample(
                params, rng, sizes[0], sampling=sampling, state=model_state
            )
            jax.block_until_ready(w["bbox"])
        for n in sizes:
            rng, r = jax.random.split(rng)
            t0 = time.time()
            layouts = model.sample(params, r, n, sampling=sampling,
                                   state=model_state)
            jax.block_until_ready(layouts["bbox"])
            t_total += time.time() - t0
            n_total += n
            results.extend(_filter_invalid(layouts))
    else:
        transform = None
        guidance = None
        if test_cfg.cond == "relation":
            transform = compose_transform(
                ["AddCanvasElement",
                 "AddRelationConstraints(edge_ratio=0.1, seed=0)"]
            )
            # one stable guidance closure; per-batch graphs ride in the cond
            # pytree so the compiled sampler is reused across batches
            guidance = make_relation_guidance(tokenizer, sampling)
        # num_run > 1: several outputs per condition (`hydra_configs.py:17`)
        batches = [
            b
            for _ in range(max(test_cfg.num_run, 1))
            for b in batch_iterator(
                data, B, rng_np, shuffle=False, drop_last=False
            )
        ]
        warmed = set()
        for batch in batches:
            rng, r_cond, r_samp = jax.random.split(rng, 3)
            cond = get_cond(
                r_cond, batch, tokenizer, test_cfg.cond,
                model_type=train_cfg.model.name,
            )
            sc = to_sampler_cond(cond, tokenizer, sampling)
            if test_cfg.cond == "relation":
                batch_w_canvas = transform(rng_np, dict(batch))
                rel = RelationData.from_batch(batch_w_canvas)
                sc = sc.replace(relation=tuple(rel))
            n = batch["label"].shape[0]
            if test_cfg.warmup and n not in warmed:
                # compile per batch shape outside the timed region
                w = model.sample(
                    params, r_samp, n, cond=sc, sampling=sampling,
                    guidance_fn=guidance, state=model_state,
                )
                jax.block_until_ready(w["bbox"])
                warmed.add(n)
            t0 = time.time()
            layouts = model.sample(
                params, r_samp, n, cond=sc, sampling=sampling,
                guidance_fn=guidance, state=model_state,
            )
            jax.block_until_ready(layouts["bbox"])
            t_total += time.time() - t0
            n_total += n
            results.extend(_filter_invalid(layouts))
            if test_cfg.cond in ("partial", "refinement"):
                dec_in = tokenizer.decode(np.asarray(cond["seq"]))
                inputs.extend(_filter_invalid(dec_in))
            if test_cfg.cond == "relation":
                # prepend canvas to generated layouts for violation check
                S1 = batch_w_canvas["bbox"].shape[1]
                gen_bbox = np.zeros((n, S1, 4), np.float32)
                gen_bbox[:, 0] = [0.5, 0.5, 1.0, 1.0]
                gen_bbox[:, 1:] = np.asarray(layouts["bbox"])[:, : S1 - 1]
                v = compute_violation(
                    gen_bbox,
                    np.asarray(batch_w_canvas["label"]),
                    np.asarray(batch_w_canvas["edge_index"]),
                    np.asarray(batch_w_canvas["edge_attr"]),
                    np.asarray(batch_w_canvas["edge_mask"]),
                )
                violations.extend(v[~np.isnan(v)].tolist())

    trace_ctx.__exit__(None, None, None)
    ms_per_sample = 1e3 * t_total / max(n_total, 1)
    logger.info("%s: %.1f ms per sample", test_cfg.cond, ms_per_sample)
    out = {
        "results": results,
        "inputs": inputs,
        "train_cfg": to_dict(train_cfg),
        "test_cfg": to_dict(test_cfg),
        "ms_per_sample": ms_per_sample,
    }
    if violations:
        out["violation_rate"] = float(np.mean(violations))
        logger.info("violation rate: %.4f", out["violation_rate"])
    return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from layoutdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("overrides", nargs="*", help="key=value TestConfig fields")
    a = p.parse_args(argv)
    cfg = TestConfig()
    from layoutdm_tpu.configs import apply_overrides

    apply_overrides(cfg, a.overrides)
    assert cfg.job_dir, "job_dir=... required"
    os.makedirs(cfg.result_dir, exist_ok=True)
    for i, seed_dir in enumerate(resolve_seed_dirs(cfg.job_dir)):
        out = run_sampling(cfg, seed_dir)
        path = os.path.join(
            cfg.result_dir, f"{cfg.cond}_{'val' if cfg.is_validation else 'test'}_seed_{i}.pkl"
        )
        with open(path, "wb") as f:
            pickle.dump(out, f)
        logger.info("wrote %s (%d layouts)", path, len(out["results"]))


if __name__ == "__main__":
    main()
