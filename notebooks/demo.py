"""Product-API demo — the `notebooks/demo.ipynb` equivalent.

Walks the same steps as the reference notebook (SURVEY.md §3.4): load a
trained job, encode/decode a ground-truth sample, generate unconditionally,
then run every conditional task from one condition broadcast to N samples,
and export a GIF of the intermediate diffusion states.

Usage:
    python notebooks/demo.py --job_dir <job> [--out_dir tmp/demo]
    python notebooks/demo.py --untrained   # random weights, synthetic data
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from layoutdm_tpu.configs import SamplingConfig, build_train_config
from layoutdm_tpu.data.datasets import load_dataset
from layoutdm_tpu.factory import build_model, build_tokenizer
from layoutdm_tpu.tasks import get_cond, to_sampler_cond
from layoutdm_tpu.train import checkpoint as ckpt
from layoutdm_tpu.utils.visualization import save_gif, save_image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--job_dir", default=None)
    p.add_argument("--out_dir", default="tmp/demo")
    p.add_argument("--untrained", action="store_true")
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("overrides", nargs="*",
                   help="key=value config overrides (untrained mode)")
    a = p.parse_args()
    os.makedirs(a.out_dir, exist_ok=True)

    # [cell 1-2] config + tokenizer + model (+ weights)
    if a.job_dir:
        cfg = ckpt.load_config(a.job_dir)
    else:
        assert a.untrained, "--job_dir or --untrained required"
        cfg = build_train_config(
            "layoutdm", "synthetic",
            ["data.bbox_quantization=linear", "dataset.max_seq_length=8"]
            + list(a.overrides),
        )
    cfg.data.pad_until_max = True
    tokenizer = build_tokenizer(cfg)
    model = build_model(cfg, tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    if a.job_dir:
        params = ckpt.load_params(params, a.job_dir, "best")
    sampling = SamplingConfig(name="random")
    rng = jax.random.PRNGKey(0)

    # [cell 4] encode -> decode a ground-truth sample
    data = load_dataset(
        cfg.dataset.name, cfg.dataset.dir, "test", cfg.dataset.max_seq_length
    )
    gt = data.slice(np.arange(a.num_samples))
    enc = tokenizer.encode(gt)
    dec = tokenizer.decode(np.asarray(enc["seq"]))
    save_image(
        {k: np.asarray(v) for k, v in dec.items()},
        os.path.join(a.out_dir, "gt_roundtrip.png"),
        cfg.dataset.num_categories,
    )

    # [cell 6] unconditional generation
    rng, r = jax.random.split(rng)
    layouts = model.sample(params, r, a.num_samples, sampling=sampling)
    save_image(
        {k: np.asarray(v) for k, v in layouts.items()},
        os.path.join(a.out_dir, "unconditional.png"),
        cfg.dataset.num_categories,
    )

    # [cell 9] one condition -> N diverse samples, per task
    one = data.slice(np.arange(1))
    for task in ("c", "cwh", "partial", "refinement"):
        rng, r_c, r_s = jax.random.split(rng, 3)
        cond = get_cond(r_c, one, tokenizer, task)
        sc = to_sampler_cond(cond, tokenizer, sampling,
                             batch_size=a.num_samples)
        layouts = model.sample(
            params, r_s, a.num_samples, cond=sc, sampling=sampling
        )
        save_image(
            {k: np.asarray(v) for k, v in layouts.items()},
            os.path.join(a.out_dir, f"{task}.png"),
            cfg.dataset.num_categories,
        )

    # [cell 15] GIF of intermediate diffusion states
    rng, r = jax.random.split(rng)
    ids, inter = model.sample_ids(
        params, r, 1, sampling=sampling, get_intermediates=True
    )
    frames = [
        {k: np.asarray(v) for k, v in tokenizer.decode(step_ids).items()}
        for step_ids in np.asarray(inter)
    ]
    save_gif(
        frames, os.path.join(a.out_dir, "diffusion.gif"),
        cfg.dataset.num_categories,
    )
    print(f"demo outputs in {a.out_dir}")


if __name__ == "__main__":
    main()
