"""PubLayNet-scale end-to-end pipeline run: max_elements=100 (S=500).

The S=500 bench row (`bench.py:bench_publaynet_scale`) only ever ran an
UNTRAINED forward at this shape; this script runs the whole pipeline —
train N epochs -> sample every task -> eval — on synthetic data at the
big shape, exercising the VMEM gates, the converter, relation guidance,
unconditional sampling, and checkpoint/resume exactly where the bench's
claims live (round-4 VERDICT next #4).  Matches the scale knob of the
reference's PubLayNet config (`config/dataset/publaynet.yaml` there is
max_seq_length=25; our claim is the 100-element serving scale, so that is
what must survive end-to-end).

Writes artifacts under --out (default /tmp/e2e_bigshape): the trained job
dir, per-task sample pickles, the eval CSV, and a one-line summary JSON
(also copied to benchmarks/e2e_bigshape.json when --record is passed so
the result is versioned round-over-round).

Usage: python bin/e2e_bigshape.py [--out DIR] [--epochs 2] [--record]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

TASKS = ("unconditional", "c", "cwh", "partial", "refinement", "relation")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="/tmp/e2e_bigshape")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_samples", type=int, default=32)
    p.add_argument("--num_timesteps", type=int, default=20)
    p.add_argument("--record", action="store_true",
                   help="copy the summary to benchmarks/e2e_bigshape.json")
    a = p.parse_args()

    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.eval_cli import main as eval_main
    from layoutdm_tpu.sample_cli import main as sample_main
    from layoutdm_tpu.train.loop import train

    job_dir = os.path.join(a.out, "job")
    t0 = time.perf_counter()
    cfg = build_train_config(
        "layoutdm",
        "synthetic",
        [
            f"job_dir={job_dir}",
            "dataset.max_seq_length=100",
            f"training.epochs={a.epochs}",
            f"data.batch_size={a.batch_size}",
            "seed=0",
        ],
    )
    assert cfg.dataset.max_seq_length == 100
    result = train(cfg)
    train_s = time.perf_counter() - t0
    assert np.isfinite(result["best_val_loss"]), result
    # S = 100 elements x 5 attrs
    summary = {
        "max_elements": 100,
        "seq_tokens": 500,
        "epochs": a.epochs,
        "train_s": round(train_s, 1),
        "best_val_loss": round(float(result["best_val_loss"]), 4),
        "tasks": {},
    }

    result_dir = os.path.join(a.out, "results")
    for task in TASKS:
        t1 = time.perf_counter()
        args = [
            f"job_dir={job_dir}",
            f"result_dir={result_dir}",
            f"cond={task}",
            f"num_timesteps={a.num_timesteps}",
            f"max_batch_size={a.num_samples}",
        ]
        if task == "unconditional":
            args.append(f"num_uncond_samples={a.num_samples}")
        else:
            args.append(f"debug_num_samples={a.num_samples}")
        sample_main(args)
        summary["tasks"][task] = {"sample_s": round(time.perf_counter() - t1, 1)}
    pkls = glob.glob(os.path.join(result_dir, "*.pkl"))
    assert len(pkls) >= len(TASKS), pkls

    t2 = time.perf_counter()
    from layoutdm_tpu.eval_cli import evaluate_results, print_scores

    scores = evaluate_results(sorted(pkls))
    print_scores(scores)
    summary["eval_s"] = round(time.perf_counter() - t2, 1)
    summary["metrics"] = {
        k: round(float(np.mean(v)), 4) for k, v in sorted(scores.items())
    }
    summary["artifacts"] = {"job_dir": job_dir, "pickles": len(pkls)}

    out_json = os.path.join(a.out, "summary.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    if a.record:
        rec = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "e2e_bigshape.json",
        )
        os.makedirs(os.path.dirname(rec), exist_ok=True)
        with open(rec, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"recorded {rec}", file=sys.stderr)


if __name__ == "__main__":
    main()
