#!/usr/bin/env python
"""Fit per-coordinate clustering for bbox quantization.

CLI parity with `bin/clustering_coordinates.py:1-71`: fits per-coordinate
1-D clusters for n_clusters in {2,4,...,256} on the train split (subsampled
to 1e5 boxes) and writes
`{dataset}_max{S}_{method}_train_clusters.npz` under the weight dir.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from layoutdm_tpu.data.datasets import load_dataset
from layoutdm_tpu.tokenizer.clustering import fit_coordinate_clusters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("--data_dir", default="download/datasets")
    p.add_argument("--out_dir", default="download/clustering_weights")
    p.add_argument("--max_seq_length", type=int, default=25)
    p.add_argument(
        "--algorithm", choices=["kmeans", "percentile"], default="kmeans"
    )
    p.add_argument("--max_points", type=int, default=100_000)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    data = load_dataset(a.dataset, a.data_dir, "train", a.max_seq_length)
    boxes = data.bbox[data.mask]
    n_list = [2**i for i in range(1, 9)]  # 2..256 like the reference
    fitted = fit_coordinate_clusters(
        boxes, n_list, a.algorithm, a.max_points, a.seed
    )
    os.makedirs(a.out_dir, exist_ok=True)
    out = os.path.join(
        a.out_dir,
        f"{a.dataset}_max{a.max_seq_length}_{a.algorithm}_train_clusters.npz",
    )
    np.savez(out, **fitted)
    print(f"wrote {out} ({len(fitted)} center sets)")


if __name__ == "__main__":
    main()
