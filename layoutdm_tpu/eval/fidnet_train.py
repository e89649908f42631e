"""Train the FIDNetV3 feature extractor — `fid/train.py:30-210` equivalent.

Objective parity: discriminate noise-added layouts (BCE) + reconstruct
labels (CE) and boxes (10x MSE) from the CLS feature; Adam 3e-4, batch 64,
200k iterations, AddNoiseToBBox(p=0.5) + LexicographicOrder transform.
The step is one jitted function; checkpointing saves flax msgpack (loadable
by `eval.fidnet.load_fidnet_v3`).
"""

from __future__ import annotations

import logging
import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from layoutdm_tpu.data.datasets import load_dataset
from layoutdm_tpu.data.loader import batch_iterator
from layoutdm_tpu.data.transforms import AddNoiseToBBox, LexicographicOrder
from layoutdm_tpu.eval.fidnet import FIDNetV3

logger = logging.getLogger(__name__)


def fid_transform(rng: np.random.RandomState, batch):
    out = dict(batch)
    noise_added = rng.rand(batch["bbox"].shape[0]) < 0.5
    noisy = AddNoiseToBBox()(rng, batch)
    out["bbox"] = np.where(
        noise_added[:, None, None], noisy["bbox"], batch["bbox"]
    )
    out = LexicographicOrder()(rng, out)
    out["is_real"] = noise_added.astype(np.float32)  # parity: fid/train.py:95
    return out


def make_fid_train_step(model: FIDNetV3, optimizer):
    def loss_fn(params, batch):
        mask = batch["mask"]
        logit, logit_cls, bbox_pred = model.apply(
            {"params": params}, batch["bbox"], batch["label"], ~mask
        )
        bce = optax.sigmoid_binary_cross_entropy(logit, batch["is_real"])
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logit_cls, batch["label"]
        )
        ce = jnp.where(mask, ce, 0.0).sum() / jnp.maximum(mask.sum(), 1)
        mse = ((bbox_pred - batch["bbox"]) ** 2).sum(-1)
        mse = jnp.where(mask, mse, 0.0).sum() / jnp.maximum(mask.sum(), 1)
        total = bce.mean() + ce + 10.0 * mse
        return total, {"bce": bce.mean(), "label": ce, "bbox": mse}

    @jax.jit
    def step(params, opt_state, batch):
        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": total, **parts}

    return step, jax.jit(loss_fn)


def train_fidnet(
    dataset_name: str,
    data_dir: str,
    out_dir: str,
    max_seq_length: int = 25,
    batch_size: int = 64,
    iterations: int = 200_000,
    lr: float = 3e-4,
    seed: int = 0,
    log_every: int = 500,
):
    train_data = load_dataset(dataset_name, data_dir, "train", max_seq_length)
    val_data = load_dataset(dataset_name, data_dir, "test", max_seq_length)
    num_labels = len(train_data.labels)

    model = FIDNetV3(num_labels=num_labels, max_bbox=max_seq_length)
    rng_np = np.random.RandomState(seed)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, max_seq_length, 4)),
        jnp.zeros((1, max_seq_length), jnp.int32),
        jnp.zeros((1, max_seq_length), bool),
    )["params"]
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step, loss_fn = make_fid_train_step(model, optimizer)

    prefix = f"{dataset_name}-max{max_seq_length}"
    ckpt_dir = os.path.join(out_dir, prefix)
    os.makedirs(ckpt_dir, exist_ok=True)
    best = float("inf")
    it = 0
    while it < iterations:
        for batch in batch_iterator(train_data, batch_size, rng_np,
                                    fid_transform):
            params, opt_state, metrics = step(params, opt_state, batch)
            it += 1
            if it % log_every == 0:
                # validation sweep (`fid/train.py:150-199`)
                vals = []
                for vb in batch_iterator(
                    val_data, batch_size, rng_np, fid_transform,
                    shuffle=False, drop_last=False,
                ):
                    vals.append(float(loss_fn(params, vb)[0]))
                vloss = float(np.mean(vals))
                logger.info("iter %d val_loss %.4f", it, vloss)
                if vloss < best:
                    best = vloss
                    with open(
                        os.path.join(ckpt_dir, "model_best.msgpack"), "wb"
                    ) as f:
                        f.write(serialization.to_bytes(jax.device_get(params)))
            if it >= iterations:
                break
    # always leave a checkpoint, even for runs shorter than log_every
    best_path = os.path.join(ckpt_dir, "model_best.msgpack")
    if not os.path.exists(best_path):
        with open(best_path, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
    return params


def main(argv=None):
    import argparse

    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("--data_dir", default="download/datasets")
    p.add_argument("--out_dir", default="download/fid_weights/FIDNetV3")
    p.add_argument("--max_seq_length", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--iteration", type=int, default=200_000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument(
        "--register_module",
        default="",
        help="module/.py registering a custom dataset (docs/custom_dataset.md)",
    )
    a = p.parse_args(argv)
    if a.register_module:
        from layoutdm_tpu.registry import import_registrations

        import_registrations(a.register_module)
    train_fidnet(
        a.dataset, a.data_dir, a.out_dir, a.max_seq_length, a.batch_size,
        a.iteration, a.lr,
    )


if __name__ == "__main__":
    main()
