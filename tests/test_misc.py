"""LayoutDictTokenizer, beautify losses, VAE module, compute_real baseline."""

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.relation.const import beautify_alignment, beautify_non_overlap
from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
from layoutdm_tpu.tokenizer.sequence import LayoutDictTokenizer
from tests.test_tokenizer import random_layout


def test_dict_tokenizer_roundtrip(rng):
    bb = BboxTokenizer(num_bins=32, shared_vocab="xywh")
    tok = LayoutDictTokenizer(
        bbox_tokenizer=bb, num_categories=5, max_elements=6,
        special_tokens=("pad", "bos", "eos", "mask"), pad_until_max=True,
    )
    layout = random_layout(rng, B=3, S=6, n_cat=5)
    enc = tok.encode(layout)
    assert enc["label"].shape == (3, 7)  # +1 BOS row
    assert (np.asarray(enc["label"][:, 0]) == tok.name_to_id("bos")).all()
    dec = tok.decode(
        {k: np.asarray(v)[:, 1:] for k, v in enc.items()}  # strip BOS
    )
    m = layout["mask"]
    np.testing.assert_array_equal(
        np.asarray(dec["label"])[m], layout["label"][m]
    )


def test_beautify_losses_grad(rng):
    bbox = jnp.asarray(rng.rand(2, 5, 4) * 0.5 + 0.2, jnp.float32)
    mask = jnp.ones((2, 5), bool)

    for fn in (beautify_alignment, beautify_non_overlap):
        val, grad = jax.value_and_grad(lambda b: fn(b, mask).sum())(bbox)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
    # perfectly aligned, non-overlapping rows -> both costs ~0
    col = jnp.asarray(
        [[[0.3, 0.1, 0.2, 0.1], [0.3, 0.4, 0.2, 0.1], [0.3, 0.7, 0.2, 0.1]]]
    )
    m = jnp.ones((1, 3), bool)
    assert float(beautify_alignment(col, m)[0]) == 0.0
    assert float(beautify_non_overlap(col, m)[0]) == 0.0
    # overlapping boxes -> positive
    over = col.at[0, 1, 1].set(0.12)
    assert float(beautify_non_overlap(over, m)[0]) > 0.1


def test_vae_module(rng):
    from layoutdm_tpu.models.base import VAEModule

    vae = VAEModule(8)
    x = jnp.asarray(rng.randn(4, 16), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    out = vae.apply(params, x, jax.random.PRNGKey(2))
    assert out["z"].shape == (4, 8)
    assert out["mu"].shape == (4, 8)


def test_compute_real_baseline():
    from layoutdm_tpu.eval_cli import compute_real_baseline

    scores = compute_real_baseline("synthetic", "", max_seq_length=6)
    assert "maximum_iou" in scores and "wdist_class" in scores
    assert all(np.isfinite(v).all() for v in scores.values())


def test_eval_cli_multi_seed_aggregation(tmp_path, rng):
    """evaluate_results aggregates mean±std across seed pickles."""
    import pickle

    from layoutdm_tpu.configs import build_train_config, to_dict
    from layoutdm_tpu.eval_cli import evaluate_results, print_scores

    cfg = build_train_config(
        "layoutdm", "synthetic",
        ["dataset.max_seq_length=6", "data.bbox_quantization=linear"],
    )
    paths = []
    for seed in range(2):
        r = np.random.RandomState(seed)
        layouts = []
        for _ in range(16):
            n = r.randint(1, 6)
            layouts.append(
                (r.rand(n, 4).astype(np.float32) * 0.5 + 0.2,
                 r.randint(0, 5, n))
            )
        out = {
            "results": layouts,
            "train_cfg": to_dict(cfg),
            "test_cfg": {"cond": "c"},
            "ms_per_sample": 10.0 + seed,
        }
        p = tmp_path / f"c_test_seed_{seed}.pkl"
        with open(p, "wb") as f:
            pickle.dump(out, f)
        paths.append(str(p))

    scores = evaluate_results(paths)
    assert len(scores["maximum_iou"]) == 2
    assert len(scores["ms_per_sample"]) == 2
    assert np.isclose(np.mean(scores["ms_per_sample"]), 10.5)
    print_scores(scores)


def test_throughput_helper():
    from layoutdm_tpu.utils.profiling import Throughput

    tp = Throughput()
    with tp.measure(10):
        pass
    assert tp.items == 10
    assert tp.items_per_sec > 0
