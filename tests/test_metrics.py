"""Metric suite: handwritten golden cases + FIDNet smoke training."""

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.eval.metrics import (
    compute_alignment,
    compute_average_iou,
    compute_docsim,
    compute_generative_model_scores,
    compute_iou,
    compute_maximum_iou,
    compute_overlap,
    compute_prdc,
    compute_wasserstein_distance,
    frechet_distance,
)


def test_iou_golden():
    a = np.array([[0.5, 0.5, 0.4, 0.4]])
    np.testing.assert_allclose(compute_iou(a, a), [1.0])
    # half-shifted: boxes [0.3,0.7]x and [0.5,0.9]x -> intersection .2*.4
    b = np.array([[0.7, 0.5, 0.4, 0.4]])
    inter = 0.2 * 0.4
    union = 0.16 * 2 - inter
    np.testing.assert_allclose(compute_iou(a, b), [inter / union], atol=1e-6)
    # disjoint
    c = np.array([[0.1, 0.1, 0.1, 0.1]])
    np.testing.assert_allclose(compute_iou(a, c), [0.0])


def test_alignment_zero_for_aligned():
    # two boxes sharing the same left edge -> perfectly aligned
    bbox = np.array([[[0.3, 0.2, 0.2, 0.2], [0.3, 0.6, 0.2, 0.2]]])
    mask = np.ones((1, 2), bool)
    res = compute_alignment(bbox, mask)
    assert res["alignment-ACLayoutGAN"][0] < 1e-6
    assert res["alignment-NDN"][0] < 1e-6


def test_alignment_positive_for_misaligned():
    bbox = np.array([[[0.31, 0.2, 0.17, 0.2], [0.56, 0.6, 0.23, 0.23]]])
    mask = np.ones((1, 2), bool)
    res = compute_alignment(bbox, mask)
    assert res["alignment-ACLayoutGAN"][0] > 1e-3


def test_overlap_golden():
    # identical boxes overlap fully: ai/a1 = 1 for both ordered pairs
    bbox = np.array([[[0.5, 0.5, 0.4, 0.4], [0.5, 0.5, 0.4, 0.4]]])
    mask = np.ones((1, 2), bool)
    res = compute_overlap(bbox, mask)
    np.testing.assert_allclose(res["overlap-ACLayoutGAN"], [2.0], atol=1e-6)
    np.testing.assert_allclose(res["overlap-LayoutGAN++"], [1.0], atol=1e-6)
    np.testing.assert_allclose(res["overlap-LayoutGAN"], [0.16], atol=1e-6)
    # disjoint boxes -> 0
    bbox2 = np.array([[[0.2, 0.2, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])
    res2 = compute_overlap(bbox2, mask)
    np.testing.assert_allclose(res2["overlap-ACLayoutGAN"], [0.0])


def test_maximum_iou_identical_lists(rng):
    layouts = []
    for _ in range(4):
        n = rng.randint(1, 5)
        b = rng.rand(n, 4) * 0.4 + 0.2
        l = rng.randint(0, 3, n)
        layouts.append((b.astype(np.float32), l))
    assert np.isclose(compute_maximum_iou(layouts, layouts), 1.0)


def test_maximum_iou_disjoint_label_sets():
    l1 = [(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), np.array([0]))]
    l2 = [(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), np.array([1]))]
    assert compute_maximum_iou(l1, l2) == 0.0


def test_docsim_identical_higher_than_different(rng):
    a = [(rng.rand(3, 4).astype(np.float32), np.array([0, 1, 2]))]
    shifted = [(a[0][0] + 0.3, a[0][1])]
    same = compute_docsim(a, a)
    diff = compute_docsim(a, shifted)
    assert same > diff > 0


def test_average_iou(rng):
    # two fully-overlapping boxes -> VTN average IoU 1.0
    layouts = [
        (np.array([[0.5, 0.5, 0.4, 0.4], [0.5, 0.5, 0.4, 0.4]], np.float32),
         np.array([0, 1]))
    ]
    res = compute_average_iou(layouts)
    assert np.isclose(res["average_iou-VTN"], 1.0)
    assert res["average_iou-BLT"] > 0


def test_prdc_identical_sets(rng):
    feats = rng.randn(64, 16)
    res = compute_prdc(feats, feats, nearest_k=5)
    assert res["precision"] == 1.0
    assert res["recall"] == 1.0
    assert res["coverage"] == 1.0


def test_fid_zero_for_identical(rng):
    feats = rng.randn(256, 16)
    mu, sig = feats.mean(0), np.cov(feats, rowvar=False)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-6
    shifted = feats + 5.0
    assert (
        frechet_distance(
            mu, sig, shifted.mean(0), np.cov(shifted, rowvar=False)
        )
        > 100
    )


def test_generative_model_scores(rng):
    real, fake = rng.randn(64, 8), rng.randn(64, 8) + 0.1
    res = compute_generative_model_scores(real, fake)
    for k in ("precision", "recall", "density", "coverage", "fid"):
        assert k in res and np.isfinite(res[k])


def test_wasserstein(rng):
    mk = lambda seed: [
        (np.random.RandomState(seed).rand(4, 4).astype(np.float32),
         np.random.RandomState(seed).randint(0, 5, 4))
        for _ in range(8)
    ]
    res = compute_wasserstein_distance(mk(0), mk(0), n_classes=5)
    assert res["wdist_class"] == 0.0 and res["wdist_bbox"] == 0.0


# ---------------------------------------------------------------------------
# FIDNet
# ---------------------------------------------------------------------------


def test_fidnet_features_and_training(rng):
    from layoutdm_tpu.eval.fidnet import FIDNetV3, make_feature_extractor
    from layoutdm_tpu.eval.fidnet_train import (
        fid_transform,
        make_fid_train_step,
    )
    import optax

    S, L = 6, 4
    model = FIDNetV3(num_labels=L, d_model=32, nhead=2, num_layers=1,
                     max_bbox=S)
    bbox = jnp.asarray(rng.rand(3, S, 4), jnp.float32)
    label = jnp.asarray(rng.randint(0, L, (3, S)), jnp.int32)
    mask = jnp.asarray(rng.rand(3, S) > 0.3)
    params = model.init(jax.random.PRNGKey(0), bbox, label, ~mask)["params"]

    extract = make_feature_extractor(model, params)
    feats = extract(bbox, label, mask)
    assert feats.shape == (3, 32)
    # features must depend on the mask (padding is masked out of attention)
    feats2 = extract(bbox, label, jnp.ones_like(mask))
    assert not np.allclose(np.asarray(feats), np.asarray(feats2))

    optimizer = optax.adam(1e-3)
    step, _ = make_fid_train_step(model, optimizer)
    opt_state = optimizer.init(params)
    batch = {
        "bbox": np.asarray(bbox),
        "label": np.asarray(label),
        "mask": np.asarray(mask),
    }
    batch = fid_transform(rng, batch)
    losses = []
    for _ in range(10):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_fidnet_torch_import_roundtrip(tmp_path, rng):
    """Build a torch FIDNetV3-compatible state dict, import, and compare
    outputs against a reference forward computed in torch."""
    torch = __import__("torch")
    L, S, D = 3, 5, 256

    # a minimal torch twin of the encoder path only
    class TorchTwin(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.emb_label = torch.nn.Embedding(L, D)
            self.fc_bbox = torch.nn.Linear(4, D)
            self.enc_fc_in = torch.nn.Linear(2 * D, D)
            self.token = torch.nn.Parameter(torch.randn(1, 1, D))
            layer = torch.nn.TransformerEncoderLayer(
                d_model=D, nhead=4, dim_feedforward=D // 2, dropout=0.0
            )
            self.core = torch.nn.TransformerEncoder(layer, num_layers=4)
            self.fc_out_disc = torch.nn.Linear(D, 1)
            self.pos_token = torch.nn.Parameter(torch.rand(S, 1, D))
            self.dec_fc_in = torch.nn.Linear(2 * D, D)
            dlayer = torch.nn.TransformerEncoderLayer(
                d_model=D, nhead=4, dim_feedforward=D // 2, dropout=0.0
            )
            self.dec = torch.nn.TransformerEncoder(dlayer, num_layers=4)
            self.fc_out_cls = torch.nn.Linear(D, L)
            self.fc_out_bbox = torch.nn.Linear(D, 4)

        @torch.no_grad()
        def extract(self, bbox, label, padding_mask):
            x = torch.cat(
                [self.fc_bbox(bbox), self.emb_label(label)], dim=-1
            )
            x = torch.relu(self.enc_fc_in(x)).permute(1, 0, 2)
            tok = self.token.expand(-1, x.size(1), -1)
            x = torch.cat([tok, x], dim=0)
            pm = torch.cat(
                [torch.zeros(x.size(1), 1, dtype=torch.bool), padding_mask],
                dim=1,
            )
            x = self.core(x, src_key_padding_mask=pm)
            return x[0]

    twin = TorchTwin().eval()
    sd = {}
    for k, v in twin.state_dict().items():
        k = k.replace("core.layers", "enc_transformer.core.layers")
        k = k.replace("token", "enc_transformer.token") if k == "token" \
            else k
        k = k.replace("dec.layers", "dec_transformer.layers")
        sd[k] = v
    path = tmp_path / "model_best.pth.tar"
    torch.save({"state_dict": sd}, path)

    from layoutdm_tpu.eval.fidnet import load_torch_fidnet

    model, params = load_torch_fidnet(str(path), L, max_bbox=S)

    bbox = rng.rand(2, S, 4).astype(np.float32)
    label = rng.randint(0, L, (2, S))
    pad = np.zeros((2, S), bool)
    pad[1, 3:] = True

    want = twin.extract(
        torch.tensor(bbox), torch.tensor(label), torch.tensor(pad)
    ).numpy()
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(bbox), jnp.asarray(label),
            jnp.asarray(pad), method=type(model).extract_features,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fidnet_train_cli(tmp_path):
    """fidnet_train CLI end-to-end on synthetic (tiny budget)."""
    from layoutdm_tpu.eval.fidnet import load_fidnet_v3
    from layoutdm_tpu.eval.fidnet_train import main as fid_main

    out_dir = str(tmp_path / "fidw")
    fid_main(
        [
            "synthetic", "--data_dir", "", "--out_dir", out_dir,
            "--max_seq_length", "4", "--batch_size", "32",
            "--iteration", "40",
        ]
    )
    import os

    assert os.path.exists(
        os.path.join(out_dir, "synthetic-max4", "model_best.msgpack")
    )
    model, params = load_fidnet_v3("synthetic", 5, out_dir, 4)
    assert model.num_labels == 5


def test_docsim_mixed_sizes_routes_per_pair(rng):
    """A batch mixing equal- and unequal-size pairs must produce the same
    result as the pure-python reference path for every pair — the native
    fast path serves the equal pairs, the python path only the odd ones."""
    from layoutdm_tpu.eval.metrics import _docsim_pair

    gt, gen = [], []
    for n_gt, n_gen in [(3, 3), (3, 2), (2, 2), (4, 2), (1, 1)]:
        gt.append((rng.rand(n_gt, 4).astype(np.float32),
                   rng.randint(0, 3, n_gt)))
        gen.append((rng.rand(n_gen, 4).astype(np.float32),
                    rng.randint(0, 3, n_gen)))
    expect = float(np.mean([_docsim_pair(a, b) for a, b in zip(gt, gen)]))
    assert np.isclose(compute_docsim(gt, gen), expect, atol=1e-9)
