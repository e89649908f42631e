"""Numerical parity against the REFERENCE'S OWN code (not hand-built twins).

Drives /root/reference's `categorical_diffusion/{util,vanilla,constrained}.py`,
`helpers/{bbox_tokenizer,layout_tokenizer}.py`, and `fid/model.py` (imported
unmodified via tests/ref_shim.py) with identical inputs and asserts:

  (a) `alpha_schedule` tables bit-equal in float64
  (b) q_pred / q_pred_one_timestep / q_posterior equal <=1e-4 in prob space
      for BOTH Q variants at the flagship vocab (rico25: V=155, S=125)
  (c) tokenizer encode/decode token-for-token under linear AND a kmeans
      pickle built with sklearn (the reference's own clustering pipeline)
  (d) one full reverse step token-identical under injected identical gumbel
      noise, with the reference's random-init transformer weights imported
      into our flax denoiser
  (e) FIDNetV3 features match after weight import

This converts round-1's twin-verified claims into reference-verified ones
(VERDICT round 1, item 1).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from layoutdm_tpu.ops import log_math
from layoutdm_tpu.models.diffusion.vanilla import VanillaQ
from layoutdm_tpu.models.diffusion.constrained import ConstrainedQ
from layoutdm_tpu.tokenizer.bbox import BboxTokenizer, load_kmeans_centers
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer
from layoutdm_tpu.registry import DATASET_LABELS

from tests import ref_shim

REF = ref_shim.load_reference()

V_FLAGSHIP = 155  # rico25, x-y-w-h, 32 bins, pad+mask
S_FLAGSHIP = 125
T = 100


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def make_my_tokenizer(quantization="linear", centers=None, dataset="rico25"):
    bb = BboxTokenizer(
        num_bins=32,
        var_order=("x", "y", "w", "h"),
        shared_vocab="x-y-w-h",
        quantization=quantization,
        centers=centers,
    )
    return LayoutSequenceTokenizer(
        bbox_tokenizer=bb,
        num_categories=len(DATASET_LABELS[dataset]),
        max_elements=25,
        special_tokens=("pad", "mask"),
        pad_until_max=True,
    )


def to_ref_layout(x_bsv: np.ndarray) -> torch.Tensor:
    """ours (B, S, V) -> reference (B, V, S)."""
    return torch.from_numpy(np.asarray(x_bsv)).permute(0, 2, 1).contiguous()


def from_ref_layout(x_bvs: torch.Tensor) -> np.ndarray:
    return x_bvs.detach().numpy().transpose(0, 2, 1)


def random_log_softmax(rng, B, S, V):
    z = rng.randn(B, S, V).astype(np.float32) * 3.0
    z = z - np.log(np.exp(z - z.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - z.max(-1, keepdims=True)
    return z.astype(np.float32)


def legal_xt_ids(rng, tok, B):
    """Random x_t ids that are attribute-legal at every slot (incl. PAD/MASK),
    as produced by the forward corruption process."""
    pad_id, mask_id = tok.name_to_id("pad"), tok.name_to_id("mask")
    cols = []
    for key in tok.var_names:
        if key == "c":
            choices = list(range(tok.N_category)) + [pad_id, mask_id]
        else:
            sl = tok.get_slice(key)
            choices = list(range(sl.start, sl.stop)) + [pad_id, mask_id]
        cols.append(
            np.asarray(choices)[rng.randint(0, len(choices), size=(B, tok.max_elements))]
        )
    return np.stack(cols, axis=-1).reshape(B, -1).astype(np.int32)


@pytest.fixture(scope="module")
def ref_vanilla_mod():
    torch.manual_seed(0)
    tok = ref_shim.make_ref_tokenizer()
    m = REF.vanilla.VanillaMaskAndReplaceDiffusion(
        backbone_cfg=ref_shim.make_backbone_cfg(),
        num_classes=tok.N_total,
        max_token_length=tok.max_token_length,
        num_timesteps=T,
        tokenizer=tok,
    ).eval()
    return m, tok


@pytest.fixture(scope="module")
def ref_constrained_mod():
    torch.manual_seed(0)
    tok = ref_shim.make_ref_tokenizer()
    m = REF.constrained.ConstrainedMaskAndReplaceDiffusion(
        backbone_cfg=ref_shim.make_backbone_cfg(),
        num_classes=tok.N_total,
        max_token_length=tok.max_token_length,
        num_timesteps=T,
        tokenizer=tok,
    ).eval()
    return m, tok


# ---------------------------------------------------------------------------
# (a) schedule tables
# ---------------------------------------------------------------------------


def test_alpha_schedule_bit_equal_f64():
    for N in (154, 26, 33):
        ref_tabs = REF.util.alpha_schedule(T, N=N)
        my_tabs = log_math.alpha_schedule(T, N=N)
        for r, m in zip(ref_tabs, my_tabs):
            r = r.numpy() if isinstance(r, torch.Tensor) else np.asarray(r)
            assert r.dtype == np.float64 and m.dtype == np.float64
            np.testing.assert_array_equal(r, m)


def test_log_buffers_bit_equal_vanilla(ref_vanilla_mod):
    """The registered float32 log buffers match our ScheduleTables exactly."""
    m, tok = ref_vanilla_mod
    mine = log_math.ScheduleTables(T, N=tok.N_total - 1)
    for name in (
        "log_at", "log_bt", "log_ct", "log_1_min_ct",
        "log_cumprod_at", "log_cumprod_bt", "log_cumprod_ct",
        "log_1_min_cumprod_ct",
    ):
        ref_buf = getattr(m, name).numpy()
        my_buf = getattr(mine, name)
        # our cumulative tables append the "t = -1" identity row at index T
        np.testing.assert_array_equal(ref_buf, my_buf[: len(ref_buf)])


# ---------------------------------------------------------------------------
# (b) q math parity — vanilla
# ---------------------------------------------------------------------------


def test_vanilla_q_pred_parity(ref_vanilla_mod, rng):
    m, tok = ref_vanilla_mod
    V, S = tok.N_total, tok.max_token_length
    B = 4
    mine = VanillaQ(num_classes=V, num_timesteps=T)
    log_x = random_log_softmax(rng, B, S, V)
    t = rng.randint(0, T, size=(B,))

    ref_out = from_ref_layout(
        m.q_pred(to_ref_layout(log_x), torch.from_numpy(t))
    )
    my_out = np.asarray(mine.q_pred(jnp.asarray(log_x), jnp.asarray(t)))
    np.testing.assert_allclose(
        np.exp(my_out), np.exp(ref_out), atol=1e-4, rtol=0
    )

    ref_out1 = from_ref_layout(
        m.q_pred_one_timestep(to_ref_layout(log_x), torch.from_numpy(t))
    )
    my_out1 = np.asarray(
        mine.q_pred_one_timestep(jnp.asarray(log_x), jnp.asarray(t))
    )
    np.testing.assert_allclose(
        np.exp(my_out1), np.exp(ref_out1), atol=1e-4, rtol=0
    )


def test_vanilla_q_posterior_parity(ref_vanilla_mod, rng):
    m, tok = ref_vanilla_mod
    V, S = tok.N_total, tok.max_token_length
    B = 4
    mine = VanillaQ(num_classes=V, num_timesteps=T)

    log_x_start = random_log_softmax(rng, B, S, V)
    xt = rng.randint(0, V, size=(B, S)).astype(np.int32)
    log_x_t = np.asarray(log_math.log_onehot(jnp.asarray(xt), V))
    for t_np in (
        np.zeros((B,), np.int64),
        rng.randint(1, T, size=(B,)),
        np.full((B,), T - 1, np.int64),
    ):
        ref_out = from_ref_layout(
            m.q_posterior(
                to_ref_layout(log_x_start),
                to_ref_layout(log_x_t),
                torch.from_numpy(t_np),
            )
        )
        my_out = np.asarray(
            mine.q_posterior(
                jnp.asarray(log_x_start), jnp.asarray(log_x_t), jnp.asarray(t_np)
            )
        )
        np.testing.assert_allclose(
            np.exp(my_out), np.exp(ref_out), atol=1e-4, rtol=0
        )
        # the ids-specialized fast path (sampler carry) agrees too
        my_ids_out = np.asarray(
            mine.q_posterior_ids(
                jnp.asarray(log_x_start), jnp.asarray(xt), jnp.asarray(t_np)
            )
        )
        np.testing.assert_allclose(
            np.exp(my_ids_out), np.exp(ref_out), atol=1e-4, rtol=0
        )


# ---------------------------------------------------------------------------
# (b) q math parity — constrained (the paper's contribution)
# ---------------------------------------------------------------------------


def test_constrained_q_posterior_parity(ref_constrained_mod, rng):
    m, ref_tok = ref_constrained_mod
    my_tok = make_my_tokenizer()
    assert my_tok.N_total == ref_tok.N_total == V_FLAGSHIP
    mine = ConstrainedQ(my_tok, num_timesteps=T)

    B, S, V = 4, S_FLAGSHIP, V_FLAGSHIP
    log_x_start = random_log_softmax(rng, B, S, V)
    xt = legal_xt_ids(rng, my_tok, B)
    log_x_t = np.asarray(log_math.log_onehot(jnp.asarray(xt), V))

    for t_np in (
        np.zeros((B,), np.int64),
        rng.randint(1, T, size=(B,)),
        np.full((B,), T - 1, np.int64),
    ):
        ref_out = from_ref_layout(
            m.q_posterior(
                to_ref_layout(log_x_start),
                to_ref_layout(log_x_t),
                torch.from_numpy(t_np),
            )
        )
        my_out = np.asarray(
            mine.q_posterior(
                jnp.asarray(log_x_start), jnp.asarray(log_x_t), jnp.asarray(t_np)
            )
        )
        np.testing.assert_allclose(
            np.exp(my_out), np.exp(ref_out), atol=1e-4, rtol=0
        )
        # the ids-specialized fast path (sampler carry) agrees too
        my_ids_out = np.asarray(
            mine.q_posterior_ids(
                jnp.asarray(log_x_start), jnp.asarray(xt), jnp.asarray(t_np)
            )
        )
        np.testing.assert_allclose(
            np.exp(my_ids_out), np.exp(ref_out), atol=1e-4, rtol=0
        )


def test_constrained_corruption_marginals_match(ref_constrained_mod, rng):
    """q_pred applied to clean one-hots agrees per attribute slot: compare
    the FULL-vocab corruption marginals q(x_t|x_0) of both implementations."""
    m, ref_tok = ref_constrained_mod
    my_tok = make_my_tokenizer()
    mine = ConstrainedQ(my_tok, num_timesteps=T)
    cv = mine.converter

    B = 3
    seq = legal_xt_ids(rng, my_tok, B)
    # replace MASK with PAD: clean layouts never contain MASK
    seq = np.where(seq == my_tok.name_to_id("mask"), my_tok.name_to_id("pad"), seq)
    t_np = rng.randint(0, T, size=(B,))

    # ours: partial-lane marginals -> full vocab via p_to_f_log
    ids_p = cv.f_to_p_id(jnp.asarray(seq.reshape(B, my_tok.max_elements, cv.A)))
    logp = mine.q_pred(
        jnp.asarray(log_math.log_onehot(ids_p, cv.Vp)), jnp.asarray(t_np)
    )
    my_marg = np.asarray(cv.p_to_f_log(logp)).reshape(B, -1, my_tok.N_total)

    # reference: per-key loop
    x = torch.from_numpy(seq.astype(np.int64))
    s_elem = ref_tok.max_seq_length
    step = ref_tok.N_var_per_element
    x_resh = m.converter.f_to_p_id_all(x.view(B, s_elem, step))
    ref_cols = []
    for i, key in enumerate(ref_tok.var_names):
        log_x_start = REF.util.index_to_log_onehot(
            x_resh[..., i], m.mat_size[key]
        )
        log_qt = m.q_pred(log_x_start, torch.from_numpy(t_np), key)
        ref_cols.append(m.converter.p_to_f_log(log_qt, key))
    ref_marg = torch.stack(ref_cols, dim=-1).view(B, ref_tok.N_total, -1)
    ref_marg = from_ref_layout(ref_marg)

    np.testing.assert_allclose(
        np.exp(my_marg), np.exp(ref_marg), atol=1e-4, rtol=0
    )


# ---------------------------------------------------------------------------
# (c) tokenizer parity — linear and kmeans (sklearn pickle path)
# ---------------------------------------------------------------------------


def _random_raw_layouts(rng, B=6, S=25, n_cat=25):
    n = rng.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    label = (rng.randint(0, n_cat, size=(B, S)) * mask).astype(np.int64)
    bbox = rng.rand(B, S, 4).astype(np.float32) * mask[..., None]
    return label, bbox, mask


def _assert_tokenizer_parity(ref_tok, my_tok, rng):
    label, bbox, mask = _random_raw_layouts(rng)
    ref_out = ref_tok.encode(
        {
            "label": torch.from_numpy(label),
            "bbox": torch.from_numpy(bbox),
            "mask": torch.from_numpy(mask),
        }
    )
    my_out = my_tok.encode(
        {"label": jnp.asarray(label), "bbox": jnp.asarray(bbox),
         "mask": jnp.asarray(mask)}
    )
    np.testing.assert_array_equal(
        np.asarray(my_out["seq"]), ref_out["seq"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(my_out["mask"]), ref_out["mask"].numpy()
    )

    # decode: reference's own encoded ids plus deliberately corrupted ones
    ids = ref_out["seq"].numpy().copy()
    ids[0, :5] = my_tok.name_to_id("mask")  # corrupt one element
    ref_dec = ref_tok.decode(torch.from_numpy(ids))
    my_dec = my_tok.decode(jnp.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(my_dec["label"]), ref_dec["label"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(my_dec["mask"]), ref_dec["mask"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(my_dec["bbox"]), ref_dec["bbox"].numpy(), atol=1e-6
    )

    # token legality mask (S*5, V)
    np.testing.assert_array_equal(
        my_tok.token_mask(), ref_tok.token_mask.numpy()
    )
    # vocab slices per attribute
    for key in ("c", "x", "y", "w", "h", "special"):
        assert my_tok.get_slice(key) == ref_tok.get_slice(key)


def test_tokenizer_parity_linear(rng):
    ref_tok = ref_shim.make_ref_tokenizer(bbox_quantization="linear")
    my_tok = make_my_tokenizer(quantization="linear")
    _assert_tokenizer_parity(ref_tok, my_tok, rng)


def test_tokenizer_parity_kmeans(tmp_path, rng, monkeypatch):
    """Build a kmeans pickle with the reference's own clustering pipeline
    (sklearn KMeans per coordinate, `bin/clustering_coordinates.py:53-60`),
    then assert token-for-token encode/decode parity."""
    import pickle

    from sklearn.cluster import KMeans

    coords = rng.rand(2000, 4).astype(np.float32)
    models = {}
    for i, key in enumerate(("x", "y", "w", "h")):
        models[f"{key}-32"] = KMeans(n_clusters=32, random_state=0, n_init=10).fit(
            coords[:, i : i + 1]
        )
    pkl = tmp_path / "rico25_max25_kmeans_train_clusters.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(models, f, protocol=pickle.HIGHEST_PROTOCOL)

    import trainer.helpers.bbox_tokenizer as ref_bb

    monkeypatch.setattr(ref_bb, "KMEANS_WEIGHT_ROOT", str(tmp_path))
    ref_tok = ref_shim.make_ref_tokenizer(bbox_quantization="kmeans")
    centers = load_kmeans_centers(str(pkl), 32)
    my_tok = make_my_tokenizer(quantization="kmeans", centers=centers)
    _assert_tokenizer_parity(ref_tok, my_tok, rng)


# ---------------------------------------------------------------------------
# (d) full reverse step with the reference's own random-init weights
# ---------------------------------------------------------------------------


def _my_flax_from_ref(m_ref, my_tok, num_layers=2, d_model=64):
    """Port the reference module's transformer weights into our flax model."""
    from layoutdm_tpu.configs import BackboneConfig
    from layoutdm_tpu.models.nn import CategoricalTransformer
    from layoutdm_tpu.utils.torch_port import convert_categorical_transformer

    sd = m_ref.state_dict()
    params = convert_categorical_transformer(
        sd, num_layers=num_layers, timestep_type="adalayernorm"
    )
    cfg = BackboneConfig(
        d_model=d_model, nhead=4, dim_feedforward=128, num_layers=num_layers,
        dropout=0.0, timestep_type="adalayernorm", diffusion_step=T,
    )
    net = CategoricalTransformer(
        backbone=cfg,
        num_classes=my_tok.N_total,
        max_token_length=my_tok.max_token_length,
        pos_emb="elem_attr",
        n_attr_per_elem=my_tok.N_var_per_element,
    )
    return net, params


def _my_predict_start(net, params):
    from layoutdm_tpu.models.diffusion.sampler import make_predict_start

    def apply_fn(p, ids, t, rng):
        return net.apply({"params": p}, ids, t, deterministic=True)

    return make_predict_start(apply_fn, net.num_classes)


def test_reverse_step_token_identical(ref_constrained_mod, rng):
    """One full reverse step (predict_start -> q_posterior -> gumbel sample):
    token-identical under injected identical gumbel noise, and distributions
    equal <=2e-4 in prob space, using the reference's own weights."""
    m, ref_tok = ref_constrained_mod
    my_tok = make_my_tokenizer()
    net, params = _my_flax_from_ref(m, my_tok)
    predict_start = _my_predict_start(net, params)

    B, S, V = 4, S_FLAGSHIP, V_FLAGSHIP
    mine = ConstrainedQ(my_tok, num_timesteps=T)

    xt = legal_xt_ids(rng, my_tok, B)
    log_x_t = np.asarray(log_math.log_onehot(jnp.asarray(xt), V))
    t_np = np.full((B,), 57, np.int64)

    # --- reference step
    with torch.no_grad():
        ref_log_z = to_ref_layout(log_x_t)
        ref_recon = m.predict_start(ref_log_z, torch.from_numpy(t_np))
        ref_mlp = m.q_posterior(ref_recon, ref_log_z, torch.from_numpy(t_np))
    ref_mlp = from_ref_layout(ref_mlp)

    # --- our step (the production path: ids in, ids-specialized posterior)
    my_recon = predict_start(params, jnp.asarray(xt), jnp.asarray(t_np), None)
    my_mlp = np.asarray(
        mine.q_posterior_ids(my_recon, jnp.asarray(xt), jnp.asarray(t_np))
    )

    np.testing.assert_allclose(
        np.exp(np.asarray(my_recon)), np.exp(from_ref_layout(ref_recon)),
        atol=2e-4, rtol=0,
    )
    np.testing.assert_allclose(
        np.exp(my_mlp), np.exp(ref_mlp), atol=2e-4, rtol=0
    )

    # identical gumbel noise -> identical tokens
    g = -np.log(-np.log(rng.rand(B, S, V).astype(np.float32) + 1e-30) + 1e-30)
    ids_ref = np.argmax(ref_mlp + g, axis=-1)
    ids_my = np.argmax(my_mlp + g, axis=-1)
    np.testing.assert_array_equal(ids_my, ids_ref)


def test_reverse_chain_teacher_forced(ref_constrained_mod, rng):
    """Walk the reference's T_eval=10 reverse chain (gumbel-sampled on the
    reference side); at every step our posterior matches on the SAME x_t."""
    m, ref_tok = ref_constrained_mod
    my_tok = make_my_tokenizer()
    net, params = _my_flax_from_ref(m, my_tok)
    predict_start = _my_predict_start(net, params)
    mine = ConstrainedQ(my_tok, num_timesteps=T)

    B, S, V = 2, S_FLAGSHIP, V_FLAGSHIP
    mask_id = my_tok.name_to_id("mask")
    xt = np.full((B, S), mask_id, np.int64)

    for t0 in range(T - 1, -1, -10):  # 90, 80, ..., 0 after the first step
        t_np = np.full((B,), t0, np.int64)
        log_x_t = np.asarray(log_math.log_onehot(jnp.asarray(xt), V))
        with torch.no_grad():
            ref_log_z = to_ref_layout(log_x_t)
            ref_recon = m.predict_start(ref_log_z, torch.from_numpy(t_np))
            ref_mlp = from_ref_layout(
                m.q_posterior(ref_recon, ref_log_z, torch.from_numpy(t_np))
            )
        my_recon = predict_start(
            params, jnp.asarray(xt), jnp.asarray(t_np), None
        )
        my_mlp = np.asarray(
            mine.q_posterior_ids(my_recon, jnp.asarray(xt), jnp.asarray(t_np))
        )
        np.testing.assert_allclose(
            np.exp(my_mlp), np.exp(ref_mlp), atol=2e-4, rtol=0
        )
        # advance the chain with shared gumbel noise
        g = -np.log(-np.log(rng.rand(B, S, V).astype(np.float32) + 1e-30) + 1e-30)
        xt = np.argmax(ref_mlp + g, axis=-1)


# ---------------------------------------------------------------------------
# (e) FIDNetV3 feature parity vs the reference fid/model.py
# ---------------------------------------------------------------------------


def test_fidnet_parity_vs_reference(tmp_path, rng):
    from trainer.fid.model import FIDNetV3 as RefFIDNet

    from layoutdm_tpu.eval.fidnet import load_torch_fidnet, make_feature_extractor

    L, S, B = 25, 25, 3
    torch.manual_seed(0)
    ref_net = RefFIDNet(num_label=L, max_bbox=S).eval()
    path = tmp_path / "model_best.pth.tar"
    torch.save({"state_dict": ref_net.state_dict()}, path)

    model, params = load_torch_fidnet(str(path), L, max_bbox=S)
    extract = make_feature_extractor(model, params)

    n = rng.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    bbox = rng.rand(B, S, 4).astype(np.float32) * mask[..., None]
    label = (rng.randint(0, L, size=(B, S)) * mask).astype(np.int64)

    with torch.no_grad():
        want = ref_net.extract_features(
            torch.from_numpy(bbox), torch.from_numpy(label),
            torch.from_numpy(~mask),
        ).numpy()
    got = np.asarray(extract(jnp.asarray(bbox), jnp.asarray(label), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fidnet_v1_parity_vs_reference(tmp_path, rng):
    from trainer.fid.model import FIDNet as RefV1

    from layoutdm_tpu.eval.fidnet import load_torch_fidnet_v1

    L, S, B = 25, 20, 3
    torch.manual_seed(1)
    ref = RefV1(num_label=L).eval()
    path = tmp_path / "v1.pth.tar"
    torch.save({"state_dict": ref.state_dict()}, path)
    model, params = load_torch_fidnet_v1(str(path), L)

    n = rng.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    bbox = rng.rand(B, S, 4).astype(np.float32) * mask[..., None]
    label = (rng.randint(0, L, size=(B, S)) * mask).astype(np.int64)

    with torch.no_grad():
        feat_w = ref.extract_features(
            torch.from_numpy(bbox), torch.from_numpy(label),
            torch.from_numpy(~mask),
        ).numpy()
        logit_w = ref(
            torch.from_numpy(bbox), torch.from_numpy(label),
            torch.from_numpy(~mask),
        ).numpy()
    feat_g = model.apply(
        {"params": params}, jnp.asarray(bbox), jnp.asarray(label),
        jnp.asarray(~mask), method=model.extract_features,
    )
    logit_g = model.apply(
        {"params": params}, jnp.asarray(bbox), jnp.asarray(label),
        jnp.asarray(~mask),
    )
    np.testing.assert_allclose(np.asarray(feat_g), feat_w, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logit_g), logit_w, atol=2e-4)


def test_fidnet_v2_parity_vs_reference(tmp_path, rng):
    from trainer.fid.model import FIDNetV2 as RefV2

    from layoutdm_tpu.eval.fidnet import load_torch_fidnet_v2

    L, S, B = 25, 20, 3
    torch.manual_seed(2)
    ref = RefV2(num_label=L, max_bbox=S).eval()
    path = tmp_path / "v2.pth.tar"
    torch.save({"state_dict": ref.state_dict()}, path)
    model, variables = load_torch_fidnet_v2(str(path), L, max_bbox=S)

    n = rng.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    bbox = rng.rand(B, S, 4).astype(np.float32) * mask[..., None]
    label = (rng.randint(0, L, size=(B, S)) * mask).astype(np.int64)

    with torch.no_grad():
        feat_w = ref.extract_features(
            torch.from_numpy(bbox), torch.from_numpy(label),
            torch.from_numpy(~mask),
        ).numpy()
        logit_w, cls_w, bbox_w = ref(
            torch.from_numpy(bbox), torch.from_numpy(label),
            torch.from_numpy(~mask),
        )
    feat_g = model.apply(
        variables, jnp.asarray(bbox), jnp.asarray(label), jnp.asarray(~mask),
        method=model.extract_features,
    )
    logit_g, cls_g, bbox_g = model.apply(
        variables, jnp.asarray(bbox), jnp.asarray(label), jnp.asarray(~mask)
    )
    np.testing.assert_allclose(np.asarray(feat_g), feat_w.numpy() if hasattr(feat_w, "numpy") else feat_w, atol=3e-4)
    np.testing.assert_allclose(np.asarray(logit_g), logit_w.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(cls_g), cls_w.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(bbox_g), bbox_w.numpy(), atol=3e-4)


def test_fidnet_train_loss_parity(tmp_path, rng):
    """FIDNet trainer loss parity: our `eval/fidnet_train.py:40-55` vs the
    reference's criterion math (`fid/train.py:76-117` — BCE on the real/fake
    logit, label CE and 10x bbox MSE over valid elements only) with
    identical ported weights and batch."""
    import optax
    import torch.nn as tnn

    from trainer.fid.model import FIDNetV3 as RefFIDNet

    from layoutdm_tpu.eval.fidnet import load_torch_fidnet
    from layoutdm_tpu.eval.fidnet_train import make_fid_train_step

    L, S, B = 25, 25, 6
    torch.manual_seed(1)
    ref_net = RefFIDNet(num_label=L, max_bbox=S).eval()
    path = tmp_path / "model_best.pth.tar"
    torch.save({"state_dict": ref_net.state_dict()}, path)
    model, params = load_torch_fidnet(str(path), L, max_bbox=S)

    n = rng.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    bbox = (rng.rand(B, S, 4).astype(np.float32) * mask[..., None])
    label = (rng.randint(0, L, size=(B, S)) * mask).astype(np.int64)
    is_real = (rng.rand(B) < 0.5).astype(np.float32)

    t_mask = torch.from_numpy(mask)
    with torch.no_grad():
        logit, logit_cls, bbox_pred = ref_net(
            torch.from_numpy(bbox), torch.from_numpy(label),
            torch.from_numpy(~mask),
        )
        ref_bce = tnn.BCEWithLogitsLoss(reduction="none")(
            logit, torch.from_numpy(is_real)
        ).mean()
        ref_label = tnn.CrossEntropyLoss(reduction="none")(
            logit_cls[t_mask], torch.from_numpy(label)[t_mask]
        ).mean()
        ref_bbox = (
            tnn.MSELoss(reduction="none")(
                bbox_pred[t_mask], torch.from_numpy(bbox)[t_mask]
            )
            .sum(-1)
            .mean()
        )
        ref_total = ref_bce + ref_label + 10.0 * ref_bbox

    _, loss_fn = make_fid_train_step(model, optax.adam(3e-4))
    total, parts = loss_fn(
        params,
        {
            "bbox": jnp.asarray(bbox),
            "label": jnp.asarray(label),
            "mask": jnp.asarray(mask),
            "is_real": jnp.asarray(is_real),
        },
    )
    np.testing.assert_allclose(float(parts["bce"]), float(ref_bce), atol=1e-4)
    np.testing.assert_allclose(
        float(parts["label"]), float(ref_label), atol=1e-4
    )
    np.testing.assert_allclose(
        float(parts["bbox"]), float(ref_bbox), atol=1e-4
    )
    np.testing.assert_allclose(float(total), float(ref_total), atol=2e-4)
