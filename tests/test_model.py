"""End-to-end smoke tests: init -> loss/grad -> compiled sampling per task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdm_tpu.configs import BackboneConfig, ModelConfig, SamplingConfig
from layoutdm_tpu.models.layoutdm import LayoutDM
from layoutdm_tpu.tasks import get_cond, to_sampler_cond
from tests.test_tokenizer import make_tokenizer, random_layout

T = 8


def tiny_model(q_type="constrained"):
    tok = make_tokenizer(
        shared_vocab="x-y-w-h", num_categories=4, max_elements=4
    )
    # d_model chosen so the 29/32 shrink stays divisible by nhead (128->116)
    backbone = BackboneConfig(
        d_model=128,
        nhead=4,
        dim_feedforward=128,
        num_layers=2,
        dropout=0.0,
        timestep_type="adalayernorm",
        diffusion_step=T,
    )
    cfg = ModelConfig(q_type=q_type, num_timesteps=T)
    return LayoutDM(backbone, tok, cfg)


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_param_count_positive(model_and_params):
    model, params = model_and_params
    n = sum(x.size for x in jax.tree.leaves(params))
    assert n > 10_000


@pytest.mark.parametrize("q_type", ["vanilla", "constrained"])
def test_loss_and_grads_finite(rng, q_type):
    model = tiny_model(q_type)
    params = model.init(jax.random.PRNGKey(0))
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    seq = model.preprocess(layout)["seq"]
    lt = model.init_state()

    def total_loss(p):
        losses, new_state = model.loss(p, jax.random.PRNGKey(1), seq, lt)
        return sum(losses.values()), (losses, new_state)

    (val, (losses, new_state)), grads = jax.value_and_grad(
        total_loss, has_aux=True
    )(params)
    assert np.isfinite(float(val))
    assert "kl_loss" in losses and "aux_loss" in losses
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # importance state advanced
    assert float(new_state.count.sum()) == 4.0


def test_unconditional_sampling(model_and_params):
    model, params = model_and_params
    ids = model.sample_ids(params, jax.random.PRNGKey(2), batch_size=3)
    assert ids.shape == (3, model.seq_len)
    assert (np.asarray(ids) < model.num_classes).all()
    layouts = model.tokenizer.decode(ids)
    assert layouts["bbox"].shape == (3, 4, 4)


def test_conditional_c_keeps_categories(rng, model_and_params):
    model, params = model_and_params
    tok = model.tokenizer
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(0), layout, tok, "c")
    sc = to_sampler_cond(cond, tok, SamplingConfig())
    ids = model.sample_ids(
        params, jax.random.PRNGKey(3), batch_size=2, cond=sc
    )
    ids = np.asarray(ids).reshape(2, 4, 5)
    # category slots of valid elements must equal the GT labels
    for b in range(2):
        for s in range(4):
            if layout["mask"][b, s]:
                assert ids[b, s, 0] == layout["label"][b, s]
            else:
                assert ids[b, s, 0] == tok.name_to_id("pad")
    # PAD must never appear in coordinate slots of valid elements
    pad_id = tok.name_to_id("pad")
    for b in range(2):
        for s in range(4):
            if layout["mask"][b, s]:
                assert (ids[b, s, 1:] != pad_id).all()


def test_refinement_cond_shapes(rng, model_and_params):
    model, params = model_and_params
    tok = model.tokenizer
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(1), layout, tok, "refinement")
    sc = to_sampler_cond(cond, tok, SamplingConfig(refine_lambda=3.0))
    assert sc.weak_logits.shape == (2, model.seq_len, model.num_classes)
    assert bool(sc.weak_mask.any())
    ids = model.sample_ids(
        params, jax.random.PRNGKey(4), batch_size=2, cond=sc
    )
    ids = np.asarray(ids).reshape(2, 4, 5)
    for b in range(2):
        for s in range(4):
            if layout["mask"][b, s]:
                assert ids[b, s, 0] == layout["label"][b, s]


def test_partial_keeps_subset(rng, model_and_params):
    model, params = model_and_params
    tok = model.tokenizer
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    layout["mask"][:, :] = True
    cond = get_cond(jax.random.PRNGKey(2), layout, tok, "partial")
    kept = np.asarray(cond["mask"])
    assert kept.any() and not kept.all()
    sc = to_sampler_cond(cond, tok, SamplingConfig())
    ids = model.sample_ids(
        params, jax.random.PRNGKey(5), batch_size=2, cond=sc
    )
    gt = np.asarray(cond["seq"])
    np.testing.assert_array_equal(np.asarray(ids)[kept], gt[kept])


def test_sampling_is_deterministic_given_key(model_and_params):
    model, params = model_and_params
    a = model.sample_ids(params, jax.random.PRNGKey(7), batch_size=2)
    b = model.sample_ids(params, jax.random.PRNGKey(7), batch_size=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_row_keys_batch_composition_independent(model_and_params):
    """Per-row keyed sampling: a row's output depends only on ITS key, not
    on which rows share the batch — the property request coalescing in the
    server relies on (`serve_cli`)."""
    model, params = model_and_params
    keys = jnp.stack([jax.random.PRNGKey(s) for s in (11, 22, 33, 44)])

    full = model.sample_ids(params, keys, batch_size=4)
    # same keys, permuted rows
    perm = jnp.asarray([2, 0, 3, 1])
    shuffled = model.sample_ids(params, keys[perm], batch_size=4)
    np.testing.assert_array_equal(np.asarray(full)[perm], np.asarray(shuffled))
    # a row alone... per-row batches of 2 with different partners
    pair = model.sample_ids(params, keys[:2], batch_size=2)
    np.testing.assert_array_equal(np.asarray(full)[:2], np.asarray(pair))


def test_intermediate_results(model_and_params):
    model, params = model_and_params
    ids, inter = model.sample_ids(
        params, jax.random.PRNGKey(8), batch_size=2, get_intermediates=True
    )
    assert inter.shape == (T, 2, model.seq_len)
    np.testing.assert_array_equal(np.asarray(inter[-1]), np.asarray(ids))


def test_num_timesteps_eval_skip_steps(model_and_params):
    model, params = model_and_params
    ids = model.sample_ids(
        params,
        jax.random.PRNGKey(9),
        batch_size=2,
        sampling=SamplingConfig(num_timesteps=T // 2),
    )
    assert ids.shape == (2, model.seq_len)


def test_seq_type_set_shuffles_pad(rng):
    from layoutdm_tpu.configs import ModelConfig

    model = tiny_model()
    model_set = LayoutDM(
        BackboneConfig(
            d_model=128, nhead=4, dim_feedforward=128, num_layers=1,
            dropout=0.0, timestep_type="adalayernorm", diffusion_step=T,
        ),
        model.tokenizer,
        ModelConfig(q_type="constrained", num_timesteps=T, seq_type="set"),
    )
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    layout["mask"][:, :2] = True
    layout["mask"][:, 2:] = False
    tokens = model_set.preprocess(layout, jax.random.PRNGKey(0))
    seq = np.asarray(tokens["seq"]).reshape(4, 4, 5)
    pad_id = model.tokenizer.name_to_id("pad")
    # PAD elements still exist but are no longer guaranteed to be suffix
    assert (seq == pad_id).sum() == 4 * 2 * 5
    poset = np.asarray(model.preprocess(layout)["seq"]).reshape(4, 4, 5)
    assert (poset[:, 2:] == pad_id).all()


def test_vanilla_q_sampling(rng):
    """The vqdiffusion ablation (single shared transition matrix) samples
    through the same compiled chain."""
    model = tiny_model(q_type="vanilla")
    params = model.init(jax.random.PRNGKey(0))
    ids = model.sample_ids(params, jax.random.PRNGKey(1), batch_size=2)
    assert ids.shape == (2, model.seq_len)
    # conditional c preserves categories through the vanilla posterior too
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(2), layout, model.tokenizer, "c")
    sc = to_sampler_cond(cond, model.tokenizer, SamplingConfig())
    out = np.asarray(
        model.sample_ids(params, jax.random.PRNGKey(3), 2, cond=sc)
    ).reshape(2, 4, 5)
    for b in range(2):
        for s in range(4):
            if layout["mask"][b, s]:
                assert out[b, s, 0] == layout["label"][b, s]


def test_embed_tokens_exact(rng):
    """The one-hot-matmul token embedding is bitwise equal to the gather.

    `embed_tokens` replaces `nn.Embed`'s gather with a HIGHEST-precision
    one-hot dot (TPU gathers bypass the MXU; measured 2.5 -> 0.79 ms/step
    at bench shapes) — the results must be identical, not just close."""
    import flax.linen as nn

    from layoutdm_tpu.models.nn import embed_tokens

    class Both(nn.Module):
        @nn.compact
        def __call__(self, seq):
            emb = nn.Embed(155, 464, name="cat_emb")
            return emb(seq), embed_tokens(emb, seq)

    seq = jax.random.randint(jax.random.PRNGKey(7), (3, 125), 0, 155)
    g, o = Both().apply(Both().init(jax.random.PRNGKey(0), seq), seq)
    assert g.dtype == o.dtype == jnp.float32
    assert bool(jnp.all(g == o))


def test_embed_tokens_bf16_exact():
    """The bf16-dtype embed path (one-hot dot in the COMPUTE dtype) is
    exactly the gather of the bf16-rounded table: one-hot selection has no
    accumulation error, so each output row must equal
    ``table.astype(bf16)[id]`` bitwise.  This is the train/serve default
    for bf16 models (the f32-HIGHEST dot lowers to a ~10x-slow conv
    emitter in the train backward — docs/DESIGN.md §6 embed-dtype entry);
    LAYOUTDM_TPU_EMBED_F32=1 restores the f32 route."""
    import flax.linen as nn

    from layoutdm_tpu.models.nn import embed_tokens

    class Both(nn.Module):
        @nn.compact
        def __call__(self, seq):
            emb = nn.Embed(155, 464, name="cat_emb")
            table = emb(jnp.arange(155))
            return (
                jnp.take(table.astype(jnp.bfloat16), seq, axis=0),
                embed_tokens(emb, seq, dtype=jnp.bfloat16),
            )

    seq = jax.random.randint(jax.random.PRNGKey(7), (3, 125), 0, 155)
    g, o = Both().apply(Both().init(jax.random.PRNGKey(0), seq), seq)
    assert g.dtype == o.dtype == jnp.bfloat16
    assert bool(jnp.all(g == o))


def test_vocab_padded_head_exact(monkeypatch):
    """LAYOUTDM_TPU_VOCAB_PAD=1: the lane-padded head (kernel zero-padded
    to a 128-lane multiple, -1e9 bias on MASK+pad lanes, slice after the
    log_softmax) must reproduce the plain head's predict_start outputs and
    sampled trajectories on the SAME params — the -1e9 lanes underflow to
    exactly zero probability, so the normalizer is identical."""
    from layoutdm_tpu.models.nn import use_vocab_pad, vocab_pad_target

    model_plain = tiny_model()
    params = model_plain.init(jax.random.PRNGKey(0))
    V = model_plain.num_classes
    assert V % 128 != 0 and vocab_pad_target(V) % 128 == 0

    monkeypatch.setenv("LAYOUTDM_TPU_VOCAB_PAD", "1")
    assert use_vocab_pad(V)
    model_pad = tiny_model()
    # identical param tree (the padded head declares the same head/kernel)
    assert jax.tree_util.tree_structure(
        model_pad.init(jax.random.PRNGKey(0))
    ) == jax.tree_util.tree_structure(params)

    ids = jnp.zeros((2, model_plain.seq_len), jnp.int32)
    t = jnp.zeros((2,), jnp.int32)
    lp_plain = model_plain._predict_start(params, ids, t)
    lp_pad = model_pad._predict_start(params, ids, t)
    assert lp_pad.shape == lp_plain.shape  # (B, S, V) both
    np.testing.assert_allclose(
        np.asarray(lp_pad), np.asarray(lp_plain), rtol=1e-6, atol=1e-6
    )

    out_plain = model_plain.sample_ids(params, jax.random.PRNGKey(3), 2)
    out_pad = model_pad.sample_ids(params, jax.random.PRNGKey(3), 2)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_pad))

    monkeypatch.setenv("LAYOUTDM_TPU_VOCAB_PAD", "0")
    assert not use_vocab_pad(V)
