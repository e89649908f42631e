"""Baseline model families: MaskGIT, BLT, RUITE, ElemWiseAutoreg, BART."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdm_tpu.configs import BackboneConfig, ModelConfig, SamplingConfig
from layoutdm_tpu.models.autoreg import ElemWiseAutoreg
from layoutdm_tpu.models.bart import BART
from layoutdm_tpu.models.blt import BLT
from layoutdm_tpu.models.maskgit import MaskGIT
from layoutdm_tpu.models.ruite import RUITE
from layoutdm_tpu.tasks import get_cond, to_sampler_cond
from tests.test_tokenizer import make_tokenizer, random_layout

BB = BackboneConfig(
    d_model=64, nhead=4, dim_feedforward=64, num_layers=1, dropout=0.0
)


def tok(special=("pad", "mask")):
    return make_tokenizer(
        shared_vocab="x-y-w-h", num_categories=4, max_elements=4,
        special=special,
    )


def check_loss_and_grads(model, tokens):
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()

    def f(p):
        losses, new_state = model.loss(p, jax.random.PRNGKey(1), tokens, state)
        return sum(losses.values()), new_state

    (val, new_state), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(val))
    g = sum(float(jnp.sum(x**2)) for x in jax.tree.leaves(grads))
    assert np.isfinite(g) and g > 0
    return params, new_state


def test_maskgit(rng):
    model = MaskGIT(BB, tok())
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    tokens = model.preprocess(layout)
    params, state = check_loss_and_grads(model, tokens)
    # seq-length EMA moved
    assert not np.allclose(
        np.asarray(state.probs), np.asarray(model.init_state().probs)
    )
    # unconditional sampling with PAD/legality constraints
    ids = model.sample_ids(
        params, jax.random.PRNGKey(2), 3,
        sampling=SamplingConfig(num_timesteps=4), state=state,
    )
    assert ids.shape == (3, model.seq_len)
    assert (np.asarray(ids) != model.mask_id).all()
    # conditional c: categories preserved
    cond = get_cond(jax.random.PRNGKey(3), layout, model.tokenizer, "c")
    sc = to_sampler_cond(cond, model.tokenizer, SamplingConfig())
    ids = model.sample_ids(
        params, jax.random.PRNGKey(4), 4, cond=sc,
        sampling=SamplingConfig(num_timesteps=4),
    )
    ids = np.asarray(ids).reshape(4, 4, 5)
    for b in range(4):
        for s in range(4):
            if layout["mask"][b, s]:
                assert ids[b, s, 0] == layout["label"][b, s]


def test_blt(rng):
    model = BLT(BB, tok())
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    tokens = model.preprocess(layout)
    params, state = check_loss_and_grads(model, tokens)
    ids = model.sample_ids(
        params, jax.random.PRNGKey(2), 3,
        sampling=SamplingConfig(num_timesteps=3), state=state,
    )
    assert ids.shape == (3, model.seq_len)
    assert (np.asarray(ids) != model.mask_id).all()


def test_ruite(rng):
    model = RUITE(BB, tok())
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    tokens = model.preprocess(layout, jax.random.PRNGKey(9))
    params, _ = check_loss_and_grads(model, tokens)
    cond = get_cond(jax.random.PRNGKey(3), layout, model.tokenizer,
                    "refinement")
    sc = to_sampler_cond(cond, model.tokenizer, SamplingConfig())
    ids = model.sample_ids(params, jax.random.PRNGKey(4), 4, cond=sc)
    assert ids.shape == (4, model.seq_len)
    # dummy unconditional output decodes
    out = model.sample(params, jax.random.PRNGKey(5), 2)
    assert out["bbox"].shape == (2, 4, 4)


def test_autoreg(rng):
    t = tok(special=("pad", "bos", "eos", "mask"))
    model = ElemWiseAutoreg(BB, t)
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    tokens = model.preprocess(layout)
    assert tokens["seq"].shape[1] == model.gen_len
    params, _ = check_loss_and_grads(model, tokens)
    ids = model.sample_ids(params, jax.random.PRNGKey(2), 2)
    assert ids.shape == (2, model.gen_len)
    layouts = model.sample(params, jax.random.PRNGKey(3), 2)
    assert layouts["bbox"].shape == (2, 4, 4)
    # conditional c
    cond = get_cond(jax.random.PRNGKey(4), layout, t, "c")
    sc = to_sampler_cond(cond, t, SamplingConfig())
    ids = np.asarray(
        model.sample_ids(params, jax.random.PRNGKey(5), 4, cond=sc)
    ).reshape(4, 4, 5)
    for b in range(4):
        for s in range(4):
            if layout["mask"][b, s]:
                assert ids[b, s, 0] == layout["label"][b, s]


def test_bart(rng):
    from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
    from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

    bb = BboxTokenizer(
        num_bins=32, var_order=("w", "h", "x", "y"), shared_vocab="x-y-w-h"
    )
    t = LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=4, max_elements=4,
        special_tokens=("pad", "bos", "eos", "mask"), pad_until_max=True,
    )
    bb_bart = BackboneConfig(
        d_model=128, nhead=4, dim_feedforward=64, num_layers=1, dropout=0.0
    )  # 21/32 shrink keeps d_model divisible by nhead (128 -> 84)
    model = BART(bb_bart, t)
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    tokens = model.preprocess(layout, jax.random.PRNGKey(0))
    params, _ = check_loss_and_grads(model, tokens)
    ids = model.sample_ids(params, jax.random.PRNGKey(2), 2)
    assert ids.shape == (2, model.gen_len)
    layouts = model.sample(params, jax.random.PRNGKey(3), 2)
    assert layouts["bbox"].shape == (2, 4, 4)
    # conditional c preserves categories through forcing
    cond = get_cond(jax.random.PRNGKey(4), layout, t, "c")
    sc = to_sampler_cond(cond, t, SamplingConfig())
    ids = np.asarray(
        model.sample_ids(params, jax.random.PRNGKey(5), 4, cond=sc)
    ).reshape(4, 4, 5)
    for b in range(4):
        for s in range(4):
            if layout["mask"][b, s]:
                assert ids[b, s, 0] == layout["label"][b, s]


def test_bart_alphabetical(rng):
    from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
    from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

    bb = BboxTokenizer(
        num_bins=32, var_order=("w", "h", "x", "y"), shared_vocab="x-y-w-h"
    )
    t = LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=4, max_elements=4,
        special_tokens=("pad", "bos", "eos", "mask"), pad_until_max=True,
    )
    bb_bart = BackboneConfig(
        d_model=128, nhead=4, dim_feedforward=64, num_layers=1, dropout=0.0
    )
    model = BART(bb_bart, t, sort_by="category_alphabetical")
    params = model.init(jax.random.PRNGKey(0))
    ids = np.asarray(
        model.sample_ids(params, jax.random.PRNGKey(1), 2)
    ).reshape(2, 4, 5)
    # generated categories must be non-decreasing until specials appear
    for b in range(2):
        cats = ids[b, :, 0]
        real = cats < t.N_category
        run = cats[real]
        assert (np.diff(run) >= 0).all()


def test_autoreg_kv_cache_matches_full_recompute(rng):
    t = tok(special=("pad", "bos", "eos", "mask"))
    model = ElemWiseAutoreg(BB, t)
    params = model.init(jax.random.PRNGKey(0))
    cfg = SamplingConfig(name="deterministic")
    fast = model.sample_ids(
        params, jax.random.PRNGKey(1), 3, sampling=cfg, use_cache=True
    )
    slow = model.sample_ids(
        params, jax.random.PRNGKey(1), 3, sampling=cfg, use_cache=False
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
    # and with a condition
    layout = random_layout(rng, B=3, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(2), layout, t, "c")
    sc = to_sampler_cond(cond, t, cfg)
    fast = model.sample_ids(params, jax.random.PRNGKey(3), 3, cond=sc,
                            sampling=cfg, use_cache=True)
    slow = model.sample_ids(params, jax.random.PRNGKey(3), 3, cond=sc,
                            sampling=cfg, use_cache=False)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_bart_kv_cache_matches_full_recompute(rng):
    from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
    from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

    bb = BboxTokenizer(
        num_bins=32, var_order=("w", "h", "x", "y"), shared_vocab="x-y-w-h"
    )
    t = LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=4, max_elements=4,
        special_tokens=("pad", "bos", "eos", "mask"), pad_until_max=True,
    )
    bb_bart = BackboneConfig(
        d_model=128, nhead=4, dim_feedforward=64, num_layers=1, dropout=0.0
    )
    cfg = SamplingConfig(name="deterministic")
    for sort_by in (None, "category_alphabetical"):
        model = BART(bb_bart, t, sort_by=sort_by)
        params = model.init(jax.random.PRNGKey(0))
        fast = model.sample_ids(params, jax.random.PRNGKey(1), 2,
                                sampling=cfg, use_cache=True)
        slow = model.sample_ids(params, jax.random.PRNGKey(1), 2,
                                sampling=cfg, use_cache=False)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
    # conditional forcing path
    model = BART(bb_bart, t)
    params = model.init(jax.random.PRNGKey(0))
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(2), layout, t, "c")
    sc = to_sampler_cond(cond, t, cfg)
    fast = model.sample_ids(params, jax.random.PRNGKey(3), 2, cond=sc,
                            sampling=cfg, use_cache=True)
    slow = model.sample_ids(params, jax.random.PRNGKey(3), 2, cond=sc,
                            sampling=cfg, use_cache=False)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


@pytest.mark.parametrize("schedule", ["log", "exp"])
def test_maskgit_log_exp_schedules_usable(rng, schedule):
    """The log/exp schedules must work through the PRODUCTION call sites
    (loss + decode), which thread total_unknown=seq_len — the reference
    never binds it (`maskgit.py:110`), so there these variants crash."""
    model = MaskGIT(BB, tok(), mask_schedule_name=schedule)
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    tokens = model.preprocess(layout)
    losses, _ = model.loss(
        model.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1), tokens,
        model.init_state(),
    )
    assert np.isfinite(float(losses["nll_loss"]))
    ids = model.sample_ids(
        model.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(2), 2,
        sampling=SamplingConfig(num_timesteps=3), state=model.init_state(),
    )
    assert (np.asarray(ids) != model.mask_id).all()
