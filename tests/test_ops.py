"""Ops + config + scheduler unit tests (golden values and properties)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdm_tpu.configs import (
    SamplingConfig,
    apply_overrides,
    build_train_config,
    to_dict,
    train_config_from_dict,
)
from layoutdm_tpu.ops.log_math import LOG_EPS, alpha_schedule, log_onehot
from layoutdm_tpu.ops.masking import batch_topk_mask, sample_mask, sequence_mask
from layoutdm_tpu.ops.samplers import sample_tokens, top_k_filter, top_p_filter
from layoutdm_tpu.train.schedulers import (
    CosineAnnealingLRWithWarmup,
    D3PMScheduler,
    ReduceLROnPlateauWithWarmup,
)


def test_alpha_schedule_invariants():
    at, bt, ct, att, btt, ctt = alpha_schedule(100, N=154)
    # per-step rows are stochastic: at + N*bt + ct = 1
    np.testing.assert_allclose(at + 154 * bt + ct, 1.0, atol=1e-12)
    np.testing.assert_allclose(att + 154 * btt + ctt, 1.0, atol=1e-12)
    # end points (`util.py:47-65` construction)
    assert np.isclose(att[0], 0.99999)
    assert np.isclose(att[99], 9e-6)
    assert np.isclose(ctt[99], 0.99999)
    assert att[100] == 1.0 and ctt[100] == 0.0  # the "t = -1" identity row
    # monotone corruption
    assert (np.diff(att[:100]) < 0).all()
    assert (np.diff(ctt[:100]) > 0).all()


def test_alpha_schedule_golden():
    """Frozen values to pin regressions (computed from the exact f64 build)."""
    at, bt, ct, att, btt, ctt = alpha_schedule(100, N=154)
    np.testing.assert_allclose(at[0], 0.99999, rtol=1e-10)
    np.testing.assert_allclose(att[49], 0.5050499090909091, rtol=1e-12)
    np.testing.assert_allclose(ctt[49], 0.4949490909090909, rtol=1e-12)
    np.testing.assert_allclose(at[49], 0.9803924994238224, rtol=1e-12)
    np.testing.assert_allclose(bt[49], 2.4715326826976564e-10, rtol=1e-9)


def test_log_onehot():
    x = log_onehot(jnp.asarray([[1, 3]]), 5)
    assert x.shape == (1, 2, 5)
    assert float(x[0, 0, 1]) == 0.0
    assert np.isclose(float(x[0, 0, 0]), LOG_EPS)


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert np.isinf(out[0, 0]) and np.isinf(out[0, 3])
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0


def test_top_p_keeps_most_likely():
    # extremely peaked: p=0.5 keeps exactly the argmax
    logits = jnp.asarray([[0.0, 10.0, 0.0, 0.0]])
    out = np.asarray(top_p_filter(logits, 0.5))
    assert out[0, 1] == 10.0
    assert np.isinf(out[0, 0]) and np.isinf(out[0, 2])
    # p=1.0 keeps everything
    out = np.asarray(top_p_filter(logits, 1.0))
    assert np.isfinite(out).all()


def test_top_p_mass_property(rng):
    """Reference semantics (`sampling.py:94-109`): drop every lane whose
    INCLUSIVE cumulative probability exceeds p, except the most likely one —
    so kept lanes are exactly {top-1} ∪ {lanes with cumsum <= p}."""
    logits = jnp.asarray(rng.randn(8, 32), jnp.float32)
    kept = np.isfinite(np.asarray(top_p_filter(logits, 0.9)))
    probs = np.asarray(jax.nn.softmax(logits, -1))
    for b in range(8):
        order = np.argsort(-probs[b], kind="stable")
        cum = np.cumsum(probs[b][order])
        want = np.zeros(32, bool)
        want[order[0]] = True
        want[order[cum <= 0.9 + 1e-7]] = True
        np.testing.assert_array_equal(kept[b], want)


def test_sample_tokens_distribution(rng):
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]]))
    logits = jnp.repeat(logits, 4000, axis=0)
    ids = np.asarray(sample_tokens(key, logits, "random"))
    freq = np.bincount(ids, minlength=3) / len(ids)
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.03)
    det = np.asarray(sample_tokens(key, logits, "deterministic"))
    assert (det == 0).all()


def test_batch_topk_mask_counts(rng):
    scores = jnp.asarray(rng.rand(4, 10), jnp.float32)
    topk = jnp.asarray([0, 1, 5, 10])
    mask, _ = batch_topk_mask(scores, topk)
    np.testing.assert_array_equal(np.asarray(mask).sum(1), [0, 1, 5, 10])
    # topk < S uses the reference's exclusive k-th-score threshold
    # (`helpers/util.py:25-47` keeps scores > kth); topk == S selects all
    # (where the reference's gather would be out of bounds)


def test_sequence_and_sample_mask(rng):
    m = sequence_mask(jnp.asarray([0, 2, 4]), 4)
    np.testing.assert_array_equal(
        np.asarray(m).sum(1), [0, 2, 4]
    )
    sm = sample_mask(jax.random.PRNGKey(0), m, jnp.asarray(0.5))
    assert (np.asarray(sm) & ~np.asarray(m)).sum() == 0


def test_config_roundtrip_and_overrides():
    cfg = build_train_config("layoutdm", "rico25", ["optimizer.lr=1e-3"])
    assert cfg.model.q_type == "constrained"
    assert cfg.data.bbox_quantization == "kmeans"
    assert cfg.optimizer.lr == 1e-3
    cfg2 = train_config_from_dict(to_dict(cfg))
    assert to_dict(cfg2) == to_dict(cfg)
    with pytest.raises(AttributeError):
        apply_overrides(cfg, ["nonexistent.key=1"])


def test_schedulers():
    s = ReduceLROnPlateauWithWarmup(0.5, warmup_epochs=2, warmup_lr=1.0,
                                    factor=0.5, patience=1)
    assert s.step(0) == 0.75  # additive warmup ramp toward warmup_lr
    assert s.step(1) == 1.0
    assert s.step(2, 1.0) == 1.0
    assert s.step(3, 1.0) == 1.0  # bad 1
    assert s.step(4, 1.0) == 0.5  # bad 2 > patience -> decay
    c = CosineAnnealingLRWithWarmup(1.0, total_epochs=10)
    assert np.isclose(c.step(0), 1.0)
    assert c.step(10) < 1e-6
    d = D3PMScheduler(1.0)
    assert d.step(5) == 1.0  # 1-based post-epoch counter: e=6 <= 10
    assert np.isclose(d.step(14), 1 / np.sqrt(5))  # e=15 -> 1/sqrt(15-10)


def test_seqlen_state(rng):
    from layoutdm_tpu.models.base import SeqLenState

    s = SeqLenState.init(8)
    mask = jnp.asarray(np.arange(8)[None, :] < 3)
    for _ in range(5):
        s = s.update(mask, weight=0.5)
    # mass concentrates on n=3 (index 2)
    assert float(s.probs[2]) > 0.9
    draws = np.asarray(s.sample(jax.random.PRNGKey(0), 200))
    assert (draws >= 1).all() and (draws <= 8).all()
    assert (draws == 3).mean() > 0.8


def test_timestep_ladder():
    from layoutdm_tpu.models.diffusion.sampler import timestep_ladder

    # T_eval == T: plain countdown, posterior at the same t
    mt, pt = timestep_ladder(10)
    np.testing.assert_array_equal(mt, np.arange(9, -1, -1))
    np.testing.assert_array_equal(pt, mt)
    # T_eval < T: skip-steps shift the posterior time (`base.py:227-240`)
    mt, pt = timestep_ladder(100, 50)
    assert mt[0] == 98 and mt[-1] == 0
    assert pt[0] == 97  # skip=1 applied while noise_t > skip
    assert pt[-1] == 0
    # time_difference lowers the noise time (`base.py:218-225`)
    mt, pt = timestep_ladder(100, None, time_difference=0.1)
    assert mt[0] == 99 and pt[0] == 89
    assert pt[-1] == 0


def test_batch_topk_mask_select_all(rng):
    """topk >= #valid selects ALL valid entries (the reference's gather
    would be out of bounds there; round-2 review finding)."""
    import jax.numpy as jnp

    from layoutdm_tpu.ops.masking import batch_topk_mask, sample_mask

    scores = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    out, _ = batch_topk_mask(scores, jnp.asarray([6, 3]))
    assert int(out[0].sum()) == 6  # all selected
    assert int(out[1].sum()) == 3

    # with a validity mask: topk == n_valid selects exactly the valid set
    mask = jnp.asarray([[True] * 4 + [False] * 2, [True] * 6])
    out, _ = batch_topk_mask(scores, jnp.asarray([4, 6]), mask=mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mask))

    # ratio=1.0 keeps every element
    import jax

    full = sample_mask(jax.random.PRNGKey(0), jnp.ones((3, 5), bool), 1.0)
    assert bool(full.all())


def test_percentile_fills_empty_bins():
    """Fewer unique values than clusters: every center is a real value (no
    -1 sentinels that would sort to the lowest bins)."""
    from layoutdm_tpu.tokenizer.clustering import percentile_1d

    x = np.repeat(np.linspace(0.2, 0.8, 5), 10)
    centers = percentile_1d(x, n_clusters=32)
    assert centers.shape == (32,)
    assert (centers >= 0.0).all() and (centers <= 1.0).all()
    assert len(np.unique(centers)) <= 5
