"""Brute-force verification of the log-space diffusion algebra.

The q_posterior identity  q(x_{t-1}|x_t, p(x0)) = q1(xt|xt-1) * Σ_i p(x0=i)
Q̄_{t-1}[i,·] / Q̄_t[i,xt]  is checked against explicit transition matrices
built from the same schedule — on both the vanilla (full-vocab) and
constrained (per-attribute) paths.  This is the numerical core the ±2% FID
parity hinges on (SURVEY.md §7 "hard parts" #1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from layoutdm_tpu.ops.log_math import alpha_schedule, log_onehot
from layoutdm_tpu.models.diffusion.vanilla import VanillaQ
from layoutdm_tpu.models.diffusion.constrained import ConstrainedQ
from tests.test_tokenizer import make_tokenizer

T = 10


def transition_matrices(V, T):
    """Explicit Q_t (V,V) and cumulative Q̄_t for the mask-and-replace chain.
    Row = source state, col = destination.  MASK (=V-1) is absorbing."""
    N = V - 1
    at, bt, ct, att, btt, ctt = alpha_schedule(T, N=N)
    Q, Qbar = [], []
    for t in range(T):
        m = np.zeros((V, V))
        m[:N, :N] = bt[t]
        np.fill_diagonal(m[:N, :N], at[t] + bt[t])
        m[:N, N] = ct[t]
        m[N, N] = 1.0
        Q.append(m)
        mb = np.zeros((V, V))
        mb[:N, :N] = btt[t]
        np.fill_diagonal(mb[:N, :N], att[t] + btt[t])
        mb[:N, N] = ctt[t]
        mb[N, N] = 1.0
        Qbar.append(mb)
    return np.array(Q), np.array(Qbar)


def brute_posterior(p_x0, xt, t, Q, Qbar, V):
    """Σ_i p(x0=i) q(x_{t-1}=j | xt, x0=i), i over real states only."""
    Qbar_prev = Qbar[t - 1] if t > 0 else np.eye(V)
    out = np.zeros(V)
    for i in range(V - 1):
        if p_x0[i] < 1e-12:
            continue
        num = Q[t][:, xt] * Qbar_prev[i, :]
        den = Qbar[t][i, xt]
        out += p_x0[i] * num / den
    return out


def test_matrices_are_stochastic():
    Q, Qbar = transition_matrices(7, T)
    np.testing.assert_allclose(Q.sum(-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(Qbar.sum(-1), 1.0, atol=1e-12)
    # cumulative = product of per-step matrices
    acc = np.eye(7)
    for t in range(T):
        acc = acc @ Q[t]
        np.testing.assert_allclose(Qbar[t], acc, atol=1e-9)


def test_vanilla_q_pred_matches_matrix():
    V = 7
    q = VanillaQ(V, T)
    Q, Qbar = transition_matrices(V, T)
    # q_pred rows are only meaningful for real x0 (x0 is never MASK; the
    # MASK column is special-cased inside q_posterior, `vanilla.py:128-140`)
    for t in (0, 3, T - 1):
        for i in range(V - 1):
            lo = log_onehot(jnp.full((1, 1), i), V)
            probs = np.exp(np.asarray(q.q_pred(lo, jnp.array([t]))))[0, 0]
            np.testing.assert_allclose(probs, Qbar[t][i], atol=1e-5)
            p1 = np.exp(
                np.asarray(q.q_pred_one_timestep(lo, jnp.array([t])))
            )[0, 0]
            np.testing.assert_allclose(p1, Q[t][i], atol=1e-5)


@pytest.mark.parametrize("t", [0, 1, 5, T - 1])
def test_vanilla_q_posterior_matches_bruteforce(rng, t):
    V = 7
    q = VanillaQ(V, T)
    Q, Qbar = transition_matrices(V, T)
    S = 4
    # random x0 distribution over real lanes (predict_start never puts mass
    # on MASK), random observed xt including MASK
    p = rng.rand(S, V - 1) + 1e-3
    p = p / p.sum(-1, keepdims=True)
    log_x_start = np.concatenate(
        [np.log(p), np.full((S, 1), -70.0)], axis=-1
    ).astype(np.float32)[None]
    xt = np.array([0, 2, V - 1, V - 1])  # mix of real and MASK
    log_xt = log_onehot(jnp.asarray(xt[None]), V)

    got = np.exp(
        np.asarray(
            q.q_posterior(jnp.asarray(log_x_start), log_xt, jnp.array([t]))
        )
    )[0]
    for s in range(S):
        want = brute_posterior(p[s], xt[s], t, Q, Qbar, V)
        np.testing.assert_allclose(got[s], want, atol=2e-4)


@pytest.mark.parametrize("t", [0, 1, 5, T - 1])
def test_constrained_q_posterior_matches_bruteforce(rng, t):
    tok = make_tokenizer(
        shared_vocab="x-y-w-h", num_categories=3, max_elements=2
    )
    # shrink bins for a tractable brute force
    from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
    from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

    bb = BboxTokenizer(num_bins=4, shared_vocab="x-y-w-h")
    tok = LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=3, max_elements=2,
        special_tokens=("pad", "mask"), pad_until_max=True,
    )
    q = ConstrainedQ(tok, T)
    cv = q.converter
    Vf, A = tok.N_total, 5
    pad_id, mask_id = tok.name_to_id("pad"), tok.name_to_id("mask")

    # per-attribute matrices in partial space
    mats = {}
    for a in range(A):
        Vp_a = int(cv.n_normal[a]) + 1  # true mat_size
        mats[a] = transition_matrices(Vp_a, T)

    B, S = 1, 2  # elements
    # x0 distribution: mass only on attr-legal full ids
    p_full = np.zeros((S, A, Vf))
    for a, key in enumerate(tok.var_names):
        sl = tok.get_slice(key)
        legal = list(range(sl.start, sl.stop)) + [pad_id]
        w = rng.rand(S, len(legal)) + 1e-3
        w /= w.sum(-1, keepdims=True)
        for j, fid in enumerate(legal):
            p_full[:, a, fid] = w[:, j]
    log_x_start = np.log(np.maximum(p_full, 1e-30)).astype(np.float32)[None]

    # observed xt: legal full ids (mix in MASK)
    xt = np.zeros((S, A), dtype=np.int64)
    for a, key in enumerate(tok.var_names):
        sl = tok.get_slice(key)
        choices = list(range(sl.start, sl.stop)) + [pad_id, mask_id]
        xt[:, a] = rng.choice(choices, size=S)
    xt[0, 0] = mask_id
    log_xt = log_onehot(jnp.asarray(xt.reshape(1, -1)), Vf)

    got = np.exp(
        np.asarray(
            q.q_posterior(
                jnp.asarray(log_x_start.reshape(1, S * A, Vf)),
                log_xt,
                jnp.array([t]),
            )
        )
    ).reshape(S, A, Vf)

    for s in range(S):
        for a in range(A):
            Q, Qbar = mats[a]
            Vp_a = int(cv.n_normal[a]) + 1
            # project to partial space
            p_part = np.zeros(Vp_a - 1)
            for lane in range(Vp_a - 1):
                p_part[lane] = p_full[s, a, cv.p2f[a, lane]]
            xt_lane = cv.f2p[a, xt[s, a]]
            xt_lane_t = Vp_a - 1 if xt[s, a] == mask_id else xt_lane
            want_p = brute_posterior(
                np.concatenate([p_part, [0.0]]), xt_lane_t, t, Q, Qbar, Vp_a
            )
            # compare on this attribute's legal full ids
            for lane in range(Vp_a - 1):
                fid = cv.p2f[a, lane]
                np.testing.assert_allclose(
                    got[s, a, fid], want_p[lane], atol=2e-4,
                    err_msg=f"s={s} a={a} lane={lane}",
                )
            np.testing.assert_allclose(
                got[s, a, mask_id], want_p[-1], atol=2e-4
            )


def test_q_pred_terminal_is_all_mask():
    V = 30
    q = VanillaQ(V, 100)
    lo = log_onehot(jnp.zeros((1, 3), jnp.int32), V)
    probs = np.exp(np.asarray(q.q_pred(lo, jnp.array([99]))))
    assert (probs[..., -1] > 0.999).all()


def test_corrupt_roundtrip_shapes(rng):
    import jax

    tok = make_tokenizer(shared_vocab="x-y-w-h", num_categories=5,
                         max_elements=4)
    q = ConstrainedQ(tok, T)
    from tests.test_tokenizer import random_layout

    layout = random_layout(rng, B=2, S=4, n_cat=5)
    seq = tok.encode(layout)["seq"]
    log_xt, xt = q.corrupt(jax.random.PRNGKey(0), seq, jnp.array([0, T - 1]))
    assert log_xt.shape == (2, 20, tok.N_total)
    assert xt.shape == (2, 20)
    # at t=0 nearly everything is kept; at t=T-1 nearly everything is MASK
    keep0 = (np.asarray(xt[0]) == np.asarray(seq[0])).mean()
    maskT = (np.asarray(xt[1]) == tok.name_to_id("mask")).mean()
    assert keep0 > 0.9
    assert maskT > 0.9


def test_corruption_frequencies_match_schedule(rng):
    """Empirical keep/uniform/mask rates of `corrupt` match (att, btt, ctt)
    per attribute at a mid-chain timestep."""
    import jax

    from layoutdm_tpu.ops.log_math import alpha_schedule

    tok = make_tokenizer(shared_vocab="x-y-w-h", num_categories=5,
                         max_elements=4)
    q = ConstrainedQ(tok, T)
    from tests.test_tokenizer import random_layout

    layout = random_layout(rng, B=512, S=4, n_cat=5)
    layout["mask"][:] = True
    seq = tok.encode(layout)["seq"]
    t = jnp.full((512,), T // 2, jnp.int32)
    _, xt = q.corrupt(jax.random.PRNGKey(0), seq, t)
    xt = np.asarray(xt).reshape(512, 4, 5)
    seq_r = np.asarray(seq).reshape(512, 4, 5)
    mask_id = tok.name_to_id("mask")

    for a, N in [(0, 6), (1, 33)]:  # category attr, x attr
        att, btt, ctt = alpha_schedule(T, N=N)[3:6]
        kept = (xt[..., a] == seq_r[..., a]).mean()
        masked = (xt[..., a] == mask_id).mean()
        # kept = att + btt (uniform can land on the original token)
        np.testing.assert_allclose(
            kept, att[T // 2] + btt[T // 2], atol=0.05
        )
        np.testing.assert_allclose(masked, ctt[T // 2], atol=0.05)


# ---------------------------------------------------------------------------
# ids-specialized posterior (sampler fast path) == dense posterior, exactly
# ---------------------------------------------------------------------------


def test_vanilla_q_posterior_ids_equals_dense(rng):
    import jax

    from layoutdm_tpu.ops.log_math import log_onehot

    V, S, B, T = 17, 10, 3, 20
    q = VanillaQ(num_classes=V, num_timesteps=T)
    z = rng.randn(B, S, V).astype(np.float32)
    log_x_start = jax.nn.log_softmax(jnp.asarray(z), axis=-1)
    xt = jnp.asarray(rng.randint(0, V, size=(B, S)), jnp.int32)
    for t0 in (0, 7, T - 1):
        t = jnp.full((B,), t0, jnp.int32)
        dense = q.q_posterior(log_x_start, log_onehot(xt, V), t)
        fast = q.q_posterior_ids(log_x_start, xt, t)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(fast))


def test_constrained_q_posterior_ids_equals_dense(rng):
    import jax

    from layoutdm_tpu.ops.log_math import log_onehot
    from tests.test_tokenizer import make_tokenizer

    tok = make_tokenizer(num_categories=7, max_elements=4)
    T = 20
    q = ConstrainedQ(tok, num_timesteps=T)
    V, S, B = tok.N_total, tok.max_token_length, 3

    # attribute-legal xt (as the corruption process produces)
    pad_id, mask_id = tok.name_to_id("pad"), tok.name_to_id("mask")
    cols = []
    for key in tok.var_names:
        if key == "c":
            choices = list(range(tok.N_category)) + [pad_id, mask_id]
        else:
            sl = tok.get_slice(key)
            choices = list(range(sl.start, sl.stop)) + [pad_id, mask_id]
        cols.append(np.asarray(choices)[
            rng.randint(0, len(choices), size=(B, tok.max_elements))
        ])
    xt = jnp.asarray(
        np.stack(cols, axis=-1).reshape(B, -1), jnp.int32
    )

    z = rng.randn(B, S, V).astype(np.float32)
    log_x_start = jax.nn.log_softmax(jnp.asarray(z), axis=-1)
    for t0 in (0, 7, T - 1):
        t = jnp.full((B,), t0, jnp.int32)
        dense = q.q_posterior(log_x_start, log_onehot(xt, V), t)
        fast = q.q_posterior_ids(log_x_start, xt, t)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(fast))
