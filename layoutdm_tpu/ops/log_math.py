"""Log-space categorical-diffusion math.

TPU-first re-expression of the reference's numerics
(`models/categorical_diffusion/util.py:7-70`).  All functions are pure jnp,
shape-polymorphic, and safe under jit; vocab is the LAST axis everywhere
(the reference keeps vocab at axis 1 — last-axis is the natural XLA layout
and lets softmax/logsumexp fuse).

The schedule builder runs on host in float64 numpy (it is tiny and executed
once), matching `util.py:47-70` bit-for-bit before the cast to float32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-30
LOG_EPS = math.log(1e-30)  # ≈ -69.0776; the reference's "log zero"


def log_add_exp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable log(exp(a) + exp(b)).

    Unlike the naive form (`util.py:19-21`), guards the case where both
    operands are -inf (schedule tables contain log(0) at the wrap-around
    index) so no NaN is produced under jit.
    """
    m = jnp.maximum(a, b)
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    out = safe_m + jnp.log(jnp.exp(a - safe_m) + jnp.exp(b - safe_m))
    return jnp.where(jnp.isfinite(m), out, m)


def log_1_min_a(a: np.ndarray) -> np.ndarray:
    """log(1 - exp(a)) with the reference's epsilon (`util.py:15-16`)."""
    return np.log(1 - np.exp(a) + 1e-40)


def log_onehot(ids: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Index -> log one-hot over the last axis (`util.py:34-40`).

    Returns 0.0 at the hot lane and LOG_EPS elsewhere (the reference clamps
    log(0) to log(1e-30)).
    """
    hot = jnp.arange(num_classes, dtype=ids.dtype) == ids[..., None]
    return jnp.where(hot, 0.0, LOG_EPS).astype(jnp.float32)


def log_onehot_to_index(log_x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(log_x, axis=-1)


def alpha_schedule(
    num_timesteps: int,
    N: int = 100,
    att_1: float = 0.99999,
    att_T: float = 0.000009,
    ctt_1: float = 0.000009,
    ctt_T: float = 0.99999,
):
    """Mask-and-replace schedule (parity: `util.py:47-70`).

    Returns float64 numpy arrays ``(at, bt, ct, att, btt, ctt)``:
    per-step keep / uniform-replace / to-MASK probabilities (length T) and
    their cumulative products (length T+1, where index T encodes "t = -1",
    i.e. the identity transition used by q_pred(t-1) at t=0).
    """
    assert att_1 > 0.0 and att_T > 0.0 and ctt_1 > 0.0 and ctt_T > 0.0
    assert att_1 + ctt_1 <= 1.0 and att_T + ctt_T <= 1.0

    T = num_timesteps
    att = np.arange(0, T, dtype=np.float64) / (T - 1) * (att_T - att_1) + att_1
    att = np.concatenate(([1.0], att))
    at = att[1:] / att[:-1]
    ctt = np.arange(0, T, dtype=np.float64) / (T - 1) * (ctt_T - ctt_1) + ctt_1
    ctt = np.concatenate(([0.0], ctt))
    one_minus_ctt = 1 - ctt
    one_minus_ct = one_minus_ctt[1:] / one_minus_ctt[:-1]
    ct = 1 - one_minus_ct
    bt = (1 - at - ct) / N
    att = np.concatenate((att[1:], [1.0]))
    ctt = np.concatenate((ctt[1:], [0.0]))
    btt = (1 - att - ctt) / N
    return at, bt, ct, att, btt, ctt


class ScheduleTables:
    """Float32 log-space schedule tables for one transition matrix.

    Stacks everything the reverse process needs, indexed by t:
      log_at/bt/ct, log_1_min_ct           — length T
      log_cumprod_at/bt/ct, log_1_min_cumprod_ct — length T+1 (index T = "t=-1")
    Mirrors the registered buffers at `vanilla.py:64-72` /
    `constrained.py:80-90`, computed in f64 then cast.
    """

    def __init__(self, num_timesteps: int, N: int, **schedule_kwargs):
        at, bt, ct, att, btt, ctt = alpha_schedule(
            num_timesteps, N=N, **schedule_kwargs
        )
        with np.errstate(divide="ignore"):
            log_at, log_bt, log_ct = np.log(at), np.log(bt), np.log(ct)
            log_catt, log_cbtt, log_cctt = np.log(att), np.log(btt), np.log(ctt)
        log_1_min_ct = log_1_min_a(log_ct)
        log_1_min_cctt = log_1_min_a(log_cctt)

        # normalization contract (`vanilla.py:58-62`)
        assert np.abs(np.logaddexp(log_ct, log_1_min_ct)).sum() < 1e-5
        assert np.abs(np.logaddexp(log_cctt, log_1_min_cctt)).sum() < 1e-5

        f32 = lambda x: x.astype(np.float32)
        self.num_timesteps = num_timesteps
        self.N = N
        self.log_at = f32(log_at)
        self.log_bt = f32(log_bt)
        self.log_ct = f32(log_ct)
        self.log_1_min_ct = f32(log_1_min_ct)
        self.log_cumprod_at = f32(log_catt)
        self.log_cumprod_bt = f32(log_cbtt)
        self.log_cumprod_ct = f32(log_cctt)
        self.log_1_min_cumprod_ct = f32(log_1_min_cctt)

    def stacked(self) -> dict:
        """Dict of arrays, suitable for stacking across attributes."""
        return {
            "log_at": self.log_at,
            "log_bt": self.log_bt,
            "log_ct": self.log_ct,
            "log_1_min_ct": self.log_1_min_ct,
            "log_cumprod_at": self.log_cumprod_at,
            "log_cumprod_bt": self.log_cumprod_bt,
            "log_cumprod_ct": self.log_cumprod_ct,
            "log_1_min_cumprod_ct": self.log_1_min_cumprod_ct,
        }


def posterior_tail(
    q_pred,  # bound q_pred of the owning Q (full or partial space)
    log_x_start: jnp.ndarray,
    log_qt: jnp.ndarray,
    log_qt1: jnp.ndarray,
    t: jnp.ndarray,
    valid=None,
) -> jnp.ndarray:
    """The shared tail of VQDiffusion Eq.5 (`vanilla.py:142-151`):
    q = x0/qt normalized, then q_pred(q, t-1) + qt1 + lse, clipped.

    One implementation serves all four posterior variants (vanilla /
    constrained x dense / ids-specialized) so numerics fixes cannot
    silently diverge between copies; ``valid`` pins dead partial-vocab
    lanes to LOG_EPS (constrained only).
    """
    q = log_x_start[..., :-1] - log_qt
    if valid is not None:
        q = jnp.where(valid, q, LOG_EPS)
    q = jnp.concatenate([q, jnp.full_like(q[..., -1:], LOG_EPS)], axis=-1)
    lse = jax.scipy.special.logsumexp(q, axis=-1, keepdims=True)
    q = q - lse
    return jnp.clip(q_pred(q, t - 1) + log_qt1 + lse, -70.0, 0.0)
