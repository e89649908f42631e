"""LR-scheduler trace parity against the REFERENCE'S OWN scheduler.py + torch.

Round-2 VERDICT item 4: the plateau scheduler's torch semantics were claimed
but never trace-compared.  Each test wraps a real torch optimizer with the
genuine `helpers/scheduler.py` (imported via ref_shim; `torch._six` stubbed)
or `torch.optim.lr_scheduler`, steps it through a synthetic val-loss
sequence, and asserts OUR host scheduler produces the identical LR sequence.

Calling convention: both sides step once after each epoch; the compared
sequence is "LR in effect for epoch k+1" (the reference sets
`optimizer.param_groups[0]['lr']`, our `step(k, val)` returns it).
"""

import math

import numpy as np
import pytest
import torch

from layoutdm_tpu.train import schedulers as my_s

from tests import ref_shim

ref_shim.install_stubs()

import trainer.helpers.scheduler as ref_s  # noqa: E402


def _opt(lr):
    p = torch.nn.Parameter(torch.zeros(1))
    return torch.optim.SGD([p], lr=lr)


def _val_losses(rng, n=40):
    """Improve fast, plateau, twitch, improve again — exercises best-tracking,
    rel-threshold, patience, and repeated reductions."""
    seq = []
    v = 10.0
    for i in range(n):
        if i < 8:
            v *= 0.8
        elif i < 20:
            v *= 1.0 + 0.004 * rng.randn()  # sub-threshold noise
        elif i < 24:
            v *= 0.9
        else:
            v *= 1.0 + 0.002 * rng.randn()
        seq.append(abs(v))
    return seq


@pytest.mark.parametrize(
    "warmup,warmup_lr,base_lr,patience,threshold,factor",
    [
        (0, None, 5e-4, 2, 1e-2, 0.5),  # flagship plateau (no warmup)
        (5, 5e-4, 1e-4, 2, 1e-2, 0.5),  # reduce_lr_on_plateau_with_warmup.yaml
        (3, 1e-3, 2e-4, 1, 1e-3, 0.1),
        (0, None, 5e-4, 0, 1e-2, 0.5),  # patience 0: reduce on every bad epoch
    ],
)
def test_plateau_with_warmup_trace_parity(
    rng, warmup, warmup_lr, base_lr, patience, threshold, factor
):
    losses = _val_losses(rng)
    opt = _opt(base_lr)
    ref = ref_s.ReduceLROnPlateauWithWarmup(
        opt, mode="min", factor=factor, patience=patience,
        threshold=threshold, threshold_mode="rel",
        warmup_lr=warmup_lr, warmup=warmup,
    )
    mine = my_s.ReduceLROnPlateauWithWarmup(
        base_lr, warmup_epochs=warmup, warmup_lr=warmup_lr,
        factor=factor, patience=patience, threshold=threshold,
    )
    ref_trace, my_trace = [], []
    for k, v in enumerate(losses):
        ref.step(v)
        ref_trace.append(opt.param_groups[0]["lr"])
        my_trace.append(mine.step(k, v))
    np.testing.assert_allclose(my_trace, ref_trace, rtol=1e-12)
    assert min(ref_trace) < base_lr  # a reduction actually fired


def test_plateau_matches_plain_torch_reduce_lr_on_plateau(rng):
    """The no-warmup config is `torch.optim.lr_scheduler.ReduceLROnPlateau`
    itself (`config/scheduler/reduce_lr_on_plateau.yaml`)."""
    losses = _val_losses(rng)
    opt = _opt(5e-4)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2, threshold=1e-2
    )
    mine = my_s.ReduceLROnPlateauWithWarmup(
        5e-4, factor=0.5, patience=2, threshold=1e-2
    )
    ref_trace, my_trace = [], []
    for k, v in enumerate(losses):
        ref.step(v)
        ref_trace.append(opt.param_groups[0]["lr"])
        my_trace.append(mine.step(k, v))
    np.testing.assert_allclose(my_trace, ref_trace, rtol=1e-12)


@pytest.mark.parametrize(
    "warmup,warmup_lr,base_lr,t_max,min_lr",
    [
        (5, 5e-4, 1e-4, 40, 0.0),
        (3, 1e-3, 1e-4, 25, 1e-5),
        (1, 5e-4, 5e-4, 50, 0.0),
    ],
)
def test_cosine_with_warmup_trace_parity(
    warmup, warmup_lr, base_lr, t_max, min_lr
):
    opt = _opt(base_lr)
    ref = ref_s.CosineAnnealingLRWithWarmup(
        opt, T_max=t_max, min_lr=min_lr, warmup_lr=warmup_lr, warmup=warmup
    )
    mine = my_s.CosineAnnealingLRWithWarmup(
        base_lr, total_epochs=t_max, warmup_epochs=warmup,
        warmup_lr=warmup_lr, min_lr=min_lr,
    )
    ref_trace, my_trace = [], []
    for k in range(t_max + 5):
        ref.step()
        ref_trace.append(opt.param_groups[0]["lr"])
        my_trace.append(mine.step(k))
    np.testing.assert_allclose(my_trace, ref_trace, rtol=1e-12)
    # the reference's last_epoch=-1 quirk: peak overshoots warmup_lr by one
    # warmup increment
    overshoot = warmup_lr + max(0.0, (warmup_lr - base_lr) / warmup)
    assert max(ref_trace) == pytest.approx(overshoot)


def test_d3pm_trace_parity_vs_torch_lambdalr():
    base_lr = 5e-4
    opt = _opt(base_lr)
    ref = ref_s.D3PMScheduler(opt)
    mine = my_s.D3PMScheduler(base_lr)
    ref_trace, my_trace = [], []
    for k in range(30):
        ref.step()
        ref_trace.append(opt.param_groups[0]["lr"])
        my_trace.append(mine.step(k))
    np.testing.assert_allclose(my_trace, ref_trace, rtol=1e-12)
    assert ref_trace[-1] < base_lr


def test_cosine_warmup0_documented_deviation():
    """The reference's warmup-free cosine CRASHES at construction
    (`_prepare_for_warmup` indexes a None warmup_lrs since warmup(0) >
    last_epoch(-1)); we deliberately anneal from base_lr instead.  Pin BOTH
    behaviors so the deviation stays known."""
    with pytest.raises(TypeError):
        ref_s.CosineAnnealingLRWithWarmup(_opt(5e-4), T_max=10, warmup=0)

    mine = my_s.CosineAnnealingLRWithWarmup(5e-4, total_epochs=10,
                                            warmup_epochs=0)
    lr0 = mine.step(0)
    assert lr0 == pytest.approx(5e-4)  # cos(0) at progress 0
    lr1 = mine.step(1)
    assert lr1 == pytest.approx(
        5e-4 * 0.5 * (1 + math.cos(math.pi * 1 / 10))
    )
