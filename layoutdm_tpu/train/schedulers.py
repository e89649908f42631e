"""Epoch-level LR schedules driven from host, matching `helpers/scheduler.py`.

The reference steps torch schedulers once per epoch (`main.py:112-118`).
Here each scheduler is a tiny stateful host object producing the next LR,
which the loop writes into the optimizer's injected hyperparams
(`train.step.set_learning_rate`).
"""

from __future__ import annotations

import math
from typing import Optional


class VoidScheduler:
    """(`scheduler.py:12-23`) — constant LR."""

    def __init__(self, base_lr: float, **kw):
        self.lr = base_lr

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        return self.lr


class D3PMScheduler:
    """1/sqrt(epoch-10) decay after epoch 10 (`scheduler.py:26-35`)."""

    def __init__(self, base_lr: float, **kw):
        self.base_lr = base_lr

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        if epoch <= 10:
            return self.base_lr
        return self.base_lr / math.sqrt(epoch - 10)


class ReduceLROnPlateauWithWarmup:
    """(`scheduler.py:50-273`): linear warmup, then multiply by ``factor``
    after ``patience`` epochs without val-loss improvement."""

    def __init__(
        self,
        base_lr: float,
        warmup_epochs: int = 0,
        factor: float = 0.5,
        patience: int = 2,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
        **kw,
    ):
        self.base_lr = base_lr
        self.warmup = warmup_epochs
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0
        self.lr = base_lr

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        if self.warmup and epoch < self.warmup:
            self.lr = self.base_lr * (epoch + 1) / self.warmup
            return self.lr
        if val_loss is None:
            return self.lr
        if val_loss < self.best * (1 - self.threshold):
            self.best = val_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


class CosineAnnealingLRWithWarmup:
    """(`scheduler.py:276-383`)"""

    def __init__(
        self,
        base_lr: float,
        total_epochs: int = 50,
        warmup_epochs: int = 0,
        min_lr: float = 0.0,
        **kw,
    ):
        self.base_lr = base_lr
        self.total = total_epochs
        self.warmup = warmup_epochs
        self.min_lr = min_lr

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        if self.warmup and epoch < self.warmup:
            return self.base_lr * (epoch + 1) / self.warmup
        t = (epoch - self.warmup) / max(self.total - self.warmup, 1)
        return self.min_lr + 0.5 * (self.base_lr - self.min_lr) * (
            1 + math.cos(math.pi * min(t, 1.0))
        )


SCHEDULERS = {
    "void": VoidScheduler,
    "d3pm": D3PMScheduler,
    "reduce_lr_on_plateau": ReduceLROnPlateauWithWarmup,
    "cosine": CosineAnnealingLRWithWarmup,
}


def build_scheduler(name: str, base_lr: float, **kw):
    return SCHEDULERS[name](base_lr, **kw)


def scheduler_state(sched) -> dict:
    """Serializable host state for preemption resume (schedulers are tiny
    host objects; without this, resume restarts the LR at base — a warm
    restart that silently changes training dynamics)."""
    keys = ("best", "num_bad", "lr")
    return {k: getattr(sched, k) for k in keys if hasattr(sched, k)}


def restore_scheduler_state(sched, state: dict) -> None:
    for k, v in (state or {}).items():
        if hasattr(sched, k):
            setattr(sched, k, v)
