"""Training meters (reference: utils.py ``RunningAverageMeter`` /
``accuracy`` — UNVERIFIED, empty mount, SURVEY.md §2.1)."""

from __future__ import annotations

__all__ = ["RunningAverageMeter", "AverageMeter", "count_parameters"]


def count_parameters(params) -> int:
    """Total scalar parameter count of a pytree (reference: utils.py
    ``count_parameters`` — UNVERIFIED, SURVEY.md §2.1)."""
    import jax

    return sum(leaf.size for leaf in jax.tree.leaves(params))


class RunningAverageMeter:
    """Exponential moving average; the reference's loss/NFE meter."""

    def __init__(self, momentum: float = 0.97):
        self.momentum = momentum
        self.val = None
        self.avg = 0.0

    def reset(self):
        self.val = None
        self.avg = 0.0

    def update(self, val: float):
        if self.val is None:
            self.avg = float(val)
        else:
            self.avg = self.avg * self.momentum + float(val) * (1.0 - self.momentum)
        self.val = float(val)


class AverageMeter:
    """Plain arithmetic mean over an epoch."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
