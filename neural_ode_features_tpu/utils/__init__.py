"""Utilities: meters, experiment management, checkpointing."""

from .checkpoint import (
    from_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
    to_torch_state_dict,
)
from .expman import Experiment
from .meters import AverageMeter, RunningAverageMeter, count_parameters

__all__ = [
    "Experiment",
    "RunningAverageMeter",
    "AverageMeter",
    "count_parameters",
    "save_checkpoint",
    "load_checkpoint",
    "to_torch_state_dict",
    "from_torch_state_dict",
]
