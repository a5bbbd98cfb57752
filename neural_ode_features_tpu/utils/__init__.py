"""Utilities: meters, experiment management, checkpointing."""

from .checkpoint import (
    from_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
    to_torch_state_dict,
)
from .expman import Experiment
from .flops import odenet_flops_per_image, peak_flops_per_chip
from .meters import AverageMeter, RunningAverageMeter, count_parameters

__all__ = [
    "odenet_flops_per_image",
    "peak_flops_per_chip",
    "Experiment",
    "RunningAverageMeter",
    "AverageMeter",
    "count_parameters",
    "save_checkpoint",
    "load_checkpoint",
    "to_torch_state_dict",
    "from_torch_state_dict",
]
