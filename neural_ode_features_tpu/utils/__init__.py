"""Utilities: meters, experiment management, checkpointing."""

from .compile_cache import enable_tpu_compile_cache
from .checkpoint import (
    from_torch_state_dict,
    load_checkpoint,
    resolve_checkpoint,
    save_checkpoint,
    to_torch_state_dict,
)
from .expman import Experiment
from .flops import (
    odenet_flops_per_image,
    odenet_train_flops_per_image,
    peak_flops_per_chip,
)
from .meters import AverageMeter, RunningAverageMeter, count_parameters

__all__ = [
    "enable_tpu_compile_cache",
    "odenet_flops_per_image",
    "odenet_train_flops_per_image",
    "peak_flops_per_chip",
    "Experiment",
    "RunningAverageMeter",
    "AverageMeter",
    "count_parameters",
    "save_checkpoint",
    "load_checkpoint",
    "resolve_checkpoint",
    "to_torch_state_dict",
    "from_torch_state_dict",
]
