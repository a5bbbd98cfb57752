"""Model zoo: ODE-Net and the discrete ResNet baseline (SURVEY.md §2.1)."""

from .api import ODEBlock, ODENet, ResNet
from .common import ModelConfig, pool_features
from .odenet import init_odenet, odefunc_apply, odenet_logits, odenet_trajectory
from .resnet import init_resnet, resnet_block_states, resnet_logits

__all__ = [
    "ModelConfig",
    "ODENet",
    "ResNet",
    "ODEBlock",
    "pool_features",
    "init_odenet",
    "odenet_logits",
    "odenet_trajectory",
    "odefunc_apply",
    "init_resnet",
    "resnet_logits",
    "resnet_block_states",
]
