"""Low-level functional ops: layers and on-device preprocessing."""

from .layers import (
    concat_conv2d,
    concat_time_channel,
    conv2d,
    global_avg_pool,
    group_norm,
    init_conv,
    init_group_norm,
    init_linear,
    linear,
)

__all__ = [
    "conv2d",
    "group_norm",
    "linear",
    "global_avg_pool",
    "concat_conv2d",
    "concat_time_channel",
    "init_conv",
    "init_group_norm",
    "init_linear",
]
