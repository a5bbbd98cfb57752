"""ResNet baseline: stem → K discrete residual blocks → head.

Capability parity with the reference's discrete counterpart (reference:
model.py ``ResBlock``:~100, UNVERIFIED — SURVEY.md §2.1; BASELINE.json
config 2 "MNIST ResNet baseline").  Per-block feature taps play the role of
the ODE-Net's continuous t grid: block k ↦ t = k / num_blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layers import conv2d, group_norm, init_conv, init_group_norm
from .common import ModelConfig, head_apply, init_head, init_stem, stem_apply

__all__ = ["init_resnet", "resnet_logits", "resnet_block_states"]


def _init_block(key, h: int):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": init_group_norm(h),
        "conv1": init_conv(k1, 3, 3, h, h),
        "norm2": init_group_norm(h),
        "conv2": init_conv(k2, 3, 3, h, h),
    }


def _block_apply(params, x, cfg: ModelConfig):
    g = cfg.groups
    out = jax.nn.relu(group_norm(params["norm1"], x, groups=g))
    out = conv2d(params["conv1"], out, padding=1)
    out = jax.nn.relu(group_norm(params["norm2"], out, groups=g))
    out = conv2d(params["conv2"], out, padding=1)
    return x + out


def init_resnet(key, cfg: ModelConfig):
    keys = jax.random.split(key, cfg.num_blocks + 2)
    return {
        "stem": init_stem(keys[0], cfg),
        "blocks": [_init_block(k, cfg.hidden) for k in keys[1:-1]],
        "head": init_head(keys[-1], cfg),
    }


def resnet_block_states(params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """All intermediate states: (num_blocks+1, B, H, W, C) — the discrete
    analogue of the ODE trajectory (tap k ≙ t = k/num_blocks), used by the
    extraction pipeline (reference extract.py ResNet path, SURVEY.md §3.3)."""
    h = stem_apply(params["stem"], x, cfg)
    states = [h]
    for bp in params["blocks"]:
        h = _block_apply(bp, h, cfg)
        states.append(h)
    return jnp.stack(states)


def resnet_logits(params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    h = stem_apply(params["stem"], x, cfg)
    for bp in params["blocks"]:
        h = _block_apply(bp, h, cfg)
    return head_apply(params["head"], h, cfg)
