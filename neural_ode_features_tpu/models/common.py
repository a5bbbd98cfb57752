"""Shared model components: downsampling stem, classification head, config.

Capability parity with the reference's network builders (reference:
model.py:~100-140, UNVERIFIED — empty mount, SURVEY.md §2.1): the
Chen-et-al. MNIST/CIFAR architecture — conv stem downsampling to a
``hidden``-channel feature map, a feature core (ODE block or residual
blocks), and a GroupNorm→ReLU→GAP→Linear head.

All functions are pure; parameters are nested dicts with stable names
(documented in utils/checkpoint.py's torch name map).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.layers import (
    conv2d,
    global_avg_pool,
    group_norm,
    init_conv,
    init_group_norm,
    init_linear,
    linear,
)

__all__ = ["ModelConfig", "init_stem", "stem_apply", "init_head", "head_apply"]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture + solver configuration (the persisted ``params.json``
    surface that extract.py uses to rebuild the net — reference train.py
    argparse, UNVERIFIED)."""

    in_channels: int = 1  # 1 = MNIST, 3 = CIFAR-10
    num_classes: int = 10
    hidden: int = 64
    groups: int = 32
    downsampling: str = "conv"  # 'conv' (Chen et al. default) | 'res'
    # solver settings (ODENet only)
    tol: float = 1e-3  # reference --tol: used for both rtol and atol
    method: str = "dopri5"
    error_control: str = "per_sample"
    controller: str = "i"  # 'i' (reference parity) | 'pi' (fewer rejections)
    adjoint: bool = False
    adjoint_seminorm: bool = False  # backward error norm on (y, a_y) only
    adjoint_mode: str = "reintegrate"  # or 'interpolated' (dense forward)
    max_steps: int = 4096
    # number of residual blocks (ResNet only)
    num_blocks: int = 6
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16' dynamics compute
    # Fused Pallas ODEfunc kernel on forward (inference/extraction) paths;
    # the adjoint differentiates the identical jnp dynamics regardless.
    use_pallas: bool = False
    # Fused Pallas RK-step kernel: one whole dopri5 step (all stage evals +
    # stage linear algebra + embedded error) as one VMEM-resident kernel.
    use_fused_rk: bool = False

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def init_stem(key, cfg: ModelConfig):
    """Downsampling stem, 28×28 → 6×6 (MNIST) / 32×32 → 7×7 (CIFAR).

    ``cfg.downsampling``:
      * 'conv' (default): conv(in→h, 3×3, VALID) then
        2 × [GN, ReLU, conv(h→h, 4×4, s2, p1)] — the Chen et al. default.
      * 'res': conv(in→h, 3×3, VALID) then 2 × stride-2 residual blocks
        (1×1 s2 shortcut) — the reference's --downsampling-method res
        variant (reference: model.py / Chen et al. example — UNVERIFIED).
    """
    h = cfg.hidden
    if cfg.downsampling == "conv":
        ks = jax.random.split(key, 3)
        return {
            "conv0": init_conv(ks[0], 3, 3, cfg.in_channels, h),
            "norm1": init_group_norm(h),
            "conv1": init_conv(ks[1], 4, 4, h, h),
            "norm2": init_group_norm(h),
            "conv2": init_conv(ks[2], 4, 4, h, h),
        }
    if cfg.downsampling == "res":
        ks = jax.random.split(key, 7)
        def res_block(k1, k2, k3):
            return {
                "norm1": init_group_norm(h),
                "conv1": init_conv(k1, 3, 3, h, h),
                "norm2": init_group_norm(h),
                "conv2": init_conv(k2, 3, 3, h, h),
                "shortcut": init_conv(k3, 1, 1, h, h),
            }
        return {
            "conv0": init_conv(ks[0], 3, 3, cfg.in_channels, h),
            "block1": res_block(ks[1], ks[2], ks[3]),
            "block2": res_block(ks[4], ks[5], ks[6]),
        }
    raise ValueError(f"unknown downsampling {cfg.downsampling!r}")


def _res_down_block(params, x, g):
    """Stride-2 pre-activation residual block with a 1×1 s2 shortcut."""
    out = jax.nn.relu(group_norm(params["norm1"], x, groups=g))
    shortcut = conv2d(params["shortcut"], out, stride=2, padding="VALID")
    out = conv2d(params["conv1"], out, stride=2, padding=1)
    out = jax.nn.relu(group_norm(params["norm2"], out, groups=g))
    out = conv2d(params["conv2"], out, padding=1)
    return shortcut + out


def stem_apply(params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    g = cfg.groups
    if cfg.downsampling == "res":
        x = conv2d(params["conv0"], x, padding="VALID")
        x = _res_down_block(params["block1"], x, g)
        x = _res_down_block(params["block2"], x, g)
        return x
    x = conv2d(params["conv0"], x, padding="VALID")
    x = jax.nn.relu(group_norm(params["norm1"], x, groups=g))
    x = conv2d(params["conv1"], x, stride=2, padding=1)
    x = jax.nn.relu(group_norm(params["norm2"], x, groups=g))
    x = conv2d(params["conv2"], x, stride=2, padding=1)
    return x


def init_head(key, cfg: ModelConfig):
    return {
        "norm": init_group_norm(cfg.hidden),
        "fc": init_linear(key, cfg.hidden, cfg.num_classes),
    }


def head_apply(params, h: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """GN → ReLU → GAP → Linear; also the feature-pooling path (GAP of the
    pre-head state is the extracted per-t feature, SURVEY.md §3.3)."""
    h = jax.nn.relu(group_norm(params["norm"], h, groups=cfg.groups))
    return linear(params["fc"], global_avg_pool(h))


def pool_features(h: jnp.ndarray) -> jnp.ndarray:
    """The extraction pooling: GAP of a (…, H, W, C) state → (…, C)."""
    return jnp.mean(h, axis=(-3, -2))
