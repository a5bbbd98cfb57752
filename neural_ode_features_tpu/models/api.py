"""Object-style convenience API: ``ODENet`` / ``ResNet`` / ``ODEBlock``.

The reference exposes its models as classes (reference: model.py ``ODENet``/
``ODEBlock``/``ResNet`` — UNVERIFIED, SURVEY.md §2.1); users migrating from
it can keep that shape.  These are thin immutable wrappers over the
functional core (explicit param pytrees + pure apply functions) — the
instances just pair ``(params, config)`` and stay fully compatible with
``jax.jit`` through their pure methods.  For ``jax.grad`` through an ODE
solve, construct the config with ``adjoint=True`` (the plain forward uses a
``lax.while_loop``, which is not reverse-differentiable; the adjoint path
is, by construction).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..solver import SolveStats
from .common import ModelConfig, pool_features
from .odenet import init_odenet, odenet_logits, odenet_trajectory
from .resnet import init_resnet, resnet_block_states, resnet_logits

__all__ = ["ODENet", "ResNet", "ODEBlock"]


class ODENet:
    """stem → ODE block → head classifier with continuous feature taps."""

    def __init__(self, params, config: ModelConfig):
        self.params = params
        self.config = config

    @classmethod
    def create(cls, key, config: ModelConfig | None = None, **cfg_kw):
        config = config or ModelConfig(**cfg_kw)
        return cls(init_odenet(key, config), config)

    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, SolveStats]:
        """Classification logits + per-sample solve stats."""
        return odenet_logits(self.params, x, self.config)

    def trajectory(self, x: jnp.ndarray, ts) -> tuple[jnp.ndarray, SolveStats]:
        """States h(t) at every requested t from one solve: (T, B, H, W, C)."""
        return odenet_trajectory(self.params, x, ts, self.config)

    def features(self, x: jnp.ndarray, ts) -> tuple[jnp.ndarray, SolveStats]:
        """Pooled per-t feature vectors: (T, B, C)."""
        traj, stats = self.trajectory(x, ts)
        return pool_features(traj), stats


class ODEBlock:
    """The continuous feature core alone: h0 ↦ h(t) (reference model.py
    ``ODEBlock``).  Operates on pre-stem feature maps."""

    def __init__(self, odefunc_params, config: ModelConfig):
        self.params = odefunc_params
        self.config = config

    def __call__(self, h0: jnp.ndarray, ts=None):
        """``ts=None`` (the reference's default [0,1] span) returns the final
        state h(1); an explicit ``ts`` — of any length, including 2 — always
        returns the full (T, B, H, W, C) trajectory."""
        from .odenet import _solve

        cfg = self.config
        final_only = ts is None
        ts = jnp.asarray([0.0, 1.0] if final_only else ts, h0.dtype)
        # Honor config.adjoint like ODENet does — the module docstring's
        # jax.grad recipe ("construct the config with adjoint=True") was
        # silently ignored for this class (code-review r4).
        traj, stats = _solve({"odefunc": self.params}, h0, ts, cfg,
                             adjoint=cfg.adjoint)
        return (traj[-1] if final_only else traj), stats


class ResNet:
    """Discrete 6-block baseline with per-block feature taps."""

    def __init__(self, params, config: ModelConfig):
        self.params = params
        self.config = config

    @classmethod
    def create(cls, key, config: ModelConfig | None = None, **cfg_kw):
        config = config or ModelConfig(**cfg_kw)
        return cls(init_resnet(key, config), config)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return resnet_logits(self.params, x, self.config)

    def block_states(self, x: jnp.ndarray) -> jnp.ndarray:
        return resnet_block_states(self.params, x, self.config)

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        return pool_features(self.block_states(x))
