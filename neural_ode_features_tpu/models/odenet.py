"""ODE-Net: stem → continuous ODE feature block → head.

Capability parity with the reference's ODENet (reference: model.py
``ConcatConv2d``/``ODEfunc``/``ODEBlock`` :~20-90, UNVERIFIED — empty mount,
SURVEY.md §2.1), TPU-native design:

  * the dynamics ``f(θ, t, h)`` is a pure function of explicit parameters so
    the adjoint ``custom_vjp`` can differentiate it;
  * the whole solve is one on-device loop (see solver/), with per-sample
    adaptive stepping by default;
  * the trajectory API returns features at *arbitrary* t ∈ [0, 1] from a
    single solve via dense output — the repo's signature capability
    ("continuous feature extraction", BASELINE.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layers import (
    concat_conv2d,
    group_norm,
    init_conv,
    init_group_norm,
)
from ..solver import SolveStats, odeint, odeint_adjoint
from .common import ModelConfig, head_apply, init_head, init_stem, stem_apply

__all__ = [
    "init_odenet",
    "odenet_logits",
    "odenet_trajectory",
    "odefunc_apply",
]


def init_odefunc(key, cfg: ModelConfig):
    """GN → ReLU → ConcatConv(h+1→h, 3×3) → GN → ReLU → ConcatConv → GN
    (reference model.py ``ODEfunc``:~40, UNVERIFIED)."""
    h = cfg.hidden
    k1, k2 = jax.random.split(key)
    return {
        "norm1": init_group_norm(h),
        "conv1": init_conv(k1, 3, 3, h + 1, h),
        "norm2": init_group_norm(h),
        "conv2": init_conv(k2, 3, 3, h + 1, h),
        "norm3": init_group_norm(h),
    }


def odefunc_apply(params, t, h: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """The dynamics f(t, h).  ``t`` may be scalar (batch-global control) or
    (B,) (per-sample integration times).

    With ``cfg.use_pallas`` (f32 only) the evaluation dispatches to the fused
    Pallas kernel (kernels/odefunc_pallas.py) — numerically equal, one
    VMEM-resident block per RK stage.  The dispatch goes through the
    custom-VJP pair (fused backward kernel), so this path is differentiable:
    both the adjoint's ``jax.vjp`` and direct backprop run fused kernels."""
    if (cfg.use_pallas and cfg.compute_dtype == "float32"
            and h.dtype == jnp.float32):  # kernel contract is f32 end-to-end
        from ..kernels.odefunc_pallas import (
            odefunc_pallas_vjp,
            pallas_supported,
        )

        if pallas_supported(h, cfg.groups):
            return odefunc_pallas_vjp(params, t, h, cfg.groups, None)
    g = cfg.groups
    dtype = cfg.cdtype
    h = h.astype(dtype)
    out = jax.nn.relu(group_norm(params["norm1"], h, groups=g))
    out = concat_conv2d(params["conv1"], t, out, padding=1)
    out = jax.nn.relu(group_norm(params["norm2"], out, groups=g))
    out = concat_conv2d(params["conv2"], t, out, padding=1)
    out = group_norm(params["norm3"], out, groups=g)
    return out.astype(jnp.float32)


def init_odenet(key, cfg: ModelConfig):
    k_stem, k_func, k_head = jax.random.split(key, 3)
    return {
        "stem": init_stem(k_stem, cfg),
        "odefunc": init_odefunc(k_func, cfg),
        "head": init_head(k_head, cfg),
    }


def fused_rk_eligible(cfg: ModelConfig, h0_shape, h0_dtype) -> bool:
    """True iff :func:`_solve` will actually install the fused RK-step
    Pallas kernel for this config and hidden-state shape.  Exposed so
    callers that *report* the fused flag (bench.py) can record the
    effective state rather than echoing the request — the gate silently
    falls back to the jnp path for non-dopri5 / bf16 / global-error /
    unsupported-shape configurations."""
    if not (cfg.use_fused_rk and cfg.method == "dopri5"
            and cfg.error_control == "per_sample"
            and cfg.compute_dtype == "float32"
            and h0_dtype == jnp.float32 and len(h0_shape) == 4):
        return False
    from ..kernels.rk_step_pallas import fused_rk_supported

    b, hh, ww, c = h0_shape
    return fused_rk_supported(b, hh * ww * c, (hh, ww), cfg.groups)


def _solve(params, h0, ts, cfg: ModelConfig, *, adjoint: bool,
           nfe_sink=None, tol=None):
    """Run the ODE block over ``ts``; returns ((T, B, H, W, C), stats).

    ``tol`` overrides ``cfg.tol`` at runtime and may be a traced scalar —
    the adaptive engine consumes rtol/atol as plain arithmetic, so a
    tolerance *axis* can be vmapped (sweep.py --fused runs a whole rtol
    grid in ONE compile + ONE dispatch).  A traced tol disables the
    opt-in fused-RK Pallas kernel (it bakes tolerances into the kernel).
    """
    runtime_tol = tol is not None
    if tol is None:
        tol = cfg.tol
    if adjoint:
        # The adjoint differentiates the dynamics with jax.vjp; the Pallas
        # path is differentiable through its custom-VJP kernel pair, so no
        # jnp fallback is forced (cfg.use_pallas applies to both directions).
        def dyn(p, t, y):
            return odefunc_apply(p, t, y, cfg)

        return odeint_adjoint(
            dyn,
            params["odefunc"],
            h0,
            ts,
            rtol=tol,
            atol=tol,
            method=cfg.method,
            error_control=cfg.error_control,
            max_steps=cfg.max_steps,
            controller=cfg.controller,
            adjoint_seminorm=cfg.adjoint_seminorm,
            adjoint_mode=cfg.adjoint_mode,
            dense_max_steps=min(cfg.max_steps, 256),
            nfe_sink=nfe_sink,
        )

    def dyn_closed(t, y):
        return odefunc_apply(params["odefunc"], t, y, cfg)

    fused_step = None
    if not runtime_tol and fused_rk_eligible(cfg, h0.shape, h0.dtype):
        # Whole-RK-step Pallas kernel: 6 FSAL dynamics evals + stage sums +
        # embedded error norm VMEM-resident (kernels/rk_step_pallas.py).
        from ..kernels.rk_step_pallas import make_fused_dopri5_step
        from ..solver.tableau import ADAPTIVE_TABLEAUS

        hh, ww = h0.shape[1:3]
        fused_step = make_fused_dopri5_step(
            params["odefunc"],
            ADAPTIVE_TABLEAUS["dopri5"],
            (hh, ww),
            groups=cfg.groups,
            rtol=cfg.tol,
            atol=cfg.tol,
        )

    return odeint(
        dyn_closed,
        h0,
        ts,
        rtol=tol,
        atol=tol,
        method=cfg.method,
        error_control=cfg.error_control,
        max_steps=cfg.max_steps,
        fused_step=fused_step,
        controller=cfg.controller,
    )


def odenet_logits(
    params, x: jnp.ndarray, cfg: ModelConfig, *, adjoint: bool | None = None,
    nfe_sink=None, tol=None,
) -> tuple[jnp.ndarray, SolveStats]:
    """Classification forward: solve h over [0, 1], head on h(1).

    ``adjoint`` overrides ``cfg.adjoint`` (training wants the adjoint path,
    inference the plain one).  ``nfe_sink`` (adjoint path only): scalar whose
    gradient reports backward-solve NFE — see
    :func:`..solver.adjoint.odeint_adjoint`.  ``tol`` overrides ``cfg.tol``
    at runtime; it may be traced, so a tolerance grid can be vmapped into
    one compile/dispatch (see :func:`_solve`).
    """
    adjoint = cfg.adjoint if adjoint is None else adjoint
    h0 = stem_apply(params["stem"], x, cfg)
    ts = jnp.asarray([0.0, 1.0], h0.dtype)
    traj, stats = _solve(params, h0, ts, cfg, adjoint=adjoint,
                         nfe_sink=nfe_sink if adjoint else None, tol=tol)
    logits = head_apply(params["head"], traj[-1], cfg)
    return logits, stats


def odenet_trajectory(
    params, x: jnp.ndarray, ts, cfg: ModelConfig
) -> tuple[jnp.ndarray, SolveStats]:
    """Feature-extraction forward: the full state trajectory h(t) at every
    requested t from ONE solve (dense output — SURVEY.md §3.3).

    Returns ((T, B, H, W, C) states, stats); pool with
    :func:`..models.common.pool_features` for (T, B, C) features.
    """
    h0 = stem_apply(params["stem"], x, cfg)
    ts = jnp.asarray(ts, h0.dtype)
    return _solve(params, h0, ts, cfg, adjoint=False)
