"""Differentiable event-terminated integration (implicit function theorem).

Parity target: modern torchdiffeq's differentiable ``odeint_event``
(reference: torchdiffeq/_impl/odeint.py ``odeint_event`` — UNVERIFIED,
empty mount, SURVEY.md §0; the 2019 vendored copy in the reference has no
events at all, so this is capability beyond the blueprint).

The hitting time ``t*`` is defined implicitly by ``g(t*, y(t*)) = 0`` along
the trajectory of ``y' = f(params, t, y)``, ``y(t0) = y0``.  The implicit
function theorem gives its sensitivity to any input ``ξ ∈ {params, y0}``::

    dt*/dξ = − (∂g/∂t + ∂g/∂y·f)⁻¹ · ∂g/∂y · ∂y(t*)/∂ξ
    dy*/dξ = ∂y(t*)/∂ξ + f(t*, y*) · dt*/dξ

where ``∂y(t*)/∂ξ`` is the fixed-endpoint trajectory sensitivity — exactly
what :func:`~.adjoint.odeint_adjoint` already computes in O(1) memory.

Instead of hand-writing another ``custom_vjp``, both formulas are obtained
by COMPOSITION — the "one differentiable Newton step around a located root"
construction:

  1. **Locate** ``t*`` with the non-differentiable :func:`~.event.odeint_event`
     (all inputs stop-gradiented; the while_loop is never transposed).
  2. **Re-express** ``y(t*)`` differentiably: one ``odeint_adjoint`` solve to
     the *fixed* located endpoint, time-reparameterized onto ``s ∈ [0, 1]``
     (``z(s) = y(t0 + s·(t*−t0))``) so per-sample endpoints share ONE
     batched solve — the TPU-native alternative to a per-row host loop.
  3. **Newton step**, differentiable only through ``y_T``::

         t*(ξ) = t_loc − g(t_loc, y_T(ξ)) / stop_grad(∂g/∂t + ∂g/∂y·f)
         y*(ξ) = y_T(ξ) + stop_grad(f) · (t*(ξ) − t_loc)

     At the primal the correction is ≈0 (the bisection already found the
     root; the Newton step only polishes it), while the chain rule through
     it reproduces the IFT formulas above EXACTLY — the frozen denominator
     and frozen ``f`` drop the O(g)≈0 product-rule terms a naive quotient
     would carry.

Scope and caveats:

  * Differentiable w.r.t. ``params`` and ``y0``.  ``t0``/``t_max`` are
    non-differentiable scalars; ``event_fn`` must close over constants only
    (a parameter-dependent event surface is not supported — fold the
    parameter into the state if needed).
  * **Grazing events** (trajectory tangent to the event surface,
    ``∂g/∂t + ∂g/∂y·f → 0`` at ``t*``) have genuinely unbounded
    sensitivity; the IFT hypothesis fails and gradients blow up there.
    The division is NaN-guarded only for rows where no event fired.
  * Rows where no event fires return ``t_event = t_max`` with ZERO
    event-time gradient (the endpoint is pinned), while ``y_event``
    remains the differentiable ``y(t_max)``.
  * Primal cost ≈ 2 forward solves (locate + differentiable re-solve);
    the backward is the standard adjoint of the re-solve plus one
    ``event_fn`` JVP.  ``stats``/NFE reported are the LOCATE solve's;
    the re-solve and adjoint evals are extra (use ``nfe_sink`` on a
    surrounding ``odeint_adjoint`` if exact accounting matters).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from .adjoint import odeint_adjoint
from .event import EventSolution, odeint_event

__all__ = ["odeint_event_adjoint"]


def _bcast_row(vec: jnp.ndarray, leaf: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a scalar or (B,) row factor onto a leaf of any rank."""
    if vec.ndim == 0:
        return vec
    return vec.reshape(vec.shape + (1,) * (leaf.ndim - 1))


def odeint_event_adjoint(
    func: Callable[[Any, Any, Any], Any],
    params: Any,
    y0: Any,
    t0: float,
    event_fn: Callable[[Any, Any], Any],
    *,
    t_max: float,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: str = "dopri5",
    error_control: str = "global",
    max_steps: int = 256,
    first_step: float | None = None,
    controller: str = "i",
    refine_iters: int = 30,
    direction: int = 0,
    interior_probes: int = 0,
    adjoint_rtol: float | None = None,
    adjoint_atol: float | None = None,
    adjoint_max_steps: int | None = None,
    adjoint_seminorm: bool = False,
    adjoint_mode: str = "reintegrate",
) -> EventSolution:
    """Like :func:`~.event.odeint_event`, but differentiable w.r.t.
    ``params`` and ``y0`` — including the event time itself.

    ``func(params, t, y)`` takes EXPLICIT parameters (the
    :func:`~.adjoint.odeint_adjoint` signature), unlike the forward-only
    ``odeint_event`` whose dynamics close over everything.  ``event_fn(t,
    y)`` is the same signature as the forward-only version: scalar output
    for ``error_control='global'``, ``(B,)`` for ``'per_sample'``.

    All location knobs (``direction``, ``interior_probes``,
    ``refine_iters``, …) pass through to the locate solve; the
    ``adjoint_*`` knobs configure the differentiable re-solve exactly as
    in :func:`~.adjoint.odeint_adjoint`.

    Returns an :class:`~.event.EventSolution` whose ``t_event`` and
    ``y_event`` carry gradients (``fired``/``stats`` do not).  See the
    module docstring for the math, scope, and the grazing-event caveat.
    """
    sg = lax.stop_gradient

    # --- 1. Locate t* (non-differentiable; inputs severed so the
    # while_loop inside is never transposed). -----------------------------
    params_c = sg(params)
    y0_c = sg(y0)
    sol = odeint_event(
        lambda t, y: func(params_c, t, y),
        y0_c,
        t0,
        event_fn,
        t_max=t_max,
        rtol=rtol,
        atol=atol,
        method=method,
        error_control=error_control,
        max_steps=max_steps,
        first_step=first_step,
        controller=controller,
        refine_iters=refine_iters,
        direction=direction,
        interior_probes=interior_probes,
    )
    t_loc = sg(sol.t_event)  # scalar ('global') or (B,) ('per_sample')
    fired = sg(sol.fired)

    # --- 2. Differentiable solve to the FIXED located endpoint(s). -------
    # Reparameterize onto s ∈ [0, 1]: z(s) = y(t0 + s·dur) solves
    # z' = dur · f(t0 + s·dur, z).  Per-sample rows with different hitting
    # times become one shared-grid batched solve (dur is (B,)); 'global'
    # keeps dur scalar.  dur is a stop-gradient constant — the endpoint-
    # motion term f·dt* is supplied explicitly by the Newton step below.
    dur = sg(t_loc - jnp.asarray(t0, t_loc.dtype))

    def func_s(p, s, z):
        t = jnp.asarray(t0, s.dtype) + s * dur
        f_val = func(p, t, z)
        return jax.tree.map(lambda lf: _bcast_row(dur, lf) * lf, f_val)

    s_grid = jnp.asarray([0.0, 1.0], t_loc.dtype)
    zs, fix_stats = odeint_adjoint(
        func_s,
        params,
        y0,
        s_grid,
        rtol=rtol,
        atol=atol,
        method=method,
        error_control=error_control,
        # The re-solve covers the whole located span in one interval; give
        # it at least odeint's default budget (the event solve's small
        # default max_steps bounds LOCATION work, not this solve).
        max_steps=max(max_steps, 2**14),
        controller=controller,
        adjoint_rtol=adjoint_rtol,
        adjoint_atol=adjoint_atol,
        adjoint_max_steps=adjoint_max_steps,
        adjoint_seminorm=adjoint_seminorm,
        adjoint_mode=adjoint_mode,
    )
    y_T = jax.tree.map(lambda z: z[-1], zs)  # differentiable y(t_loc)

    # --- 3. One differentiable Newton step (the IFT in disguise). --------
    # Frozen pieces: f at the endpoint and the total derivative of g along
    # the flow, denom = ∂g/∂t + ∂g/∂y·f (one event_fn JVP, zero extra
    # dynamics solves).
    y_T_c = sg(y_T)
    f_T = func(params_c, t_loc, y_T_c)  # frozen endpoint velocity
    ones_t = jnp.ones_like(t_loc)
    _, denom = jax.jvp(event_fn, (t_loc, y_T_c), (ones_t, f_T))
    denom = sg(jnp.asarray(denom))
    # NaN-guard rows where no event fired (denom is garbage there and the
    # where() below discards the branch — but 0·NaN would still poison
    # reverse-mode cotangents).  Fired rows keep the true denom: a grazing
    # event (denom→0) SHOULD blow up rather than silently zero its grad.
    denom_safe = jnp.where(fired & (denom != 0.0), denom, 1.0)

    g_T = jnp.asarray(event_fn(t_loc, y_T))  # differentiable through y_T
    newton = g_T / denom_safe
    mask = fired.astype(newton.dtype)
    t_star = t_loc - mask * newton  # == t_loc (→ t_max) where not fired

    y_star = jax.tree.map(
        lambda yt, ft: yt - _bcast_row(mask * newton, yt) * ft, y_T, f_T
    )

    # Primal validity needs BOTH solves to have completed.
    stats = sol.stats._replace(
        success=sol.stats.success & jnp.all(sg(fix_stats.success))
    )
    return EventSolution(t_event=t_star, y_event=y_star, fired=fired,
                         stats=stats)
