"""``odeint`` — the framework's front door to ODE integration.

Capability parity with the reference's solver entry point (reference:
torchdiffeq/_impl/odeint.py ``odeint`` and its ``SOLVERS`` dispatch dict —
UNVERIFIED, empty mount, SURVEY.md §0/§2.2), redesigned for TPU:

  * The user passes ``func(t, y)`` over an arbitrary pytree state; the front
    door flattens to a ``(B, N)`` matrix once and the entire solve runs as a
    single compiled on-device loop.
  * ``error_control='per_sample'`` (the TPU-native mode for batched
    states; the model layer's ``ModelConfig`` defaults to it): every batch
    row gets its own adaptive step sequence and NFE count — the reference
    cannot do this (its error norm reduces over the whole batch, SURVEY.md
    §2.4).  It requires every state leaf to carry a leading batch axis,
    which arbitrary user pytrees may not have — hence ``odeint`` itself
    defaults to ``'global'`` (reference semantics, any state shape).
  * ``error_control='global'`` reproduces the reference's batch-global
    semantics exactly (one norm over the whole flattened state), for
    NFE-parity comparisons against torchdiffeq.

Returns ``(ys, SolveStats)`` — NFE is data, not a mutable counter.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .adams import adams_odeint
from .fixed_grid import FIXED_GRID_METHODS, fixed_grid_odeint
from .ravel import ravel_batched, ravel_full
from .runge_kutta import SolveStats, adaptive_odeint
from .tableau import ADAPTIVE_TABLEAUS

__all__ = ["odeint", "SOLVERS", "SolveStats"]

SOLVERS: tuple[str, ...] = tuple(ADAPTIVE_TABLEAUS) + ("adams",) + FIXED_GRID_METHODS


def odeint(
    func: Callable[[Any, Any], Any],
    y0: Any,
    ts: jnp.ndarray,
    *,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: str = "dopri5",
    error_control: str = "global",
    max_steps: int = 2**14,
    first_step: float | None = None,
    unroll: str = "while",
    steps_per_interval: int = 1,
    error_mask: Any = None,
    max_order: int = 8,
    fused_step: Callable | None = None,
    controller: str = "i",
) -> tuple[Any, SolveStats]:
    """Solve ``dy/dt = func(t, y)`` from ``y0`` over times ``ts``.

    Args:
      func: dynamics. With ``error_control='global'`` it receives a scalar
        ``t`` and the state pytree unchanged (reference semantics).  With
        ``'per_sample'`` it receives ``t`` of shape ``(B,)`` and state leaves
        with leading batch axis ``B``; it must broadcast ``t`` per sample.
      y0: initial state pytree (floating leaves).
      ts: (T,) strictly monotonic times, T >= 1; ``ts[0]`` is the initial
        time.  Both time directions supported.
      rtol, atol: tolerances (adaptive methods).
      method: one of :data:`SOLVERS` — adaptive: ``dopri5`` (default),
        ``bosh3``, ``fehlberg2``, ``tsit5``; fixed-grid: ``euler``,
        ``midpoint``, ``heun2``, ``rk4``, ``fixed_adams``.
      error_control: ``'global'`` | ``'per_sample'`` (see module docstring).
      max_steps: bound on adaptive loop iterations.
      first_step: optional fixed initial step size (adaptive methods).
      unroll: ``'while'`` (fast, on-device early exit), ``'scan'``
        (reverse-differentiable; use small ``max_steps``), or
        ``'scan_remat'`` (reverse-differentiable with a rematerialised body:
        backward memory ~O(steps·state) instead of O(steps·intermediates)).
      steps_per_interval: substeps per ``ts`` interval (fixed-grid methods).
      error_mask: optional pytree like ``y0`` with 0/1 leaves — adaptive error
        control restricted to the selected state entries (seminorm control;
        Kidger et al. 2020).
      max_order: order-ramp ceiling for ``method='adams'`` (2..12; higher
        order → fewer, more expensive steps at tight tolerances).  Ignored
        by other methods.
      fused_step: optional fused RK-step kernel operating on the FLAT
        ``(B, N)`` state (see ``adaptive_odeint``; built by
        ``kernels.rk_step_pallas.make_fused_dopri5_step``).  Adaptive
        tableau methods only; the caller is responsible for matching the
        tableau/tolerances and the flat layout (``error_control=
        'per_sample'`` keeps leaves' batch rows — the model layer is the
        intended caller).
      controller: step-size controller for adaptive tableau methods —
        ``'i'`` (integral, torchdiffeq/reference parity, default) or
        ``'pi'`` (proportional-integral: smooth-NFE parity, far fewer
        rejected steps, and fewer NFE on stiffness-limited dynamics; see
        ``runge_kutta._optimal_dt_pi``).  ``'adams'`` and fixed-grid
        methods accept only ``'i'`` (they have their own / no step
        control).

    Returns:
      ys: pytree like ``y0`` with a new leading time axis ``T``.
      stats: :class:`SolveStats` with per-sample ``nfe`` (shape ``(B,)`` for
        per-sample control, ``(1,)`` for global).
    """
    if method not in SOLVERS:
        raise ValueError(f"unknown method {method!r}; available: {SOLVERS}")
    if error_control not in ("global", "per_sample"):
        raise ValueError(f"unknown error_control {error_control!r}")

    ts = jnp.asarray(ts)
    if ts.ndim != 1:
        raise ValueError(f"ts must be 1-D, got shape {ts.shape}")
    # Validate monotonicity when ts is concrete (a traced ts — e.g. inside the
    # adjoint's interval scan — skips the check; out-of-span times would
    # silently stay zero otherwise).
    if ts.shape[0] > 1 and not isinstance(ts, jax.core.Tracer):
        import numpy as _np

        diffs = _np.diff(_np.asarray(ts))
        if not (_np.all(diffs > 0) or _np.all(diffs < 0)):
            raise ValueError("ts must be strictly monotonic (either direction)")
        if method == "fixed_adams" and not _np.allclose(
            diffs, diffs[0], rtol=1e-6
        ):
            raise ValueError(
                "fixed_adams assumes a uniformly spaced ts grid (its constant"
                " substep would silently desynchronise from a non-uniform"
                " grid); use steps_per_interval on a uniform grid, or the"
                " adaptive 'adams' method"
            )
    if error_mask is not None and method in FIXED_GRID_METHODS:
        raise ValueError(
            "error_mask (seminorm control) only applies to adaptive methods;"
            f" {method!r} is fixed-grid"
        )
    if controller != "i" and method not in ADAPTIVE_TABLEAUS:
        raise ValueError(
            f"controller={controller!r} only applies to adaptive tableau "
            f"methods ({tuple(ADAPTIVE_TABLEAUS)}), not {method!r}"
        )

    if error_control == "per_sample":
        flat0, unravel, flatten = ravel_batched(y0)

        def flat_func(t, y_flat):
            return flatten(func(t, unravel(y_flat)))

    else:
        flat0, unravel, flatten = ravel_full(y0)

        def flat_func(t, y_flat):
            return flatten(func(t[0], unravel(y_flat)))

    flat_mask = None
    if error_mask is not None:
        mask_full = jax.tree.map(
            lambda y, m: jnp.broadcast_to(
                jnp.asarray(m, flat0.dtype), y.shape
            ),
            y0,
            error_mask,
        )
        flat_mask = flatten(mask_full)
        # An all-zero mask row silently DISABLES error control (the masked
        # error norm collapses to ~0, every step accepts, dt grows by
        # ifactor unbounded) and the garbage trajectory still reports
        # success=True. Catch it at trace time when the mask is concrete
        # (the usual case: 0/1 constants). (code-review r3)
        if not isinstance(flat_mask, jax.core.Tracer):
            import numpy as _np

            m = _np.asarray(flat_mask)
            if not m.any(axis=-1).all():
                raise ValueError(
                    "error_mask masks out EVERY state component for at"
                    " least one sample — that disables error control"
                    " entirely (unbounded step growth) rather than"
                    " restricting the norm; keep >=1 component unmasked"
                    " per sample"
                )

    if ts.shape[0] == 1:
        ys = flat0[None]
        batch = flat0.shape[0]
        stats = SolveStats(
            nfe=jnp.zeros((batch,), jnp.int32),
            naccept=jnp.zeros((batch,), jnp.int32),
            nreject=jnp.zeros((batch,), jnp.int32),
            success=jnp.ones((batch,), bool),
        )
        return unravel(ys), stats

    if method in ADAPTIVE_TABLEAUS:
        ys, stats = adaptive_odeint(
            flat_func,
            flat0,
            ts,
            rtol,
            atol,
            ADAPTIVE_TABLEAUS[method],
            max_steps=max_steps,
            first_step=first_step,
            unroll=unroll,
            error_mask=flat_mask,
            fused_step=fused_step,
            controller=controller,
        )
    elif fused_step is not None:
        raise ValueError(
            f"fused_step only applies to adaptive tableau methods, not "
            f"{method!r}")
    elif method == "adams":
        ys, stats = adams_odeint(
            flat_func,
            flat0,
            ts,
            rtol,
            atol,
            max_steps=max_steps,
            first_step=first_step,
            unroll=unroll,
            error_mask=flat_mask,
            max_order=max_order,
        )
    else:
        ys, stats = fixed_grid_odeint(
            flat_func, flat0, ts, method, steps_per_interval=steps_per_interval
        )

    return unravel(ys), stats
