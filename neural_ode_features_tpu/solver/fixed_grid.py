"""Fixed-grid ODE steppers as ``lax.scan`` loops.

Capability parity with the reference's fixed-step solvers (reference:
torchdiffeq/_impl/fixed_grid.py ``Euler``/``Midpoint``/``RK4`` and
torchdiffeq/_impl/fixed_adams.py — UNVERIFIED, empty mount, SURVEY.md §0),
re-expressed as a single compiled scan over the output grid.  Because the
trip count is static these solvers are reverse-mode differentiable, which the
gradient tests exploit as the "direct backprop" oracle for the adjoint.

Each interval ``[ts[i], ts[i+1]]`` is subdivided into ``steps_per_interval``
equal substeps (default 1, matching the reference's default grid).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax

from .runge_kutta import SolveStats

__all__ = ["fixed_grid_odeint", "FIXED_GRID_METHODS"]


def _euler_step(func, t0, dt, y0):
    return y0 + dt[:, None] * func(t0, y0), 1


def _midpoint_step(func, t0, dt, y0):
    half = 0.5 * dt
    k1 = func(t0, y0)
    k2 = func(t0 + half, y0 + half[:, None] * k1)
    return y0 + dt[:, None] * k2, 2


def _heun2_step(func, t0, dt, y0):
    k1 = func(t0, y0)
    k2 = func(t0 + dt, y0 + dt[:, None] * k1)
    return y0 + dt[:, None] * 0.5 * (k1 + k2), 2


def _rk4_step(func, t0, dt, y0):
    dt_c = dt[:, None]
    half = 0.5 * dt
    k1 = func(t0, y0)
    k2 = func(t0 + half, y0 + half[:, None] * k1)
    k3 = func(t0 + half, y0 + half[:, None] * k2)
    k4 = func(t0 + dt, y0 + dt_c * k3)
    return y0 + dt_c / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4), 4


_STEPPERS: dict[str, Callable] = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "heun2": _heun2_step,
    "rk4": _rk4_step,
}

# Adams–Bashforth-4 predictor / Adams–Moulton-3 corrector coefficients
# (uniform grid).  Reference: torchdiffeq/_impl/fixed_adams.py (UNVERIFIED).
_AB4 = (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0)
_AM3 = (9.0 / 24.0, 19.0 / 24.0, -5.0 / 24.0, 1.0 / 24.0)


def _fixed_adams_odeint(func, y0, ts, steps_per_interval):
    """4th-order Adams–Bashforth–Moulton predictor–corrector (PECE) on the
    uniformly-subdivided grid, RK4-bootstrapped for the first three steps.

    Assumes ``ts`` is (approximately) uniformly spaced — the reference's
    fixed-step Adams has the same restriction via its step-size option.
    """
    batch = y0.shape[0]
    n_out = ts.shape[0]
    dtype = y0.dtype

    # Build the full substep grid: ((n_out-1)*spi + 1,) times.
    spi = steps_per_interval
    frac = jnp.arange(spi, dtype=dtype) / spi
    grid = (ts[:-1, None] + (ts[1:] - ts[:-1])[:, None] * frac[None, :]).reshape(-1)
    grid = jnp.concatenate([grid, ts[-1:]])
    n_steps = grid.shape[0] - 1

    h = grid[1] - grid[0]
    hb = jnp.full((batch,), h, dtype)

    # Bootstrap: 3 RK4 steps to fill the f-history (k-1, k-2, k-3, k).
    ys = [y0]
    fs = [func(jnp.full((batch,), grid[0], dtype), y0)]
    nfe = 1
    y = y0
    for i in range(min(3, n_steps)):
        t_i = jnp.full((batch,), grid[i], dtype)
        y, ev = _rk4_step(func, t_i, hb, y)
        nfe += ev + 1
        ys.append(y)
        fs.append(func(jnp.full((batch,), grid[i + 1], dtype), y))

    if n_steps > 3:
        def scan_body(carry, t_next):
            y, f0, f1, f2, f3 = carry  # f3 newest
            h_c = hb[:, None]
            y_pred = y + h_c * (
                _AB4[0] * f3 + _AB4[1] * f2 + _AB4[2] * f1 + _AB4[3] * f0
            )
            f_pred = func(jnp.full((batch,), t_next, dtype), y_pred)
            y_new = y + h_c * (
                _AM3[0] * f_pred + _AM3[1] * f3 + _AM3[2] * f2 + _AM3[3] * f1
            )
            f_new = func(jnp.full((batch,), t_next, dtype), y_new)
            return (y_new, f1, f2, f3, f_new), y_new

        carry0 = (ys[3], fs[0], fs[1], fs[2], fs[3])
        _, tail = lax.scan(scan_body, carry0, grid[4:])
        nfe += 2 * (n_steps - 3)
        all_y = jnp.concatenate([jnp.stack(ys), tail], axis=0)
    else:
        all_y = jnp.stack(ys)

    # Select the requested output times from the substep grid.
    idx = jnp.arange(n_out) * spi
    idx = idx.at[-1].set(all_y.shape[0] - 1)
    out = all_y[idx]
    stats = SolveStats(
        nfe=jnp.full((batch,), nfe, jnp.int32),
        naccept=jnp.full((batch,), n_steps, jnp.int32),
        nreject=jnp.zeros((batch,), jnp.int32),
        success=jnp.ones((batch,), bool),
    )
    return out, stats


def fixed_grid_odeint(
    func: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    method: str,
    *,
    steps_per_interval: int = 1,
) -> tuple[jnp.ndarray, SolveStats]:
    """Integrate on the grid ``ts`` with a fixed-step method.

    Args/returns as :func:`..runge_kutta.adaptive_odeint` (flat ``(B, N)``
    state), minus tolerances.
    """
    if method == "fixed_adams":
        return _fixed_adams_odeint(func, y0, ts, steps_per_interval)
    step = _STEPPERS[method]
    batch = y0.shape[0]
    dtype = y0.dtype
    evals_holder = []

    def interval(y, t_pair):
        t_a, t_b = t_pair
        h = (t_b - t_a) / steps_per_interval
        hb = jnp.full((batch,), h, dtype)

        def sub(y, k):
            t_k = jnp.full((batch,), t_a, dtype) + k * hb
            y_new, ev = step(func, t_k, hb, y)
            if not evals_holder:
                evals_holder.append(ev)
            return y_new, None

        y, _ = lax.scan(sub, y, jnp.arange(steps_per_interval, dtype=dtype))
        return y, y

    _, traj = lax.scan(interval, y0, (ts[:-1], ts[1:]))
    out = jnp.concatenate([y0[None], traj], axis=0)

    n_steps = (ts.shape[0] - 1) * steps_per_interval
    nfe = evals_holder[0] * n_steps
    stats = SolveStats(
        nfe=jnp.full((batch,), nfe, jnp.int32),
        naccept=jnp.full((batch,), n_steps, jnp.int32),
        nreject=jnp.zeros((batch,), jnp.int32),
        success=jnp.ones((batch,), bool),
    )
    return out, stats


FIXED_GRID_METHODS = tuple(_STEPPERS) + ("fixed_adams",)
