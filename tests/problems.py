"""Analytic-solution ODE fixtures for solver tests.

Same strategy as the reference's solver test suite (reference:
torchdiffeq/tests/problems.py — UNVERIFIED, empty mount, SURVEY.md §4):
problems with closed-form solutions, evaluated at requested times, so solver
output can be compared against exact trajectories.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Problem:
    name: str
    func: Callable  # func(t, y) -> dy/dt; t scalar or (B,), y (B, D)
    exact: Callable  # exact(t (T,), y0 (B, D)) -> (T, B, D)
    y0: np.ndarray  # (B, D)
    # Tolerance multiplier for "solution error < mult * rtol" style checks.
    hardness: float = 1.0


def _col(t):
    """Broadcast scalar-or-(B,) time against (B, D) states."""
    t = jnp.asarray(t)
    return t[..., None] if t.ndim else t


# dy/dt = λ y, y(t) = y0 exp(λ (t - t0));  per-sample λ for NFE-divergence
# tests (each row decays at a different rate → different step sequences).
_EXP_LAMBDA = np.array([-0.5, -1.0, -2.0, -4.0])


def _exp_func(t, y):
    lam = jnp.asarray(_EXP_LAMBDA, y.dtype)[: y.shape[0], None]
    return lam * y


def _exp_exact(ts, y0):
    lam = _EXP_LAMBDA[: y0.shape[0], None]
    return np.exp(lam[None] * (np.asarray(ts)[:, None, None] - 0.0)) * y0[None]


EXPONENTIAL = Problem(
    name="exponential",
    func=_exp_func,
    exact=_exp_exact,
    y0=np.array([[1.0, 2.0], [1.0, -1.0], [0.5, 1.5], [2.0, 0.25]]),
)


# Harmonic oscillator as a 2-D linear system: y'' = -ω² y.
_OMEGA = 3.0


def _sine_func(t, y):
    pos, vel = y[..., 0], y[..., 1]
    return jnp.stack([vel, -(_OMEGA**2) * pos], axis=-1)


def _sine_exact(ts, y0):
    ts = np.asarray(ts)[:, None]
    pos0, vel0 = y0[None, :, 0], y0[None, :, 1]
    pos = pos0 * np.cos(_OMEGA * ts) + vel0 / _OMEGA * np.sin(_OMEGA * ts)
    vel = -pos0 * _OMEGA * np.sin(_OMEGA * ts) + vel0 * np.cos(_OMEGA * ts)
    return np.stack([pos, vel], axis=-1)


SINE = Problem(
    name="sine",
    func=_sine_func,
    exact=_sine_exact,
    y0=np.array([[1.0, 0.0], [0.0, 3.0], [1.0, 1.0]]),
    hardness=20.0,
)


# Non-autonomous scalar problem: dy/dt = y * cos(t)  →  y = y0 exp(sin t).
# Exercises genuine t-dependence (ConcatConv-style dynamics) and t-grads.
def _nonauto_func(t, y):
    return y * jnp.cos(_col(t))


def _nonauto_exact(ts, y0):
    return np.exp(np.sin(np.asarray(ts)))[:, None, None] * y0[None]


NONAUTONOMOUS = Problem(
    name="nonautonomous",
    func=_nonauto_func,
    exact=_nonauto_exact,
    y0=np.array([[1.0], [2.0], [-0.5]]),
    hardness=5.0,
)


# Quartic polynomial dynamics: dy/dt = 5 t^4  →  y = y0 + t^5.  A 5th-order
# method solves this to machine precision in one step; catches tableau typos.
def _poly_func(t, y):
    return jnp.broadcast_to(5.0 * _col(t) ** 4, y.shape).astype(y.dtype)


def _poly_exact(ts, y0):
    return y0[None] + (np.asarray(ts) ** 5)[:, None, None]


POLYNOMIAL = Problem(
    name="polynomial",
    func=_poly_func,
    exact=_poly_exact,
    y0=np.array([[0.0], [1.0]]),
)


ALL_PROBLEMS = [EXPONENTIAL, SINE, NONAUTONOMOUS, POLYNOMIAL]


# Stiffness-spread batch for per-sample adaptivity tests: identical structure,
# wildly different step-size requirements per row.
STIFF_LAMBDA = np.array([-0.1, -1.0, -10.0, -100.0])
STIFF_Y0 = np.ones((4, 1))


def stiff_func_for(lams):
    """Dynamics factory: dy/dt = λ_b y for an explicit per-row λ vector."""
    lams = np.asarray(lams)

    def func(t, y):
        return jnp.asarray(lams, y.dtype)[:, None] * y

    return func


def stiff_spread_exact(ts, y0, lams=STIFF_LAMBDA):
    lam = np.asarray(lams)[:, None]
    return np.exp(lam[None] * np.asarray(ts)[:, None, None]) * y0[None]
