"""TPU-native ODE solver library.

The engine layer of the framework — the capability of the reference's
vendored torchdiffeq (SURVEY.md §2.2) rebuilt as compiled JAX loops with
per-sample adaptive stepping.  Public surface:

  * :func:`odeint` — forward solves, all methods.
  * :func:`odeint_adjoint` — O(1)-memory training via the augmented
    reverse-time adjoint ODE (``jax.custom_vjp``).
  * :class:`SolveStats` — functional NFE / step accounting.
"""

from .adjoint import odeint_adjoint, set_backward_nfe_tap
from .dense import DenseSolution, odeint_dense
from .event import EventSolution, odeint_event
from .event_adjoint import odeint_event_adjoint
from .odeint import SOLVERS, SolveStats, odeint

__all__ = [
    "odeint",
    "odeint_adjoint",
    "odeint_dense",
    "odeint_event",
    "odeint_event_adjoint",
    "DenseSolution",
    "EventSolution",
    "set_backward_nfe_tap",
    "SolveStats",
    "SOLVERS",
]
