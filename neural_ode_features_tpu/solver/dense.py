"""Continuous-solution API: solve once, evaluate y(t) anywhere afterwards.

The reference's signature capability is features at arbitrary t from one
solve, but its (and our) ``odeint`` needs the t-grid *up front*.  This module
removes that restriction: :func:`odeint_dense` returns a
:class:`DenseSolution` — the per-step interpolation coefficients of every
accepted step — which can be evaluated at any t ∈ [t0, t1] later, on or off
device, under jit, without re-solving (the scipy ``dense_output`` /
diffrax ``SaveAt(dense=True)`` capability, TPU-native: evaluation is a
vectorised per-sample segment lookup + Horner pass).

Memory: O(max_steps · (order+1) · B · N) for the coefficient buffer — choose
``max_steps`` to fit (it is also the solve-iteration bound, so ~3× the
expected accepted steps is right).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .ravel import ravel_batched, ravel_full
from .runge_kutta import (
    SolveStats,
    _error_ratio,
    _optimal_dt,
    _optimal_dt_pi,
    _rk_attempt,
    _select_initial_step,
)
from .tableau import ADAPTIVE_TABLEAUS, CUBIC_FIT, QUARTIC_FIT

__all__ = ["odeint_dense", "DenseSolution"]


class DenseSolution(NamedTuple):
    """Piecewise-polynomial continuous solution (a pytree — jit/vmap-safe).

    Fields are per accepted step s and sample b; ``unravel`` restores the
    original state pytree structure on evaluation.
    """

    t0s: jnp.ndarray  # (S, B) step start times (monotonic in direction)
    dts: jnp.ndarray  # (S, B) signed step sizes
    coeffs: jnp.ndarray  # (S, D+1, B, N) monomial coefficients on x∈[0,1]
    naccept: jnp.ndarray  # (B,) valid step count per sample
    direction: jnp.ndarray  # () sign of integration
    t_span: jnp.ndarray  # (2,) [t0, t1]

    def evaluate_flat(self, t) -> jnp.ndarray:
        """y(t) as the flat (B, N) matrix; ``t``: scalar or (T,) → (T, B, N).

        Queries outside [t0, t1] are clamped to the span endpoints (the last
        accepted step generally overshoots t1, so the clamp must happen in
        t-space, not on the within-step coordinate)."""
        t_arr = jnp.atleast_1d(jnp.asarray(t, self.t0s.dtype))  # (T,)
        d = self.direction
        t_arr = d * jnp.clip(d * t_arr, d * self.t_span[0], d * self.t_span[1])
        # Segment lookup per sample: last step with direction*(t - t0s) >= 0,
        # clipped to the valid range [0, naccept-1].
        key = self.direction * self.t0s  # (S, B), ascending over valid steps
        q = self.direction * t_arr  # (T,)

        def per_sample(key_b, nacc_b, t0_b, dt_b, coef_b):
            # key_b (S,), coef_b (S, D+1, N)
            # invalid (unwritten) slots hold 0 — force them beyond any query
            s_idx = jnp.arange(key_b.shape[0])
            key_valid = jnp.where(s_idx < nacc_b, key_b, jnp.inf)
            k = jnp.clip(
                jnp.searchsorted(key_valid, q, side="right") - 1,
                0,
                jnp.maximum(nacc_b - 1, 0),
            )  # (T,)
            x = jnp.clip((t_arr - t0_b[k]) / dt_b[k], 0.0, 1.0)  # (T,)
            c = coef_b[k]  # (T, D+1, N)
            val = c[:, -1, :]
            for i in range(c.shape[1] - 2, -1, -1):
                val = val * x[:, None] + c[:, i, :]
            return val  # (T, N)

        out = jax.vmap(per_sample, in_axes=(1, 0, 1, 1, 2), out_axes=1)(
            key, self.naccept, self.t0s, self.dts, self.coeffs
        )  # (T, B, N)
        return out


def odeint_dense(
    func: Callable[[Any, Any], Any],
    y0: Any,
    t0: float,
    t1: float,
    *,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: str = "dopri5",
    error_control: str = "global",
    max_steps: int = 256,
    first_step: float | None = None,
    controller: str = "i",
) -> tuple[Callable[[Any], Any], SolveStats]:
    """Solve over [t0, t1] once; return ``(y_at, stats)`` where ``y_at(t)``
    evaluates the continuous solution at any scalar-or-vector ``t`` in the
    span (clamped at the ends), returning the state pytree with a leading
    time axis for vector ``t``.

    ``max_steps`` bounds BOTH the solve iterations and the coefficient-buffer
    size — keep it ~3× the expected accepted steps.
    """
    if method not in ADAPTIVE_TABLEAUS:
        raise ValueError(
            f"odeint_dense supports adaptive RK methods, got {method!r}"
        )
    tableau = ADAPTIVE_TABLEAUS[method]
    if not tableau.fsal:  # pragma: no cover - all shipped tableaus are FSAL
        raise NotImplementedError(
            "odeint_dense assumes an FSAL tableau (f1 = last stage); "
            f"{method!r} is not FSAL"
        )
    if error_control == "per_sample":
        flat0, unravel, flatten = ravel_batched(y0)
    elif error_control == "global":
        flat0, unravel, flatten = ravel_full(y0)
    else:
        raise ValueError(f"unknown error_control {error_control!r}")

    def flat_func(t, y_flat):
        if error_control == "global":
            return flatten(func(t[0], unravel(y_flat)))
        return flatten(func(t, unravel(y_flat)))

    dtype = flat0.dtype
    batch, n = flat0.shape
    span = jnp.asarray([t0, t1], dtype)
    direction = jnp.sign(span[1] - span[0])

    quartic = tableau.c_mid is not None
    n_coef = 5 if quartic else 4
    fit = jnp.asarray(QUARTIC_FIT if quartic else CUBIC_FIT, dtype)

    t_init = jnp.full((batch,), span[0], dtype)
    f_init = flat_func(t_init, flat0)
    nfe0 = jnp.ones((batch,), jnp.int32)
    if first_step is None:
        dt0 = _select_initial_step(
            flat_func, t_init, flat0, f_init, direction, rtol, atol,
            tableau.order - 1,
        )
        nfe0 = nfe0 + 1
    else:
        dt0 = jnp.full((batch,), first_step, dtype) * direction

    carry0 = dict(
        t=t_init, dt=dt0, y=flat0, f=f_init,
        t0s=jnp.zeros((max_steps, batch), dtype),
        dts=jnp.ones((max_steps, batch), dtype),
        coeffs=jnp.zeros((max_steps, n_coef, batch, n), dtype),
        nfe=nfe0,
        naccept=jnp.zeros((batch,), jnp.int32),
        nreject=jnp.zeros((batch,), jnp.int32),
        done=jnp.zeros((batch,), bool),
        iters=jnp.zeros((), jnp.int32),
        rprev=jnp.ones((batch,), dtype),
    )

    def body(c):
        active = ~c.get("done")
        t0_, dt, y0_, f0 = c["t"], c["dt"], c["y"], c["f"]

        y1, err, f1, new_evals, parts_fn = _rk_attempt(
            tableau, flat_func, t0_, dt, y0_, f0, dtype
        )
        data = jnp.stack(parts_fn())  # this solver STORES coeffs
        ratio = _error_ratio(err, y0_, y1, rtol, atol)
        accept = (ratio <= 1.0) & active
        t1_ = t0_ + dt

        # precision pin: TPU dots default to bf16 multiplies; this one
        # touches the stored state data itself (see runge_kutta._dense_write).
        coef = jnp.einsum("cd,dbn->cbn", fit, data,
                          precision=lax.Precision.HIGHEST)  # (D+1, B, N)

        # Per-sample scatter of this step's record at row naccept[b].
        slot = jnp.minimum(c["naccept"], max_steps - 1)  # (B,)
        bidx = jnp.arange(batch)
        t0s = c["t0s"].at[slot, bidx].set(
            jnp.where(accept, t0_, c["t0s"][slot, bidx])
        )
        dts = c["dts"].at[slot, bidx].set(
            jnp.where(accept, dt, c["dts"][slot, bidx])
        )
        coeffs = c["coeffs"].at[slot, :, bidx, :].set(
            jnp.where(accept[:, None, None],
                      jnp.moveaxis(coef, 1, 0),
                      c["coeffs"][slot, :, bidx, :])
        )

        if controller == "pi":
            proposed = _optimal_dt_pi(dt, ratio, c["rprev"], accept,
                                      tableau.order, 0.9, 10.0, 0.2)
            rprev = jnp.where(accept & active,
                              jnp.maximum(ratio, 1e-4), c["rprev"])
        else:
            proposed = _optimal_dt(dt, ratio, accept, tableau.order,
                                   0.9, 10.0, 0.2)
            rprev = c["rprev"]
        new_dt = jnp.where(active, proposed, dt)
        reached = accept & (direction * (t1_ - span[1]) >= 0.0)
        acc_col = accept[:, None]
        return dict(
            t=jnp.where(accept, t1_, t0_),
            dt=new_dt,
            y=jnp.where(acc_col, y1, y0_),
            f=jnp.where(acc_col, f1, f0),
            t0s=t0s, dts=dts, coeffs=coeffs,
            nfe=c["nfe"] + jnp.where(active, new_evals, 0),
            naccept=c["naccept"] + accept.astype(jnp.int32),
            nreject=c["nreject"] + (active & ~accept).astype(jnp.int32),
            done=c["done"] | reached,
            iters=c["iters"] + 1,
            rprev=rprev,
        )

    final = lax.while_loop(
        lambda c: (~jnp.all(c["done"])) & (c["iters"] < max_steps),
        body, carry0,
    )

    sol = DenseSolution(
        t0s=final["t0s"],
        dts=final["dts"],
        coeffs=final["coeffs"],
        naccept=final["naccept"],
        direction=direction,
        t_span=span,
    )
    stats = SolveStats(
        nfe=final["nfe"], naccept=final["naccept"],
        nreject=final["nreject"], success=final["done"],
    )

    def y_at(t):
        flat = sol.evaluate_flat(t)
        scalar = jnp.asarray(t).ndim == 0
        tree = unravel(flat)
        if scalar:
            return jax.tree.map(lambda leaf: leaf[0], tree)
        return tree

    # The raw record, for callers that must carry the solution through
    # pytree-only boundaries (e.g. custom_vjp residuals in adjoint.py).
    y_at.__wrapped_sol__ = sol
    return y_at, stats
