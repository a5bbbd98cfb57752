"""Adjoint-method gradients: O(1)-memory backprop through ``odeint``.

Capability parity with the reference's ``odeint_adjoint`` (reference:
torchdiffeq/_impl/adjoint.py ``OdeintAdjointMethod`` / ``augmented_dynamics``
— UNVERIFIED, empty mount, SURVEY.md §0/§3.4), rebuilt as a
``jax.custom_vjp``:

  * Forward: a plain :func:`~.odeint.odeint` solve (no tape).
  * Backward: integrate the augmented state ``(y, a_y, a_θ, a_t)`` in reverse
    time interval-by-interval with ``lax.scan``, restarting ``y`` from the
    stored observation at each grid point (exactly the reference's scheme —
    bounded drift) and adding the incoming cotangent ``g_i`` to ``a_y`` at
    each observation time.  The vector–Jacobian products
    ``a_y·∂f/∂{y,θ,t}`` come from one ``jax.vjp`` per dynamics evaluation.
  * ``adjoint_mode='interpolated'`` (Daulbaev et al. 2020, arXiv:2003.05271,
    PAPERS.md): the forward runs as a dense solve
    (:func:`~.dense.odeint_dense`) and the backward *interpolates* y(t) from
    the stored piecewise polynomials instead of co-integrating it — the
    augmented state shrinks to ``(a_y, a_θ, a_t)``, y never drifts, and the
    backward error control no longer couples to y.  Costs
    O(dense_max_steps·(order+1)·B·N) memory for the coefficient buffer
    (no longer O(1) in depth — the classic trade-off).
  * Gradients w.r.t. the observation times ``ts`` are produced too:
    ``dL/dt_i = g_i · f(t_i, y_i)`` for i ≥ 1 and the accumulated
    ``a_t(t_0)`` for the initial time.

The dynamics signature here is ``func(params, t, y)`` with *explicit*
parameters — the differentiable quantities must be positional arguments of
the ``custom_vjp`` function, which is why the model layer passes its
parameter pytree explicitly rather than closing over it.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.experimental
import jax.numpy as jnp
from jax import lax

from .odeint import odeint

__all__ = ["odeint_adjoint", "set_backward_nfe_tap"]

# Backward-NFE observability: the reference logs NFE-backward per batch by
# reading a mutable counter (train.py:~170, UNVERIFIED).  Functionally the
# backward NFE is internal to the custom_vjp, exposed two ways:
#
#   1. ``nfe_sink`` side-channel (preferred, works on every backend): pass a
#      scalar ``nfe_sink`` and differentiate w.r.t. it — its "gradient" IS the
#      total backward-solve NFE (an f32 count, NOT a calculus derivative; the
#      primal output never depends on the sink).  This is how train steps log
#      nfe_b on TPU, where io_callback is unimplemented.
#   2. ``set_backward_nfe_tap(fn)`` host tap via ``io_callback`` (legacy;
#      CPU-only on axon).  Leave unset for zero overhead.
_BACKWARD_NFE_TAP = None


def _sink_derived_from_traced_inputs(sink) -> bool:
    """Best-effort trace-time misuse detection for ``nfe_sink`` (VERDICT r3
    #7 / ADVICE r2 residue).

    ``nfe_sink``'s VJP is deliberately non-linear (a fixed eval count,
    independent of the incoming cotangent), so a sink COMPUTED from traced
    values chain-rules that count into real gradients.  Under ``jit`` the
    dependence is visible in the in-flight jaxpr frame: walk the equations
    backwards from the sink's variable and report True iff it transitively
    reads any traced function input (an *invar*).  ``stop_gradient`` cuts
    the walk — gradient flow stops there, so upstream dependence is safe.

    Detection scope (documented in :func:`odeint_adjoint`): only values
    traced by the ENCLOSING jit frame are visible.  Under a bare
    ``jax.grad`` (no jit) the sink's primal is concrete and derivation is
    undetectable — that path stays a caller contract.  Any internal-API
    drift degrades to "no check" rather than a crash.
    """
    try:
        from jax._src.core import Literal, Var
        from jax._src.interpreters.partial_eval import DynamicJaxprTracer
    except Exception:  # pragma: no cover - jax internals moved
        return False
    t, hops = sink, 0
    # Unwrap JVP/batch tracer layers (grad-of-jit, vmap-of-jit) down to the
    # dynamic-jaxpr tracer that carries the frame.  JVPTracer carries its
    # inner tracer as ``.primal``; BatchTracer (vmap) carries it as ``.val``
    # — follow either, or the vmap-of-jit path is silently undetectable.
    while not isinstance(t, DynamicJaxprTracer) and hops < 8:
        nxt = getattr(t, "primal", None)
        if nxt is None:
            nxt = getattr(t, "val", None)
        if nxt is None or nxt is t:
            return False
        t, hops = nxt, hops + 1
    if not isinstance(t, DynamicJaxprTracer):
        return False
    try:
        frame = t._trace.frame
        var = getattr(t, "val", None)
        if var is None or isinstance(var, Literal):
            return False
        invars = set(frame.invars)
        if var in invars:
            # The sink IS a function argument — independent by construction
            # (this is exactly the documented correct usage).
            return False
        active = {var}
        for eqn in frame.get_eqns()[::-1]:
            produced = set(eqn.outvars) & active
            if not produced:
                continue
            active -= produced
            if eqn.primitive.name == "stop_gradient":
                continue
            active.update(v for v in eqn.invars if isinstance(v, Var))
        return bool(active & invars)
    except Exception:  # pragma: no cover - jax internals moved
        return False


def set_backward_nfe_tap(fn) -> None:
    """Register ``fn(nfe: int) -> None`` to observe backward-solve NFE
    (pass ``None`` to disable).

    Caveats: the tap is read at *trace* time — register it before the first
    backward pass is compiled (already-cached executables are unaffected).
    It relies on ``jax.experimental.io_callback``, which some PJRT backends
    (the axon remote TPU) do not implement; leave unset there."""
    global _BACKWARD_NFE_TAP
    _BACKWARD_NFE_TAP = fn


def _tree_vdot(a: Any, b: Any) -> jnp.ndarray:
    # precision pin: vdot lowers to a dot_general, which TPU multiplies in
    # bf16 by default — this contraction IS the t-gradient (g·f), so it must
    # run in f32 (same class as runge_kutta._dense_write's pin).
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return sum(
        jnp.vdot(x, y, precision=jax.lax.Precision.HIGHEST)
        for x, y in zip(leaves_a, leaves_b, strict=True)
    )


def _freeze(d: dict) -> tuple:
    return tuple(sorted(d.items()))


def _thaw(t: tuple) -> dict:
    return dict(t)


_ADJOINT_ONLY_KEYS = ("adjoint_rtol", "adjoint_atol", "adjoint_max_steps",
                      "adjoint_seminorm", "adjoint_mode", "dense_max_steps")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _odeint_adjoint(func, cfg, params, y0, ts, nfe_sink):
    # ``nfe_sink`` is a pure side-channel: the primal ignores it, but _bwd
    # returns the total backward-solve NFE as its cotangent (see module
    # comment above) so callers can observe nfe_b through jax.grad.
    del nfe_sink
    kw = _thaw(cfg)
    for k in _ADJOINT_ONLY_KEYS:
        kw.pop(k, None)
    ys, stats = odeint(lambda t, y: func(params, t, y), y0, ts, **kw)
    return ys, stats


def _fwd(func, cfg, params, y0, ts, nfe_sink):
    del nfe_sink
    kw = _thaw(cfg)
    if kw.get("adjoint_mode") == "interpolated" and ts.shape[0] >= 2:
        # Dense forward: same solver/tolerances, but keep every accepted
        # step's interpolation record so the backward can evaluate y(t).
        from .dense import odeint_dense

        y_at, stats = odeint_dense(
            lambda t, y: func(params, t, y),
            y0,
            ts[0],
            ts[-1],
            rtol=kw.get("rtol", 1e-7),
            atol=kw.get("atol", 1e-9),
            method=kw.get("method", "dopri5"),
            error_control=kw.get("error_control", "global"),
            max_steps=kw.get("dense_max_steps", 256),
            controller=kw.get("controller", "i"),
        )
        ys = y_at(ts)
        # Residuals must be array pytrees: store the DenseSolution record,
        # not the evaluator closure; _bwd rebuilds the unravel from y0.
        # The forward's success flags ride along: a truncated dense solve
        # (dense_max_steps exhausted) must poison gradients, not silently
        # clamp-extrapolate.
        fwd_ok = jnp.all(stats.success)
        return (ys, stats), (params, y0, ts, ys,
                             (y_at.__wrapped_sol__, fwd_ok))
    out = _odeint_adjoint(func, cfg, params, y0, ts, jnp.zeros(()))
    ys, _stats = out
    return out, (params, y0, ts, ys, None)


def _bwd(func, cfg, residuals, cotangents):
    params, y0, ts, ys, dense_res = residuals
    g_ys, _g_stats = cotangents
    kw = _thaw(cfg)
    interpolated = (kw.get("adjoint_mode") == "interpolated"
                    and dense_res is not None)
    fwd_ok = jnp.asarray(True)
    if interpolated:
        dense_sol, fwd_ok = dense_res
        from .ravel import ravel_batched, ravel_full

        ravel = (ravel_batched
                 if kw.get("error_control", "global") == "per_sample"
                 else ravel_full)
        _, unravel_y, _ = ravel(y0)

        def y_at(t):
            return jax.tree.map(
                lambda leaf: leaf[0], unravel_y(dense_sol.evaluate_flat(t))
            )

    def _override(opt_key, base_key, default):
        v = kw.get(opt_key)
        return kw.get(base_key, default) if v is None else v

    rtol = _override("adjoint_rtol", "rtol", 1e-7)
    atol = _override("adjoint_atol", "atol", 1e-9)
    solve_kw = dict(
        rtol=rtol,
        atol=atol,
        method=kw.get("method", "dopri5"),
        max_steps=_override("adjoint_max_steps", "max_steps", 2**14),
        # The augmented state couples every sample through shared a_θ, so the
        # backward solve always uses batch-global error control (as the
        # reference does for everything).
        error_control="global",
        unroll=kw.get("unroll", "while"),
        steps_per_interval=kw.get("steps_per_interval", 1),
        # PI control applies to the reverse augmented solve too (it is just
        # another adaptive tableau integration).
        controller=kw.get("controller", "i"),
    )
    if kw.get("adjoint_seminorm") and not interpolated:
        # Seminorm adjoint (Kidger et al. 2020, arXiv:2009.09457): control
        # backward error only on (y, a_y); the a_θ / a_t columns are pure
        # integrals that cannot feed back into the dynamics, so excluding
        # them from the accept/reject norm cuts backward NFE with no
        # first-order effect on gradient accuracy.
        solve_kw["error_mask"] = {
            "y": jax.tree.map(lambda _: 1.0, y0),
            "a_y": jax.tree.map(lambda _: 1.0, y0),
            "a_p": jax.tree.map(lambda _: 0.0, params),
            "a_t": 0.0,
        }
    elif kw.get("adjoint_seminorm") and interpolated:
        solve_kw["error_mask"] = {
            "a_y": jax.tree.map(lambda _: 1.0, y0),
            "a_p": jax.tree.map(lambda _: 0.0, params),
            "a_t": 0.0,
        }

    # Honour the forward's time-argument contract in the backward too: with
    # error_control='per_sample' the forward calls func with t of shape
    # (B,), so a func written to that contract (e.g. ``y * t[:, None]``)
    # must not suddenly receive a 0-d t inside jax.grad just because the
    # augmented solve itself runs batch-global. broadcast_to is linear, so
    # jax.vjp still returns a scalar t-cotangent (code-review r3).
    if kw.get("error_control", "global") == "per_sample":
        _bsz = jax.tree.leaves(y0)[0].shape[0]
        _t_arg = lambda t_: jnp.broadcast_to(t_, (_bsz,))
    else:
        _t_arg = lambda t_: t_

    def f_closed(p, t_, y_):
        return func(p, _t_arg(t_), y_)

    def aug_dynamics(t, aug):
        y, a_y = aug["y"], aug["a_y"]
        f_val, vjp_fn = jax.vjp(f_closed, params, t, y)
        v_p, v_t, v_y = vjp_fn(a_y)
        return {
            "y": f_val,
            "a_y": jax.tree.map(jnp.negative, v_y),
            "a_p": jax.tree.map(jnp.negative, v_p),
            "a_t": -v_t,
        }

    def aug_dynamics_interp(t, aug):
        # y(t) comes from the forward's dense solution — not integrated.
        y = y_at(t)
        _, vjp_fn = jax.vjp(f_closed, params, t, y)
        v_p, v_t, v_y = vjp_fn(aug["a_y"])
        return {
            "a_y": jax.tree.map(jnp.negative, v_y),
            "a_p": jax.tree.map(jnp.negative, v_p),
            "a_t": -v_t,
        }

    n_times = ts.shape[0]
    t_dtype = ts.dtype

    a_y0 = jax.tree.map(jnp.zeros_like, y0)
    a_p0 = jax.tree.map(jnp.zeros_like, params)
    a_t0 = jnp.zeros((), t_dtype)

    if n_times < 2:
        a_y = jax.tree.map(
            lambda g, z: z + g[0], g_ys, a_y0
        )
        return a_p0, a_y, jnp.zeros_like(ts), jnp.zeros((), jnp.float32)

    def interval(carry, xs):
        a_y, a_p, a_t = carry
        t_hi, t_lo, g_i, y_i = xs

        a_y = jax.tree.map(lambda a, g: a + g, a_y, g_i)
        # dL/dt_i from shifting the i-th observation time.
        f_i = func(params, _t_arg(t_hi), y_i)
        g_t_i = _tree_vdot(g_i, f_i).astype(t_dtype)
        a_t = a_t - g_t_i

        if interpolated:
            aug0 = {"a_y": a_y, "a_p": a_p, "a_t": a_t}
            dyn = aug_dynamics_interp
        else:
            aug0 = {"y": y_i, "a_y": a_y, "a_p": a_p, "a_t": a_t}
            dyn = aug_dynamics
        span = jnp.stack([t_hi, t_lo])
        aug_traj, aug_stats = odeint(dyn, aug0, span, **solve_kw)
        aug1 = jax.tree.map(lambda x: x[-1], aug_traj)
        return (
            (aug1["a_y"], aug1["a_p"], aug1["a_t"]),
            (g_t_i, aug_stats.nfe[0], aug_stats.success[0]),
        )

    # Reverse-ordered per-interval inputs: i = T-1 … 1.
    rev = lambda x: jnp.flip(x, axis=0)
    xs = (
        rev(ts[1:]),
        rev(ts[:-1]),
        jax.tree.map(lambda g: rev(g[1:]), g_ys),
        jax.tree.map(lambda y: rev(y[1:]), ys),
    )
    (a_y, a_p, a_t), (g_t_rev, nfe_b, ok) = lax.scan(
        interval, (a_y0, a_p0, a_t0), xs
    )

    # Total backward dynamics evaluations: the augmented solves PLUS the
    # one direct f(t_i, y_i) eval per interval used for the observation-
    # time gradients (T-1 of them) — omitting those undercounted nfe_b
    # versus the reference's counter semantics (code-review r3).
    nfe_b_sum = jnp.sum(nfe_b) + jnp.asarray(n_times - 1, nfe_b.dtype)

    if _BACKWARD_NFE_TAP is not None:
        jax.experimental.io_callback(
            _BACKWARD_NFE_TAP, None, nfe_b_sum, ordered=False
        )

    a_y = jax.tree.map(lambda a, g: a + g[0], a_y, g_ys)
    grad_ts = jnp.zeros_like(ts).at[1:].set(rev(g_t_rev)).at[0].set(a_t)

    # A failed backward solve (max_steps exhausted — e.g. atol=0 with
    # exactly-zero augmented components making the relative norm infinite)
    # must not masquerade as zero gradients: poison them with NaN so the
    # caller sees the failure.
    all_ok = jnp.all(ok) & fwd_ok
    poison = lambda g: jnp.where(all_ok, g, jnp.full_like(g, jnp.nan))
    a_p = jax.tree.map(poison, a_p)
    a_y = jax.tree.map(poison, a_y)
    # The sink cotangent is diagnostics, not a derivative: total backward
    # dynamics evaluations, independent of the incoming cotangent scale.
    # Deliberately NOT poisoned — it stays readable when a solve fails.
    nfe_b_total = nfe_b_sum.astype(jnp.float32)
    return a_p, a_y, poison(grad_ts), nfe_b_total


_odeint_adjoint.defvjp(_fwd, _bwd)


def odeint_adjoint(
    func: Callable[[Any, Any, Any], Any],
    params: Any,
    y0: Any,
    ts: jnp.ndarray,
    *,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: str = "dopri5",
    error_control: str = "global",
    max_steps: int = 2**14,
    unroll: str = "while",
    steps_per_interval: int = 1,
    controller: str = "i",
    adjoint_rtol: float | None = None,
    adjoint_atol: float | None = None,
    adjoint_max_steps: int | None = None,
    adjoint_seminorm: bool = False,
    adjoint_mode: str = "reintegrate",
    dense_max_steps: int = 256,
    nfe_sink: jnp.ndarray | None = None,
):
    """Like :func:`~.odeint.odeint` but differentiable w.r.t. ``params``,
    ``y0`` and ``ts`` via the augmented reverse-time adjoint ODE.

    ``func(params, t, y)`` must be a pure function of its explicit arguments.
    ``adjoint_{rtol,atol,max_steps}`` override the backward-solve tolerances
    (default: same as forward).  ``controller`` ('i' | 'pi', see
    :func:`~.odeint.odeint`) applies to the forward AND the reverse
    augmented solve.  ``adjoint_mode``: ``'reintegrate'`` (the
    reference's O(1)-memory scheme) or ``'interpolated'`` (backward reads
    y(t) from the forward's dense solution — see module docstring;
    ``dense_max_steps`` bounds the forward's step/coefficient buffer).
    ``adjoint_seminorm=True`` restricts the
    backward error norm to the (y, a_y) columns — typically 20-60% fewer
    backward NFE at equal gradient quality (Kidger et al. 2020).

    Time-argument contract: with ``error_control='per_sample'`` the func
    receives ``t`` of shape ``(B,)`` in the forward AND in the backward —
    the augmented solve itself runs batch-global, but the wrapper
    broadcasts ``t`` so a strictly per-sample func keeps working under
    ``jax.grad``.

    ``nfe_sink``: optional scalar side-channel for backward-NFE accounting
    (the reference's ``nfe`` counter read after ``.backward()``,
    train.py:~170 UNVERIFIED).  The primal output ignores it, but its
    *cotangent* under ``jax.grad`` is the total number of backward dynamics
    evaluations (f32 count, not a calculus derivative) — the augmented
    solves plus the one direct ``f(t_i, y_i)`` per observation interval
    used for time gradients, matching the reference counter, which those
    evals also increment (adjoint.py:~70 UNVERIFIED).  Backend-portable,
    unlike the legacy :func:`set_backward_nfe_tap` io_callback hook::

        def loss(params, sink):
            ys, _ = odeint_adjoint(f, params, y0, ts, nfe_sink=sink)
            return ys[-1].sum()
        grads, nfe_b = jax.grad(loss, argnums=(0, 1))(params, jnp.zeros(()))

    **The sink must be an INDEPENDENT scalar** (a fresh ``jnp.zeros(())``
    leaf, never a value computed from ``params``/``y0``/``ts``): its VJP is
    deliberately non-linear (a fixed count, independent of the incoming
    cotangent), so a sink derived from traced values would chain-rule the
    count into real gradients, and ``jax.jvp``/``linearize`` through it
    would be wrong (ADVICE r2).  A 0-d shape is enforced, and under ``jit``
    a derived sink is REJECTED at trace time (the in-flight jaxpr frame is
    walked backwards from the sink; transitive dependence on any traced
    input raises, with ``stop_gradient`` cutting the walk since it also
    cuts the chain rule).  Outside jit — a bare ``jax.grad`` where primals
    are concrete — derivation is undetectable and remains the caller's
    contract; misuse there corrupts gradients silently::

        # WRONG: grads wrt params gain +nfe_b * d(mean)/d(params)
        odeint_adjoint(f, params, y0, ts, nfe_sink=params["w"].mean())

    Returns ``(ys, SolveStats)``; the stats carry no gradient.
    """
    # Reject invalid combinations HERE, where the caller passed them — not
    # three frames deep inside the VJP trace (or, worse, only on the first
    # jax.grad after a silently-working primal). (code-review r3)
    from .fixed_grid import FIXED_GRID_METHODS
    from .tableau import ADAPTIVE_TABLEAUS

    if adjoint_seminorm and method in FIXED_GRID_METHODS:
        raise ValueError(
            "adjoint_seminorm controls the backward solve's adaptive error"
            f" norm; method={method!r} is fixed-grid and has no error"
            " control to restrict"
        )
    if adjoint_mode == "interpolated" and method not in ADAPTIVE_TABLEAUS:
        raise ValueError(
            "adjoint_mode='interpolated' needs the forward's dense solution"
            f" (odeint_dense), which supports adaptive RK methods only —"
            f" not {method!r}"
        )
    cfg = _freeze(
        dict(
            rtol=rtol,
            atol=atol,
            method=method,
            error_control=error_control,
            max_steps=max_steps,
            unroll=unroll,
            steps_per_interval=steps_per_interval,
            controller=controller,
            adjoint_rtol=adjoint_rtol,
            adjoint_atol=adjoint_atol,
            adjoint_max_steps=adjoint_max_steps,
            adjoint_seminorm=adjoint_seminorm,
            adjoint_mode=adjoint_mode,
            dense_max_steps=dense_max_steps,
        )
    )
    if nfe_sink is None:
        nfe_sink = jnp.zeros(())
    if jnp.shape(nfe_sink) != ():
        raise ValueError(
            f"nfe_sink must be a 0-d scalar (got shape {jnp.shape(nfe_sink)});"
            " see the docstring — it must also be INDEPENDENT of"
            " params/y0/ts or its count-valued cotangent leaks into real"
            " gradients"
        )
    if _sink_derived_from_traced_inputs(nfe_sink):
        raise ValueError(
            "nfe_sink was COMPUTED from traced inputs of the enclosing jit"
            " (it transitively reads a traced function argument). Its VJP is"
            " a raw eval count, not a derivative — a derived sink"
            " chain-rules that count into the real gradients of whatever it"
            " was computed from. Pass an independent scalar instead: a fresh"
            " jnp.zeros(()) (created inside or outside jit), a dedicated"
            " function argument differentiated via its own argnum, or wrap"
            " the derivation in jax.lax.stop_gradient(...) if you truly"
            " need a data-dependent initial value."
        )
    return _odeint_adjoint(func, cfg, params, y0, jnp.asarray(ts), nfe_sink)
