"""Every dot_general in the SOLVER machinery must carry HIGHEST precision.

TPU dot_general defaults to bf16 multiplies.  That is the right default for
the model's conv dynamics (production choice, RESULTS.md) but silently
corrupts solver-side contractions: the dense-output fit einsum in
runge_kutta._dense_write produced ~400 tolerance units of output error on
easy per-sample rows (large covering dt) at tol 1e-6 until pinned — found
on-chip in round 4 (probes/r4/persample_tpu_accuracy.log).  The same class
of bug applies to dense.py's coefficient einsum (touches state data),
adams.py's predictor/corrector combinations, and adjoint.py's _tree_vdot
(IS the t-gradient).

This test traces each path with a purely elementwise dynamics function, so
any dot_general appearing in the jaxpr belongs to solver machinery — and
asserts each one is precision-pinned.  Backend-independent (a trace-level
pin), so the TPU-only numerics bug can be caught on CPU CI.
"""

import jax
import jax.numpy as jnp

from neural_ode_features_tpu.solver import odeint, odeint_adjoint
from neural_ode_features_tpu.solver.dense import odeint_dense
import pytest

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast

HIGH = jax.lax.Precision.HIGHEST


def _collect_dots(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append(eqn)
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                if hasattr(item, "jaxpr"):  # ClosedJaxpr
                    _collect_dots(item.jaxpr, out)
                elif hasattr(item, "eqns"):  # raw Jaxpr
                    _collect_dots(item, out)
    return out


def _assert_all_pinned(fn, *args, expect_dots=True):
    jaxpr = jax.make_jaxpr(fn)(*args)
    dots = _collect_dots(jaxpr.jaxpr, [])
    if expect_dots:
        assert dots, "expected solver-machinery dot_generals in the trace"
    bad = [
        e for e in dots
        if e.params.get("precision") not in ((HIGH, HIGH), HIGH)
    ]
    assert not bad, (
        f"{len(bad)} unpinned dot_general(s) in solver machinery: "
        f"{[e.params.get('precision') for e in bad]}"
    )


def _f(t, y):
    return -0.7 * y  # purely elementwise: any dot in the trace is ours


_Y0 = jnp.ones((3, 4), jnp.float32)
_TS = jnp.asarray([0.0, 0.4, 1.0], jnp.float32)


def test_adaptive_dense_write_dots_pinned():
    _assert_all_pinned(
        lambda y0: odeint(_f, y0, _TS, rtol=1e-4, atol=1e-6,
                          error_control="per_sample")[0],
        _Y0,
    )


def test_odeint_dense_dots_pinned():
    def run(y0):
        y_at, _ = odeint_dense(_f, y0, 0.0, 1.0, rtol=1e-4, atol=1e-6)
        return y_at(jnp.asarray([0.3, 0.9], jnp.float32))

    _assert_all_pinned(run, _Y0)


def test_adams_dots_pinned():
    _assert_all_pinned(
        lambda y0: odeint(_f, y0, _TS, rtol=1e-4, atol=1e-6,
                          method="adams", error_control="per_sample")[0],
        _Y0,
    )


def test_odeint_event_dots_pinned():
    from neural_ode_features_tpu.solver import odeint_event

    def run(y0):
        sol = odeint_event(
            _f, y0, 0.0, lambda t, y: y[:, 0] - 0.5, t_max=2.0,
            rtol=1e-4, atol=1e-6, error_control="per_sample",
        )
        return sol.t_event, jax.tree.leaves(sol.y_event)[0]

    _assert_all_pinned(run, _Y0)


def test_adjoint_backward_dots_pinned():
    # _tree_vdot (the t-gradient contraction) lives in the VJP: trace the
    # gradient wrt ts as well as y0 so it appears in the jaxpr.
    def loss(y0, ts):
        ys, _ = odeint_adjoint(
            lambda params, t, y: _f(t, y), None, y0, ts,
            rtol=1e-4, atol=1e-6,
        )
        return jnp.sum(ys[-1])

    _assert_all_pinned(jax.grad(loss, argnums=(0, 1)), _Y0, _TS)
