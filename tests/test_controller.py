"""PI step-size controller tests (``controller='pi'``).

No reference counterpart — torchdiffeq ships I (integral) control only
(reference: torchdiffeq/_impl/misc.py ``_optimal_step_size`` — UNVERIFIED,
empty mount), so the default stays ``'i'`` for exact NFE parity and these
tests pin the *opt-in* PI behaviour instead:

  1. accuracy is untouched (acceptance is controller-independent),
  2. smooth-problem NFE stays at parity with the I controller,
  3. rejections collapse on stiffness-limited dynamics (the whole point),
  4. the flag threads through every entry point (odeint / dense / adjoint /
     model config) and is rejected where it can't apply.

The shipped β-pair (1.0, 0.1) was chosen by the measurement reproduced in
``test_pi_smooth_nfe_parity`` / ``test_pi_beats_i_on_stiff_row``: the
textbook Gustafsson (0.7, 0.4) pair costs +30% NFE on smooth dynamics at
these tolerances (see runge_kutta._PI_BETA1 note).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.models import (
    ModelConfig,
    init_odenet,
    odenet_logits,
)
from neural_ode_features_tpu.solver import (
    odeint,
    odeint_adjoint,
    odeint_dense,
)
from problems import (
    ALL_PROBLEMS,
    SINE,
    STIFF_LAMBDA,
    STIFF_Y0,
    stiff_func_for,
)
# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast

TS = jnp.linspace(0.0, 4.0, 5)


def _solve(problem, method, controller, tol, **kw):
    return odeint(problem.func, jnp.asarray(problem.y0), TS, rtol=tol,
                  atol=tol, method=method, controller=controller, **kw)


# ---------------------------------------------------------------------------
# 1. Accuracy: the accept test (ratio <= 1) is controller-independent, so PI
#    must meet the same bound the I controller does (mirrors
#    test_odeint.test_adaptive_accuracy).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("method", ["dopri5", "tsit5", "bosh3"])
@pytest.mark.parametrize("problem", ALL_PROBLEMS, ids=lambda p: p.name)
def test_pi_accuracy(problem, method):
    tol = 1e-6
    ys, stats = _solve(problem, method, "pi", tol)
    exact = problem.exact(np.asarray(TS), problem.y0)
    err = np.max(np.abs(np.asarray(ys) - exact))
    scale = np.max(np.abs(exact)) + 1.0
    # Same bound as test_odeint.test_adaptive_accuracy (dense-output
    # interpolation is one order below the solver).
    assert err < 5e3 * tol * scale * problem.hardness, f"{problem.name}: {err}"
    assert bool(np.all(np.asarray(stats.success)))


# ---------------------------------------------------------------------------
# 2. Default untouched: controller='i' is the default and PI genuinely
#    changes the step sequence (otherwise the flag is a no-op).
# ---------------------------------------------------------------------------
def test_default_is_i_controller():
    ys_default, st_default = odeint(SINE.func, jnp.asarray(SINE.y0), TS,
                                    rtol=1e-6, atol=1e-6)
    ys_i, st_i = _solve(SINE, "dopri5", "i", 1e-6)
    np.testing.assert_array_equal(np.asarray(ys_default), np.asarray(ys_i))
    np.testing.assert_array_equal(np.asarray(st_default.nfe),
                                  np.asarray(st_i.nfe))
    # ModelConfig / odeint defaults agree.
    assert ModelConfig().controller == "i"


def test_pi_changes_step_sequence():
    _, st_i = _solve(SINE, "dopri5", "i", 1e-6)
    _, st_pi = _solve(SINE, "dopri5", "pi", 1e-6)
    assert int(np.sum(np.asarray(st_i.nfe))) != int(
        np.sum(np.asarray(st_pi.nfe)))


# ---------------------------------------------------------------------------
# 3. The measured claims behind the shipped β-pair.
# ---------------------------------------------------------------------------
def test_pi_smooth_nfe_parity():
    """Aggregate NFE over the smooth-problem × tolerance grid: PI within 2%
    of I (measured: 3192 vs 3204 in f64 — parity, NOT the +30% the textbook
    Gustafsson pair costs)."""
    totals = {}
    for ctrl in ("i", "pi"):
        tot = 0
        for tol in (1e-3, 1e-6, 1e-9):
            for p in ALL_PROBLEMS:
                _, st = _solve(p, "dopri5", ctrl, tol)
                tot += int(np.sum(np.asarray(st.nfe)))
        totals[ctrl] = tot
    assert totals["pi"] <= totals["i"] * 1.02, totals


def test_pi_beats_i_on_stiff_row():
    """On the stiffness-limited row (λ=-100) the I controller oscillates
    (measured 30 rejections); PI damps it (≤5) and spends ≥10% fewer NFE."""
    func = stiff_func_for(STIFF_LAMBDA)
    res = {}
    for ctrl in ("i", "pi"):
        _, st = odeint(func, jnp.asarray(STIFF_Y0), TS, rtol=1e-6, atol=1e-6,
                       method="dopri5", error_control="per_sample",
                       controller=ctrl)
        res[ctrl] = (int(np.asarray(st.nfe)[-1]),
                     int(np.asarray(st.nreject)[-1]))
    nfe_i, rej_i = res["i"]
    nfe_pi, rej_pi = res["pi"]
    assert rej_i >= 15, f"fixture drift: I controller rejections {rej_i}"
    assert rej_pi <= 5, f"PI rejections {rej_pi}"
    assert nfe_pi <= 0.9 * nfe_i, f"PI {nfe_pi} vs I {nfe_i}"


# ---------------------------------------------------------------------------
# 4. Validation + threading through every entry point.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("method", ["rk4", "adams", "fixed_adams"])
def test_pi_rejected_for_non_tableau_methods(method):
    with pytest.raises(ValueError, match="controller"):
        odeint(SINE.func, jnp.asarray(SINE.y0), TS, method=method,
               controller="pi")


def test_unknown_controller_rejected():
    with pytest.raises(ValueError, match="controller"):
        odeint(SINE.func, jnp.asarray(SINE.y0), TS, controller="pid")


def test_pi_dense_output():
    """odeint_dense threads the controller; y(t) still meets tolerance."""
    tol = 1e-6
    y_at, stats = odeint_dense(SINE.func, jnp.asarray(SINE.y0), 0.0, 4.0,
                               rtol=tol, atol=tol, controller="pi")
    t_q = jnp.linspace(0.0, 4.0, 11)
    ys = y_at(t_q)
    exact = SINE.exact(np.asarray(t_q), SINE.y0)
    err = np.max(np.abs(np.asarray(ys) - exact) / (1.0 + np.abs(exact)))
    assert err < SINE.hardness * tol * 50
    assert bool(np.all(np.asarray(stats.success)))


def test_pi_adjoint_gradients():
    """Adjoint gradients under PI match I-controller gradients (both
    integrate the same continuous adjoint ODE; at tight tolerances the
    controller choice is a sub-tolerance perturbation)."""
    def dynamics(params, t, y):
        return jnp.tanh(y @ params["w"]) * jnp.cos(jnp.asarray(t))

    key = jax.random.PRNGKey(3)
    params = {"w": 0.4 * jax.random.normal(key, (3, 3))}
    y0 = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)))
    ts = jnp.linspace(0.0, 2.0, 4)

    def loss(p, controller):
        ys, _ = odeint_adjoint(dynamics, p, y0, ts, rtol=1e-9, atol=1e-11,
                               controller=controller)
        return jnp.sum(ys ** 2)

    g_i = jax.grad(loss)(params, "i")["w"]
    g_pi = jax.grad(loss)(params, "pi")["w"]
    np.testing.assert_allclose(np.asarray(g_pi), np.asarray(g_i),
                               rtol=1e-5, atol=1e-7)


def test_pi_through_model_config():
    """ModelConfig(controller='pi') reaches the solver: logits are close to
    the 'i' run (same ODE, sub-tolerance perturbation) but the step
    sequence differs."""
    cfg_i = ModelConfig(in_channels=1, tol=1e-3)
    cfg_pi = dataclasses.replace(cfg_i, controller="pi")
    params = init_odenet(jax.random.PRNGKey(0), cfg_i)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 28, 28, 1)), jnp.float32)
    logits_i, st_i = odenet_logits(params, x, cfg_i)
    logits_pi, st_pi = odenet_logits(params, x, cfg_pi)
    np.testing.assert_allclose(np.asarray(logits_pi), np.asarray(logits_i),
                               rtol=0, atol=0.05)
    assert np.all(np.isfinite(np.asarray(logits_pi)))
