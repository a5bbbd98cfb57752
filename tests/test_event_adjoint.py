"""Differentiable event solves (solver/event_adjoint.py).

IFT gradients checked three ways per VERDICT r4 #1's done-criteria:
analytic closed forms (exact to solver tolerance), central finite
differences (<=1e-4 rel), and a direct-backprop oracle on the constant-
velocity problem where y* is analytically constant (the endpoint-motion
cancellation must be EXACT).  Plus an end-to-end demo that TRAINS a
parameter to hit a target event time.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.solver import odeint_event_adjoint

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast

TOLS = dict(rtol=1e-10, atol=1e-12)


def fd_grad(fn, x, eps=1e-6):
    return (fn(x + eps) - fn(x - eps)) / (2 * eps)


# --- problem 1: exponential decay through a threshold -------------------
# y' = -k y, y0 = a, event y - c = 0  ->  t* = ln(a/c)/k
#   dt*/dk = -t*/k      dt*/da = 1/(k a)
#   y* = c exactly      dy*/dk = dy*/da = 0 (pinned to the level set)


def decay(p, t, y):
    return -p["k"] * y


def test_decay_tstar_grads_analytic():
    k0, a0, c = 1.3, 2.0, 0.5

    def tstar(p, y0):
        return odeint_event_adjoint(
            decay, p, y0, 0.0, lambda t, y: y[0] - c, t_max=10.0, **TOLS
        ).t_event

    p = {"k": jnp.asarray(k0, jnp.float64)}
    y0 = jnp.asarray([a0], jnp.float64)
    t_true = math.log(a0 / c) / k0
    val, (g_p, g_y0) = jax.value_and_grad(tstar, argnums=(0, 1))(p, y0)
    np.testing.assert_allclose(float(val), t_true, rtol=1e-8)
    np.testing.assert_allclose(float(g_p["k"]), -t_true / k0, rtol=1e-6)
    np.testing.assert_allclose(float(g_y0[0]), 1.0 / (k0 * a0), rtol=1e-6)


def test_decay_tstar_grads_finite_difference():
    a0, c = 2.0, 0.5

    def tstar_of_k(k):
        p = {"k": jnp.asarray(k, jnp.float64)}
        return odeint_event_adjoint(
            decay, p, jnp.asarray([a0], jnp.float64), 0.0,
            lambda t, y: y[0] - c, t_max=10.0, **TOLS,
        ).t_event

    k0 = 1.3
    g_ad = float(jax.grad(tstar_of_k)(jnp.asarray(k0, jnp.float64)))
    g_fd = float(fd_grad(tstar_of_k, jnp.asarray(k0, jnp.float64)))
    np.testing.assert_allclose(g_ad, g_fd, rtol=1e-4)


def test_decay_ystar_pinned_to_level_set():
    # y* == c identically in (k, a): the IFT endpoint correction must
    # cancel the trajectory sensitivity EXACTLY, not just to FD accuracy.
    c = 0.5

    def ystar(p, y0):
        return odeint_event_adjoint(
            decay, p, y0, 0.0, lambda t, y: y[0] - c, t_max=10.0, **TOLS
        ).y_event[0]

    p = {"k": jnp.asarray(1.3, jnp.float64)}
    y0 = jnp.asarray([2.0], jnp.float64)
    g_p, g_y0 = jax.grad(ystar, argnums=(0, 1))(p, y0)
    np.testing.assert_allclose(float(g_p["k"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(g_y0[0]), 0.0, atol=1e-7)


# --- problem 2: constant velocity to a wall -----------------------------
# y' = v, y0 = 0, event y - 1 = 0  ->  t* = 1/v ; y* == 1 constant.


def test_constant_velocity_exact_cancellation():
    def out(p):
        s = odeint_event_adjoint(
            lambda p_, t, y: jnp.full_like(y, p_["v"]),
            p, jnp.asarray([0.0], jnp.float64), 0.0,
            lambda t, y: y[0] - 1.0, t_max=10.0, **TOLS,
        )
        return s.t_event, s.y_event[0]

    p = {"v": jnp.asarray(0.7, jnp.float64)}
    t_s, y_s = jax.jit(out)(p)
    np.testing.assert_allclose(float(t_s), 1 / 0.7, rtol=1e-9)
    np.testing.assert_allclose(float(y_s), 1.0, rtol=1e-9)
    g_t = jax.grad(lambda q: out(q)[0])(p)
    g_y = jax.grad(lambda q: out(q)[1])(p)
    # Direct-backprop oracle: y(t) = v t is linear, so d y(t*)/dv at fixed
    # t* is t* = 1/v and f·dt*/dv = v·(-1/v²) = -1/v — the sum is 0.
    np.testing.assert_allclose(float(g_t["v"]), -1 / 0.49, rtol=1e-6)
    assert float(g_y["v"]) == 0.0


# --- problem 3: harmonic oscillator zero crossing -----------------------
# y'' = -w² y from (1, 0): y = cos(w t), first zero t* = pi/(2w),
# dt*/dw = -pi/(2w²); v* = -w sin(w t*) = -w, dv*/dw = -1.


def osc(p, t, s):
    return {"y": s["v"], "v": -p["w"] ** 2 * s["y"]}


def test_oscillator_grads_analytic_and_fd():
    w0 = 1.7

    def solve(p):
        s0 = {"y": jnp.asarray(1.0, jnp.float64),
              "v": jnp.asarray(0.0, jnp.float64)}
        s = odeint_event_adjoint(
            osc, p, s0, 0.0, lambda t, st: st["y"],
            t_max=10.0, direction=-1, **TOLS,
        )
        return s.t_event, s.y_event["v"]

    p = {"w": jnp.asarray(w0, jnp.float64)}
    t_s, v_s = solve(p)
    np.testing.assert_allclose(float(t_s), math.pi / (2 * w0), rtol=1e-8)
    np.testing.assert_allclose(float(v_s), -w0, rtol=1e-7)
    g_t = jax.grad(lambda q: solve(q)[0])(p)
    g_v = jax.grad(lambda q: solve(q)[1])(p)
    np.testing.assert_allclose(float(g_t["w"]), -math.pi / (2 * w0**2),
                               rtol=1e-6)
    np.testing.assert_allclose(float(g_v["w"]), -1.0, rtol=1e-6)
    # FD cross-check on the event time.
    g_fd = float(fd_grad(
        lambda w: solve({"w": w})[0], jnp.asarray(w0, jnp.float64), 1e-5
    ))
    np.testing.assert_allclose(float(g_t["w"]), g_fd, rtol=1e-4)


# --- per-sample: each row differentiates its own hitting time -----------


def test_per_sample_event_grads():
    # Rows a_b hit c at t*_b = ln(a_b/c)/k; dt*_b/da_b = 1/(k a_b) and the
    # cross-row Jacobian is diagonal (rows are independent solves).
    k0, c = 1.1, 0.5
    a = jnp.asarray([1.0, 2.0, 4.0], jnp.float64)

    def tstars(p, a_vec):
        y0 = a_vec[:, None]
        s = odeint_event_adjoint(
            decay, p, y0, 0.0, lambda t, y: y[:, 0] - c,
            t_max=20.0, error_control="per_sample", **TOLS,
        )
        return s.t_event

    p = {"k": jnp.asarray(k0, jnp.float64)}
    ts = tstars(p, a)
    np.testing.assert_allclose(
        np.asarray(ts), np.log(np.asarray(a) / c) / k0, rtol=1e-8
    )
    jac = jax.jacrev(tstars, argnums=1)(p, a)
    np.testing.assert_allclose(
        np.asarray(jac), np.diag(1.0 / (k0 * np.asarray(a))), atol=1e-6
    )
    g_k = jax.grad(lambda q: tstars(q, a).sum())(p)
    t_true = np.log(np.asarray(a) / c) / k0
    np.testing.assert_allclose(float(g_k["k"]), -t_true.sum() / k0,
                               rtol=1e-6)


def test_per_sample_unfired_rows_zero_tstar_grad():
    # Row 1 never reaches its threshold: t_event pins to t_max with zero
    # gradient, while the fired row keeps its IFT gradient.
    k0 = 1.0
    thresholds = jnp.asarray([1.0, 1e-6], jnp.float64)

    def tstars(p):
        y0 = jnp.asarray([[2.0], [2.0]], jnp.float64)
        s = odeint_event_adjoint(
            decay, p, y0, 0.0, lambda t, y: y[:, 0] - thresholds,
            t_max=2.0, error_control="per_sample", **TOLS,
        )
        return s.t_event, s.fired

    p = {"k": jnp.asarray(k0, jnp.float64)}
    (ts, fired) = tstars(p)
    assert bool(fired[0]) and not bool(fired[1])
    g0 = jax.grad(lambda q: tstars(q)[0][0])(p)
    g1 = jax.grad(lambda q: tstars(q)[0][1])(p)
    np.testing.assert_allclose(float(g0["k"]), -math.log(2.0) / k0**2,
                               rtol=1e-6)
    assert float(g1["k"]) == 0.0


def test_unfired_y_event_still_differentiable():
    # No event in span: y_event = y(t_max) keeps its trajectory gradient
    # (d/dk [a e^{-k T}] = -T a e^{-k T}) even though dt*/dk is pinned 0.
    a0, T = 2.0, 1.5

    def y_end(p):
        s = odeint_event_adjoint(
            decay, p, jnp.asarray([a0], jnp.float64), 0.0,
            lambda t, y: y[0] - 1e-6, t_max=T, **TOLS,
        )
        return s.y_event[0]

    p = {"k": jnp.asarray(0.9, jnp.float64)}
    g = jax.grad(y_end)(p)
    np.testing.assert_allclose(
        float(g["k"]), -T * a0 * math.exp(-0.9 * T), rtol=1e-6
    )


# --- end-to-end: TRAIN a parameter to hit a target event time -----------


def test_train_parameter_to_target_hitting_time():
    # Learn k so that decay from a=2 crosses c=0.5 at exactly T=2.0;
    # closed form k* = ln(4)/2.  Plain gradient descent on (t*(k) - T)².
    a0, c, T = 2.0, 0.5, 2.0

    @jax.jit
    def loss_and_grad(p):
        def loss(q):
            t_s = odeint_event_adjoint(
                decay, q, jnp.asarray([a0], jnp.float64), 0.0,
                lambda t, y: y[0] - c, t_max=20.0,
                rtol=1e-8, atol=1e-10,
            ).t_event
            return (t_s - T) ** 2

        return jax.value_and_grad(loss)(p)

    # lr sized to the curvature 2(t*/k)² near the start (≈ 150 at k=0.4).
    p = {"k": jnp.asarray(0.4, jnp.float64)}
    first_loss = None
    for _ in range(200):
        val, g = loss_and_grad(p)
        if first_loss is None:
            first_loss = float(val)
        p = {"k": p["k"] - 0.01 * g["k"]}
    k_true = math.log(a0 / c) / T
    assert float(val) < 1e-8 < first_loss
    np.testing.assert_allclose(float(p["k"]), k_true, rtol=1e-3)


# --- misc surfaces -------------------------------------------------------


def test_stats_and_fired_survive():
    p = {"k": jnp.asarray(1.0, jnp.float64)}
    s = odeint_event_adjoint(
        decay, p, jnp.asarray([2.0], jnp.float64), 0.0,
        lambda t, y: y[0] - 1.0, t_max=5.0, **TOLS,
    )
    assert bool(s.fired)
    assert bool(jnp.all(s.stats.success))
    assert int(s.stats.nfe[0]) > 0


def test_works_under_vmap():
    # vmap over a batch of initial amplitudes (global-mode solves).
    c = 0.5

    def tstar(a):
        p = {"k": jnp.asarray(1.0, jnp.float64)}
        return odeint_event_adjoint(
            decay, p, a[None], 0.0, lambda t, y: y[0] - c,
            t_max=10.0, **TOLS,
        ).t_event

    a_vec = jnp.asarray([1.0, 2.0, 4.0], jnp.float64)
    ts = jax.vmap(tstar)(a_vec)
    np.testing.assert_allclose(np.asarray(ts),
                               np.log(np.asarray(a_vec) / c), rtol=1e-7)
    g = jax.vmap(jax.grad(tstar))(a_vec)
    np.testing.assert_allclose(np.asarray(g), 1.0 / np.asarray(a_vec),
                               rtol=1e-6)
