"""Event-terminated integration (solver/event.py).

Analytic hitting times: exponential decay through a threshold (t* = ln k),
harmonic-oscillator zero crossing (t* = pi/2), time-only events, backward
time, per-sample events with mixed fired/not-fired rows, and the jit /
misuse surfaces.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.solver import odeint_event

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast

TOLS = dict(rtol=1e-9, atol=1e-12)


def decay(t, y):
    return -y


def test_exponential_threshold_global():
    y0 = jnp.asarray([2.0], jnp.float64)
    sol = odeint_event(
        decay, y0, 0.0, lambda t, y: y[0] - 1.0, t_max=5.0, **TOLS
    )
    assert bool(sol.fired)
    assert sol.t_event.shape == ()
    np.testing.assert_allclose(float(sol.t_event), math.log(2.0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.y_event), [1.0], atol=1e-7)
    assert sol.y_event.shape == y0.shape
    assert bool(jnp.all(sol.stats.success))
    assert int(sol.stats.nfe[0]) > 0


def test_no_event_reaches_t_max():
    y0 = jnp.asarray([2.0], jnp.float64)
    sol = odeint_event(
        decay, y0, 0.0, lambda t, y: y[0] - 0.001, t_max=1.5, **TOLS
    )
    assert not bool(sol.fired)
    np.testing.assert_allclose(float(sol.t_event), 1.5, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sol.y_event), [2.0 * math.exp(-1.5)], atol=1e-7
    )


def test_time_only_event():
    y0 = jnp.asarray([1.0], jnp.float64)
    sol = odeint_event(
        decay, y0, 0.0, lambda t, y: t - 0.3, t_max=2.0, **TOLS
    )
    assert bool(sol.fired)
    np.testing.assert_allclose(float(sol.t_event), 0.3, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(sol.y_event), [math.exp(-0.3)], atol=1e-7
    )


def test_backward_time():
    # y' = -y solved backwards grows: y(t) = e^{-t}; y = 2 at t = -ln 2.
    y0 = jnp.asarray([1.0], jnp.float64)
    sol = odeint_event(
        decay, y0, 0.0, lambda t, y: y[0] - 2.0, t_max=-3.0, **TOLS
    )
    assert bool(sol.fired)
    np.testing.assert_allclose(float(sol.t_event), -math.log(2.0), atol=1e-7)


def test_oscillator_zero_crossing():
    # y'' = -y from (1, 0): y(t) = cos t, first zero at pi/2.
    def f(t, s):
        return {"y": s["v"], "v": -s["y"]}

    s0 = {"y": jnp.asarray(1.0, jnp.float64),
          "v": jnp.asarray(0.0, jnp.float64)}
    sol = odeint_event(f, s0, 0.0, lambda t, s: s["y"], t_max=10.0, **TOLS)
    assert bool(sol.fired)
    np.testing.assert_allclose(float(sol.t_event), math.pi / 2, atol=1e-7)
    np.testing.assert_allclose(float(sol.y_event["v"]), -1.0, atol=1e-6)


def test_per_sample_events():
    # Each row hits its own threshold at t* = ln(y0_b): rows finish at
    # different times inside ONE while_loop.
    y0 = jnp.asarray([[2.0], [4.0], [8.0]], jnp.float64)
    sol = odeint_event(
        decay, y0, 0.0, lambda t, y: y[:, 0] - 1.0,
        t_max=5.0, error_control="per_sample", **TOLS,
    )
    assert sol.t_event.shape == (3,)
    assert bool(jnp.all(sol.fired))
    np.testing.assert_allclose(
        np.asarray(sol.t_event), np.log([2.0, 4.0, 8.0]), atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(sol.y_event),
                               np.ones((3, 1)), atol=1e-7)


def test_per_sample_mixed_fired():
    # Row 0 fires at ln 2; row 1's threshold is unreachable in the span.
    y0 = jnp.asarray([[2.0], [2.0]], jnp.float64)
    thresholds = jnp.asarray([1.0, 0.001], jnp.float64)
    sol = odeint_event(
        decay, y0, 0.0, lambda t, y: y[:, 0] - thresholds,
        t_max=1.5, error_control="per_sample", **TOLS,
    )
    assert bool(sol.fired[0]) and not bool(sol.fired[1])
    np.testing.assert_allclose(float(sol.t_event[0]), math.log(2.0),
                               atol=1e-7)
    np.testing.assert_allclose(float(sol.t_event[1]), 1.5, atol=1e-12)
    np.testing.assert_allclose(float(sol.y_event[1, 0]),
                               2.0 * math.exp(-1.5), atol=1e-7)
    assert bool(jnp.all(sol.stats.success))


def test_under_jit_and_tsit5():
    @jax.jit
    def hit_time(y0):
        return odeint_event(
            decay, y0, 0.0, lambda t, y: y[0] - 1.0,
            t_max=5.0, method="tsit5", **TOLS,
        ).t_event

    t = hit_time(jnp.asarray([2.0], jnp.float64))
    np.testing.assert_allclose(float(t), math.log(2.0), atol=1e-7)


def test_misuse_raises():
    y0 = jnp.asarray([1.0], jnp.float64)
    with pytest.raises(ValueError, match="adaptive RK"):
        odeint_event(decay, y0, 0.0, lambda t, y: y[0], t_max=1.0,
                     method="euler")
    with pytest.raises(ValueError, match="error_control"):
        odeint_event(decay, y0, 0.0, lambda t, y: y[0], t_max=1.0,
                     error_control="bogus")
    with pytest.raises(ValueError, match="event_fn must return"):
        odeint_event(decay, jnp.ones((2, 3), jnp.float64), 0.0,
                     lambda t, y: y, t_max=1.0,
                     error_control="per_sample")


# --- r5 edge hardening (VERDICT r4 #3 / ADVICE r4) ---------------------


def test_direction_filter_skips_nonmatching():
    # cos t crosses zero falling at pi/2, rising at 3pi/2.  direction=-1
    # finds the first; direction=+1 steps over it and finds the second.
    def f(t, s):
        return {"y": s["v"], "v": -s["y"]}

    s0 = {"y": jnp.asarray(1.0, jnp.float64),
          "v": jnp.asarray(0.0, jnp.float64)}
    ev = lambda t, s: s["y"]
    falling = odeint_event(f, s0, 0.0, ev, t_max=10.0, direction=-1, **TOLS)
    rising = odeint_event(f, s0, 0.0, ev, t_max=10.0, direction=1, **TOLS)
    assert bool(falling.fired) and bool(rising.fired)
    np.testing.assert_allclose(float(falling.t_event), math.pi / 2,
                               atol=1e-6)
    np.testing.assert_allclose(float(rising.t_event), 3 * math.pi / 2,
                               atol=1e-6)


def test_direction_no_matching_crossing():
    # g = y - 1 with decaying y only falls; direction=+1 never fires.
    y0 = jnp.asarray([2.0], jnp.float64)
    sol = odeint_event(decay, y0, 0.0, lambda t, y: y[0] - 1.0,
                       t_max=3.0, direction=1, **TOLS)
    assert not bool(sol.fired)
    np.testing.assert_allclose(float(sol.t_event), 3.0, atol=1e-12)


def test_interior_probes_catch_double_crossing():
    # Dip-and-return: g(t) = sin(t) - 0.999 crosses up at ~1.526 and back
    # down at ~1.616 — inside ONE accepted step of a loose smooth solve.
    # Endpoint-only sampling misses it (documented blind spot); interior
    # probes catch it.  This test PINS both behaviors.
    y0 = jnp.asarray([2.0], jnp.float64)
    ev = lambda t, y: jnp.sin(t) - 0.999
    loose = dict(rtol=1e-3, atol=1e-6)
    missed = odeint_event(decay, y0, 0.0, ev, t_max=10.0, **loose)
    assert not bool(missed.fired)  # blind spot, documented
    caught = odeint_event(decay, y0, 0.0, ev, t_max=10.0,
                          interior_probes=16, **loose)
    assert bool(caught.fired)
    np.testing.assert_allclose(float(caught.t_event),
                               math.asin(0.999), atol=1e-4)


def test_event_at_t0_fires_immediately():
    y0 = jnp.asarray([1.0], jnp.float64)
    sol = odeint_event(decay, y0, 0.0, lambda t, y: y[0] - 1.0,
                       t_max=5.0, **TOLS)
    assert bool(sol.fired)
    np.testing.assert_allclose(float(sol.t_event), 0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(sol.y_event), [1.0], atol=0.0)
    # direction does not override the start-on-surface rule
    sol_dir = odeint_event(decay, y0, 0.0, lambda t, y: y[0] - 1.0,
                           t_max=5.0, direction=1, **TOLS)
    assert bool(sol_dir.fired)


def test_degenerate_span_no_nan():
    # t_max == t0 used to NaN-bracket a fake fired event (ADVICE r4).
    y0 = jnp.asarray([2.0], jnp.float64)
    sol = odeint_event(decay, y0, 0.0, lambda t, y: y[0] - 1.0,
                       t_max=0.0, **TOLS)
    assert not bool(sol.fired)
    assert np.isfinite(float(sol.t_event))
    np.testing.assert_allclose(float(sol.t_event), 0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(sol.y_event), [2.0], atol=0.0)
    assert bool(jnp.all(sol.stats.success))


def test_nan_event_fn_never_fires():
    # A NaN event value must never read as a sign change (ADVICE r4).
    y0 = jnp.asarray([2.0], jnp.float64)
    sol = odeint_event(decay, y0, 0.0,
                       lambda t, y: jnp.full((), jnp.nan, jnp.float64),
                       t_max=1.0, **TOLS)
    assert not bool(sol.fired)
    np.testing.assert_allclose(float(sol.t_event), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.y_event),
                               [2.0 * math.exp(-1.0)], atol=1e-7)


def test_max_steps_exhausted_reports_running_position():
    # Budget runs out before the event: success=False and (t_event,
    # y_event) is the solver's RUNNING position — a consistent pair, not
    # t_max-paired-with-y0 (ADVICE r4).
    y0 = jnp.asarray([2.0], jnp.float64)
    sol = odeint_event(decay, y0, 0.0, lambda t, y: y[0] - 0.001,
                       t_max=500.0, max_steps=5, first_step=0.1, **TOLS)
    assert not bool(sol.fired)
    assert not bool(jnp.all(sol.stats.success))
    t_run = float(sol.t_event)
    assert 0.0 < t_run < 500.0
    np.testing.assert_allclose(np.asarray(sol.y_event),
                               [2.0 * math.exp(-t_run)], rtol=1e-6)


def test_direction_misuse_raises():
    y0 = jnp.asarray([1.0], jnp.float64)
    with pytest.raises(ValueError, match="direction"):
        odeint_event(decay, y0, 0.0, lambda t, y: y[0], t_max=1.0,
                     direction=2)
    with pytest.raises(ValueError, match="interior_probes"):
        odeint_event(decay, y0, 0.0, lambda t, y: y[0], t_max=1.0,
                     interior_probes=-1)
