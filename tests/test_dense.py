"""Continuous-solution API: solve once, evaluate anywhere afterwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.solver import odeint, odeint_dense

from problems import EXPONENTIAL, SINE

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast


def test_dense_matches_exact():
    y_at, stats = odeint_dense(SINE.func, jnp.asarray(SINE.y0), 0.0, 2.0,
                               rtol=1e-8, atol=1e-10, max_steps=256)
    assert bool(np.all(stats.success))
    ts = np.asarray([0.0, 0.123, 0.777, 1.5, 2.0])
    ys = y_at(jnp.asarray(ts))
    exact = SINE.exact(ts, SINE.y0)
    np.testing.assert_allclose(np.asarray(ys), exact, rtol=1e-5, atol=1e-7)


def test_dense_scalar_eval_and_clamp():
    y_at, _ = odeint_dense(EXPONENTIAL.func, jnp.asarray(EXPONENTIAL.y0),
                           0.0, 1.0, rtol=1e-8, atol=1e-10)
    y_half = y_at(0.5)
    assert y_half.shape == EXPONENTIAL.y0.shape
    exact = EXPONENTIAL.exact(np.asarray([0.5]), EXPONENTIAL.y0)[0]
    np.testing.assert_allclose(np.asarray(y_half), exact, rtol=1e-6)
    # out-of-span queries clamp to the endpoints
    np.testing.assert_allclose(
        np.asarray(y_at(-3.0)),
        EXPONENTIAL.exact(np.asarray([0.0]), EXPONENTIAL.y0)[0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(y_at(9.0)),
        EXPONENTIAL.exact(np.asarray([1.0]), EXPONENTIAL.y0)[0], rtol=1e-5)


def test_dense_matches_odeint_grid():
    """Post-hoc evaluation equals the up-front-grid solve at equal tol."""
    ts = jnp.asarray(np.linspace(0.0, 2.0, 9))
    kw = dict(rtol=1e-9, atol=1e-11)
    ys_grid, _ = odeint(SINE.func, jnp.asarray(SINE.y0), ts, **kw)
    y_at, _ = odeint_dense(SINE.func, jnp.asarray(SINE.y0), 0.0, 2.0,
                           max_steps=256, **kw)
    ys_dense = y_at(ts)
    np.testing.assert_allclose(np.asarray(ys_dense), np.asarray(ys_grid),
                               rtol=1e-6, atol=1e-9)


def test_dense_per_sample_and_reverse():
    import problems as P

    y_at, stats = odeint_dense(
        P.stiff_func_for(P.STIFF_LAMBDA), jnp.asarray(P.STIFF_Y0), 0.0, 1.0,
        rtol=1e-6, atol=1e-8, error_control="per_sample", max_steps=512,
    )
    nfe = np.asarray(stats.nfe)
    assert nfe[3] > nfe[0]
    ts = np.asarray([0.25, 0.9])
    np.testing.assert_allclose(
        np.asarray(y_at(jnp.asarray(ts))),
        P.stiff_spread_exact(ts, P.STIFF_Y0), rtol=5e-4, atol=1e-6)

    # reverse time span
    y_at_r, st_r = odeint_dense(P.EXPONENTIAL.func,
                                jnp.asarray(P.EXPONENTIAL.exact(
                                    np.asarray([1.0]), P.EXPONENTIAL.y0)[0]),
                                1.0, 0.0, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(y_at_r(0.0)), P.EXPONENTIAL.y0,
                               rtol=1e-5, atol=1e-8)


def test_dense_under_jit():
    @jax.jit
    def solve_and_eval(y0, t):
        y_at, _ = odeint_dense(EXPONENTIAL.func, y0, 0.0, 1.0,
                               rtol=1e-7, atol=1e-9, max_steps=128)
        return y_at(t)

    out = solve_and_eval(jnp.asarray(EXPONENTIAL.y0), jnp.asarray([0.3, 0.8]))
    exact = EXPONENTIAL.exact(np.asarray([0.3, 0.8]), EXPONENTIAL.y0)
    np.testing.assert_allclose(np.asarray(out), exact, rtol=1e-5)
