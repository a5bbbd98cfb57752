"""Property-based solver tests (hypothesis): random linear systems against
their matrix-exponential closed form, random tolerances, both directions."""

import jax.numpy as jnp
import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from neural_ode_features_tpu.solver import odeint


def _expm(a, t):
    """Matrix exponential via eigendecomposition (a is made diagonalisable
    by construction: symmetric part dominant random matrices)."""
    w, v = np.linalg.eig(a)
    return (v @ np.diag(np.exp(w * t)) @ np.linalg.inv(v)).real


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    dim=st.integers(1, 4),
    t_end=st.floats(0.25, 2.0),
    direction=st.sampled_from([1.0, -1.0]),
    method=st.sampled_from(["dopri5", "bosh3", "tsit5", "adams"]),
)
def test_linear_system_matches_expm(seed, dim, t_end, direction, method):
    rng = np.random.default_rng(seed)
    a_np = rng.normal(size=(dim, dim)) * 0.8
    a_np = a_np - 0.3 * np.eye(dim)  # keep mildly contractive
    y0_np = rng.normal(size=(2, dim))

    a = jnp.asarray(a_np)
    ts = jnp.asarray([0.0, direction * t_end])

    ys, stats = odeint(
        lambda t, y: y @ a.T, jnp.asarray(y0_np), ts,
        rtol=1e-7, atol=1e-9, method=method,
    )
    exact = y0_np @ _expm(a_np, direction * t_end).T
    assert bool(np.all(stats.success))
    scale = np.max(np.abs(exact)) + 1.0
    err = np.max(np.abs(np.asarray(ys[-1]) - exact))
    assert err < 5e-4 * scale, f"{method} d={dim} t={t_end}: err {err:.2e}"


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    log_tol=st.floats(-8.0, -3.0),
)
def test_tolerance_monotonicity(seed, log_tol):
    """Tighter tolerance must not increase solution error (statistically) and
    must not decrease NFE."""
    rng = np.random.default_rng(seed)
    lam = -float(rng.uniform(0.5, 5.0))
    y0 = jnp.asarray(rng.normal(size=(1, 3)))
    ts = jnp.asarray([0.0, 1.0])
    tol = 10.0**log_tol

    def solve(t):
        ys, stats = odeint(lambda _, y: lam * y, y0, ts, rtol=t, atol=t)
        return np.asarray(ys[-1]), int(stats.nfe[0])

    y_loose, nfe_loose = solve(tol * 100)
    y_tight, nfe_tight = solve(tol)
    exact = np.asarray(y0) * np.exp(lam)
    # Not a strict theorem (controller start-up effects), so allow slack.
    assert nfe_tight >= nfe_loose - 8, (nfe_tight, nfe_loose)
    err_tight = np.max(np.abs(y_tight - exact))
    assert err_tight < 100 * tol + 1e-12
