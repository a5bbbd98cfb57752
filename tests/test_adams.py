"""Adaptive Adams (ABM-PECE) solver tests — the multistep engine row of the
component inventory (SURVEY.md §2.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.solver import odeint

import problems as P

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast


@pytest.mark.parametrize("problem", P.ALL_PROBLEMS, ids=lambda p: p.name)
def test_adams_accuracy(problem):
    rtol, atol = 1e-6, 1e-8
    ts = np.linspace(0.0, 2.0, 7)
    ys, stats = odeint(
        problem.func, jnp.asarray(problem.y0), jnp.asarray(ts),
        rtol=rtol, atol=atol, method="adams",
    )
    exact = problem.exact(ts, problem.y0)
    err = np.max(np.abs(np.asarray(ys) - exact))
    scale = np.max(np.abs(exact)) + 1.0
    assert bool(np.all(stats.success))
    assert err < 1e4 * rtol * scale * problem.hardness, f"err={err:.3e}"


def test_adams_fewer_evals_than_rk_per_step():
    """The multistep selling point: 2 evals/step vs dopri5's 6."""
    ts = jnp.asarray([0.0, 2.0])
    y0 = jnp.asarray(P.SINE.y0)
    _, s_ad = odeint(P.SINE.func, y0, ts, rtol=1e-6, atol=1e-8, method="adams")
    evals_per_step = float(s_ad.nfe[0]) / float(s_ad.naccept[0] + s_ad.nreject[0])
    assert evals_per_step < 2.5, evals_per_step


def test_adams_reverse_time():
    ts = jnp.asarray([0.0, 1.0])
    y0 = jnp.asarray(P.EXPONENTIAL.y0)
    ys, _ = odeint(P.EXPONENTIAL.func, y0, ts, rtol=1e-7, atol=1e-9,
                   method="adams")
    back, _ = odeint(P.EXPONENTIAL.func, ys[-1], jnp.asarray([1.0, 0.0]),
                     rtol=1e-7, atol=1e-9, method="adams")
    np.testing.assert_allclose(np.asarray(back[-1]), np.asarray(y0),
                               rtol=1e-4, atol=1e-6)


def test_adams_per_sample_control():
    _, stats = odeint(
        P.stiff_func_for(P.STIFF_LAMBDA), jnp.asarray(P.STIFF_Y0),
        jnp.asarray([0.0, 1.0]), rtol=1e-6, atol=1e-8,
        method="adams", error_control="per_sample",
    )
    nfe = np.asarray(stats.nfe)
    assert nfe[3] > nfe[0]


def test_adams_scan_mode_gradients_finite():
    """Regression (code review): the order-ramp's duplicated history nodes
    made the Vandermonde solves singular; NaNs leaked into scan-mode
    gradients through linalg.solve's transpose rule."""
    import jax

    def loss(y0):
        ys, _ = odeint(lambda t, y: -y, y0, jnp.asarray([0.0, 1.0]),
                       rtol=1e-5, atol=1e-7, method="adams",
                       unroll="scan", max_steps=64)
        return jnp.sum(ys[-1] ** 2)

    g = jax.grad(loss)(jnp.ones((2, 3)))
    assert np.all(np.isfinite(np.asarray(g))), g


def test_fixed_adams_rejects_nonuniform_ts():
    with pytest.raises(ValueError, match="uniform"):
        odeint(lambda t, y: -y, jnp.ones((1, 2)),
               jnp.asarray([0.0, 0.1, 0.5, 1.0]), method="fixed_adams")


def test_error_mask_rejected_for_fixed_grid():
    with pytest.raises(ValueError, match="seminorm"):
        odeint(lambda t, y: -y, jnp.ones((1, 2)), jnp.asarray([0.0, 1.0]),
               method="rk4", error_mask=jnp.ones((1, 2)))


def test_adams_scan_mode_gradients_finite_f32():
    """x64-disabled variant (regression: mean(err^2) underflowed to 0 in f32
    and sqrt'(0)=inf leaked NaN through the controller's zero cotangents —
    the tests-only x64 default masked this)."""
    import jax

    def loss(y0):
        ys, _ = odeint(lambda t, y: -y, y0, jnp.asarray([0.0, 1.0], jnp.float32),
                       rtol=1e-5, atol=1e-7, method="adams",
                       unroll="scan", max_steps=64)
        return jnp.sum(ys[-1] ** 2)

    g = jax.grad(loss)(jnp.ones((2, 3), jnp.float32))
    assert g.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(g))), g
    np.testing.assert_allclose(np.asarray(g), 2 * np.exp(-2.0), rtol=1e-3)


def test_adams_polynomial_unbounded_step_edge():
    """Regression: cubic dynamics make the k=4 predictor exact, so dt grows
    without bound; the old cubic-Hermite dense output then silently returned
    garbage (err ~0.2 with success=True). Order-matched Lagrange dense
    output is exact here."""
    def f(t, y):
        t = jnp.asarray(t)
        tt = t[..., None] if t.ndim else t
        return jnp.broadcast_to(4.0 * tt**3, y.shape).astype(y.dtype)

    ts = np.linspace(0.0, 2.0, 7)
    ys, st = odeint(f, jnp.zeros((1, 1)), jnp.asarray(ts),
                    rtol=1e-6, atol=1e-8, method="adams")
    err = np.abs(np.asarray(ys)[:, 0, 0] - ts**4).max()
    assert bool(np.all(st.success))
    assert err < 1e-8, err


def test_high_order_beats_order4_at_tight_tolerance():
    """VERDICT r1 missing #2: the reference's VCABM ramps order far past 4.
    Order 8 must need (substantially) fewer function evals than order 4 at
    tight tolerances (measured: 100 vs 284 at 1e-6, 234 vs 1448 at 1e-10)."""
    ts = jnp.asarray([0.0, 2.0])
    y0 = jnp.asarray(P.SINE.y0)
    exact = P.SINE.exact(np.asarray(ts), P.SINE.y0)[-1]
    for rtol in (1e-6, 1e-10):
        nfe = {}
        for k in (4, 8):
            ys, st = odeint(P.SINE.func, y0, ts, rtol=rtol, atol=rtol * 1e-2,
                            method="adams", max_order=k)
            assert bool(np.all(st.success))
            err = np.max(np.abs(np.asarray(ys[-1]) - exact))
            assert err < 1e4 * rtol, (k, rtol, err)
            nfe[k] = int(st.nfe[0])
        assert nfe[8] < 0.6 * nfe[4], (rtol, nfe)


def test_high_order_f32_stable():
    """The order-8 Lagrange weights come from Björck–Pereyra recurrences, not
    a generic Vandermonde LU solve, precisely so f32 (the TPU compute dtype)
    survives them. Solve in f32 at a tolerance near f32 resolution."""
    ts = jnp.asarray([0.0, 2.0], jnp.float32)
    y0 = jnp.asarray(P.SINE.y0, jnp.float32)
    exact = P.SINE.exact(np.asarray(ts), P.SINE.y0)[-1]
    ys, st = odeint(P.SINE.func, y0, ts, rtol=1e-5, atol=1e-7,
                    method="adams", max_order=8)
    assert ys.dtype == jnp.float32
    assert bool(np.all(st.success))
    err = np.max(np.abs(np.asarray(ys[-1]) - exact))
    assert err < 1e-3, err


def test_max_order_validation():
    ts = jnp.asarray([0.0, 1.0])
    y0 = jnp.asarray(P.SINE.y0)
    for bad in (1, 13):
        with pytest.raises(ValueError, match="max_order"):
            odeint(P.SINE.func, y0, ts, method="adams", max_order=bad)


def test_order12_no_longer_oversteps():
    """VCABM order selection (round 2): with the adaptive order decrease,
    max_order=12 must be at least as step-efficient as max_order=8 at tight
    tolerance — under round 1's monotone ramp it overstepped and LOST
    (documented deviation, now closed).  Reference: torchdiffeq VCABM order
    selection (SURVEY.md §2.2, UNVERIFIED)."""
    from problems import SINE

    y0 = jnp.asarray(SINE.y0)
    ts = jnp.asarray([0.0, 2.0])
    nfe = {}
    for mo in (8, 12):
        _, st = odeint(SINE.func, y0, ts, rtol=1e-10, atol=1e-10,
                       method="adams", max_order=mo, max_steps=2**14)
        assert bool(np.all(st.success))
        nfe[mo] = int(st.nfe[0])
    assert nfe[12] <= nfe[8] * 1.1, nfe
