"""Order-of-convergence checks for the fixed-grid steppers and the dense
output (SURVEY.md §4, test plan item 1: error ~ O(h^order))."""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.solver import odeint

from problems import SINE

ORDERS = {"euler": 1, "midpoint": 2, "heun2": 2, "rk4": 4}


def _max_err(method, spi):
    ts = jnp.asarray([0.0, 1.0])
    ys, _ = odeint(
        SINE.func, jnp.asarray(SINE.y0), ts, method=method, steps_per_interval=spi
    )
    exact = SINE.exact(np.asarray(ts), SINE.y0)
    return float(np.max(np.abs(np.asarray(ys) - exact)))


@pytest.mark.parametrize("method,order", ORDERS.items())
def test_convergence_order(method, order):
    errs = [_max_err(method, spi) for spi in (64, 128, 256)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for rate in rates:
        assert rate > order - 0.35, f"{method}: rates {rates}, errors {errs}"


def test_dopri5_dense_output_order():
    """The quartic interpolant must be ~4th-order accurate at off-step times:
    halving the forced step size should shrink midpoint error ~16x."""
    from neural_ode_features_tpu.solver.runge_kutta import adaptive_odeint
    from neural_ode_features_tpu.solver.tableau import DOPRI5

    ts = jnp.asarray([0.0, 0.31, 1.0])  # 0.31: never a step endpoint

    def err_at(first_step):
        # rtol/atol huge + ifactor 1.0: every step accepted at exactly
        # `first_step`, isolating interpolation error from step control.
        ys, _ = adaptive_odeint(
            SINE.func,
            jnp.asarray(SINE.y0),
            ts,
            1e30,
            1e30,
            DOPRI5,
            first_step=first_step,
            ifactor=1.0,
            max_steps=4096,
        )
        exact = SINE.exact(np.asarray(ts), SINE.y0)
        return float(np.max(np.abs(np.asarray(ys[1]) - exact[1])))

    e1, e2 = err_at(0.05), err_at(0.025)
    rate = np.log2(e1 / e2)
    assert rate > 3.4, f"dense output rate {rate} (errors {e1:.2e}, {e2:.2e})"
