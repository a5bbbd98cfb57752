"""Per-sample adaptive stepping — the TPU build's headline capability
(SURVEY.md §2.4: BASELINE.json demands per-sample error control + NFE
accounting; the reference can only do batch-global stepping)."""

import jax.numpy as jnp
import numpy as np

from neural_ode_features_tpu.solver import odeint

from problems import STIFF_LAMBDA, STIFF_Y0, stiff_func_for, stiff_spread_exact
import pytest

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast


def _solve(y0, lams, error_control, **kw):
    ts = jnp.asarray([0.0, 1.0])
    return odeint(
        stiff_func_for(lams),
        jnp.asarray(y0),
        ts,
        rtol=1e-6,
        atol=1e-8,
        error_control=error_control,
        **kw,
    )


def test_nfe_differs_per_sample():
    """Rows with λ ∈ {-0.1, -1, -10, -100} must get different step counts."""
    _, stats = _solve(STIFF_Y0, STIFF_LAMBDA, "per_sample")
    nfe = np.asarray(stats.nfe)
    assert nfe.shape == (4,)
    assert nfe[3] > nfe[0], f"stiff sample should need more steps: {nfe}"
    assert len(np.unique(nfe)) >= 3, f"expected spread NFE, got {nfe}"


def test_batched_equals_solo_solves():
    """Per-sample control: solving a batch jointly must give the same
    trajectories and the same per-sample NFE as solving each row alone."""
    ys_b, stats_b = _solve(STIFF_Y0, STIFF_LAMBDA, "per_sample")
    for i in range(4):
        ys_i, stats_i = _solve(
            STIFF_Y0[i : i + 1], STIFF_LAMBDA[i : i + 1], "per_sample"
        )
        np.testing.assert_allclose(
            np.asarray(ys_b[:, i]), np.asarray(ys_i[:, 0]), rtol=1e-9, atol=1e-12
        )
        assert int(stats_b.nfe[i]) == int(stats_i.nfe[0]), (
            f"sample {i}: batched nfe {int(stats_b.nfe[i])} != solo "
            f"{int(stats_i.nfe[0])}"
        )


def test_global_mode_shares_steps():
    """Batch-global control (reference semantics): one NFE for everyone,
    driven by the stiffest sample."""
    _, stats = _solve(STIFF_Y0, STIFF_LAMBDA, "global")
    assert np.asarray(stats.nfe).shape == (1,)
    nfe_ps = np.asarray(_solve(STIFF_Y0, STIFF_LAMBDA, "per_sample")[1].nfe)
    # The shared step sequence is driven by the stiff tail: global NFE far
    # exceeds what the mildest samples need on their own...
    assert int(stats.nfe[0]) > int(nfe_ps.min()) * 3
    # ...but is *smaller* than the stiffest sample's own-norm NFE, because the
    # batch-global RMS dilutes that sample's error across the whole batch —
    # i.e. global control silently under-resolves stiff samples, which is
    # exactly why BASELINE.json demands per-sample control.
    assert int(stats.nfe[0]) <= int(nfe_ps.max()) + 12


def test_per_sample_accuracy():
    ts = np.linspace(0.0, 1.0, 5)
    ys, stats = odeint(
        stiff_func_for(STIFF_LAMBDA),
        jnp.asarray(STIFF_Y0),
        jnp.asarray(ts),
        rtol=1e-6,
        atol=1e-8,
        error_control="per_sample",
    )
    exact = stiff_spread_exact(ts, STIFF_Y0)
    assert bool(np.all(stats.success))
    np.testing.assert_allclose(np.asarray(ys), exact, rtol=5e-4, atol=1e-6)
