"""Fused RK-step Pallas kernel (kernels/rk_step_pallas.py) equivalence vs
the jnp solver path — interpreter mode on the CPU backend (Mosaic only
compiles for TPU; hardware parity is spot-checked by the bench harness).

The kernel must reproduce ``_rk_attempt`` + ``_error_ratio`` for the
dopri5 tableau bit-for-bit up to f32 reassociation: same stage states, same
embedded error norm, same dense-output midpoint — so the full solve
(accept/reject sequence, NFE, dense output) is equivalent.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.kernels.rk_step_pallas import (
    fused_rk_supported,
    make_fused_dopri5_step,
)
from neural_ode_features_tpu.models import (
    ModelConfig,
    init_odenet,
    odenet_logits,
    odenet_trajectory,
)
from neural_ode_features_tpu.models.odenet import odefunc_apply
from neural_ode_features_tpu.solver.runge_kutta import (
    _error_ratio,
    _rk_attempt,
)
from neural_ode_features_tpu.solver.tableau import ADAPTIVE_TABLEAUS

B, H, W, C = 16, 6, 6, 64
RTOL = ATOL = 1e-3


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(in_channels=1, tol=RTOL, error_control="per_sample")
    params = init_odenet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32) * 0.3)
    return cfg, params, h


@pytest.mark.parametrize("strategy", ["rollS", "roll9", "im2col", "tree9"])
def test_step_matches_rk_attempt(setup, strategy):
    cfg, params, h = setup
    tab = ADAPTIVE_TABLEAUS["dopri5"]
    y0 = h.reshape(B, -1)

    def func(t, y):
        return odefunc_apply(
            params["odefunc"], t, y.reshape(B, H, W, C), cfg
        ).reshape(B, -1)

    rng = np.random.default_rng(2)
    t0 = jnp.asarray(rng.uniform(0.0, 0.5, B).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.05, 0.2, B).astype(np.float32))
    f0 = func(t0, y0)

    y1_ref, err_ref, f1_ref, _, parts_fn_ref = _rk_attempt(
        tab, func, t0, dt, y0, f0, jnp.float32
    )
    parts_ref = parts_fn_ref()
    ratio_ref = _error_ratio(err_ref, y0, y1_ref, RTOL, ATOL)

    fused = make_fused_dopri5_step(
        params["odefunc"], tab, (H, W), groups=cfg.groups,
        rtol=RTOL, atol=ATOL, interpret=True, conv_strategy=strategy,
    )
    y1, f1, y_mid, ratio = fused(t0, dt, y0, f0)

    np.testing.assert_allclose(y1, y1_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(f1, f1_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(y_mid, parts_ref[2], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ratio, ratio_ref, rtol=2e-3, atol=1e-6)


@pytest.mark.parametrize("shape_cfg", [(1, 28), (3, 32)])
def test_full_forward_matches_jnp(shape_cfg):
    in_ch, side = shape_cfg
    cfg = ModelConfig(in_channels=in_ch, tol=1e-3,
                      error_control="per_sample")
    params = init_odenet(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(16, side, side, in_ch))
        .astype(np.float32)
    )
    logits_ref, stats_ref = odenet_logits(params, x, cfg)
    cfg_f = dataclasses.replace(cfg, use_fused_rk=True)
    logits, stats = odenet_logits(params, x, cfg_f)

    # Same accept/reject sequence → identical NFE; logits equal to f32
    # reassociation noise accumulated over the solve.
    np.testing.assert_array_equal(np.asarray(stats.nfe),
                                  np.asarray(stats_ref.nfe))
    np.testing.assert_allclose(logits, logits_ref, rtol=1e-3, atol=1e-3)


def test_trajectory_dense_output_matches(setup):
    cfg, params, _ = setup
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(8, 28, 28, 1))
        .astype(np.float32)
    )
    ts = jnp.linspace(0.0, 1.0, 5)
    traj_ref, _ = odenet_trajectory(params, x, ts, cfg)
    cfg_f = dataclasses.replace(cfg, use_fused_rk=True)
    traj, stats = odenet_trajectory(params, x, ts, cfg_f)
    assert bool(np.all(np.asarray(stats.success)))
    np.testing.assert_allclose(traj, traj_ref, rtol=1e-3, atol=1e-3)


def test_non_dividing_batch_tile(setup):
    """Batches the ≤16 tile cap doesn't divide (e.g. B=20) must shrink the
    tile to a divisor — a bare min() made grid = B // tb drop the tail
    samples, leaving their outputs unwritten (regression, round 3)."""
    cfg, params, _ = setup
    tab = ADAPTIVE_TABLEAUS["dopri5"]
    b = 20
    rng = np.random.default_rng(6)
    h = jnp.asarray(rng.normal(size=(b, H, W, C)).astype(np.float32) * 0.3)
    y0 = h.reshape(b, -1)

    def func(t, y):
        return odefunc_apply(
            params["odefunc"], t, y.reshape(b, H, W, C), cfg
        ).reshape(b, -1)

    t0 = jnp.zeros((b,), jnp.float32)
    dt = jnp.full((b,), 0.1, jnp.float32)
    f0 = func(t0, y0)
    y1_ref, err_ref, f1_ref, _, _ = _rk_attempt(
        tab, func, t0, dt, y0, f0, jnp.float32
    )
    fused = make_fused_dopri5_step(
        params["odefunc"], tab, (H, W), groups=cfg.groups,
        rtol=RTOL, atol=ATOL, interpret=True,
    )
    y1, f1, _, _ = fused(t0, dt, y0, f0)
    np.testing.assert_allclose(y1, y1_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(f1, f1_ref, rtol=2e-4, atol=2e-5)


def test_supported_predicate():
    assert fused_rk_supported(64, 6 * 6 * 64, (6, 6), 32)
    assert not fused_rk_supported(64, 6 * 6 * 64 + 1, (6, 6), 32)
    assert not fused_rk_supported(64, 6 * 6 * 48, (6, 6), 32)  # C % groups
