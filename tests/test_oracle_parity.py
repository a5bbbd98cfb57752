"""Cross-implementation parity harness (SURVEY.md §4 item 3): the JAX solver
in batch-global mode vs an independent torch-CPU dopri5 on the same weights
must agree on trajectories and logits at equal tolerances."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from neural_ode_features_tpu.models import ModelConfig, init_odenet, odenet_logits
from neural_ode_features_tpu.oracle.torch_ref import (
    build_torch_odenet,
    load_jax_params_into_torch,
    torch_odeint,
)
from neural_ode_features_tpu.solver import odeint


def test_solver_parity_scalar_ode():
    """Same ODE, same tolerances: trajectories match to ~tolerance, NFE
    within the difference explained by clamped-step vs dense-output."""
    lam = -1.7

    def jf(t, y):
        return lam * y

    def tf(t, y):
        return lam * y

    ts = np.linspace(0.0, 2.0, 5)
    y0 = np.ones((4, 3))
    ys_j, stats = odeint(jf, jnp.asarray(y0, jnp.float64), jnp.asarray(ts),
                         rtol=1e-6, atol=1e-8, error_control="global")
    ys_t, nfe_t = torch_odeint(tf, torch.tensor(y0), torch.tensor(ts),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ys_j), ys_t.numpy(), rtol=1e-5,
                               atol=1e-7)
    nfe_j = int(stats.nfe[0])
    assert abs(nfe_j - nfe_t) < max(12, 0.5 * nfe_j), (nfe_j, int(nfe_t))


def test_odenet_logits_parity():
    """Full model: jax (global control, f32) vs torch oracle on identical
    weights — logits must agree to solver-tolerance accuracy."""
    cfg = ModelConfig(in_channels=1, tol=1e-4, error_control="global")
    params = init_odenet(jax.random.PRNGKey(3), cfg)
    tm = build_torch_odenet(in_channels=1)
    load_jax_params_into_torch(tm, params)
    tm.eval()

    x = np.random.default_rng(0).normal(size=(2, 28, 28, 1)).astype(np.float32)
    logits_j, _ = odenet_logits(params, jnp.asarray(x), cfg)
    with torch.no_grad():
        logits_t, nfe_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_j, np.float64),
                               logits_t.numpy(), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("tol", [1e-2, 1e-3, 1e-4])
def test_nfe_parity_across_tolerances(tol):
    """BASELINE.json: mean NFE must match the reference at equal rtol/atol.
    With identical weights and batch-global control, the accepted-step
    sequences coincide exactly (measured 26/32/44/80 at 1e-2..1e-5)."""
    import dataclasses

    from neural_ode_features_tpu.models import ModelConfig, init_odenet, odenet_logits
    from neural_ode_features_tpu.oracle.torch_ref import (
        build_torch_odenet,
        load_jax_params_into_torch,
    )

    cfg = ModelConfig(in_channels=1, tol=tol, error_control="global")
    params = init_odenet(jax.random.PRNGKey(3), cfg)
    tm = build_torch_odenet(in_channels=1)
    load_jax_params_into_torch(tm, params)
    tm.eval()
    x = np.random.default_rng(0).normal(size=(4, 28, 28, 1)).astype(np.float32)
    _, stats = odenet_logits(params, jnp.asarray(x), cfg)
    with torch.no_grad():
        _, nfe_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      rtol=tol, atol=tol)
    assert int(stats.nfe[0]) == int(nfe_t), (int(stats.nfe[0]), int(nfe_t))


def test_oracle_rejects_unmapped_checkpoint():
    """A --model resnet checkpoint has no torch-oracle counterpart: the
    loader must fail with the actionable --skip-baseline message, not a raw
    KeyError (code-review r4)."""
    from neural_ode_features_tpu.models import ModelConfig
    from neural_ode_features_tpu.models.resnet import init_resnet
    from neural_ode_features_tpu.oracle.torch_ref import (
        build_torch_odenet,
        load_jax_params_into_torch,
    )

    cfg = ModelConfig(in_channels=1)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    tm = build_torch_odenet(in_channels=1)
    with pytest.raises(ValueError, match="skip-baseline"):
        load_jax_params_into_torch(tm, params)
