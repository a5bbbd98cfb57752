"""Pallas fused-ODEfunc equivalence vs the jnp path (SURVEY.md §4 item 4);
runs the kernel in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.kernels.odefunc_pallas import (
    odefunc_pallas,
    pallas_supported,
)
from neural_ode_features_tpu.models import ModelConfig, init_odenet
from neural_ode_features_tpu.models.odenet import odefunc_apply


@pytest.mark.parametrize("side,batch", [(6, 8), (7, 16), (6, 33)])
def test_pallas_matches_jnp(side, batch):
    cfg = ModelConfig(in_channels=1)
    params = init_odenet(jax.random.PRNGKey(0), cfg)["odefunc"]
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(batch, side, side, 64)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, size=(batch,)), jnp.float32)
    assert pallas_supported(h, cfg.groups)

    ref = odefunc_apply(params, t, h, cfg)
    out = odefunc_pallas(params, t, h, groups=cfg.groups, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_scalar_t():
    cfg = ModelConfig(in_channels=1)
    params = init_odenet(jax.random.PRNGKey(2), cfg)["odefunc"]
    h = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6, 6, 64)),
                    jnp.float32)
    ref = odefunc_apply(params, 0.37, h, cfg)
    out = odefunc_pallas(params, 0.37, h, groups=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
