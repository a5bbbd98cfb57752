"""Pallas fused-ODEfunc equivalence vs the jnp path (SURVEY.md §4 item 4);
runs the kernel in interpreter mode on CPU."""

import jax
import jax.flatten_util
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


@pytest.mark.parametrize("batch,side", [(8, 6), (32, 7)])
def test_pallas_vjp_matches_jnp_grads(batch, side):
    """The fused backward kernel (odefunc_pallas_vjp) must reproduce
    jax.vjp of the jnp dynamics: gradients w.r.t. params, t and h all match
    to f32 roundoff (VERDICT r1 weak #2: the custom-VJP kernel pair).
    (32, 7) exercises the multi-tile grid (revisited accumulator blocks)
    and the CIFAR-shape 7×7 rows layout — the hardware-probe shape."""
    from neural_ode_features_tpu.kernels.odefunc_pallas import (
        odefunc_pallas_vjp,
    )

    cfg = ModelConfig(in_channels=1)
    params = init_odenet(jax.random.PRNGKey(5), cfg)["odefunc"]
    key = jax.random.PRNGKey(6)
    h = jax.random.normal(key, (batch, side, side, 64), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(7), h.shape, jnp.float32)
    t = jnp.asarray(0.43)

    def loss_pallas(p, tt, hh):
        return jnp.sum(odefunc_pallas_vjp(p, tt, hh, 32, True) * g)

    def loss_jnp(p, tt, hh):
        return jnp.sum(odefunc_apply(p, tt, hh, cfg) * g)

    gp, gt, gh = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, t, h)
    rp, rt, rh = jax.grad(loss_jnp, argnums=(0, 1, 2))(params, t, h)

    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(gt), float(rt), rtol=2e-4, atol=1e-5)
    flat_g = jax.flatten_util.ravel_pytree(gp)[0]
    flat_r = jax.flatten_util.ravel_pytree(rp)[0]
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_r),
                               rtol=3e-4, atol=3e-4)


def test_pallas_vjp_per_sample_t():
    """Per-sample integration times (B,) must get per-sample t-gradients."""
    from neural_ode_features_tpu.kernels.odefunc_pallas import (
        odefunc_pallas_vjp,
    )

    cfg = ModelConfig(in_channels=1)
    params = init_odenet(jax.random.PRNGKey(8), cfg)["odefunc"]
    h = jax.random.normal(jax.random.PRNGKey(9), (4, 6, 6, 64), jnp.float32)
    tb = jnp.linspace(0.1, 0.9, 4)

    def loss_pallas(tt):
        return jnp.sum(odefunc_pallas_vjp(params, tt, h, 32, True) ** 2)

    def loss_jnp(tt):
        return jnp.sum(odefunc_apply(params, tt, h, cfg) ** 2)

    gt = jax.grad(loss_pallas)(tb)
    rt = jax.grad(loss_jnp)(tb)
    assert gt.shape == (4,)
    # dt sums 72 per-position contributions across two convs in a different
    # order than XLA — f32 roundoff on near-cancelling values needs the
    # looser absolute floor.
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt),
                               rtol=5e-3, atol=5e-5)


def test_pallas_adjoint_training_gradients():
    """End-to-end: adjoint gradients of the full ODE-Net with
    cfg.use_pallas=True (fused forward + fused backward inside the
    augmented dynamics' jax.vjp) match the jnp path."""
    from neural_ode_features_tpu.models import odenet_logits

    # Tight tolerance: at loose tol the two (equal-to-1e-6) dynamics can
    # flip backward accept/reject decisions, adding O(tol) integration noise
    # on top of kernel error — tol 1e-5 isolates the kernel claim.
    cfg_j = ModelConfig(in_channels=1, tol=1e-5, adjoint=True,
                        error_control="global", max_steps=512)
    import dataclasses

    cfg_p = dataclasses.replace(cfg_j, use_pallas=True)
    params = init_odenet(jax.random.PRNGKey(11), cfg_j)
    # f32 explicitly: under the test suite's x64 mode the default would be
    # f64, which the pallas dispatch (correctly) declines.
    x = jax.random.normal(jax.random.PRNGKey(12), (8, 28, 28, 1),
                          jnp.float32)
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)

    def loss(p, cfg):
        logits, _ = odenet_logits(p, x, cfg, adjoint=True)
        return jnp.sum(logits ** 2)

    vj, gj = jax.value_and_grad(lambda p: loss(p, cfg_j))(params)
    vp, gp = jax.value_and_grad(lambda p: loss(p, cfg_p))(params)
    np.testing.assert_allclose(float(vp), float(vj), rtol=1e-5)
    fj = np.asarray(jax.flatten_util.ravel_pytree(gj)[0])
    fp = np.asarray(jax.flatten_util.ravel_pytree(gp)[0])
    # Single-eval VJP exactness is pinned by test_pallas_vjp_matches_jnp_grads;
    # end-to-end, both f32 paths accumulate per-eval rounding through ~100
    # reverse dynamics evals (measured ~4e-3 rel L2 between them, NOT
    # shrinking with tol — rounding accumulation, not step divergence), so
    # assert direction + magnitude agreement at that scale.
    rel_l2 = np.linalg.norm(fp - fj) / np.linalg.norm(fj)
    cos = float(np.dot(fp, fj) / (np.linalg.norm(fp) * np.linalg.norm(fj)))
    assert rel_l2 < 1e-2, rel_l2
    assert cos > 0.9999, cos


def test_pallas_gate_forward_only_with_jnp_bwd_fallback():
    """A large H*W*C state whose BACKWARD rows kernel cannot fit VMEM must
    (a) still pass pallas_supported — the forward fits, so inference keeps
    the fused kernel (code-review r4: the old bwd-budget gate silently
    slowed forward-only extract/bench for these shapes) — and (b) remain
    differentiable via the jnp backward fallback in _vjp_bwd instead of
    stack-OOMing Mosaic at train time, with gradients matching the jnp
    reference."""
    from neural_ode_features_tpu.kernels.odefunc_pallas import (
        VMEM_BUDGET,
        bwd_tile_bytes,
        odefunc_pallas_vjp,
    )
    from neural_ode_features_tpu.kernels.odefunc_bwd_rows import (
        _pick_tile_bwd,
    )

    flagship = jax.ShapeDtypeStruct((8, 7, 7, 64), jnp.float32)
    assert pallas_supported(flagship, 32)
    big = jax.ShapeDtypeStruct((8, 28, 28, 64), jnp.float32)
    assert bwd_tile_bytes(1, 28 * 28, 64) > VMEM_BUDGET
    assert pallas_supported(big, 32)  # forward fits; bwd takes the fallback

    # The tile picker shrinks with the working set instead of a blind cap.
    assert _pick_tile_bwd(8, 7 * 7, 64) == 8
    assert _pick_tile_bwd(8, 14 * 14, 512) == 1
    assert bwd_tile_bytes(_pick_tile_bwd(8, 8 * 8, 512), 64, 512) \
        <= VMEM_BUDGET

    # (b) gradients through the fallback path == jnp reference.
    cfg = ModelConfig(in_channels=1)
    params = init_odenet(jax.random.PRNGKey(13), cfg)["odefunc"]
    h = jax.random.normal(jax.random.PRNGKey(14), (2, 28, 28, 64),
                          jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(15), h.shape, jnp.float32)
    t = jnp.asarray(0.31)

    def loss_pallas(p, tt, hh):
        return jnp.sum(odefunc_pallas_vjp(p, tt, hh, 32, True) * g)

    def loss_jnp(p, tt, hh):
        return jnp.sum(odefunc_apply(p, tt, hh, cfg) * g)

    gp, gt, gh = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, t, h)
    rp, rt, rh = jax.grad(loss_jnp, argnums=(0, 1, 2))(params, t, h)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(gt), float(rt), rtol=2e-4, atol=1e-5)
    flat_g = jax.flatten_util.ravel_pytree(gp)[0]
    flat_r = jax.flatten_util.ravel_pytree(rp)[0]
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_r),
                               rtol=3e-4, atol=3e-4)
