"""Model zoo tests: shapes, parameter counts (~0.22M per Chen et al., TBV),
trajectory extraction, adjoint trainability (SURVEY.md §4 test plan)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.models import (
    ModelConfig,
    init_odenet,
    init_resnet,
    odenet_logits,
    odenet_trajectory,
    pool_features,
    resnet_block_states,
    resnet_logits,
)
# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast

CFG_MNIST = ModelConfig(in_channels=1, tol=1e-2)
CFG_CIFAR = ModelConfig(in_channels=3, tol=1e-2)


def _param_count(params):
    return int(jax.flatten_util.ravel_pytree(params)[0].size)


def _x(cfg, b=2):
    side = 28 if cfg.in_channels == 1 else 32
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(b, side, side, cfg.in_channels)),
        jnp.float32,
    )


@pytest.fixture(scope="module")
def odenet_mnist():
    return init_odenet(jax.random.PRNGKey(0), CFG_MNIST)


def test_odenet_param_count(odenet_mnist):
    """Chen et al. report ~0.22M params for the MNIST ODE-Net (BASELINE.md,
    TBV).  Sanity band: 0.15M – 0.30M."""
    n = _param_count(odenet_mnist)
    assert 150_000 < n < 300_000, f"param count {n}"


def test_odenet_forward_shapes(odenet_mnist):
    logits, stats = odenet_logits(odenet_mnist, _x(CFG_MNIST), CFG_MNIST)
    assert logits.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.asarray(stats.nfe).shape == (2,)  # per-sample accounting
    assert int(np.asarray(stats.nfe).min()) >= 8


def test_odenet_cifar_shapes():
    params = init_odenet(jax.random.PRNGKey(1), CFG_CIFAR)
    logits, _ = odenet_logits(params, _x(CFG_CIFAR), CFG_CIFAR)
    assert logits.shape == (2, 10)


def test_odenet_trajectory_extraction(odenet_mnist):
    """N timestamps from ONE solve; features finite, distinct per t, and the
    t=1 state consistent with the classification forward."""
    ts = jnp.linspace(0.0, 1.0, 5)
    traj, stats = odenet_trajectory(odenet_mnist, _x(CFG_MNIST), ts, CFG_MNIST)
    assert traj.shape[:2] == (5, 2)
    feats = pool_features(traj)
    assert feats.shape == (5, 2, 64)
    assert np.all(np.isfinite(np.asarray(feats)))
    # states must evolve with t
    d = np.abs(np.asarray(feats[0]) - np.asarray(feats[-1])).max()
    assert d > 1e-3
    # one solve: NFE comparable to a plain [0,1] solve, far below 5 solves
    logits, stats_cls = odenet_logits(odenet_mnist, _x(CFG_MNIST), CFG_MNIST)
    assert int(stats.nfe.max()) < 2 * int(stats_cls.nfe.max())


def test_odenet_global_control_mode():
    cfg = ModelConfig(in_channels=1, tol=1e-2, error_control="global")
    params = init_odenet(jax.random.PRNGKey(0), cfg)
    logits, stats = odenet_logits(params, _x(cfg), cfg)
    assert logits.shape == (2, 10)
    assert np.asarray(stats.nfe).shape == (1,)


def test_odenet_adjoint_training_step(odenet_mnist):
    """One SGD step through the adjoint must reduce loss on a fixed batch."""
    x = _x(CFG_MNIST, b=4)
    y = jnp.asarray([0, 1, 2, 3])

    def loss_fn(p):
        logits, _ = odenet_logits(p, x, CFG_MNIST, adjoint=True)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(4), y])

    l0, g = jax.value_and_grad(loss_fn)(odenet_mnist)
    gnorm = jnp.sqrt(
        sum(jnp.sum(v**2) for v in jax.tree.leaves(g))
    )
    assert np.isfinite(float(l0)) and float(gnorm) > 0
    p1 = jax.tree.map(lambda p, g_: p - 0.05 * g_, odenet_mnist, g)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0), (float(l0), float(l1))


def test_resnet_forward_and_taps():
    params = init_resnet(jax.random.PRNGKey(0), CFG_MNIST)
    logits = resnet_logits(params, _x(CFG_MNIST), CFG_MNIST)
    assert logits.shape == (2, 10)
    states = resnet_block_states(params, _x(CFG_MNIST), CFG_MNIST)
    assert states.shape[0] == CFG_MNIST.num_blocks + 1
    feats = pool_features(states)
    assert feats.shape == (7, 2, 64)


def test_resnet_param_count_close_to_odenet():
    """The papers' comparison point: ResNet(6) has ~2.6x the ODE-Net's
    params (0.58M vs 0.22M per Chen et al. — TBV)."""
    n_ode = _param_count(init_odenet(jax.random.PRNGKey(0), CFG_MNIST))
    n_res = _param_count(init_resnet(jax.random.PRNGKey(0), CFG_MNIST))
    assert n_res > n_ode * 1.8


def test_bfloat16_compute_path():
    cfg = ModelConfig(in_channels=1, tol=1e-2, compute_dtype="bfloat16")
    params = init_odenet(jax.random.PRNGKey(0), cfg)
    logits, stats = odenet_logits(params, _x(cfg), cfg)
    assert logits.dtype == jnp.float32  # solver state stays f32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_object_api():
    """Reference-style class surface: ODENet / ResNet / ODEBlock."""
    from neural_ode_features_tpu.models import ODEBlock, ODENet, ResNet

    net = ODENet.create(jax.random.PRNGKey(0), in_channels=1, tol=1e-2)
    x = _x(CFG_MNIST)
    logits, stats = net(x)
    assert logits.shape == (2, 10)
    feats, _ = net.features(x, jnp.linspace(0, 1, 4))
    assert feats.shape == (4, 2, 64)

    block = ODEBlock(net.params["odefunc"], net.config)
    from neural_ode_features_tpu.models.common import stem_apply
    h0 = stem_apply(net.params["stem"], x, net.config)
    h1, st = block(h0)
    assert h1.shape == h0.shape

    res = ResNet.create(jax.random.PRNGKey(1), in_channels=1)
    assert res(x).shape == (2, 10)
    assert res.features(x).shape == (7, 2, 64)


def test_odeblock_explicit_two_point_ts_returns_trajectory():
    """Regression (code review): an explicit 2-element ts used to collapse to
    the final state; explicit grids always return the full trajectory."""
    from neural_ode_features_tpu.models import ODEBlock, ODENet
    from neural_ode_features_tpu.models.common import stem_apply

    net = ODENet.create(jax.random.PRNGKey(0), in_channels=1, tol=1e-2)
    h0 = stem_apply(net.params["stem"], _x(CFG_MNIST), net.config)
    blk = ODEBlock(net.params["odefunc"], net.config)
    traj, _ = blk(h0, ts=jnp.asarray([0.0, 0.5]))
    assert traj.shape == (2,) + h0.shape
    final, _ = blk(h0)
    assert final.shape == h0.shape


def test_res_downsampling_stem():
    """Reference parity: --downsampling-method res (stride-2 residual stem)."""
    cfg = ModelConfig(in_channels=1, tol=1e-2, downsampling="res")
    params = init_odenet(jax.random.PRNGKey(0), cfg)
    logits, stats = odenet_logits(params, _x(cfg), cfg)
    assert logits.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(logits)))
    # 3x3 s2 residual blocks: 28 -> 26 -> 13 -> 7 (shortcut agrees)
    from neural_ode_features_tpu.models.common import stem_apply
    h = stem_apply(params["stem"], _x(cfg), cfg)
    assert h.shape == (2, 7, 7, 64)
    # CIFAR: 32 -> 30 -> 15 -> 8
    cfg3 = ModelConfig(in_channels=3, tol=1e-2, downsampling="res")
    p3 = init_odenet(jax.random.PRNGKey(1), cfg3)
    h3 = stem_apply(p3["stem"], _x(cfg3), cfg3)
    assert h3.shape == (2, 8, 8, 64)


def test_conv_transpose_path():
    """ops.conv2d(transpose=True) upsamples (the reference's ConcatConv2d
    carries a transpose flag; ours lives on the layer op)."""
    from neural_ode_features_tpu.ops import conv2d, init_conv

    p = init_conv(jax.random.PRNGKey(0), 4, 4, 8, 8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 6, 8)),
                    jnp.float32)
    up = conv2d(p, x, stride=2, padding=1, transpose=True)
    assert up.shape == (2, 12, 12, 8)
    assert np.all(np.isfinite(np.asarray(up)))


def test_bfloat16_adjoint_training_grads():
    """Regression: bf16 dynamics + adjoint raised a conv-VJP dtype mismatch
    (preferred_element_type wider than the inputs); gradients must be finite
    and close to the f32 path."""
    cfg16 = ModelConfig(in_channels=1, tol=1e-2, compute_dtype="bfloat16")
    cfg32 = ModelConfig(in_channels=1, tol=1e-2)
    params = init_odenet(jax.random.PRNGKey(0), cfg32)
    x = _x(cfg32, b=4)

    def gnorm(cfg):
        g = jax.grad(lambda p: jnp.sum(
            odenet_logits(p, x, cfg, adjoint=True)[0]))(params)
        flat = jax.flatten_util.ravel_pytree(g)[0]
        assert np.all(np.isfinite(np.asarray(flat)))
        return float(jnp.linalg.norm(flat))

    n16, n32 = gnorm(cfg16), gnorm(cfg32)
    assert abs(n16 - n32) / n32 < 0.15, (n16, n32)


def test_odeblock_honors_config_adjoint():
    """api.py's documented jax.grad recipe ('construct the config with
    adjoint=True') must work for ODEBlock too — it silently forced
    adjoint=False before (code-review r4)."""
    import jax

    from neural_ode_features_tpu.models import ModelConfig, ODEBlock, ODENet

    cfg = ModelConfig(in_channels=1, hidden=32, groups=8, tol=1e-2,
                      adjoint=True)
    net = ODENet.create(jax.random.PRNGKey(0), cfg)
    blk = ODEBlock(net.params["odefunc"], cfg)
    h0 = jnp.ones((2, 6, 6, 32), jnp.float32) * 0.1

    # Reverse-differentiable only via the adjoint path (the plain forward
    # is a lax.while_loop).
    g = jax.grad(lambda h: jnp.sum(blk(h)[0] ** 2))(h0)
    assert g.shape == h0.shape
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0
