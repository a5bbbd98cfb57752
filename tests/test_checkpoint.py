"""Checkpoint format tests: msgpack round-trip + torch name-map conversion
both ways (BASELINE.json: checkpoint format is public surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.models import (
    ModelConfig,
    init_odenet,
    init_resnet,
    odenet_logits,
)
from neural_ode_features_tpu.utils import (
    Experiment,
    from_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
    to_torch_state_dict,
)
# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast


def test_roundtrip(tmp_path):
    cfg = ModelConfig(in_channels=1, tol=1e-2)
    params = init_odenet(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "ckpt.msgpack"
    save_checkpoint(path, params, cfg, extra={"epoch": 3, "model": "odenet"})
    params2, cfg2, extra = load_checkpoint(path)
    assert cfg2 == cfg and extra["epoch"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resnet_roundtrip(tmp_path):
    cfg = ModelConfig(in_channels=3)
    params = init_resnet(jax.random.PRNGKey(1), cfg)
    path = tmp_path / "c.msgpack"
    save_checkpoint(path, params, cfg)
    params2, _, _ = load_checkpoint(path, init_resnet)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_state_dict_roundtrip():
    """ours → torch names/layouts → ours must be the identity."""
    cfg = ModelConfig(in_channels=1)
    params = init_odenet(jax.random.PRNGKey(2), cfg)
    sd = to_torch_state_dict(params)
    # torch conventions: OIHW convs, (out,in) linear
    assert sd["stem.conv0.weight"].shape == (64, 1, 3, 3)
    assert sd["odefunc.conv1.weight"].shape == (64, 65, 3, 3)
    assert sd["head.fc.weight"].shape == (10, 64)
    back = from_torch_state_dict(params, sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loaded_checkpoint_reproduces_logits(tmp_path):
    cfg = ModelConfig(in_channels=1, tol=1e-2)
    params = init_odenet(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 1)),
                    jnp.float32)
    ref, _ = odenet_logits(params, x, cfg)
    save_checkpoint(tmp_path / "c.msgpack", params, cfg)
    params2, cfg2, _ = load_checkpoint(tmp_path / "c.msgpack")
    out, _ = odenet_logits(params2, x, cfg2)
    # ULP-tight, not bitwise: loaded params are host numpy arrays, and the
    # split ConcatConv's ones-map conv can pick a different lowering for
    # host-sourced operands (measured max |Δ| ≈ 2e-7).  Checkpoint fidelity
    # (same weights → same function) is what this pins.
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=5e-7)


def test_expman_run_dirs(tmp_path):
    p = {"dataset": "mnist", "lr": 0.1, "adjoint": True}
    e1 = Experiment(tmp_path, p).create()
    assert e1.exists
    e1.log({"epoch": 0, "loss": 1.5})
    e1.log({"epoch": 1, "loss": 1.2})
    # deterministic resume: same params → same dir
    e2 = Experiment(tmp_path, p)
    assert e2.path == e1.path and e2.exists
    rows = e2.read_log()
    assert len(rows) == 2 and rows[1]["loss"] == "1.2"
    # different params → different dir
    e3 = Experiment(tmp_path, {**p, "lr": 0.01})
    assert e3.path != e1.path
    # reload params from dir
    e4 = Experiment.from_dir(e1.path)
    assert e4.params["dataset"] == "mnist"


def test_expman_long_names_do_not_collide(tmp_path):
    """Regression (code review): >200-char names were truncated and distinct
    experiments (e.g. differing only in seed) collided into one dir."""
    base = {f"param_with_a_rather_long_name_{i}": i for i in range(12)}
    e0 = Experiment(tmp_path, {**base, "seed": 0})
    e1 = Experiment(tmp_path, {**base, "seed": 1})
    assert e0.path != e1.path
    assert len(e0.name) <= 200


def test_expman_refuses_foreign_rundir(tmp_path):
    """create() must not silently adopt a dir holding different params."""
    p = {"a": 1}
    e0 = Experiment(tmp_path, p, name="fixed").create()
    import pytest as _pt

    with _pt.raises(ValueError, match="DIFFERENT"):
        Experiment(tmp_path, {"a": 2}, name="fixed").create()
    # identical params are fine (resume)
    Experiment(tmp_path, p, name="fixed").create()


def test_reference_style_torch_names():
    """Regression (code review): the documented reference-style name map is
    now actually implemented, both directions."""
    cfg = ModelConfig(in_channels=1)
    params = init_odenet(jax.random.PRNGKey(5), cfg)
    sd = to_torch_state_dict(params, style="reference")
    assert "downsampling_layers.0.weight" in sd
    assert "feature_layers.0.odefunc.conv1._layer.weight" in sd
    assert "fc_layers.4.weight" in sd and sd["fc_layers.4.weight"].shape == (10, 64)
    back = from_torch_state_dict(params, sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resnet block prefixes
    pr = init_resnet(jax.random.PRNGKey(6), cfg)
    sdr = to_torch_state_dict(pr, style="reference")
    assert "feature_layers.0.conv1.weight" in sdr
    back_r = from_torch_state_dict(pr, sdr)
    for a, b in zip(jax.tree.leaves(pr), jax.tree.leaves(back_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
