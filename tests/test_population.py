"""Population (vmapped multi-seed) training: member i must reproduce the
solo run with seed i, the seed axis must shard over the data mesh axis,
and the per-seed states must stay solo-compatible (multi.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neural_ode_features_tpu.data import load_dataset
from neural_ode_features_tpu.multi import PopulationTrainer
from neural_ode_features_tpu.training import TrainConfig, Trainer


def _tiny_cfg(**kw):
    base = dict(
        dataset="synthetic-mnist",
        tol=1e-2,
        epochs=1,
        batch_size=32,
        lr=0.05,
        lr_decay_epochs=(),
        num_devices=2,
    )
    base.update(kw)
    return TrainConfig(**base)


def _tiny_data(limit=64):
    x, y = load_dataset("synthetic-mnist", "train", None, limit=limit)
    xt, yt = load_dataset("synthetic-mnist", "test", None, limit=limit)
    return x, y, xt, yt


def test_population_matches_solo_resnet():
    """ResNet (no adaptive branching): population member 1 tracks the solo
    seed-1 run to float noise."""
    x, y, xt, yt = _tiny_data()
    cfg = _tiny_cfg(model="resnet")
    steps = len(x) // cfg.batch_size

    pop = PopulationTrainer(cfg, [0, 1], steps)
    em = pop.train_epoch(x, y, 0)
    assert em["loss"].shape == (2, steps)

    solo = Trainer(TrainConfig(**{**cfg.__dict__, "seed": 1}), steps)
    em1 = solo.train_epoch(x, y, 0)
    np.testing.assert_allclose(em["loss"][1], em1["loss"], rtol=1e-5,
                               atol=1e-6)
    p_pop = pop.params_for(1)
    p_solo = jax.device_get(solo.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        p_pop, p_solo,
    )
    # And the two members genuinely differ (different seeds).
    assert not np.allclose(em["loss"][0], em["loss"][1])


def test_population_seed_axis_shards_over_data():
    """K=2 on a 2-device mesh: every param leaf shards its leading (seed)
    axis over 'data' — zero-collective parallelism."""
    from jax.sharding import PartitionSpec as P

    x, y, *_ = _tiny_data()
    cfg = _tiny_cfg(model="resnet")
    pop = PopulationTrainer(cfg, [0, 1], len(x) // cfg.batch_size)
    leaf = jax.tree.leaves(pop.params)[0]
    assert leaf.sharding.spec == P("data")
    assert len(leaf.sharding.device_set) == 2


def test_population_odenet_state_roundtrip(tmp_path):
    """Adjoint ODE-Net population: epoch + fused eval run; a per-seed state
    written by the population loads into a solo Trainer and evaluates to
    the same accuracy (format + semantics compatibility).

    num_devices=1: the vmapped adjoint epoch is the suite's heaviest
    XLA:CPU compile and multi-device variants of it belong in bare
    processes (CLAUDE.md segfault rule); the 2-device sharding semantics
    are covered by the cheap ResNet tests above."""
    x, y, xt, yt = _tiny_data()
    cfg = _tiny_cfg(num_devices=1)
    steps = len(x) // cfg.batch_size

    pop = PopulationTrainer(cfg, [0, 1], steps)
    em = pop.train_epoch(x, y, 0)
    assert np.all(np.isfinite(em["loss"])) and np.all(em["nfe"] > 5)
    evs = pop.evaluate_fused(xt, yt)
    assert len(evs) == 2 and all(0.0 <= e["acc"] <= 1.0 for e in evs)

    pop.save_state_for(1, tmp_path / "s1.msgpack")
    solo = Trainer(TrainConfig(**{**cfg.__dict__, "seed": 1}), steps)
    solo.load_state(tmp_path / "s1.msgpack")
    ev1 = solo.evaluate_fused(xt, yt)
    assert abs(ev1["acc"] - evs[1]["acc"]) < 1e-6

    # load_states restacks solo-format states bit-exactly.
    pop.save_state_for(0, tmp_path / "s0.msgpack")
    pop2 = PopulationTrainer(cfg, [0, 1], steps)
    pop2.load_states([tmp_path / "s0.msgpack", tmp_path / "s1.msgpack"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(pop.params), jax.device_get(pop2.params),
    )


def test_population_validation():
    x, y, *_ = _tiny_data()
    steps = len(x) // 32
    with pytest.raises(ValueError, match="FSDP"):
        PopulationTrainer(_tiny_cfg(model_shards=2), [0, 1], steps)
    with pytest.raises(ValueError, match="at least one"):
        PopulationTrainer(_tiny_cfg(), [], steps)


@pytest.mark.slow
def test_population_cli_and_resume(tmp_path):
    """train.py --seeds writes one solo-compatible run dir per seed and a
    second invocation resumes (trains zero additional epochs)."""
    import train as train_cli

    args = [
        "--dataset", "synthetic-mnist", "--epochs", "1", "--limit", "96",
        "--batch-size", "32", "--tol", "1e-2", "--lr", "0.05",
        "--lr-decay-epochs", "", "--seeds", "0,1",
        "--runs-dir", str(tmp_path / "runs"),
    ]
    dirs = train_cli.main(args)
    assert len(dirs) == 2
    for d in dirs:
        assert (d / "ckpt_best.msgpack").exists()
        assert (d / "train_state.msgpack").exists()
        assert len(Path(d / "log.csv").read_text().splitlines()) == 2
    dirs2 = train_cli.main(args)
    assert [str(d) for d in dirs2] == [str(d) for d in dirs]
    for d in dirs2:  # resume appended no rows
        assert len(Path(d / "log.csv").read_text().splitlines()) == 2
