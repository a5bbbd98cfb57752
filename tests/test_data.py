"""Data pipeline tests: synthetic twins, batching, on-device preprocessing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.data import Batches, dataset_spec, load_dataset
from neural_ode_features_tpu.ops.preprocess import augment, normalize


def test_synthetic_shapes_and_determinism():
    x1, y1 = load_dataset("synthetic-mnist", "test", limit=64)
    x2, y2 = load_dataset("synthetic-mnist", "test", limit=64)
    assert x1.shape == (64, 28, 28, 1) and x1.dtype == np.uint8
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    xc, _ = load_dataset("synthetic-cifar10", "train", limit=8)
    assert xc.shape == (8, 32, 32, 3)


def test_synthetic_splits_differ():
    xtr, _ = load_dataset("synthetic-mnist", "train", limit=32)
    xte, _ = load_dataset("synthetic-mnist", "test", limit=32)
    assert not np.array_equal(xtr, xte)


def test_synthetic_class_structure():
    """Same-class images must be closer than cross-class on average."""
    x, y = load_dataset("synthetic-mnist", "train", limit=256)
    x = x.astype(np.float32).reshape(len(x), -1) / 255.0
    same, diff = [], []
    for i in range(0, 128, 4):
        for j in range(128, 256, 4):
            d = np.linalg.norm(x[i] - x[j])
            (same if y[i] == y[j] else diff).append(d)
    assert np.mean(same) < np.mean(diff)


def test_missing_real_dataset_raises_helpfully(tmp_path):
    with pytest.raises(FileNotFoundError, match="synthetic-mnist"):
        load_dataset("mnist", "train", str(tmp_path))


def test_batches_deterministic_shuffle():
    x = np.arange(100, dtype=np.uint8)[:, None, None, None]
    y = np.arange(100, dtype=np.uint8)
    b1 = Batches(x, y, 32, seed=5)
    b2 = Batches(x, y, 32, seed=5)
    for (xa, ya), (xb, yb) in zip(b1, b2):
        np.testing.assert_array_equal(xa, xb)
    assert len(b1) == 3  # drop remainder


def test_batches_resume_epoch_alignment():
    """Resume parity (code-review r4): setting ``epoch`` to the resumed
    index must reproduce the permutation an uninterrupted run used at that
    epoch — train.py relies on this after a preemption restart."""
    x = np.arange(100, dtype=np.uint8)[:, None, None, None]
    y = np.arange(100, dtype=np.uint8)
    straight = Batches(x, y, 32, seed=5)
    for _ in range(3):  # consume epochs 0..2
        list(straight)
    resumed = Batches(x, y, 32, seed=5)
    resumed.epoch = 3
    for (xa, ya), (xb, yb) in zip(straight, resumed):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_padded_batches_mask():
    x = np.zeros((70, 4, 4, 1), np.uint8)
    y = np.zeros(70, np.uint8)
    b = Batches(x, y, 32, shuffle=False, drop_remainder=False)
    batches = list(b.padded_batches())
    assert len(batches) == 3
    img, lab, valid = batches[-1]
    assert img.shape[0] == 32 and valid.sum() == 6


def test_normalize_and_augment_on_device():
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (8, 32, 32, 3), np.uint8)
    )
    x = normalize(x_u8, "cifar10")
    assert x.dtype == jnp.float32
    # normalized stats roughly standardised for uniform input
    assert abs(float(x.mean())) < 2.0

    key = jax.random.PRNGKey(0)
    xa = jax.jit(lambda k, v: augment(k, v))(key, x)
    assert xa.shape == x.shape
    assert not np.allclose(np.asarray(xa), np.asarray(x))
    # deterministic in key
    xb = jax.jit(lambda k, v: augment(k, v))(key, x)
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_dataset_spec():
    assert dataset_spec("synthetic-cifar10")["shape"] == (32, 32, 3)
    assert dataset_spec("mnist")["n_train"] == 60_000


def test_augment_fill_matches_raw_space_crop():
    """Torch-parity property (code-review r4): the reference crops the RAW
    image with black padding and normalizes after; we normalize first, so
    the pad fill must be the dataset's normalized black.  Both orders must
    agree exactly (normalize is affine; crop/flip are selections)."""
    from neural_ode_features_tpu.ops.preprocess import (
        NORM_STATS,
        normalized_black,
    )

    x_u8 = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (8, 32, 32, 3), np.uint8)
    )
    key = jax.random.PRNGKey(7)
    ours = augment(key, normalize(x_u8, "cifar10"),
                   fill=normalized_black("cifar10"))
    # Reference order: crop the raw [0,1] image with zero padding, then
    # normalize the crop.
    raw = x_u8.astype(jnp.float32) / 255.0
    mean, std = NORM_STATS["cifar10"]
    ref = (augment(key, raw, fill=0.0)
           - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # Border pixels are normalized BLACK, not zero (the mean color).
    nb = np.asarray(normalized_black("cifar10"))
    assert not np.allclose(nb, 0.0)
