"""Raw-format dataset loaders exercised against fabricated files (the real
MNIST/CIFAR archives are not on this machine — zero egress)."""

import gzip
import pickle
import struct

import numpy as np

from neural_ode_features_tpu.data import load_dataset


def _write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">i", 0x00000803))
        f.write(struct.pack(">3i", *arr.shape))
        f.write(arr.tobytes())


def _write_idx_labels(path, arr, gz=False):
    opener = gzip.open if gz else open
    with opener(str(path) + (".gz" if gz else ""), "wb") as f:
        f.write(struct.pack(">i", 0x00000801))
        f.write(struct.pack(">i", arr.shape[0]))
        f.write(arr.tobytes())


def test_mnist_idx_loader(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (10, 28, 28), np.uint8)
    labs = rng.integers(0, 10, (10,), np.uint8)
    sub = tmp_path / "mnist"
    sub.mkdir()
    _write_idx_images(sub / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(sub / "train-labels-idx1-ubyte", labs, gz=True)  # mixed
    x, y = load_dataset("mnist", "train", str(tmp_path))
    assert x.shape == (10, 28, 28, 1)
    np.testing.assert_array_equal(x[..., 0], imgs)
    np.testing.assert_array_equal(y, labs)


def test_cifar10_pickle_loader(tmp_path):
    rng = np.random.default_rng(1)
    pydir = tmp_path / "cifar-10-batches-py"
    pydir.mkdir()
    all_imgs, all_labs = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, (4, 3 * 32 * 32), np.uint8)
        labels = rng.integers(0, 10, (4,)).tolist()
        with open(pydir / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        all_imgs.append(data)
        all_labs.extend(labels)
    x, y = load_dataset("cifar10", "train", str(tmp_path))
    assert x.shape == (20, 32, 32, 3)
    ref = np.concatenate(all_imgs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(x, ref)
    np.testing.assert_array_equal(y, np.asarray(all_labs, np.uint8))


def test_cifar10_binary_loader(tmp_path):
    rng = np.random.default_rng(2)
    bindir = tmp_path / "cifar-10-batches-bin"
    bindir.mkdir()
    rec = np.zeros((3, 3073), np.uint8)
    rec[:, 0] = [1, 5, 9]
    rec[:, 1:] = rng.integers(0, 256, (3, 3072), np.uint8)
    (bindir / "test_batch.bin").write_bytes(rec.tobytes())
    x, y = load_dataset("cifar10", "test", str(tmp_path))
    assert x.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(y, [1, 5, 9])
    ref = rec[:, 1:].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(x, ref)
