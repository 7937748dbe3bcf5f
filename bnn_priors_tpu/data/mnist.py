"""MNIST / FashionMNIST / RotatedMNIST (reference: `bnn_priors/data/MNIST/`).

Images are flattened to 784 with /255 normalization; RotatedMNIST appends
two rotated copies of the test set (±45° and ±90°, numpy seed 1337),
reproducing the reference protocol (`mnist.py:52-112`).

Loading order: raw IDX files (`train-images-idx3-ubyte` etc.) under
`data_root`, then torchvision's cached layout — no downloads (the build
environment has no egress). `FakeMNIST` provides a deterministic synthetic
stand-in with the same shapes for tests/benchmarks.
"""
from __future__ import annotations

import gzip
import os
import struct

import jax.numpy as jnp
import numpy as np

from .base import DataContainer, Dataset

__all__ = ("MNIST", "FashionMNIST", "RotatedMNIST", "FakeMNIST")


def _read_idx(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _load_raw(data_root, names):
    "search for IDX files under data_root (plain, .gz, or torchvision raw/)"
    candidates = [data_root, os.path.join(data_root, "raw")]
    out = []
    for name in names:
        found = None
        for d in candidates:
            for suffix in ("", ".gz"):
                p = os.path.join(d, name + suffix)
                if os.path.exists(p):
                    found = p
                    break
            if found:
                break
        if found is None:
            raise FileNotFoundError(
                f"{name} not found under {data_root}; place the IDX files "
                "there or use FakeMNIST for synthetic data")
        out.append(_read_idx(found))
    return out


_MNIST_FILES = ("train-images-idx3-ubyte", "train-labels-idx1-ubyte",
                "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte")


class _MNISTBase(DataContainer):
    subdir = "MNIST"

    def __init__(self, dtype="float32", data_root=None):
        if data_root is None:
            data_root = os.path.join(
                os.environ.get("BNN_PRIORS_DATA", "data"), self.subdir)
        xtr, ytr, xte, yte = _load_raw(data_root, _MNIST_FILES)
        self._build(xtr.astype(dtype), ytr.astype(np.int64),
                    xte.astype(dtype), yte.astype(np.int64))

    def _build(self, xtr, ytr, xte, yte):
        X_unnorm = np.concatenate([xtr, xte]).reshape(-1, 784)
        y = np.concatenate([ytr, yte])
        index_train = np.arange(len(xtr))
        index_test = np.arange(len(xtr), len(xtr) + len(xte))
        self.unnorm = Dataset(X_unnorm, y, index_train, index_test)
        self.norm = Dataset(X_unnorm / 255.0, y, index_train, index_test)
        self._finalize()


class MNIST(_MNISTBase):
    subdir = "MNIST"


class FashionMNIST(_MNISTBase):
    subdir = "FashionMNIST"


class RotatedMNIST(_MNISTBase):
    "test set + ±45° + ±90° rotations appended (reference mnist.py:52-112)"

    def _build(self, xtr, ytr, xte, yte):
        from scipy import ndimage
        rng = np.random.RandomState(1337)
        imgs = xte.reshape(-1, 28, 28)

        def rotate_all(low, high):
            out = np.zeros_like(imgs)
            for i, img in enumerate(imgs):
                angle = rng.randint(low=low, high=high)
                out[i] = ndimage.rotate(img, angle, reshape=False)
            return out

        rot_small = rotate_all(-45, 45)
        rot_large = rotate_all(-90, 90)
        X_unnorm = np.concatenate(
            [xtr.reshape(-1, 784), xte.reshape(-1, 784),
             rot_small.reshape(-1, 784), rot_large.reshape(-1, 784)])
        y = np.concatenate([ytr, yte, yte, yte])
        index_train = np.arange(len(xtr))
        index_test = np.arange(len(xtr), len(xtr) + 3 * len(yte))
        self.unnorm = Dataset(X_unnorm, y, index_train, index_test)
        self.norm = Dataset(X_unnorm / 255.0, y, index_train, index_test)
        self._finalize()


class FakeMNIST(_MNISTBase):
    """Deterministic synthetic MNIST-shaped data (class-dependent blobs) for
    tests and throughput benchmarks when the real files are absent."""

    def __init__(self, dtype="float32", n_train=60000, n_test=10000, seed=0):
        rng = np.random.RandomState(seed)
        n = n_train + n_test
        y = rng.randint(0, 10, n).astype(np.int64)
        x = rng.randint(0, 256, (n, 28, 28)).astype(dtype)
        # class-dependent signal so models can learn something
        for c in range(10):
            x[y == c, 2 + c, :] = 255.0
        self._build(x[:n_train], y[:n_train], x[n_train:], y[n_train:])
