"""CIFAR-10 family + SVHN (reference: `bnn_priors/data/CIFAR/cifar.py`).

Channel-stats normalization from the training set; `CIFAR10Augmented`
provides a pure-JAX random-crop(32, pad=4) + horizontal-flip `augment_fn`
that runs *inside* the jitted training scan on device — the TPU-native
replacement for the reference's host-side torchvision transforms
(SURVEY §7 "Augmented CIFAR-10 input pipeline ... without host
round-trips").

Loading: CIFAR-10 python pickle batches under `data_root` (torchvision's
`cifar-10-batches-py` layout), CIFAR-10-C `.npy` files, SVHN `.mat` files.
`FakeCIFAR10` is the synthetic stand-in for tests/benchmarks.
"""
from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .base import DataContainer, Dataset

__all__ = ("CIFAR10", "CIFAR10Augmented", "CIFAR10Small", "CIFAR10_C",
           "SVHN", "FakeCIFAR10", "random_crop_flip")


def _load_cifar10_batches(data_root):
    d = os.path.join(data_root, "cifar-10-batches-py")
    if not os.path.isdir(d):
        d = data_root
    train_x, train_y = [], []
    for i in range(1, 6):
        p = os.path.join(d, f"data_batch_{i}")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"{p} not found; place the CIFAR-10 python batches under "
                f"{data_root} or use FakeCIFAR10")
        with open(p, "rb") as f:
            batch = pickle.load(f, encoding="bytes")
        train_x.append(batch[b"data"])
        train_y.extend(batch[b"labels"])
    with open(os.path.join(d, "test_batch"), "rb") as f:
        batch = pickle.load(f, encoding="bytes")
    test_x = batch[b"data"].reshape(-1, 3, 32, 32)
    test_y = np.asarray(batch[b"labels"])
    train_x = np.concatenate(train_x).reshape(-1, 3, 32, 32)
    return train_x, np.asarray(train_y), test_x, test_y


class CIFAR10(DataContainer):
    def __init__(self, dtype="float32", data_root=None):
        if data_root is None:
            data_root = os.path.join(
                os.environ.get("BNN_PRIORS_DATA", "data"), "CIFAR")
        xtr, ytr, xte, yte = _load_cifar10_batches(data_root)
        self._save_datasets(xtr.astype(dtype), xte.astype(dtype), ytr, yte)

    def _save_datasets(self, xtr, xte, ytr, yte):
        "NCHW layout with per-channel train-set normalization (cifar.py:35-60)"
        X_unnorm = np.concatenate([xtr, xte])
        y = np.concatenate([ytr, yte]).astype(np.int64)
        index_train = np.arange(len(xtr))
        index_test = np.arange(len(xtr), len(xtr) + len(xte))
        self.unnorm = Dataset(X_unnorm, y, index_train, index_test)
        X_std = np.std(np.asarray(self.unnorm.train_X), axis=(0, 2, 3),
                       keepdims=True, ddof=1)
        X_mean = np.mean(np.asarray(self.unnorm.train_X), axis=(0, 2, 3),
                         keepdims=True)
        self.X_std, self.X_mean = jnp.asarray(X_std), jnp.asarray(X_mean)
        X_norm = (self.unnorm.X - self.X_mean) / self.X_std
        self.norm = Dataset(X_norm, y, index_train, index_test)
        self._finalize()


def random_crop_flip(key, x, pad=4):
    """Per-image random crop (with `pad` zero padding) + horizontal flip,
    NCHW, fully vectorized — safe inside jit/scan on TPU."""
    B, C, H, W = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    dy = jax.random.randint(k1, (B,), 0, 2 * pad + 1)
    dx = jax.random.randint(k2, (B,), 0, 2 * pad + 1)

    def crop_one(img, oy, ox):
        return jax.lax.dynamic_slice(img, (0, oy, ox), (C, H, W))
    cropped = jax.vmap(crop_one)(xp, dy, dx)
    flip = jax.random.bernoulli(k3, 0.5, (B,))
    return jnp.where(flip[:, None, None, None], cropped[..., ::-1], cropped)


class CIFAR10Augmented(CIFAR10):
    """CIFAR-10 with train-time RandomCrop(32, padding=4)+HFlip
    (reference cifar.py:136-172) as an on-device `augment_fn`."""

    @staticmethod
    def augment_fn(key, x):
        return random_crop_flip(key, x, pad=4)


class CIFAR10Small(CIFAR10):
    "First 5k training points (reference cifar.py:175-184)."

    def __init__(self, dtype="float32", data_root=None, n_train=5000):
        if data_root is None:
            data_root = os.path.join(
                os.environ.get("BNN_PRIORS_DATA", "data"), "CIFAR")
        xtr, ytr, xte, yte = _load_cifar10_batches(data_root)
        self._save_datasets(xtr[:n_train].astype(dtype), xte.astype(dtype),
                            ytr[:n_train], yte)


class CIFAR10_C(CIFAR10):
    """CIFAR-10 with a corrupted test set (Hendrycks & Dietterich; 19
    corruptions from zenodo record 2535967; reference cifar.py:63-110).
    Train set and normalization are the clean CIFAR-10's."""

    def __init__(self, corruption, dtype="float32", data_root=None,
                 severity=None):
        if data_root is None:
            data_root = os.path.join(
                os.environ.get("BNN_PRIORS_DATA", "data"), "CIFAR")
        xtr, ytr, _, _ = _load_cifar10_batches(data_root)
        cdir = os.path.join(data_root, "cifar10-c", "CIFAR-10-C")
        if not os.path.isdir(cdir):
            cdir = os.path.join(data_root, "CIFAR-10-C")
        xc = np.load(os.path.join(cdir, f"{corruption}.npy"))
        yc = np.load(os.path.join(cdir, "labels.npy"))
        xc = xc.transpose(0, 3, 1, 2)  # NHWC files -> NCHW
        if severity is not None:
            sl = slice((severity - 1) * 10000, severity * 10000)
            xc, yc = xc[sl], yc[sl]
        self._save_datasets(xtr.astype(dtype), xc.astype(dtype), ytr,
                            yc.astype(np.int64))


class SVHN(DataContainer):
    "SVHN normalized by CIFAR-10 train statistics (reference cifar.py:113-134)."

    def __init__(self, dtype="float32", data_root=None):
        from scipy.io import loadmat
        if data_root is None:
            data_root = os.path.join(
                os.environ.get("BNN_PRIORS_DATA", "data"), "SVHN")
        train = loadmat(os.path.join(data_root, "train_32x32.mat"))
        test = loadmat(os.path.join(data_root, "test_32x32.mat"))

        def conv(m):
            x = m["X"].transpose(3, 2, 0, 1).astype(dtype)
            y = m["y"].astype(np.int64).ravel() % 10
            return x, y
        xtr, ytr = conv(train)
        xte, yte = conv(test)
        X_unnorm = np.concatenate([xtr, xte])
        y = np.concatenate([ytr, yte])
        index_train = np.arange(len(xtr))
        index_test = np.arange(len(xtr), len(xtr) + len(xte))
        self.unnorm = Dataset(X_unnorm, y, index_train, index_test)
        X_std = np.std(xtr, axis=(0, 2, 3), keepdims=True, ddof=1)
        X_mean = np.mean(xtr, axis=(0, 2, 3), keepdims=True)
        self.X_std, self.X_mean = jnp.asarray(X_std), jnp.asarray(X_mean)
        X_norm = (self.unnorm.X - self.X_mean) / self.X_std
        self.norm = Dataset(X_norm, y, index_train, index_test)
        self._finalize()


class FakeCIFAR10(CIFAR10):
    "Synthetic CIFAR-shaped data for tests/benchmarks (no files needed)."

    def __init__(self, dtype="float32", n_train=50000, n_test=10000, seed=0):
        rng = np.random.RandomState(seed)
        n = n_train + n_test
        y = rng.randint(0, 10, n).astype(np.int64)
        x = rng.randint(0, 256, (n, 3, 32, 32)).astype(dtype)
        for c in range(10):
            x[y == c, :, 2 + c, :] = 255.0
        self._save_datasets(x[:n_train], x[n_train:], y[:n_train], y[n_train:])

    augment_fn = staticmethod(CIFAR10Augmented.augment_fn)
