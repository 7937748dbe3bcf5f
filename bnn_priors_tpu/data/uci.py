"""UCI regression datasets (reference: `bnn_priors/data/UCI/uci.py`).

9 datasets × 20 train/test splits shipped as text files. The loader reads
the reference's bundled text-file layout from `data_root` (defaulting to
the read-only reference checkout if present, or $BNN_PRIORS_DATA/UCI);
normalization constants are computed from the training split.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .base import DataContainer, Dataset

__all__ = ("UCI",)

_DEFAULT_ROOTS = (
    os.environ.get("BNN_PRIORS_DATA", "") + "/UCI",
    # the 9 UCI datasets x 20 splits ship with the package (public data
    # artifacts, Hernandez-Lobato & Adams splits, same layout as the
    # reference's bundled copy)
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "UCI"),
)


def _find_root(data_root):
    if data_root is not None:
        return data_root
    for root in _DEFAULT_ROOTS:
        if root and os.path.isdir(root):
            return root
    raise FileNotFoundError(
        "UCI data not found; set BNN_PRIORS_DATA or pass data_root")


class UCI(DataContainer):
    def __init__(self, dataset: str, split: int, dtype="float32",
                 data_root=None):
        root = _find_root(data_root)
        d = os.path.join(root, dataset)
        data = np.loadtxt(os.path.join(d, "data.txt")).astype(dtype)
        index_features = np.loadtxt(os.path.join(d, "index_features.txt"))
        index_target = int(np.loadtxt(os.path.join(d, "index_target.txt")))
        X_unnorm = data[:, index_features.astype(int)]
        y_unnorm = data[:, index_target:index_target + 1]

        index_train = np.loadtxt(
            os.path.join(d, f"index_train_{split}.txt")).astype(int)
        index_test = np.loadtxt(
            os.path.join(d, f"index_test_{split}.txt")).astype(int)

        self.unnorm = Dataset(X_unnorm, y_unnorm, index_train, index_test)

        X_std = np.std(np.asarray(self.unnorm.train_X), 0, ddof=1)
        X_std[X_std == 0] = 1.0
        X_mean = np.mean(np.asarray(self.unnorm.train_X), 0)
        self.X_std, self.X_mean = jnp.asarray(X_std), jnp.asarray(X_mean)
        self.y_mean = jnp.mean(self.unnorm.train_y)
        self.y_std = jnp.std(self.unnorm.train_y, ddof=1)

        X_norm = (self.unnorm.X - self.X_mean) / self.X_std
        y_norm = (self.unnorm.y - self.y_mean) / self.y_std
        self.norm = Dataset(X_norm, y_norm, index_train, index_test)
        self._finalize()
