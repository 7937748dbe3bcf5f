"""Dataset containers (reference: `bnn_priors/data/base.py`).

A `Dataset` holds the full X/y on device with train/test index splits —
exactly the reference layout, since the TPU-native runners want the whole
training set resident in HBM (SURVEY §7: data pre-sharded, no host
round-trips per batch).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ("Dataset", "DataContainer")


class Dataset:
    "Full dataset on device; train/test views via index arrays."

    def __init__(self, X, y, index_train, index_test):
        self.X = jnp.asarray(X)
        self.y = jnp.asarray(y)
        index_train = np.asarray(index_train, dtype=np.int64)
        index_test = np.asarray(index_test, dtype=np.int64)
        self.train_X = self.X[index_train]
        self.train_y = self.y[index_train]
        self.test_X = self.X[index_test]
        self.test_y = self.y[index_test]

    @property
    def train(self):
        return (self.train_X, self.train_y)

    @property
    def test(self):
        return (self.test_X, self.test_y)


class DataContainer:
    """Common base for named datasets: `norm`/`unnorm` Dataset pair plus
    shape metadata, mirroring the reference API (`.norm.train` etc.)."""

    norm: Dataset
    unnorm: Dataset

    def _finalize(self):
        self.num_train_set = int(self.unnorm.X.shape[0])
        self.in_shape = tuple(self.unnorm.X.shape[1:])
        self.out_shape = tuple(self.unnorm.y.shape[1:])

    def denormalize_y(self, y):
        return self.y_std * y + self.y_mean
