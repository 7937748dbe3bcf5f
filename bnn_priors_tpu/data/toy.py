"""Toy/synthetic datasets (reference: `bnn_priors/data/toy_data.py`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import DataContainer, Dataset

__all__ = ("RandomData", "RandomOODTestData", "Synthetic")


class RandomData(DataContainer):
    "Uniform[-1,1] inputs/targets, half train / half test (toy_data.py:11-52)."

    def __init__(self, dim=20, n_points=2000, dtype="float32", seed=None):
        rng = np.random.RandomState(seed)
        X_unnorm = rng.uniform(-1, 1, [n_points, dim]).astype(dtype)
        y_unnorm = rng.uniform(-1, 1, [n_points, 1]).astype(dtype)
        self._build(X_unnorm, y_unnorm, n_points // 2)

    def _build(self, X_unnorm, y_unnorm, len_train):
        n_points = len(X_unnorm)
        index_train = np.arange(len_train)
        index_test = np.arange(len_train, n_points)
        self.unnorm = Dataset(X_unnorm, y_unnorm, index_train, index_test)
        X_std = np.std(X_unnorm[index_train], 0, ddof=1)
        X_std[X_std == 0] = 1.0
        X_mean = np.mean(X_unnorm[index_train], 0)
        self.X_std, self.X_mean = jnp.asarray(X_std), jnp.asarray(X_mean)
        self.y_mean = jnp.asarray(np.mean(y_unnorm[index_train]))
        self.y_std = jnp.asarray(np.std(y_unnorm[index_train], ddof=1))
        X_norm = (self.unnorm.X - self.X_mean) / self.X_std
        y_norm = (self.unnorm.y - self.y_mean) / self.y_std
        self.norm = Dataset(X_norm, y_norm, index_train, index_test)
        self._finalize()


class RandomOODTestData(RandomData):
    "train Uniform[-1,1], test Uniform[1,2] (toy_data.py:55-91)"

    def __init__(self, dim=20, n_points=2000, dtype="float32", seed=None):
        rng = np.random.RandomState(seed)
        len_train = n_points // 2
        X = np.concatenate([
            rng.uniform(-1, 1, [len_train, dim]),
            rng.uniform(1, 2, [n_points - len_train, dim])]).astype(dtype)
        y = np.concatenate([
            rng.uniform(-1, 1, [len_train, 1]),
            rng.uniform(1, 2, [n_points - len_train, 1])]).astype(dtype)
        self._build(X, y, len_train)


class Synthetic(DataContainer):
    """Labels re-sampled from a model's predictive at the dataset inputs —
    for posterior-recovery experiments (toy_data.py:91-124)."""

    def __init__(self, dataset, model, params, model_state=None, key=None,
                 batch_size=None):
        key = key if key is not None else jax.random.key(0)
        model_state = model_state or {}
        X = dataset.norm.X
        f, _ = model.net_apply(params, model_state, X, train=False)
        from ..models.base import ClassificationModel
        if isinstance(model, ClassificationModel):
            logits = model._logits(f, params)
            new_y = jax.random.categorical(key, logits, axis=-1)
        else:
            mean, std = model.predictions(f, params)
            new_y = mean + std * jax.random.normal(key, mean.shape, mean.dtype)

        len_train = dataset.norm.train_X.shape[0]
        n = X.shape[0]
        index_train = np.arange(len_train)
        index_test = np.arange(len_train, n)
        self.unnorm = Dataset(dataset.unnorm.X, new_y, index_train, index_test)
        self.norm = Dataset(dataset.norm.X, new_y, index_train, index_test)
        self._finalize()
