"""Rao-Blackwellized Gaussian regression: the last layer's weights are
integrated out analytically (reference: `bnn_priors/models/base.py:194-311`).

With iid N(0, last_layer_std²) last-layer weights, the marginal likelihood
of y given features f = net(x) is N(y | 0, llv·ffᵀ + σ²I), evaluated via
the Woodbury identity with a float64 Cholesky:
    log p(y) = -D/2 [ N log 2π + (N-F) log σ² + tr(YᵀY)/(D σ²)
                      + log det(llv·fᵀf + σ²I) − ‖L⁻¹ fᵀy‖²·llv/(D σ²) ]
The predictive at new features marginalizes the conjugate posterior over
the last-layer weights.
"""
from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp

from .. import priors as prior
from ..priors.base import Prior
from .base import RegressionModel, Module
from .dense_nets import LinearPrior
from .layers import Identity, ReLU, Sequential

__all__ = ("RaoBRegressionModel", "RaoBDenseNet", "RaoBLinearRegression")


def _f64(x):
    return x.astype(jnp.float64) if jax.config.jax_enable_x64 else x


class RaoBRegressionModel(RegressionModel):
    def __init__(self, x_train, y_train, noise_std, last_layer_std, net):
        assert x_train.ndim == 2
        assert x_train.shape[0] == y_train.shape[0]
        assert y_train.shape[1] == 1
        super().__init__(net, noise_std)
        self.x_train = jnp.asarray(x_train)
        self.y_train = jnp.asarray(y_train)
        self.last_layer_std = last_layer_std

    def _constants(self, params, n_feat):
        "N log 2π + (N-F) log σ² + tr(YᵀY)/(D σ²)"
        y = self.y_train
        N, D = y.shape
        sig = self._noise_std(params) ** 2
        tr_yy = jnp.sum(y * y) / (D * sig)
        return N * math.log(2 * math.pi) + (N - n_feat) * jnp.log(sig) + tr_yy

    def log_likelihood(self, params, state, x, y, eff_num_data, train=False,
                       mask=None, compute_dtype=None):
        # compute_dtype accepted for API parity, ignored: the RaoB
        # marginal-likelihood path is numerically delicate (f64 Woodbury)
        "Marginal likelihood of the training set (always the full set)."
        f, new_state = self.net_apply(params, state, self.x_train, train)
        y_tr = self.y_train
        N, D = y_tr.shape
        n_feat = f.shape[-1]
        sig = self._noise_std(params) ** 2
        llv = self.last_layer_std ** 2

        constants = self._constants(params, n_feat)
        FF = (f.T @ f) * llv
        FF_sig = _f64(FF) + _f64(sig) * jnp.eye(n_feat, dtype=_f64(FF).dtype)
        L = jnp.linalg.cholesky(FF_sig)
        logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
        Lfy = jax.scipy.linalg.solve_triangular(L, _f64(f.T @ y_tr),
                                                lower=True)
        quad = jnp.sum(Lfy * Lfy) * (llv / (D * _f64(sig)))
        ll = (-D / 2) * (constants + logdet - quad)
        return ll.astype(f.dtype), new_state, f

    def _posterior_w(self, params, state):
        "mean and lower-triangular precision Cholesky of whitened p(w | X,y)"
        f, _ = self.net_apply(params, state, self.x_train, train=False)
        f = f * self.last_layer_std
        sig = self._noise_std(params) ** 2
        A = (f.T @ f) / sig + jnp.eye(f.shape[-1], dtype=f.dtype)
        L = jnp.linalg.cholesky(_f64(A))
        FY = _f64(f.T @ self.y_train)
        white_mean = jax.scipy.linalg.solve_triangular(L, FY, lower=True)
        return white_mean / _f64(sig), L

    def posterior_w(self, params, state):
        "returns mean and root of the covariance (Cov = Lᵀ L) of p(w | X,y)"
        white_mean, L_w = self._posterior_w(params, state)
        mean = jax.scipy.linalg.solve_triangular(
            L_w.T, white_mean, lower=False)
        eye = jnp.eye(L_w.shape[-1], dtype=L_w.dtype)
        L = jax.scipy.linalg.solve_triangular(L_w, eye, lower=True)
        return mean, L

    def predictive(self, params, state, x):
        "p(y* | x*, X, y): mean and std at new inputs"
        white_mean, L_w = self._posterior_w(params, state)
        f, _ = self.net_apply(params, state, x, train=False)
        f = f * self.last_layer_std
        Lf = jax.scipy.linalg.solve_triangular(L_w, _f64(f.T), lower=True)
        mean = Lf.T @ white_mean
        var = jnp.sum(Lf * Lf, axis=0) + self._noise_std(params) ** 2
        return mean.astype(f.dtype), jnp.sqrt(var).astype(f.dtype)[:, None]


def RaoBDenseNet(x_train, y_train, width, noise_std=1.0,
                 prior_w=prior.Normal, loc_w=0.0, std_w=2 ** 0.5,
                 prior_b=prior.Normal, loc_b=0.0, std_b=1.0, scaling_fn=None):
    in_features = x_train.shape[-1]
    kw = dict(prior_w=prior_w, loc_w=loc_w, std_w=std_w, prior_b=prior_b,
              loc_b=loc_b, std_b=std_b, scaling_fn=scaling_fn)
    return RaoBRegressionModel(
        x_train, y_train, noise_std, last_layer_std=(2 / width) ** 0.5,
        net=Sequential(
            LinearPrior(in_features, width, **kw), ReLU(),
            LinearPrior(width, width, **kw), ReLU()))


def RaoBLinearRegression(x_train, y_train, noise_std=1.0, std_w=2 ** 0.5):
    in_features = x_train.shape[-1]
    return RaoBRegressionModel(
        x_train, y_train, noise_std,
        last_layer_std=std_w * in_features ** -0.5,
        net=Identity())
