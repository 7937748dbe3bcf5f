"""Fixed-covariance multivariate priors for conv kernels, via PCA whitening
(reference: `bnn_priors/prior/conv_loc_scale.py`).

The covariance is a *static* constant (fitted offline from trained-network
weights); its eigendecomposition is precomputed once in NumPy float64 and
baked into the traced log-prob as constants — the TPU only ever sees two
small matmuls per kernel.

Density convention (matches `TransformedDistribution` + `PCATransform`):
    x = (flat(p) - loc) @ inv_scale           # whiten
    log_prob(p) = Σ base.log_prob(x) - log_det,  per kernel slice,
where `scale = diag(sqrt(vals)) @ vecsᵀ`, `inv_scale = vecs @ diag(1/sqrt(vals))`
and `log_det = ½ Σ log vals` (conv_loc_scale.py:56-62).
"""
from __future__ import annotations

import math
from numbers import Number

import jax.numpy as jnp
import numpy as np

from .. import distributions as D
from .base import Prior

__all__ = ("ConvCovariance", "FixedCovNormal", "FixedCovLaplace",
           "FixedCovDoubleGamma", "FixedCovGenNorm")


def _break_down_cov(cov: np.ndarray):
    vals, vecs = np.linalg.eigh(np.asarray(cov, dtype=np.float64))
    sqrt_vals = np.sqrt(vals)
    scale = sqrt_vals[:, None] * vecs.T        # PCA whitening
    inv_scale = vecs / sqrt_vals
    log_det = np.sum(np.log(vals)) / 2.0
    return scale, inv_scale, log_det


class ConvCovariance(Prior):
    def __init__(self, shape, loc, cov, **kwargs):
        if isinstance(cov, Number) or len(np.shape(cov)) == 0:
            cov = np.eye(shape[-2] * shape[-1]) * float(cov) ** 2  # cov given as std
            loc = np.zeros(shape[-2] * shape[-1]) + loc
        scale, inv_scale, log_det = _break_down_cov(cov)
        super().__init__(
            shape, loc=np.asarray(loc, dtype=np.float64), scale=scale,
            inv_scale=inv_scale, log_det=np.asarray(log_det), **kwargs,
        )
        self.event_shape = tuple(shape[-2:])

    def assign_cov(self, cov):
        "replace the fitted covariance in place (before `init`)"
        scale, inv_scale, log_det = _break_down_cov(np.asarray(cov))
        self.hypers["scale"] = scale
        self.hypers["inv_scale"] = inv_scale
        self.hypers["log_det"] = np.asarray(log_det)

    # base distribution over the whitened event, defined by subclasses
    def _base_dist(self, params, prefix):
        raise NotImplementedError

    def _whiten(self, params, prefix, value):
        loc = self.resolve(params, prefix, "loc")
        inv_scale = self.resolve(params, prefix, "inv_scale")
        flat = value.reshape(value.shape[:-2] + (-1,))
        return (flat - loc) @ inv_scale

    def log_prob_value(self, params, prefix, value):
        x = self._whiten(params, prefix, value)
        log_det = self.resolve(params, prefix, "log_det")
        base_lp = jnp.sum(self._base_dist(params, prefix).log_prob(x), axis=-1)
        n_kernels = int(np.prod(value.shape[:-2])) if value.ndim > 2 else 1
        return jnp.sum(base_lp) - log_det * n_kernels

    def _sample_p(self, key, params, prefix, dtype):
        loc = self.resolve(params, prefix, "loc")
        scale = self.resolve(params, prefix, "scale")
        x = self._base_dist(params, prefix).sample(
            key, tuple(self.shape[:-2]) + (int(np.prod(self.event_shape)),)
        )
        y = x @ scale + loc
        return y.reshape(self.shape).astype(dtype)


class FixedCovNormal(ConvCovariance):
    def __init__(self, shape, loc, cov):
        super().__init__(shape, loc, cov)

    def _base_dist(self, params, prefix):
        return D.Normal(0.0, 1.0)


class FixedCovLaplace(ConvCovariance):
    def __init__(self, shape, loc, cov, base_scale=math.sqrt(1 / 2)):
        # base_scale=sqrt(1/2) gives the base unit variance
        super().__init__(shape, loc, cov, base_scale=np.asarray(base_scale))

    def _base_dist(self, params, prefix):
        return D.Laplace(0.0, self.resolve(params, prefix, "base_scale"))


class FixedCovDoubleGamma(ConvCovariance):
    def __init__(self, shape, loc, cov, concentration, base_scale=None):
        # stddev of DoubleGamma(rate=1) is sqrt(c(1+c)); pick rate for unit var
        if base_scale is None:
            base_rate = (concentration * (1 + concentration)) ** 0.5
        else:
            base_rate = 1.0 / base_scale
        super().__init__(shape, loc, cov, concentration=np.asarray(concentration),
                         base_rate=np.asarray(base_rate))

    def _base_dist(self, params, prefix):
        return D.DoubleGamma(
            self.resolve(params, prefix, "concentration"),
            self.resolve(params, prefix, "base_rate"),
        )


class FixedCovGenNorm(ConvCovariance):
    def __init__(self, shape, loc, cov, beta, base_scale=None):
        if base_scale is None:
            b = float(beta)
            base_scale = math.exp((math.lgamma(1 / b) - math.lgamma(3 / b)) / 2)
        super().__init__(shape, loc, cov, beta=np.asarray(beta),
                         base_scale=np.asarray(base_scale))

    def _base_dist(self, params, prefix):
        return D.GeneralizedNormal(
            0.0,
            self.resolve(params, prefix, "base_scale"),
            self.resolve(params, prefix, "beta"),
        )
