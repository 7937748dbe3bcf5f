"""Reparameterized priors on constrained domains
(reference: `bnn_priors/prior/transformed.py`)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import distributions as D
from .base import Prior

__all__ = ("Uniform", "Gamma", "HalfCauchy", "DoubleGamma")


class Uniform(Prior):
    """Uniform prior via a Gaussian reparameterization: p ~ N(0,1),
    forward = low + (high-low)·Φ(p); analytic log-prob -log(high-low)
    (reference transformed.py:12-47)."""

    def __init__(self, shape, low, high):
        super().__init__(shape, low=low, high=high)

    def _dist(self, low, high):
        return D.Uniform(low, high)

    def forward(self, params, prefix):
        low = self.resolve(params, prefix, "low")
        high = self.resolve(params, prefix, "high")
        u = D.Normal(0.0, 1.0).cdf(self.p(params, prefix))
        return low + (high - low) * u

    def log_prob_value(self, params, prefix, value):
        low = self.resolve(params, prefix, "low")
        high = self.resolve(params, prefix, "high")
        distance = high - low
        log_prob = -jnp.log(distance)
        # account for broadcasting of the bound across the parameter
        numel = int(jnp.size(value))
        multiplier = numel / max(int(jnp.size(log_prob)), 1)
        return jnp.sum(log_prob) * multiplier

    def _sample_p(self, key, params, prefix, dtype):
        return jax.random.normal(key, self.shape, dtype=dtype)


class Gamma(Prior):
    """Gamma prior with softplus reparameterization. Like the reference
    (transformed.py:50-63), the log-prob is the Gamma density at
    softplus(p) with no Jacobian term."""

    def __init__(self, shape, concentration, rate):
        super().__init__(shape, concentration=concentration, rate=rate)

    def _dist(self, concentration, rate):
        return D.Gamma(concentration, rate)

    def forward(self, params, prefix):
        return D.softplus(self.p(params, prefix))

    def log_prob_value(self, params, prefix, value):
        fwd = D.softplus(value)
        return jnp.sum(self._dist_obj(params, prefix).log_prob(fwd))

    def _sample_p(self, key, params, prefix, dtype):
        x = super()._sample_p(key, params, prefix, dtype)
        return D.inv_softplus(x).astype(dtype)


class HalfCauchy(Prior):
    """Half-Cauchy with softplus reparameterization and a fixed multiplier
    (reference transformed.py:66-80)."""

    def __init__(self, shape, scale=1.0, multiplier=1.0):
        super().__init__(shape, scale=scale)
        self.multiplier = multiplier

    def _dist(self, scale):
        return D.HalfCauchy(scale)

    def forward(self, params, prefix):
        return D.softplus(self.p(params, prefix)) * self.multiplier

    def log_prob_value(self, params, prefix, value):
        fwd = D.softplus(value) * self.multiplier
        return jnp.sum(self._dist_obj(params, prefix).log_prob(fwd))

    def _sample_p(self, key, params, prefix, dtype):
        x = super()._sample_p(key, params, prefix, dtype)
        return D.inv_softplus(x).astype(dtype)


class DoubleGamma(Prior):
    """Symmetrized Gamma with a location shift
    (reference transformed.py:83-95)."""

    def __init__(self, shape, loc, scale, concentration):
        super().__init__(shape, loc=loc, scale=scale, concentration=concentration)

    def _dist(self, loc, scale, concentration):
        return D.DoubleGamma(concentration=concentration, rate=1.0 / scale)

    def log_prob_value(self, params, prefix, value):
        loc = self.resolve(params, prefix, "loc")
        return jnp.sum(self._dist_obj(params, prefix).log_prob(value - loc))

    def _sample_p(self, key, params, prefix, dtype):
        x = super()._sample_p(key, params, prefix, dtype)
        loc = self.resolve(params, prefix, "loc")
        return (x + loc).astype(dtype)
