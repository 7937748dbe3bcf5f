"""Loc-scale prior families (reference: `bnn_priors/prior/loc_scale.py`)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import distributions as D
from .base import Prior, join

__all__ = (
    "LocScale", "Normal", "Laplace", "Cauchy", "StudentT", "GenNorm",
    "LogNormal", "Improper", "PositiveImproper", "ConvCorrelatedNormal",
)


class LocScale(Prior):
    def __init__(self, shape, loc, scale):
        super().__init__(shape, loc=loc, scale=scale)


class Normal(LocScale):
    def _dist(self, loc, scale):
        return D.Normal(loc, scale)


class Laplace(LocScale):
    def _dist(self, loc, scale):
        return D.Laplace(loc, scale)


class Cauchy(LocScale):
    def _dist(self, loc, scale):
        return D.Cauchy(loc, scale)


class StudentT(LocScale):
    def __init__(self, shape, loc, scale, df=3):
        Prior.__init__(self, shape, df=df, loc=loc, scale=scale)

    def _dist(self, df, loc, scale):
        return D.StudentT(df, loc, scale)


class GenNorm(LocScale):
    def __init__(self, shape, loc, scale, beta=0.5):
        Prior.__init__(self, shape, loc=loc, scale=scale, beta=beta)

    def _dist(self, loc, scale, beta):
        return D.GeneralizedNormal(loc, scale, beta)


class LogNormal(LocScale):
    """Gaussian over p, `forward` = exp(p); the log-det correction `-Σp`
    matches reference `loc_scale.py:86-91`."""

    def _dist(self, loc, scale):
        return D.Normal(loc, scale)

    def forward(self, params, prefix):
        return jnp.exp(self.p(params, prefix))

    def log_prob_value(self, params, prefix, value):
        return jnp.sum(self._dist_obj(params, prefix).log_prob(value)) - jnp.sum(value)


class Improper(Normal):
    "Improper flat prior that samples like a Normal (loc_scale.py:94-97)."

    def log_prob_value(self, params, prefix, value):
        return jnp.asarray(0.0)


class PositiveImproper(Improper):
    "Improper prior for positive quantities: forward = softplus(p)."

    def forward(self, params, prefix):
        return D.softplus(self.p(params, prefix))


class ConvCorrelatedNormal(Prior):
    """MVN over the flattened k×k spatial dims with squared-exponential
    covariance exp(-dist/lengthscale)·scale² (reference loc_scale.py:38-63).

    The distance matrix is a static constant; the Cholesky is (re)computed
    inside the traced log-prob so hierarchical lengthscale/scale priors work.
    """

    def __init__(self, shape, loc, scale, *, lengthscale=1.0):
        if isinstance(loc, (int, float)) or (hasattr(loc, "shape") and len(np.shape(loc)) == 0):
            loc = np.asarray([loc], dtype=np.float64)
        distance_matrix = D.grid_distance_matrix(shape[-2], shape[-1])
        super().__init__(
            shape, loc=loc, scale=scale, distance_matrix=distance_matrix,
            lengthscale=lengthscale,
        )

    def _dist(self, loc, scale, distance_matrix, lengthscale):
        L = D.squared_exponential_scale_tril(distance_matrix, lengthscale, scale)
        return D.MultivariateNormal(loc, L)

    def log_prob_value(self, params, prefix, value):
        flat = value.reshape(value.shape[:-2] + (-1,))
        return jnp.sum(self._dist_obj(params, prefix).log_prob(flat))

    def _sample_p(self, key, params, prefix, dtype):
        dist = self._dist_obj(params, prefix)
        flat = dist.sample(key, self.shape[:-2])
        return flat.reshape(self.shape).astype(dtype)
