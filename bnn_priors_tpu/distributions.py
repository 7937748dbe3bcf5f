"""Pure-functional probability distributions for TPU-native SG-MCMC.

Each distribution is a frozen pytree dataclass whose fields are (traceable)
JAX arrays, with `log_prob(x)` and `sample(key, sample_shape)` methods that
are pure functions — safe under `jit`, `vmap`, `grad` and `shard_map`.

This is the TPU-first re-design of the distribution zoo in the reference
implementation (`/root/reference/bnn_priors/prior/distributions.py`,
`prior/loc_scale.py:13-18`): instead of `torch.distributions` objects with
stateful `scipy` fallbacks, everything here is traceable jax.numpy math, so
XLA can fuse log-prob evaluation directly into the potential-gradient kernel.

Semantics parity notes (checked against the reference):
  * ``GeneralizedNormal.log_prob`` follows the analytic form at
    ``prior/distributions.py:75-79``.
  * ``DoubleGamma`` is a Gamma reflected around 0 (log_prob(|x|) - log 2,
    ``prior/distributions.py:97-109``).
  * ``MultivariateT`` uses the Shah et al. 2014 parameterization where the
    `covariance_matrix` IS the covariance (``prior/distributions.py:115-199``),
    including the broadcast half-log-det rule for event_dims larger than the
    covariance dimension.
  * ``SquaredExponentialMVN`` builds cov = exp(-d/lengthscale) * scale**2
    (``prior/loc_scale.py:13-18``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp_special
from jax.scipy import stats as jsp_stats


def _as_array(x):
    return jnp.asarray(x)


def pytree_dataclass(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are leaves)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


class Distribution:
    """Minimal distribution interface.

    event_dim: number of trailing dims of an event (0 for scalar dists).
    """

    event_dim: int = 0

    def log_prob(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def sample(self, key, sample_shape: Tuple[int, ...] = ()):  # pragma: no cover
        raise NotImplementedError

    # batch/event bookkeeping used by Prior._sample_value-style logic
    def batch_shape(self) -> Tuple[int, ...]:
        return ()

    def event_shape(self) -> Tuple[int, ...]:
        return ()


@pytree_dataclass
class Normal(Distribution):
    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, x):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        z = (x - loc) / scale
        return -0.5 * z * z - jnp.log(scale) - 0.5 * math.log(2 * math.pi)

    def sample(self, key, sample_shape=()):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        shape = tuple(sample_shape) + jnp.broadcast_shapes(loc.shape, scale.shape)
        return loc + scale * jax.random.normal(key, shape, dtype=jnp.result_type(loc, scale, float))

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def cdf(self, x):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        return jsp_stats.norm.cdf(x, loc=loc, scale=scale)

    def icdf(self, q):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        return loc + scale * jsp_special.ndtri(q)


@pytree_dataclass
class Laplace(Distribution):
    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, x):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        return -jnp.abs(x - loc) / scale - jnp.log(2 * scale)

    def sample(self, key, sample_shape=()):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        shape = tuple(sample_shape) + jnp.broadcast_shapes(loc.shape, scale.shape)
        dtype = jnp.result_type(loc, scale, float)
        return loc + scale * jax.random.laplace(key, shape, dtype=dtype)

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))


@pytree_dataclass
class Cauchy(Distribution):
    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, x):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        z = (x - loc) / scale
        return -jnp.log1p(z * z) - jnp.log(math.pi * scale)

    def sample(self, key, sample_shape=()):
        loc, scale = _as_array(self.loc), _as_array(self.scale)
        shape = tuple(sample_shape) + jnp.broadcast_shapes(loc.shape, scale.shape)
        dtype = jnp.result_type(loc, scale, float)
        return loc + scale * jax.random.cauchy(key, shape, dtype=dtype)

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))


@pytree_dataclass
class StudentT(Distribution):
    df: jnp.ndarray
    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, x):
        df, loc, scale = map(_as_array, (self.df, self.loc, self.scale))
        z = (x - loc) / scale
        lp = (
            jsp_special.gammaln((df + 1) / 2)
            - jsp_special.gammaln(df / 2)
            - 0.5 * jnp.log(df * math.pi)
            - jnp.log(scale)
            - (df + 1) / 2 * jnp.log1p(z * z / df)
        )
        return lp

    def sample(self, key, sample_shape=()):
        df, loc, scale = map(_as_array, (self.df, self.loc, self.scale))
        shape = tuple(sample_shape) + jnp.broadcast_shapes(df.shape, loc.shape, scale.shape)
        dtype = jnp.result_type(loc, scale, float)
        return loc + scale * jax.random.t(key, df.astype(dtype), shape, dtype=dtype)

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.df), jnp.shape(self.loc), jnp.shape(self.scale))


@pytree_dataclass
class GeneralizedNormal(Distribution):
    """p(x) ∝ exp(-(|x-loc|/scale)^beta); cf. reference distributions.py:75-79."""

    loc: jnp.ndarray
    scale: jnp.ndarray
    beta: jnp.ndarray

    def log_prob(self, x):
        loc, scale, beta = map(_as_array, (self.loc, self.scale, self.beta))
        return (
            -jnp.log(2 * scale)
            - jsp_special.gammaln(1 / beta)
            + jnp.log(beta)
            - jnp.power(jnp.abs(x - loc) / scale, beta)
        )

    def sample(self, key, sample_shape=()):
        # |X|^beta ~ Gamma(1/beta, rate=1)  =>  X = sign * G^(1/beta) * scale
        loc, scale, beta = map(_as_array, (self.loc, self.scale, self.beta))
        shape = tuple(sample_shape) + jnp.broadcast_shapes(loc.shape, scale.shape)
        dtype = jnp.result_type(loc, scale, float)
        kg, ks = jax.random.split(key)
        g = jax.random.gamma(kg, jnp.broadcast_to(1 / beta, shape).astype(dtype), dtype=dtype)
        mag = jnp.power(g, 1 / beta)
        sign = jax.random.rademacher(ks, shape, dtype=dtype)
        return loc + scale * sign * mag

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))


@pytree_dataclass
class Uniform(Distribution):
    low: jnp.ndarray
    high: jnp.ndarray

    def log_prob(self, x):
        low, high = _as_array(self.low), _as_array(self.high)
        inside = (x >= low) & (x <= high)
        return jnp.where(inside, -jnp.log(high - low), -jnp.inf)

    def sample(self, key, sample_shape=()):
        low, high = _as_array(self.low), _as_array(self.high)
        shape = tuple(sample_shape) + jnp.broadcast_shapes(low.shape, high.shape)
        dtype = jnp.result_type(low, high, float)
        return jax.random.uniform(key, shape, minval=low, maxval=high, dtype=dtype)

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.low), jnp.shape(self.high))


@pytree_dataclass
class Gamma(Distribution):
    concentration: jnp.ndarray
    rate: jnp.ndarray

    def log_prob(self, x):
        conc, rate = _as_array(self.concentration), _as_array(self.rate)
        return (
            conc * jnp.log(rate)
            + (conc - 1) * jnp.log(x)
            - rate * x
            - jsp_special.gammaln(conc)
        )

    def sample(self, key, sample_shape=()):
        conc, rate = _as_array(self.concentration), _as_array(self.rate)
        shape = tuple(sample_shape) + jnp.broadcast_shapes(conc.shape, rate.shape)
        dtype = jnp.result_type(conc, rate, float)
        g = jax.random.gamma(key, jnp.broadcast_to(conc, shape).astype(dtype), dtype=dtype)
        return g / rate

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.concentration), jnp.shape(self.rate))


@pytree_dataclass
class HalfCauchy(Distribution):
    scale: jnp.ndarray

    def log_prob(self, x):
        scale = _as_array(self.scale)
        z = x / scale
        lp = math.log(2 / math.pi) - jnp.log(scale) - jnp.log1p(z * z)
        return jnp.where(x >= 0, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        scale = _as_array(self.scale)
        shape = tuple(sample_shape) + scale.shape
        dtype = jnp.result_type(scale, float)
        return jnp.abs(scale * jax.random.cauchy(key, shape, dtype=dtype))

    def batch_shape(self):
        return jnp.shape(self.scale)


@pytree_dataclass
class DoubleGamma(Distribution):
    """Gamma reflected around zero; reference distributions.py:97-109."""

    concentration: jnp.ndarray
    rate: jnp.ndarray

    def log_prob(self, x):
        g = Gamma(self.concentration, self.rate)
        return g.log_prob(jnp.abs(x)) - math.log(2)

    def sample(self, key, sample_shape=()):
        kg, ks = jax.random.split(key)
        g = Gamma(self.concentration, self.rate)
        x = g.sample(kg, sample_shape)
        sign = jax.random.rademacher(ks, x.shape, dtype=x.dtype)
        return x * sign

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.concentration), jnp.shape(self.rate))


@pytree_dataclass
class LogNormal(Distribution):
    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, x):
        base = Normal(self.loc, self.scale)
        return base.log_prob(jnp.log(x)) - jnp.log(x)

    def sample(self, key, sample_shape=()):
        return jnp.exp(Normal(self.loc, self.scale).sample(key, sample_shape))

    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))


def _tril_solve(L, b):
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


@pytree_dataclass
class MultivariateNormal(Distribution):
    """MVN over the last axis, parameterized by loc and scale_tril."""

    loc: jnp.ndarray        # (..., D)
    scale_tril: jnp.ndarray  # (..., D, D)

    event_dim = 1

    def log_prob(self, x):
        loc, L = _as_array(self.loc), _as_array(self.scale_tril)
        diff = x - loc
        solve = jnp.vectorize(
            lambda Lm, d: _tril_solve(Lm, d), signature="(d,d),(d)->(d)"
        )
        z = solve(L, diff)
        M = jnp.sum(z * z, axis=-1)
        half_log_det = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        D = x.shape[-1]
        return -0.5 * M - half_log_det - 0.5 * D * math.log(2 * math.pi)

    def sample(self, key, sample_shape=()):
        loc, L = _as_array(self.loc), _as_array(self.scale_tril)
        D = L.shape[-1]
        shape = tuple(sample_shape) + jnp.broadcast_shapes(loc.shape[:-1] if loc.ndim else (), L.shape[:-2]) + (D,)
        dtype = jnp.result_type(loc, L, float)
        eps = jax.random.normal(key, shape, dtype=dtype)
        return loc + jnp.einsum("...ij,...j->...i", L, eps)

    def event_shape(self):
        return (jnp.shape(self.scale_tril)[-1],)

    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.loc)[:-1] if jnp.ndim(self.loc) else (), jnp.shape(self.scale_tril)[:-2]
        )


def squared_exponential_scale_tril(distance_matrix, lengthscale, scale):
    """Cholesky of cov = exp(-d/lengthscale)*scale^2 (reference loc_scale.py:13-18).

    A small jitter keeps the Cholesky stable in float32 on TPU.
    """
    d = _as_array(distance_matrix)
    cov = jnp.exp(-d / lengthscale) * scale ** 2
    dtype = cov.dtype
    jitter = (1e-6 if dtype == jnp.float64 else 1e-5) * scale ** 2
    cov = cov + jitter * jnp.eye(cov.shape[-1], dtype=dtype)
    return jnp.linalg.cholesky(cov)


def grid_distance_matrix(h: int, w: int) -> np.ndarray:
    """Euclidean distances between all points of an h×w grid (static, NumPy)."""
    p = np.mgrid[:h, :w].reshape(2, -1).T
    return np.sqrt(np.sum((p[:, None, :] - p[None, :, :]) ** 2.0, axis=2))


@pytree_dataclass
class MultivariateT(Distribution):
    """Multivariate Student-t, Shah et al. 2014 parameterization (covariance =
    covariance matrix). Supports `event_ndim` trailing event dims whose total
    size may exceed the covariance dimension, reproducing the broadcast
    half-log-det rule of the reference (`prior/distributions.py:176-199`).

    scale_tril is the Cholesky of the *covariance* (like the reference, which
    passes `covariance_matrix` to the MVN parent).
    """

    df: jnp.ndarray
    loc: jnp.ndarray          # broadcastable to event
    scale_tril: jnp.ndarray   # (D, D); events are (..., D) or (..., k, D) etc.

    event_dim = 1  # minimum; actual event_ndim passed to log_prob

    def log_prob(self, x, event_ndim: int = 1):
        df, loc, L = map(_as_array, (self.df, self.loc, self.scale_tril))
        diff = x - loc
        D = L.shape[-1]
        # Mahalanobis over the last axis
        flat = diff.reshape(-1, D)
        z = jax.vmap(lambda d: _tril_solve(L, d))(flat).reshape(diff.shape)
        M = jnp.sum(z * z, axis=-1)
        # Sum over remaining event dims (all but the first of event_ndim)
        if event_ndim > 1:
            M = jnp.sum(M, axis=tuple(range(-event_ndim + 1, 0)))
        p = int(np.prod(x.shape[-event_ndim:]))
        log_diag = jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))
        # Broadcast rule: scale half-log-det by p / D when the event is larger
        half_log_det = jnp.sum(log_diag) * (p / D)
        lam = df - 2.0
        return (
            jsp_special.gammaln((p + df) / 2.0)
            - (p / 2.0) * jnp.log(math.pi * lam)
            - jsp_special.gammaln(df / 2.0)
            - half_log_det
            - ((df + p) / 2.0) * jnp.log1p(M / lam)
        )

    def sample(self, key, sample_shape=(), event_shape: Optional[Tuple[int, ...]] = None):
        df, loc, L = map(_as_array, (self.df, self.loc, self.scale_tril))
        D = L.shape[-1]
        if event_shape is None:
            event_shape = (D,)
        assert event_shape[-1] == D
        dtype = jnp.result_type(loc, L, float)
        kn, kg = jax.random.split(key)
        shape = tuple(sample_shape) + tuple(event_shape)
        eps = jax.random.normal(kn, shape, dtype=dtype)
        # one gamma per event
        r_inv = 2.0 * jax.random.gamma(kg, jnp.full(tuple(sample_shape), df / 2.0, dtype=dtype), dtype=dtype)
        r = jnp.sqrt((df - 2.0) / r_inv)
        r = r.reshape(tuple(sample_shape) + (1,) * len(event_shape))
        return loc + r * jnp.einsum("ij,...j->...i", L, eps)


def rademacher_like(key, x):
    return jax.random.rademacher(key, jnp.shape(x), dtype=jnp.result_type(x, float))


def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y):
    """Inverse of softplus: log(exp(y) - 1), numerically stable."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


class Improper:
    """Improper flat 'distribution': log_prob = 0, samples like a Normal."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    def log_prob(self, x):
        return jnp.zeros_like(x)

    def sample(self, key, sample_shape=()):
        return Normal(self.loc, self.scale).sample(key, sample_shape)
