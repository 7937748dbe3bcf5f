"""Distribution log-prob and sampling tests.

Port of the reference test strategy (`testing/test_priors.py`): log-probs are
checked against scipy closed forms; sampling is checked with exact
Kolmogorov–Smirnov tests against the CDF on large sample counts.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bnn_priors_tpu import distributions as D


KEY = jax.random.key(0)
X = np.linspace(-4.0, 4.0, 41)
XPOS = np.linspace(0.05, 8.0, 41)


def _check_logp(dist, x, scipy_dist, atol=1e-6):
    ours = np.asarray(dist.log_prob(jnp.asarray(x)))
    theirs = scipy_dist.logpdf(x)
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-6)


def _check_ks(dist, scipy_dist, n=100_000, pmin=1e-4, **sample_kwargs):
    samples = np.asarray(dist.sample(KEY, (n,), **sample_kwargs)).ravel()
    assert np.isfinite(samples).all()
    res = st.kstest(samples, scipy_dist.cdf)
    assert res.pvalue > pmin, f"KS p={res.pvalue}"


def test_normal():
    _check_logp(D.Normal(0.3, 1.7), X, st.norm(0.3, 1.7))
    _check_ks(D.Normal(0.3, 1.7), st.norm(0.3, 1.7))


def test_laplace():
    _check_logp(D.Laplace(-0.2, 0.8), X, st.laplace(-0.2, 0.8))
    _check_ks(D.Laplace(-0.2, 0.8), st.laplace(-0.2, 0.8))


def test_cauchy():
    _check_logp(D.Cauchy(0.1, 2.0), X, st.cauchy(0.1, 2.0))
    _check_ks(D.Cauchy(0.1, 2.0), st.cauchy(0.1, 2.0))


def test_student_t():
    _check_logp(D.StudentT(3.0, 0.5, 1.2), X, st.t(3.0, 0.5, 1.2))
    _check_ks(D.StudentT(3.0, 0.5, 1.2), st.t(3.0, 0.5, 1.2))


def test_gennorm():
    _check_logp(D.GeneralizedNormal(0.0, 1.3, 0.5), X, st.gennorm(0.5, 0.0, 1.3))
    _check_ks(D.GeneralizedNormal(0.0, 1.3, 0.5), st.gennorm(0.5, 0.0, 1.3))
    _check_logp(D.GeneralizedNormal(0.2, 0.7, 3.0), X, st.gennorm(3.0, 0.2, 0.7))
    _check_ks(D.GeneralizedNormal(0.2, 0.7, 3.0), st.gennorm(3.0, 0.2, 0.7))


def test_uniform():
    _check_logp(D.Uniform(-1.0, 2.0), np.linspace(-0.9, 1.9, 20), st.uniform(-1.0, 3.0))
    _check_ks(D.Uniform(-1.0, 2.0), st.uniform(-1.0, 3.0))


def test_gamma():
    _check_logp(D.Gamma(2.5, 1.5), XPOS, st.gamma(2.5, scale=1 / 1.5))
    _check_ks(D.Gamma(2.5, 1.5), st.gamma(2.5, scale=1 / 1.5))
    _check_logp(D.Gamma(0.5, 3.0), XPOS, st.gamma(0.5, scale=1 / 3.0))


def test_half_cauchy():
    _check_logp(D.HalfCauchy(1.5), XPOS, st.halfcauchy(scale=1.5))
    _check_ks(D.HalfCauchy(1.5), st.halfcauchy(scale=1.5))


def test_double_gamma():
    conc, rate = 0.5, 2.0
    dist = D.DoubleGamma(conc, rate)
    scipy_dist = st.dgamma(conc, scale=1 / rate)
    _check_logp(dist, np.concatenate([-XPOS, XPOS]), scipy_dist)
    _check_ks(dist, scipy_dist)


def test_lognormal():
    _check_logp(D.LogNormal(0.1, 0.9), XPOS, st.lognorm(0.9, scale=math.exp(0.1)))
    _check_ks(D.LogNormal(0.1, 0.9), st.lognorm(0.9, scale=math.exp(0.1)))


def test_mvn_logp_and_moments():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 4))
    cov = A @ A.T + 4 * np.eye(4)
    L = np.linalg.cholesky(cov)
    loc = rng.normal(size=(4,))
    dist = D.MultivariateNormal(jnp.asarray(loc), jnp.asarray(L))
    xs = rng.normal(size=(7, 4))
    ours = np.asarray(dist.log_prob(jnp.asarray(xs)))
    theirs = st.multivariate_normal(loc, cov).logpdf(xs)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    samples = np.asarray(dist.sample(KEY, (200_000,)))
    np.testing.assert_allclose(samples.mean(0), loc, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.1)


def test_sqexp_scale_tril():
    d = D.grid_distance_matrix(3, 3)
    L = D.squared_exponential_scale_tril(jnp.asarray(d), 1.0, 2.0)
    cov = np.asarray(L @ L.T)
    expected = np.exp(-d / 1.0) * 4.0
    np.testing.assert_allclose(cov, expected, atol=1e-3)


def test_multivariate_t_logp_matches_formula():
    """MVT with Shah et al. parameterization: check against a direct formula."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(3, 3))
    cov = A @ A.T + 3 * np.eye(3)
    L = np.linalg.cholesky(cov)
    df = 5.0
    dist = D.MultivariateT(df, 0.0, jnp.asarray(L))
    x = rng.normal(size=(3,))

    # Direct formula: a standard MVT with scale Sigma = (df-2)/df * cov has
    # covariance = cov; Shah et al. set lambda = df - 2.
    lam = df - 2.0
    M = x @ np.linalg.inv(cov) @ x
    p = 3
    expected = (
        math.lgamma((p + df) / 2)
        - (p / 2) * math.log(math.pi * lam)
        - math.lgamma(df / 2)
        - 0.5 * math.log(np.linalg.det(cov))
        - ((df + p) / 2) * math.log(1 + M / lam)
    )
    ours = float(dist.log_prob(jnp.asarray(x)))
    assert abs(ours - expected) < 1e-6


def test_multivariate_t_moments():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(3, 3))
    cov = A @ A.T + 3 * np.eye(3)
    L = np.linalg.cholesky(cov)
    dist = D.MultivariateT(7.0, 0.0, jnp.asarray(L))
    s = np.asarray(dist.sample(KEY, (400_000,)))
    # Shah parameterization: covariance == cov exactly
    np.testing.assert_allclose(s.mean(0), np.zeros(3), atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), cov, rtol=0.05, atol=0.1)


def test_multivariate_t_event_ndim():
    """Reproduce the reference's broadcast half-log-det for larger events."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(2, 2))
    cov = A @ A.T + 2 * np.eye(2)
    L = np.linalg.cholesky(cov)
    df = 6.0
    dist = D.MultivariateT(df, 0.0, jnp.asarray(L))
    x = rng.normal(size=(3, 2))  # event is (3, 2): 3 rows sharing one 2x2 cov
    lam = df - 2.0
    M = sum(row @ np.linalg.inv(cov) @ row for row in x)
    p = 6
    expected = (
        math.lgamma((p + df) / 2)
        - (p / 2) * math.log(math.pi * lam)
        - math.lgamma(df / 2)
        - 0.5 * math.log(np.linalg.det(cov)) * (p / 2)
        - ((df + p) / 2) * math.log(1 + M / lam)
    )
    ours = float(dist.log_prob(jnp.asarray(x), event_ndim=2))
    assert abs(ours - expected) < 1e-6


def test_inv_softplus_roundtrip():
    y = jnp.asarray([0.01, 0.5, 1.41, 10.0])
    np.testing.assert_allclose(
        np.asarray(D.softplus(D.inv_softplus(y))), np.asarray(y), rtol=1e-6
    )
