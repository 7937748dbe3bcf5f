"""Prior DSL tests, porting the strategy of reference `testing/test_priors.py`:
log-probs against closed forms, sampling via KS tests, structure/naming of
hierarchical and mixture priors, and finiteness of transformed priors at
extreme p values.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bnn_priors_tpu import distributions as D
from bnn_priors_tpu import priors

KEY = jax.random.key(42)
SHAPE = (3, 4)


def make(prior_cls, *args, **kwargs):
    prior = prior_cls(SHAPE, *args, **kwargs)
    params = prior.init(KEY, "w")
    return prior, params


def test_normal_logp_and_names():
    prior, params = make(priors.Normal, 0.0, 1.3)
    assert set(params) == {"w.p"}
    assert params["w.p"].shape == SHAPE
    lp = float(prior.log_prob(params, "w"))
    expected = st.norm(0, 1.3).logpdf(np.asarray(params["w.p"])).sum()
    assert abs(lp - expected) < 1e-6


@pytest.mark.parametrize("cls,scipy_fn", [
    (priors.Normal, lambda: st.norm(0, 0.7)),
    (priors.Laplace, lambda: st.laplace(0, 0.7)),
    (priors.Cauchy, lambda: st.cauchy(0, 0.7)),
])
def test_loc_scale_sampling_ks(cls, scipy_fn):
    prior = cls((50, 40), 0.0, 0.7)
    params = prior.init(KEY, "w")
    samples = np.asarray(params["w.p"]).ravel()
    assert st.kstest(samples, scipy_fn().cdf).pvalue > 1e-4


def test_student_t():
    prior, params = make(priors.StudentT, 0.0, 1.0, df=3)
    lp = float(prior.log_prob(params, "w"))
    expected = st.t(3, 0, 1).logpdf(np.asarray(params["w.p"])).sum()
    assert abs(lp - expected) < 1e-6


def test_gennorm():
    prior, params = make(priors.GenNorm, 0.0, 1.0, beta=0.5)
    lp = float(prior.log_prob(params, "w"))
    expected = st.gennorm(0.5, 0, 1).logpdf(np.asarray(params["w.p"])).sum()
    assert abs(lp - expected) < 1e-6


def test_lognormal_reparam():
    prior, params = make(priors.LogNormal, 0.1, 0.8)
    p = np.asarray(params["w.p"])
    # forward is exp(p); density includes the -sum(p) log-det correction
    fwd = np.asarray(prior.forward(params, "w"))
    np.testing.assert_allclose(fwd, np.exp(p), rtol=1e-6)
    lp = float(prior.log_prob(params, "w"))
    expected = st.norm(0.1, 0.8).logpdf(p).sum() - p.sum()
    assert abs(lp - expected) < 1e-6
    # equivalently: the lognormal density at exp(p)
    expected2 = st.lognorm(0.8, scale=math.exp(0.1)).logpdf(np.exp(p)).sum()
    assert abs(lp - expected2) < 1e-6


def test_improper():
    prior, params = make(priors.Improper, 0.0, 1.0)
    assert float(prior.log_prob(params, "w")) == 0.0
    prior2, params2 = make(priors.PositiveImproper, 0.0, 1.0)
    assert np.all(np.asarray(prior2.forward(params2, "w")) > 0)


def test_uniform():
    prior, params = make(priors.Uniform, -1.0, 2.0)
    fwd = np.asarray(prior.forward(params, "w"))
    assert ((-1 <= fwd) & (fwd <= 2)).all()
    lp = float(prior.log_prob(params, "w"))
    assert abs(lp - (-math.log(3.0) * 12)) < 1e-6
    # sampling through the reparam: forward values should be uniform
    big = priors.Uniform((300, 300), -1.0, 2.0)
    bp = big.init(KEY, "w")
    u = np.asarray(big.forward(bp, "w")).ravel()
    assert st.kstest(u, st.uniform(-1, 3).cdf).pvalue > 1e-4


def test_uniform_finite_at_extreme():
    "Transformed priors stay finite at p=-100 (reference _generic_positive_test)."
    prior, params = make(priors.Uniform, 0.0, 2.0)
    params["w.p"] = jnp.full(SHAPE, -100.0)
    assert np.isfinite(float(prior.log_prob(params, "w")))
    assert np.isfinite(np.asarray(prior.forward(params, "w"))).all()


def test_gamma():
    prior, params = make(priors.Gamma, 2.0, 0.5)
    fwd = np.asarray(prior.forward(params, "w"))
    assert (fwd > 0).all()
    lp = float(prior.log_prob(params, "w"))
    expected = st.gamma(2.0, scale=2.0).logpdf(fwd).sum()
    assert abs(lp - expected) < 1e-6
    big = priors.Gamma((300, 300), 2.0, 0.5)
    bp = big.init(KEY, "w")
    fwd = np.asarray(big.forward(bp, "w")).ravel()
    assert st.kstest(fwd, st.gamma(2.0, scale=2.0).cdf).pvalue > 1e-4


def test_half_cauchy():
    prior, params = make(priors.HalfCauchy, scale=1.0, multiplier=2.0)
    fwd = np.asarray(prior.forward(params, "w"))
    assert (fwd > 0).all()
    lp = float(prior.log_prob(params, "w"))
    expected = st.halfcauchy(scale=1.0).logpdf(np.asarray(D.softplus(params["w.p"])) * 2.0).sum()
    assert abs(lp - expected) < 1e-6


def test_double_gamma():
    prior, params = make(priors.DoubleGamma, 0.5, 1.0, 0.7)
    lp = float(prior.log_prob(params, "w"))
    p = np.asarray(params["w.p"])
    expected = st.dgamma(0.7, scale=1.0).logpdf(p - 0.5).sum()
    assert abs(lp - expected) < 1e-6


def test_hierarchical_gamma_structure():
    prior = priors.NormalGamma(SHAPE, 0.0, 1.41)
    params = prior.init(KEY, "w")
    assert set(params) == {"w.p", "w.scale.p"}
    # scale leaf pinned at inv_softplus(1.41)
    assert abs(float(D.softplus(params["w.scale.p"])) - 1.41) < 1e-6
    # log_prob = Normal(p; 0, softplus(scale_p)) + Gamma(softplus(scale_p))
    scale = float(D.softplus(params["w.scale.p"]))
    p = np.asarray(params["w.p"])
    expected = (
        st.norm(0, scale).logpdf(p).sum()
        + st.gamma(1.41, scale=1.0).logpdf(scale)
    )
    assert abs(float(prior.log_prob(params, "w")) - expected) < 1e-6


def test_horseshoe_structure():
    prior = priors.Horseshoe(SHAPE, 0.0, 0.5, hyperscale=1.0)
    params = prior.init(KEY, "w")
    assert set(params) == {"w.p", "w.scale.p"}
    eff_scale = float(D.softplus(params["w.scale.p"])) * 0.5
    p = np.asarray(params["w.p"])
    expected = (
        st.norm(0, eff_scale).logpdf(p).sum()
        + st.halfcauchy(scale=1.0).logpdf(eff_scale)
    )
    assert abs(float(prior.log_prob(params, "w")) - expected) < 1e-6


def test_empirical_bayes():
    prior = priors.StudentTEmpirical(SHAPE, 0.0, 1.0, df=2.0)
    params = prior.init(KEY, "w")
    assert set(params) == {"w.p", "w.scale.p", "w.df.p"}
    # hyper priors are flat: only the StudentT term contributes
    scale = float(D.softplus(params["w.scale.p"]))
    df = float(D.softplus(params["w.df.p"]))
    p = np.asarray(params["w.p"])
    expected = st.t(df, 0, scale).logpdf(p).sum()
    assert abs(float(prior.log_prob(params, "w")) - expected) < 1e-6


def test_conv_correlated_normal():
    prior = priors.ConvCorrelatedNormal((8, 2, 3, 3), 0.0, 1.0, lengthscale=1.0)
    params = prior.init(KEY, "w")
    assert params["w.p"].shape == (8, 2, 3, 3)
    d = D.grid_distance_matrix(3, 3)
    cov = np.exp(-d) * 1.0
    p = np.asarray(params["w.p"]).reshape(16, 9)
    expected = st.multivariate_normal(np.zeros(9), cov, allow_singular=True).logpdf(p).sum()
    lp = float(prior.log_prob(params, "w"))
    assert abs(lp - expected) < 1e-2  # jitter-limited

    # empirical covariance of samples matches
    big = priors.ConvCorrelatedNormal((5000, 4, 3, 3), 0.0, 1.0, lengthscale=1.0)
    bp = big.init(KEY, "w")
    flat = np.asarray(bp["w.p"]).reshape(-1, 9)
    emp = np.cov(flat.T)
    np.testing.assert_allclose(emp, cov, atol=0.05)


def test_conv_corr_normal_gamma():
    prior = priors.ConvCorrNormalGamma((4, 2, 3, 3), 0.0, 1.0, lengthscale=1.0)
    params = prior.init(KEY, "w")
    assert set(params) == {"w.p", "w.scale.p", "w.lengthscale.p"}
    assert np.isfinite(float(prior.log_prob(params, "w")))


def test_mixture():
    prior = priors.Mixture(SHAPE, 0.0, 1.0, components="g_l")
    params = prior.init(KEY, "w")
    assert "w.mixture_weights" in params
    assert params["w.mixture_weights"].shape == (2,)
    p = np.asarray(params["w.p"])
    # equal weights: log prob = logsumexp([lp_g, lp_l]) - log 2
    lp_g = st.norm(0, 1).logpdf(p).sum()
    lp_l = st.laplace(0, 1).logpdf(p).sum()
    expected = np.logaddexp(lp_g, lp_l) - math.log(2)
    assert abs(float(prior.log_prob(params, "w")) - expected) < 1e-6


def test_scale_mixture():
    prior = priors.ScaleMixture(SHAPE, 0.0, 1.0)
    params = prior.init(KEY, "w")
    assert params["w.mixture_weights"].shape == (5,)
    p = np.asarray(params["w.p"])
    lps = [st.norm(0, s).logpdf(p).sum() for s in [1 / 9, 1 / 3, 1.0, 3.0, 9.0]]
    expected = np.logaddexp.reduce(lps) - math.log(5)
    assert abs(float(prior.log_prob(params, "w")) - expected) < 1e-5


def test_scale_mixture_empirical():
    prior = priors.ScaleMixtureEmpirical(SHAPE, 0.0, 1.0)
    params = prior.init(KEY, "w")
    names = {f"w.component_{i}.scale.p" for i in range(5)}
    assert names <= set(params)
    assert np.isfinite(float(prior.log_prob(params, "w")))


def test_fixedcov_normal():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(9, 9))
    cov = A @ A.T + np.eye(9)
    prior = priors.FixedCovNormal((4, 2, 3, 3), np.zeros(9), cov)
    params = prior.init(KEY, "w")
    p = np.asarray(params["w.p"]).reshape(8, 9)
    expected = st.multivariate_normal(np.zeros(9), cov).logpdf(p).sum()
    lp = float(prior.log_prob(params, "w"))
    assert abs(lp - expected) < 1e-6

    big = priors.FixedCovNormal((3000, 3, 3, 3), np.zeros(9), cov)
    bp = big.init(KEY, "w")
    flat = np.asarray(bp["w.p"]).reshape(-1, 9)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.5)


def test_fixedcov_laplace_moments():
    cov = np.diag([1.0, 4.0])
    prior = priors.FixedCovLaplace((20000, 1, 1, 2), np.zeros(2), cov)
    params = prior.init(KEY, "w")
    flat = np.asarray(params["w.p"]).reshape(-1, 2)
    np.testing.assert_allclose(flat.var(axis=0), [1.0, 4.0], rtol=0.1)
    assert np.isfinite(float(prior.log_prob(params, "w")))


def test_multivariate_t_prior():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(9, 9))
    cov = A @ A.T + 9 * np.eye(9)
    L = np.linalg.cholesky(cov)
    # correlate the spatial dims of an (8,2,3,3) kernel
    prior = priors.MultivariateT((8, 2, 3, 3), np.zeros(9), L, df=5.0, event_dim=2)
    params = prior.init(KEY, "w")
    assert params["w.p"].shape == (8, 2, 3, 3)
    lp = float(prior.log_prob(params, "w"))
    # check against per-event direct MVT formula
    x = np.asarray(params["w.p"]).reshape(16, 9)
    df, lam, p = 5.0, 3.0, 9
    expected = 0.0
    for row in x:
        M = row @ np.linalg.inv(cov) @ row
        expected += (
            math.lgamma((p + df) / 2) - (p / 2) * math.log(math.pi * lam)
            - math.lgamma(df / 2) - 0.5 * math.log(np.linalg.det(cov))
            - ((df + p) / 2) * math.log(1 + M / lam)
        )
    assert abs(lp - expected) < 1e-5


def test_multivariate_t_permute():
    """Correlate the input-channel axis: permute moves it last."""
    L = np.eye(4)
    prior = priors.MultivariateT(
        (2, 4, 3, 3), 0.0, L, df=5.0, event_dim=1, permute=[0, 2, 3, 1]
    )
    params = prior.init(KEY, "w")
    assert params["w.p"].shape == (2, 4, 3, 3)
    assert np.isfinite(float(prior.log_prob(params, "w")))


def test_sample_all():
    prior = priors.NormalGamma(SHAPE, 0.0, 1.0)
    params = prior.init(KEY, "w")
    new = prior.sample(jax.random.key(7), params, "w")
    assert set(new) == set(params)
    assert not np.allclose(np.asarray(new["w.p"]), np.asarray(params["w.p"]))


def test_registry_complete():
    names = [
        "gaussian", "convcorrnormal", "convcorrnormal_fitted_ls",
        "convcorrnormal_empirical", "convcorrnormal_gamma",
        "datadrivencorrnormal", "datadrivencorrdoublegamma",
        "fixedcov_normal", "fixedcov_gennorm", "lognormal", "laplace",
        "cauchy", "student-t", "uniform", "improper", "gaussian_gamma",
        "gaussian_uniform", "horseshoe", "laplace_gamma", "laplace_uniform",
        "student-t_gamma", "student-t_uniform", "gennorm", "gennorm_uniform",
        "gaussian_empirical", "laplace_empirical", "student-t_empirical",
        "gennorm_empirical", "scale_mixture", "mixture",
        "scale_mixture_empirical",
    ]
    for n in names:
        assert priors.get_prior(n) is not None
