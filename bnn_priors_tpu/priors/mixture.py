"""Mixture priors + the string registry `get_prior`
(reference: `bnn_priors/prior/mixture.py`).

The reference wires mixtures by monkey-patching the shared parameter into
each component module (`mixture.py:59-65`); here components are ordinary
sub-priors with `suppress_own=True`, so they emit no `p` leaf of their own
and the mixture's log-prob evaluates each component's density at the shared
leaf explicitly. The `mixture_weights` leaf is a free (flat-prior) parameter
sampled by the MCMC kernel, as in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import distributions as D
from .base import Prior, join
from . import fixed_cov
from .empirical_bayes import (ConvCorrNormalEmpirical, GenNormEmpirical,
                              LaplaceEmpirical, NormalEmpirical,
                              StudentTEmpirical)
from .hierarchical import (ConvCorrNormalGamma, GenNormUniform, Horseshoe,
                           LaplaceGamma, LaplaceUniform, NormalGamma,
                           NormalUniform, StudentTGamma, StudentTUniform)
from .loc_scale import (Cauchy, ConvCorrelatedNormal, GenNorm, Improper,
                        Laplace, LocScale, LogNormal, Normal,
                        PositiveImproper, StudentT)
from .transformed import DoubleGamma, Gamma, HalfCauchy, Uniform

__all__ = ("Mixture", "ScaleMixture", "ScaleMixtureEmpirical", "get_prior")


def get_prior(prior_name: str):
    priors = {
        "gaussian": Normal,
        "convcorrnormal": ConvCorrelatedNormal,
        "convcorrnormal_fitted_ls": ConvCorrelatedNormal,
        "convcorrnormal_empirical": ConvCorrNormalEmpirical,
        "convcorrnormal_gamma": ConvCorrNormalGamma,
        "datadrivencorrnormal": Normal,
        "datadrivencorrdoublegamma": DoubleGamma,
        "fixedcov_normal": fixed_cov.FixedCovNormal,
        "fixedcov_gennorm": fixed_cov.FixedCovGenNorm,
        "lognormal": LogNormal,
        "laplace": Laplace,
        "cauchy": Cauchy,
        "student-t": StudentT,
        "uniform": Uniform,
        "improper": Improper,
        "gaussian_gamma": NormalGamma,
        "gaussian_uniform": NormalUniform,
        "horseshoe": Horseshoe,
        "laplace_gamma": LaplaceGamma,
        "laplace_uniform": LaplaceUniform,
        "student-t_gamma": StudentTGamma,
        "student-t_uniform": StudentTUniform,
        "gennorm": GenNorm,
        "gennorm_uniform": GenNormUniform,
        "gaussian_empirical": NormalEmpirical,
        "laplace_empirical": LaplaceEmpirical,
        "student-t_empirical": StudentTEmpirical,
        "gennorm_empirical": GenNormEmpirical,
        "scale_mixture": ScaleMixture,
        "mixture": Mixture,
        "scale_mixture_empirical": ScaleMixtureEmpirical,
    }
    assert prior_name in priors, f"unknown prior {prior_name!r}"
    return priors[prior_name]


class Mixture(LocScale):
    """prob(p) = Σ_i softmax(w)_i · exp(comp_i.log_prob(p)); the mixture
    weights are a flat-prior leaf `mixture_weights`."""

    def __init__(self, shape, loc, scale, components="g_l_s_c_gn"):
        comp_names = self.get_components(components)
        assert len(comp_names) > 0, "Too few mixture components"
        super().__init__(shape, loc, scale)
        self._build_components(
            [get_prior(c)(shape, loc, scale) for c in comp_names]
        )

    def _build_components(self, components):
        self.components = components
        for comp in self.components:
            comp.suppress_own = True
        for i, comp in enumerate(self.components):
            self.hypers[f"component_{i}"] = comp

    def extra_leaf_shapes(self):
        return {"mixture_weights": (len(self.components),)}

    def _dist(self, **kwargs):
        raise NotImplementedError("Mixture has no single distribution")

    def log_prob_value(self, params, prefix, value):
        w = params[join(prefix, "mixture_weights")]
        normaliser = jax.scipy.special.logsumexp(w)
        log_ps = jnp.stack([
            comp.log_prob_value(params, join(prefix, f"component_{i}"), value)
            for i, comp in enumerate(self.components)
        ])
        return jax.scipy.special.logsumexp(w + log_ps) - normaliser

    def _sample_p(self, key, params, prefix, dtype):
        kc, ks = jax.random.split(key)
        w = params.get(join(prefix, "mixture_weights"))
        if w is None:
            w = jnp.zeros(len(self.components))
        idx = int(jax.random.categorical(kc, jnp.asarray(w)))
        comp = self.components[idx]
        return comp._sample_p(ks, params, join(prefix, f"component_{idx}"), dtype)

    @staticmethod
    def get_components(comp_string: str):
        comp_dict = {
            "g": "gaussian", "ln": "lognormal", "l": "laplace", "c": "cauchy",
            "s": "student-t", "u": "uniform", "i": "improper",
            "gg": "gaussian_gamma", "gu": "gaussian_uniform", "h": "horseshoe",
            "lg": "laplace_gamma", "lu": "laplace_uniform",
            "sg": "student-t_gamma", "su": "student-t_uniform",
            "gn": "gennorm", "gnu": "gennorm_uniform",
            "ge": "gaussian_empirical", "le": "laplace_empirical",
            "se": "student-t_empirical", "gne": "gennorm_empirical",
        }
        abrvs = comp_string.split("_")
        assert all(a in comp_dict for a in abrvs), "Unknown mixture components"
        return [comp_dict[a] for a in abrvs]


class ScaleMixture(Mixture):
    """Mixture of one base family at 5 geometric scales (mixture.py:130-150)."""

    def __init__(self, shape, loc, scale, base_dist="gaussian", scales=None):
        if scales is None:
            scales = [scale / 9, scale / 3, scale, scale * 3, scale * 9]
        self.scales = scales
        LocScale.__init__(self, shape, loc, scale)
        self._build_components(
            [get_prior(base_dist)(shape, loc, scl) for scl in scales]
        )


class ScaleMixtureEmpirical(Mixture):
    """Scale mixture whose component scales are free (flat-prior) leaves."""

    def __init__(self, shape, loc, scale, base_dist="gaussian", scales=None):
        if scales is None:
            scales = [scale / 9, scale / 3, scale, scale * 3, scale * 9]
        self.scales = scales
        LocScale.__init__(self, shape, loc, scale)
        comps = []
        for scl in scales:
            scale_prior = PositiveImproper(shape=[], loc=scl, scale=1.0)
            scale_prior.pinned_init = np.asarray(D.inv_softplus(float(scl)))
            comps.append(get_prior(base_dist)(shape, loc, scale_prior))
        self._build_components(comps)
