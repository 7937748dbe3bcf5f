"""Prior-only models with zero likelihood — the analytic test workhorses
(reference: `bnn_priors/models/prior_only.py`). `GaussianModel`'s exact
posterior is known, which makes it the fixture for the sampler
distribution-preservation tests.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import priors as prior
from .base import Model
from .layers import Identity

__all__ = ("PriorOnlyModel", "GaussianModel", "NealFunnel", "NealFunnelT")


class PriorOnlyModel(Model):
    def __init__(self, priors_list):
        super().__init__(Identity())
        for i, p in enumerate(priors_list):
            setattr(self, str(i), p)

    def likelihood_log_prob(self, params, f, y):
        return jnp.zeros(1)

    def log_likelihood(self, params, state, x, y, eff_num_data, train=False,
                       mask=None, compute_dtype=None):
        return jnp.asarray(0.0), state, None

    def acc_fn(self, f, y, params):
        return jnp.zeros(1)

    def predictions(self, f, params):
        return f

    def potential_avg_fn(self, state=None, x=None, y=None, eff_num_data=1.0,
                         train=False, mask=None, compute_dtype=None):
        "params -> (-log_prior/eff_num_data, aux); kernel-level test closure"

        def fn(params):
            lp = self.log_prior(params)
            pot = -lp / eff_num_data
            return pot, ({}, {"loss": jnp.asarray(0.0), "log_prior": lp,
                              "acc": jnp.asarray(0.0)})
        return fn

    def potential_avg_closure(self, eff_num_data=1.0):
        """Reference-named alias (prior_only.py:31-35): a pure
        `params -> potential_avg` scalar function for kernel-level tests."""
        fn = self.potential_avg_fn(eff_num_data=eff_num_data)
        return lambda params: fn(params)[0]


class GaussianModel(PriorOnlyModel):
    "N independent D-dim Gaussian parameters (prior_only.py:38-41)."

    def __init__(self, N, D, mean=0.0, std=1.0):
        super().__init__([prior.Normal((D,), mean, std) for _ in range(N)])


class NealFunnel(PriorOnlyModel):
    def __init__(self):
        std = np.linspace(0.01, 1, 100)
        super().__init__([prior.Normal((100,), 0.0, std)])


class NealFunnelT(PriorOnlyModel):
    def __init__(self):
        std = np.linspace(0.01, 1, 100)
        super().__init__([prior.StudentT((100,), 0.0, std, df=3)])
