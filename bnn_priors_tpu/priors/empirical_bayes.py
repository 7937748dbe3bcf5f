"""Empirical-Bayes priors: hyperparameters get flat (PositiveImproper)
priors and are optimized/sampled by the MCMC kernel itself
(reference: `bnn_priors/prior/empirical_bayes.py`)."""
from __future__ import annotations

import numpy as np

from .. import distributions as D
from .base import Prior
from .loc_scale import (ConvCorrelatedNormal, GenNorm, Laplace, Normal,
                        PositiveImproper, StudentT)

__all__ = (
    "NormalEmpirical", "LaplaceEmpirical", "StudentTEmpirical",
    "GenNormEmpirical", "ConvCorrNormalEmpirical",
)


def _flat_positive(value) -> Prior:
    p = PositiveImproper(shape=[], loc=value, scale=1.0)
    p.pinned_init = np.asarray(D.inv_softplus(float(value)))
    return p


class ConvCorrNormalEmpirical(ConvCorrelatedNormal):
    def __init__(self, shape, loc, scale, lengthscale=1.0):
        super().__init__(
            shape, loc, scale=_flat_positive(scale),
            lengthscale=_flat_positive(lengthscale),
        )


class NormalEmpirical(Normal):
    def __init__(self, shape, loc, scale):
        super().__init__(shape, loc, _flat_positive(scale))


class LaplaceEmpirical(Laplace):
    def __init__(self, shape, loc, scale):
        super().__init__(shape, loc, _flat_positive(scale))


class StudentTEmpirical(StudentT):
    def __init__(self, shape, loc, scale, df=2.0):
        super().__init__(shape, loc, _flat_positive(scale), df=_flat_positive(df))


class GenNormEmpirical(GenNorm):
    def __init__(self, shape, loc, scale, beta=0.5):
        super().__init__(shape, loc, _flat_positive(scale), beta=_flat_positive(beta))
