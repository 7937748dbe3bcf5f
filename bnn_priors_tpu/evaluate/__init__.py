"""Posterior-predictive evaluation: ensembles, calibration, OOD, marglik."""
from .calibration import ace, ece, gce, rmsce, sce, tace
from .metrics import (evaluate_marglik, evaluate_model, evaluate_ood,
                      reject_samples_, split_sample_bank)
