"""bnn_priors_tpu — a TPU-native SG-MCMC framework for Bayesian neural nets.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference `ratschlab/bnn_priors` library: SG-MCMC samplers (SGLD/GGMC/HMC)
over neural-network weights with a rich library of weight priors, cyclical
temperature schedules, RMSProp preconditioning, Metropolis–Hastings
correction with exact gradients, and posterior-predictive evaluation —
built on pure functions, pytree chain state, `lax.scan` trajectories,
vmapped parallel chains and `shard_map` device meshes.
"""

__version__ = "0.1.0"

from . import distributions  # noqa: F401
