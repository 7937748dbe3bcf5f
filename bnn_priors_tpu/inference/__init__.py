"""Cyclical SG-MCMC inference runners."""
from .runner import HMCRunner, SGLDRunner, VerletSGLDRunner
from .reject import HMCRunnerReject, SGLDRunnerReject, VerletSGLDRunnerReject
from .schedules import get_cosine_schedule, make_schedule
