"""TPU Pallas kernels for the sampler hot path."""
from .fused_update import PACK_ALIGN, fused_langevin_update  # noqa: F401
