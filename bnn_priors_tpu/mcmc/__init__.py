"""Pure-function SG-MCMC kernels over pytree chain state."""
from .sgld import SGLD, SGLDState
from .verlet_sgld import VerletSGLD, VerletSGLDState
from .hmc import HMC
from .packing import Packer
from .segmented import SegPacker, SegVec
from . import tree_util
