"""Multi-chain parallelism over device meshes (+ multi-host)."""
from . import distributed
from .chains import (ChainMesh, init_chains, init_chains_diverse,
                     init_chains_from_fn, make_mesh, vmap_chains)
from .multichain import MultiChainRunner, MultiChainRunnerReject
