"""Multi-chain parallelism over device meshes."""
from .chains import (ChainMesh, init_chains, init_chains_diverse, make_mesh,
                     vmap_chains)
from .multichain import MultiChainRunner, MultiChainRunnerReject
