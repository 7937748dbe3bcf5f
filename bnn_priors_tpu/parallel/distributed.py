"""Multi-host (multi-process) support for the chains mesh — SURVEY §5.8.

The reference has NO distributed backend (its only multi-device code is
single-process `torch.nn.DataParallel`, exp_utils.py:226-233; multi-node
scaling is bash loops over independent processes). Here multi-host is a
first-class code path:

* `initialize(...)` wraps `jax.distributed.initialize` — call it before
  any jax operation; each host then sees the GLOBAL device set and
  `global_chains_mesh()` builds one `chains` mesh spanning all hosts.
* Chains are embarrassingly parallel, so the only cross-host traffic is
  (a) XLA's partitioning of the vmapped update (none on the chains axis),
  (b) tiny diagnostic gathers (`host_value` reshards to replicated), and
  (c) nothing for samples: each host streams ITS OWN chains' sample banks
  to disk (`local_chain_rows`) — rank-aware writers, no sample gather.

Topology recipe (the 1-chip → 1-host → N-hosts path):
  1 chip:    no mesh, vmapped chains.
  1 host:    mesh over `jax.local_devices()` (sweep_tempering n_devices=K).
  N hosts:   `distributed.initialize(coordinator, N, rank)` on every host,
             then the same mesh code over `jax.devices()` (global); run
             the SAME program on every host (SPMD).

Verified by tests/test_distributed.py: 2 processes x 4 CPU devices via
`jax.distributed` on localhost match the single-process 8-device run.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "is_multiprocess", "global_chains_mesh",
           "host_value", "local_chain_rows", "add_distributed_config",
           "initialize_from_config"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """`jax.distributed.initialize` wrapper. No-op (returns False) when
    num_processes is None/1 — the same program then runs single-process.
    MUST run before the first jax computation."""
    if not num_processes or int(num_processes) <= 1:
        return False
    assert coordinator_address and process_id is not None, \
        "multi-process runs need coordinator_address and process_id"
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=int(num_processes),
                               process_id=int(process_id))
    return True


# the sacred-style CLI keys shared by train_bnn.py / sweep_tempering.py
DISTRIBUTED_DEFAULTS = dict(
    coordinator_address=None,  # host:port of process 0
    num_processes=None,        # total process count (None/1 = local run)
    process_id=None,           # this process's rank
)


def add_distributed_config(defaults: dict) -> dict:
    defaults.update(DISTRIBUTED_DEFAULTS)
    return defaults


def initialize_from_config(cfg: dict) -> bool:
    return initialize(cfg.get("coordinator_address"),
                      cfg.get("num_processes"), cfg.get("process_id"))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_chains_mesh(n_devices: Optional[int] = None) -> Mesh:
    """`chains` mesh over the GLOBAL device set (all hosts). With
    `jax.distributed` initialized this spans processes; otherwise it is
    the ordinary local mesh."""
    devices = jax.devices()
    n = int(n_devices or len(devices))
    return Mesh(np.asarray(devices[:n]), ("chains",))


def local_chain_indices_for_mesh(mesh: Mesh, n_chains: int):
    """Chain indices this process will own under `NamedSharding(mesh,
    P('chains'))` — chains are split evenly over the mesh's device order.
    Lets rank-aware callers create run dirs / sample savers BEFORE the
    runner exists (each host only for its own chains)."""
    devices = list(mesh.devices.reshape(-1))
    n_dev = len(devices)
    assert n_chains % n_dev == 0, (n_chains, n_dev)
    per_dev = n_chains // n_dev
    pid = jax.process_index()
    out = []
    for pos, dev in enumerate(devices):
        if dev.process_index == pid:
            out.extend(range(pos * per_dev, (pos + 1) * per_dev))
    return out


def put_chains(tree, mesh: Mesh, spec=P("chains")):
    """Place a host-replicated pytree (same values on every process — e.g.
    states built from one PRNG key) onto a possibly multi-host mesh.
    jax.device_put to a non-addressable sharding only accepts HOST arrays
    (they are assumed identical across processes), so committed device
    arrays are routed through numpy; typed PRNG keys via their key data."""
    sh = NamedSharding(mesh, spec)
    if not is_multiprocess():
        return jax.device_put(tree, sh)

    def put(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                  jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            return jax.random.wrap_key_data(jax.device_put(data, sh))
        return jax.device_put(np.asarray(x), sh)
    return jax.tree_util.tree_map(put, tree)


def host_value(tree, mesh: Optional[Mesh]):
    """Device->host for (possibly non-`np.asarray`-able) global arrays:
    reshard to fully-replicated over the mesh, then to numpy. Identity
    numpy conversion for single-process runs (no collective issued)."""
    if mesh is None or not is_multiprocess():
        def conv(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jax.dtypes.prng_key):
                return x  # typed PRNG keys pass through (io encodes them)
            return np.asarray(x)
        return jax.tree_util.tree_map(conv, tree)
    sh = NamedSharding(mesh, P())

    def rep(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                  jax.dtypes.prng_key):
            data = jax.jit(jax.random.key_data, out_shardings=sh)(x)
            return jax.random.wrap_key_data(jnp.asarray(np.asarray(data)))
        return np.asarray(jax.jit(lambda t: t, out_shardings=sh)(x))
    return jax.tree_util.tree_map(rep, tree)


def local_chain_rows(arr) -> Dict[int, np.ndarray]:
    """{chain_index: row} for the chains of a chains-sharded global array
    that are addressable from THIS process (all of them single-process).
    The basis of rank-aware sample streaming: each host saves its rows."""
    out: Dict[int, np.ndarray] = {}
    if not hasattr(arr, "addressable_shards"):
        arr = jnp.asarray(arr)
    for shard in arr.addressable_shards:
        data = np.asarray(shard.data)
        idx = shard.index[0]
        start = idx.start or 0
        for j in range(data.shape[0]):
            out[start + j] = data[j]
    return out
