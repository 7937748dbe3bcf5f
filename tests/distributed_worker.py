"""Worker for tests/test_distributed.py: one process of a 2-process
jax.distributed run (4 CPU devices each -> 8-device global chains mesh).

Usage: python distributed_worker.py <rank> <nprocs> <port> <outdir>

Runs MultiChainRunnerReject on a fixed toy workload over the GLOBAL
mesh, streams the locally-owned chains' sample banks to
<outdir>/chain_<c>.h5 (rank-aware writers), snapshots a checkpoint
(gather + rank-0 write), and dumps this rank's view of the shared
diagnostics to <outdir>/rank<r>.npz.
"""
import json
import sys
from pathlib import Path

rank, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), Path(sys.argv[4]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bnn_priors_tpu.parallel import distributed  # noqa: E402

distributed.initialize(coordinator_address=f"localhost:{port}",
                       num_processes=nprocs, process_id=rank)

import jax.numpy as jnp  # noqa: E402

from bnn_priors_tpu import models  # noqa: E402
from bnn_priors_tpu.io.hdf5 import HDF5ModelSaver  # noqa: E402
from bnn_priors_tpu.parallel import MultiChainRunnerReject  # noqa: E402

assert len(jax.devices()) == 4 * nprocs, jax.devices()

N_CHAINS = 8


def workload():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((48, 4)))
    y = jnp.asarray((rng.standard_normal(48) > 0).astype(np.int64))
    return x, y


x, y = workload()
mesh = distributed.global_chains_mesh()
local = distributed.local_chain_indices_for_mesh(mesh, N_CHAINS)

savers = [None] * N_CHAINS
for c in local:
    savers[c] = HDF5ModelSaver(outdir / f"chain_{c}.h5")

model = models.LogisticRegression(4, 2)
runner = MultiChainRunnerReject(
    model, (x, y), n_chains=N_CHAINS, temperatures=1.0,
    learning_rate=1e-4, momentum=0.9, batch_size=16, cycles=2,
    epochs_per_cycle=2, warmup_epochs=1, sample_epochs=1,
    key=jax.random.key(42), dtype=jnp.float64, mesh=mesh,
    model_savers=savers)
runner.run(checkpoint_path=str(outdir / "chains.ckpt.npz"),
           checkpoint_every=2)
for s in savers:
    if s is not None:
        s.close()

np.savez(outdir / f"rank{rank}.npz",
         local_chains=np.asarray(local),
         rejections=np.stack(runner.rejections),
         delta_energies=np.stack(runner.delta_energies),
         acceptance=runner.acceptance_rates())
(outdir / f"rank{rank}.done").write_text(json.dumps({
    "n_global_devices": len(jax.devices()),
    "process_count": jax.process_count(),
    "local_chains": local}))
