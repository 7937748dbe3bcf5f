"""Multi-host code path (SURVEY §5.8): a REAL 2-process
`jax.distributed` run on localhost (4 CPU devices per process, 8-device
global chains mesh) must

* give every process the global device view,
* split the chains so each process owns + writes only its own sample
  banks (rank-aware streaming),
* produce identical shared diagnostics on both ranks, and
* match a single-process 8-device run of the SAME workload/key
  chain-for-chain (topology equivalence).

Run via subprocesses because jax.distributed can only initialize before
the backend exists (the test process already holds a local backend).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "distributed_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def dist_run(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("dist")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(r), "2", str(port), str(outdir)],
        cwd=str(REPO), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for r in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    return outdir


def test_two_process_run_completes_and_is_rank_aware(dist_run):
    r0 = np.load(dist_run / "rank0.npz")
    r1 = np.load(dist_run / "rank1.npz")
    # chains split across processes, disjoint, covering all 8
    l0, l1 = set(r0["local_chains"]), set(r1["local_chains"])
    assert l0 | l1 == set(range(8)) and not (l0 & l1)
    # each process wrote exactly its own chains' banks
    for c in range(8):
        assert (dist_run / f"chain_{c}.h5").exists(), c
    # shared diagnostics identical on both ranks (replicated gathers)
    np.testing.assert_array_equal(r0["rejections"], r1["rejections"])
    np.testing.assert_allclose(r0["delta_energies"], r1["delta_energies"])
    np.testing.assert_allclose(r0["acceptance"], r1["acceptance"])
    assert r0["rejections"].shape == (2, 8)  # 2 boundaries x 8 chains
    # checkpoint written exactly once (rank 0)
    assert (dist_run / "chains.ckpt.npz").exists()


def test_matches_single_process_mesh(dist_run):
    """Topology equivalence: the 2-process x 4-device run equals a
    single-process 8-device run of the same workload and key."""
    import jax
    import jax.numpy as jnp

    from bnn_priors_tpu import models
    from bnn_priors_tpu.io.hdf5 import load_samples
    from bnn_priors_tpu.parallel import MultiChainRunnerReject, distributed

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((48, 4)))
    y = jnp.asarray((rng.standard_normal(48) > 0).astype(np.int64))
    mesh = distributed.global_chains_mesh()  # 8 local CPU devices
    model = models.LogisticRegression(4, 2)
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=8, temperatures=1.0, learning_rate=1e-4,
        momentum=0.9, batch_size=16, cycles=2, epochs_per_cycle=2,
        warmup_epochs=1, sample_epochs=1, key=jax.random.key(42),
        dtype=jnp.float64, mesh=mesh)
    runner.run()

    r0 = np.load(dist_run / "rank0.npz")
    np.testing.assert_array_equal(np.stack(runner.rejections),
                                  r0["rejections"])
    np.testing.assert_allclose(np.stack(runner.delta_energies),
                               r0["delta_energies"], rtol=1e-9)

    bank = runner.get_samples()  # (n_samples, n_chains, ...)
    for c in range(8):
        dist_bank = load_samples(str(dist_run / f"chain_{c}.h5"))
        for k, v in dist_bank.items():
            np.testing.assert_allclose(
                v, bank[k][:, c], rtol=1e-9, atol=1e-12,
                err_msg=f"chain {c} key {k}")
