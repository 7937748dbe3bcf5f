"""Chain-scaling efficiency benchmark (BASELINE.md: >=90% samples/s
scaling on the parallel-chain ensemble workload).

Two modes:

* multiple real devices: chains sharded over the `chains` mesh axis —
  the scaling-efficiency number that matters (run on a pod slice).
  NOTE: a virtual CPU mesh (xla_force_host_platform_device_count) shares
  one set of physical cores, so its "efficiency" measures contention, not
  scaling — use it only to check the sharded program runs.
* one device: chains vmapped on the single chip — measures how much chip
  utilization improves with the chain batch (ensemble workloads).

    python experiments/bench_scaling.py [n_devices] [cpu|tpu]

Prints one JSON line per chain count plus a summary efficiency line.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(n_devices=8, backend="cpu", batch_size=64):
    import jax
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(n_devices))
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from bnn_priors_tpu import models
    from bnn_priors_tpu.parallel import MultiChainRunner

    devices = jax.devices()
    n_devices = min(int(n_devices), len(devices))

    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (512, 3, 16, 16), jnp.float32)
    y = jax.random.randint(ky, (512,), 0, 10)
    model = models.ClassificationConvNet(3, 16, 10, width=16, depth=3)

    def measure(n_chains, mesh_devices):
        mesh = (Mesh(np.asarray(devices[:mesh_devices]), ("chains",))
                if mesh_devices > 1 else None)
        r = MultiChainRunner(
            model, (x, y), n_chains=n_chains, temperatures=1.0,
            kernel="VerletSGLD", learning_rate=1e-3, momentum=0.994,
            batch_size=batch_size, cycles=1, epochs_per_cycle=1,
            warmup_epochs=0, sample_epochs=1, mesh=mesh,
            key=jax.random.key(1))
        fn = r._build_epoch_fn()
        idxs = r._epoch_idxs()
        states, mstates = r.states, r.model_states
        # warmup/compile
        s, m, _ = fn(states, mstates, idxs, jnp.asarray(0), r.temperatures,
                     x, y)
        jax.block_until_ready(s.position)
        reps = 10  # amortize dispatch overhead over several epoch calls
        t0 = time.perf_counter()
        for _ in range(reps):
            s, m, _ = fn(s, m, idxs, jnp.asarray(0), r.temperatures, x, y)
        # readback forces completion (position may be a SegVec pytree)
        float(jnp.ravel(jax.tree_util.tree_leaves(s.position)[0])[0])
        dt = time.perf_counter() - t0
        steps = reps * idxs.shape[1] * n_chains
        return steps / dt

    single_device = len(devices) == 1 or n_devices == 1
    if single_device:
        mode = "vmap_single_chip"
        plan = [(n, 1) for n in (1, 2, 4, 8)]
    else:
        mode = "mesh_sharded"
        if backend == "cpu":
            print(json.dumps({"warning": "virtual CPU mesh: efficiency "
                              "reflects core contention, not scaling"}))
        plan = [(n, n) for n in (1, 2, 4, 8) if n <= n_devices]

    base = None
    results = []
    for n, dev in plan:
        rate = measure(n, dev)
        base = rate if base is None else base
        # mesh mode: ideal = base*n (weak scaling over devices);
        # single chip: efficiency = per-chain rate kept vs 1 chain
        eff = rate / (base * n) if mode == "mesh_sharded" else rate / base
        results.append((n, rate, eff))
        print(json.dumps({"mode": mode, "n_chains": n, "devices": dev,
                          "chain_steps_per_s": round(rate, 2),
                          ("efficiency" if mode == "mesh_sharded"
                           else "throughput_vs_1chain"): round(eff, 3)}))
    print(json.dumps({
        "metric": ("chain_scaling_efficiency" if mode == "mesh_sharded"
                   else "single_chip_chain_throughput_gain"),
        "value": round(results[-1][2], 3),
        "unit": f"at {results[-1][0]} chains ({mode})",
    }))


if __name__ == "__main__":
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    be = sys.argv[2] if len(sys.argv) > 2 else "cpu"
    main(nd, be)
