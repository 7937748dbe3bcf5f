"""Decompose the production epoch's overhead vs the bare bench scan.

Times MultiChainRunner's actual jitted epoch function (grouped dispatch,
segmented state) on the TPU with:
  granular   — metrics savers attached (per-leaf est_* computed in-scan)
  cheap      — no savers (aggregate diagnostics only)
against the bench-style fixed-batch scan rate. The difference to the
bench rate isolates (a) the per-step minibatch gather from the on-device
dataset and (b) the in-scan metric reductions.

Run: python experiments/perf/epoch_probe.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1].parent))

K = 8


class _NullSaver:
    def add_scalar(self, *a, **k):
        pass

    def flush(self, *a, **k):
        pass


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from bnn_priors_tpu import models
    from bnn_priors_tpu.parallel import MultiChainRunner

    model = models.ResNet(depth=20, softmax_temp=1.0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        x = jax.random.normal(jax.random.key(0), (50048, 3, 32, 32),
                              jnp.float32)
        y = jax.random.randint(jax.random.key(1), (50048,), 0, 10)
    dev = jax.devices()[0]
    x, y = jax.device_put((x, y), dev)

    def bench_epoch(label, savers):
        r = MultiChainRunner(
            model, (x, y), n_chains=K, temperatures=1.0,
            kernel="VerletSGLD", learning_rate=1e-2, momentum=0.994,
            batch_size=128, cycles=1, epochs_per_cycle=1, warmup_epochs=0,
            sample_epochs=1, key=jax.random.key(2),
            compute_dtype="bfloat16", metrics_savers=savers)
        fn = r._build_epoch_fn()
        idxs = r._epoch_idxs()
        n = r.n_full

        def chain_of(R, s, m):
            t0 = time.perf_counter()
            for _ in range(R):
                s, m, ms = fn(s, m, idxs, jnp.asarray(0), r.temperatures,
                              x, y)
            leaf = jax.tree_util.tree_leaves(ms["potential"])[0]
            float(jnp.ravel(leaf)[-1])
            return time.perf_counter() - t0, s, m

        _, s, m = chain_of(1, r.states, r.model_states)
        best = float("inf")
        for _ in range(3):
            t1, s, m = chain_of(1, s, m)
            t3, s, m = chain_of(3, s, m)
            best = min(best, (t3 - t1) / 2)
        print(json.dumps({
            "variant": label, "epoch_s": round(best, 3),
            "aggregate_steps_per_s": round(K * n / best, 1)}), flush=True)

    bench_epoch("cheap_metrics", None)
    bench_epoch("granular_metrics", [_NullSaver() for _ in range(K)])


if __name__ == "__main__":
    main()
