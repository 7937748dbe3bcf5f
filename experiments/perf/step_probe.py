"""Quick A/B probe for model-code changes on the K=8 bf16 ResNet-20
GGMC step (the bench.py headline program, 100-step scans for fast
compiles). Prints aggregate steps/s/chip with the fetch-differencing
clock. Usage: python experiments/perf/step_probe.py [K] [n_steps] [packing]
(packing: flat | segmented | hybrid; default segmented)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1].parent))


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    packing = sys.argv[3] if len(sys.argv) > 3 else "segmented"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import bench
    from bnn_priors_tpu import mcmc, models

    model = models.ResNet(depth=20, softmax_temp=1.0)
    kernel = mcmc.VerletSGLD(num_data=50000, momentum=0.994,
                             packing=packing)
    run, s, m = bench.build_run(K, model, kernel, n_steps,
                                compute_dtype=(jnp.bfloat16 if K > 1
                                               else None))

    def chain_of(R, s, m):
        t0 = time.perf_counter()
        for _ in range(R):
            s, m, pot = run(s, m)
        float(pot)
        return time.perf_counter() - t0, s, m

    t, s, m = chain_of(1, s, m)
    print(f"# compile+warm {t:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t1, s, m = chain_of(1, s, m)
        t3, s, m = chain_of(3, s, m)
        best = min(best, (t3 - t1) / 2)
    print(json.dumps({
        "metric": f"step_probe_K{K}_{packing}_aggregate_steps_per_s",
        "value": round(K * n_steps / best, 2), "unit": "steps/s/chip",
        "ms_per_vmapped_step": round(best / n_steps * 1e3, 3)}),
        flush=True)


if __name__ == "__main__":
    main()
