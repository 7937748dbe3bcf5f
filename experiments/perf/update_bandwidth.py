"""Measure the update-only GGMC step: steps/s and achieved HBM fraction
on a 16.7M-parameter chain (the README "update-only" figure).

The GGMC transition is HBM-bound: per step it streams the packed state
vectors (position, momentum, grads, RMSProp EMA, preconditioner) a
handful of times. The byte model below counts
  reads:  position, momentum, grads, precond (+ saved slots untouched)
  writes: position, momentum
plus the threefry noise (generated in-register). With scan-carry buffer
donation (jit_utils.donating_jit — falls back automatically on backends
that reject donation, like the dev tunnel) the carry is updated in
place; without it XLA adds a carry copy.

Run: python experiments/perf/update_bandwidth.py
Prints one JSON line; paste the result into README.md's perf table.
"""
import json
import time
from pathlib import Path

HBM_PEAK_GB_S = 819.0  # TPU v5e


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from bnn_priors_tpu import mcmc
    from bnn_priors_tpu.jit_utils import donating_jit, donation_supported

    D = 16_700_000
    n_steps = 200
    kernel = mcmc.VerletSGLD(num_data=50000, momentum=0.994)
    # init on the host CPU backend: eager 67MB ops through the device
    # tunnel are slow and occasionally flake (see PERF.md)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = kernel.init({"w": jnp.zeros((D,), jnp.float32)},
                            jax.random.key(0))
        state = kernel.sample_momentum(state, 1.0)
    state = jax.device_put(state, jax.devices()[0])
    grads = jnp.full((state.position.shape[0],), 1e-4, jnp.float32)

    def run_impl(state):
        def body(s, _):
            s, _ = kernel.step(s, grads, 1e-5, 1.0, calc_metrics=False)
            return s, ()
        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state, jnp.sum(state.position)

    run = donating_jit(run_impl, donate_argnums=(0,))

    def chain_of(R, s):
        t0 = time.perf_counter()
        for _ in range(R):
            s, probe = run(s)
        float(probe)
        return time.perf_counter() - t0, s

    _, state = chain_of(1, state)
    best = float("inf")
    for _ in range(3):
        t1, state = chain_of(1, state)
        t3, state = chain_of(3, state)
        best = min(best, (t3 - t1) / 2)
    steps_per_s = n_steps / best

    # byte model: 4 reads + 2 writes of the packed f32 state per step
    d = int(state.position.shape[0])
    gb_per_step = 6 * d * 4 / 1e9
    achieved = steps_per_s * gb_per_step
    print(json.dumps({
        "metric": "ggmc_update_only_steps_per_s_16p7M",
        "value": round(steps_per_s, 1), "unit": "steps/s",
        "achieved_GB_per_s": round(achieved, 1),
        "hbm_peak_fraction": round(achieved / HBM_PEAK_GB_S, 3),
        "donation_active": donation_supported()}), flush=True)


if __name__ == "__main__":
    main()
