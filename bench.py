"""Benchmark: CIFAR-10 ResNet-20 (googleresnet) GGMC leapfrog throughput
on one chip — single chain AND the chain axis the framework is designed
around (K vmapped chains per chip; SURVEY §5.7).

Emits one JSON object per line:
  * single-chain minibatch steps/s/chip (the reference's execution model:
    one chain per accelerator),
  * aggregate steps/s/chip for K in {3, 4, 8} vmapped chains (batch 128
    each) + the implied per-chain efficiency vs K x single-chain,
  * LAST line = the headline: aggregate GGMC steps/s/chip at the best
    measured K per dispatch — the number the TPU-native design argues
    for (chains are independent, so an ensemble of any size runs as
    sequential sweet-spot-sized dispatch groups). `vs_baseline` is
    against BASELINE_SELF (the first recorded single-chain figure), i.e.
    the whole-design speedup over the reference's one-chain-per-chip
    model at equal hardware.

The reference publishes no numbers (BASELINE.md: "we establish it").
"""
import json
import time

# Round-0 self-baseline, RE-MEASURED under the corrected clock
# (experiments/perf/rebaseline_r0.py runs the exact r0-commit program
# with the fetch-differencing clock): median of 5 runs on 2026-08-21 =
# 948.9 steps/s/chip (samples 1011/949/927/950/942). The originally
# recorded 434.09 (2026-08-17) was taken with the broken
# block_until_ready clock over a single 50-step dispatch, i.e. biased
# DOWN by unamortized per-dispatch transport overhead — see PERF.md
# "Measurement methodology". vs_baseline therefore now divides
# correct-clock by correct-clock (VERDICT r4 item 7).
BASELINE_SELF = 948.9  # steps/s/chip (r0 code, corrected clock)


def build_run(K, model, kernel, n_steps, batch_size=128,
              compute_dtype=None):
    import jax
    import jax.numpy as jnp
    from bnn_priors_tpu.parallel import init_chains_diverse

    # Chain init is hundreds of tiny prior-sample ops; dispatched eagerly
    # through a remote-device tunnel that is ~25 s PER CHAIN. Build the
    # states on the host CPU backend and ship only the packed vectors
    # (5 flat arrays per chain) to the device in one transfer.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        states = init_chains_diverse(kernel, model, jax.random.key(1), K,
                                     dtype=jnp.float32)
        states = jax.vmap(lambda s: kernel.sample_momentum(s, 1.0))(states)
        _, mstate = model.init(jax.random.key(0), dtype=jnp.float32)
        mstates = jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v, (K,) + v.shape).copy(), mstate)
        if K == 1:  # single chain runs unbatched (vmap costs ~25% at K=1)
            states, mstates = jax.tree_util.tree_map(
                lambda v: v[0], (states, mstates))
    dev = jax.devices()[0]
    states, mstates = jax.device_put((states, mstates), dev)
    xshape = (batch_size, 3, 32, 32) if K == 1 else (K, batch_size, 3, 32, 32)
    x = jax.random.normal(jax.random.key(2), xshape, dtype=jnp.float32)
    y = jax.random.randint(jax.random.key(3), xshape[:-3], 0, 10)

    def one_chain_step(chain, ms, xb, yb):
        fn = model.potential_avg_fn(ms, xb, yb, eff_num_data=50000.0,
                                    train=True, compute_dtype=compute_dtype)
        (pot, (new_ms, _aux)), grads = jax.value_and_grad(
            fn, has_aux=True)(kernel.unpack(chain.position))
        from bnn_priors_tpu.mcmc.segmented import vclip
        g = vclip(kernel.pack(grads), -1e6, 1e6)
        chain, _ = kernel.step(chain, g, 0.01, 1.0, calc_metrics=False)
        return chain, new_ms, pot

    def one_step(carry, _):
        chains, mss = carry
        if K == 1:
            chains, mss, pots = one_chain_step(chains, mss, x, y)
            return (chains, mss), pots
        chains, mss, pots = jax.vmap(one_chain_step)(chains, mss, x, y)
        return (chains, mss), pots[-1]

    # Buffer donation (jit_utils.donating_jit): the epoch scan reuses the
    # chain-state buffers in place, like the production runners; backends
    # that reject donated buffers (the remote-tunnel transport used here)
    # automatically fall back to plain jit via the capability probe.
    from bnn_priors_tpu.jit_utils import donating_jit

    def run_impl(chains, mss):
        # bf16 MXU passes: the JAX/TPU-native precision (the analogue of
        # the reference's TF32-on-GPU); grad error is 5x below the
        # inherent minibatch noise SG-MCMC tolerates.
        with jax.default_matmul_precision("bfloat16"):
            (chains, mss), pots = jax.lax.scan(
                one_step, (chains, mss), None, length=n_steps)
        return chains, mss, pots[-1]

    return donating_jit(run_impl, donate_argnums=(0, 1)), states, mstates


def timed_steps_per_s(run, states, mstates, n_steps, repeats=3):
    """Time by DIFFERENCING chained-dispatch walls with a forced scalar
    readback: on the remote-tunnel backend `jax.block_until_ready`
    returns before the computation finishes (measured: ~0.1 ms "wall"
    for dispatches whose results then take seconds to fetch), so the
    only reliable clock is enqueue-R-dispatches -> fetch a scalar; the
    fixed enqueue+roundtrip+readback cost cancels in T(R2) - T(R1)."""

    def chain_of(R, s, m):
        t0 = time.perf_counter()
        for _ in range(R):
            s, m, pot = run(s, m)
        float(pot)  # device->host readback forces completion
        return time.perf_counter() - t0, s, m

    _, states, mstates = chain_of(1, states, mstates)  # warmup/compile
    best = float("inf")
    for _ in range(repeats):
        t1, states, mstates = chain_of(1, states, mstates)
        t3, states, mstates = chain_of(3, states, mstates)
        best = min(best, (t3 - t1) / 2)
    return n_steps / best


def main():
    from pathlib import Path

    import jax

    # Persistent compilation cache: compiles through the remote-device
    # tunnel run 2-7 MINUTES per program shape; warm-cache reloads are
    # seconds. The cache directory (gitignored) persists on disk between
    # invocations in the same worktree.
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp  # noqa: F401 (fail fast if jax is broken)
    from bnn_priors_tpu import mcmc, models

    # one CIFAR-10 epoch of minibatch steps per device dispatch — exactly
    # what the production runner scans (inference/runner.py _scan_steps)
    n_steps = 391
    model = models.ResNet(depth=20, softmax_temp=1.0)

    def make_kernel(K):
        # measured r5 (PERF.md packing x K grid): the HYBRID state (conv
        # kernels native, small leaves in one flat segment) wins EVERY
        # regime - K=1: 1081 vs flat 940 / segmented 860; K=4: 1334 vs
        # 1306; K=8: 1177 vs 1166. Default for the runners too.
        return mcmc.VerletSGLD(num_data=50000, momentum=0.994,
                               packing="hybrid")

    kernel = make_kernel(1)
    run1, s1, m1 = build_run(1, model, kernel, n_steps)
    single = timed_steps_per_s(run1, s1, m1, n_steps)
    print(json.dumps({
        "metric": "cifar10_resnet20_leapfrog_steps_per_s_per_chip",
        "value": round(single, 2), "unit": "steps/s",
        "vs_baseline": round(single / BASELINE_SELF, 3)}), flush=True)

    # Chain-axis runs use the production mixed-precision path
    # (compute_dtype='bfloat16', train_bnn.py config key) over the
    # hybrid chain state. Measured hybrid K-curve (aggregate
    # steps/s/chip, r5): K=1 1081, K=2 1312, K=3 1362, K=4 1334,
    # K=5 1313, K=6 1247, K=8 1177 — the sweet spot is K=3-4/dispatch; larger
    # banks run faster as sequential sweet-spot-sized dispatch groups.
    agg = {}
    for K in (3, 4, 8):
        kernelK = make_kernel(K)
        runK, sK, mK = build_run(K, model, kernelK, n_steps,
                                 compute_dtype=jnp.bfloat16)
        agg[K] = K * timed_steps_per_s(runK, sK, mK, n_steps)
        print(json.dumps({
            "metric": f"cifar10_resnet20_ggmc_bf16_aggregate_steps_per_s_"
                      f"{K}chains",
            "value": round(agg[K], 2), "unit": "steps/s/chip",
            "vs_baseline": round(agg[K] / BASELINE_SELF, 3)}), flush=True)
        print(json.dumps({
            "metric": f"chain_scaling_efficiency_{K}chains",
            "value": round(agg[K] / (K * single), 3), "unit": "ratio",
            "vs_baseline": 1.0}), flush=True)

    # headline LAST: the chain axis is the framework's scale story.
    # An ensemble of any size runs its chains in sweet-spot-sized
    # dispatch groups, so the achievable aggregate rate is the BEST
    # over K, not a fixed K.
    bestK = max(agg, key=agg.get)
    print(json.dumps({
        "metric": "cifar10_resnet20_ggmc_aggregate_steps_per_s_per_chip",
        "value": round(agg[bestK], 2), "unit": "steps/s/chip",
        "chains_per_dispatch": bestK,
        "vs_baseline": round(agg[bestK] / BASELINE_SELF, 3)}), flush=True)


if __name__ == "__main__":
    main()
