"""Re-measure the round-0 self-baseline under the CORRECTED clock
(VERDICT r4 item 7).

The 434.09 steps/s figure in BASELINE_SELF was recorded with the
`block_until_ready` clock, which this transport does not honor (PERF.md
"Measurement methodology"): it timed one 50-step dispatch whose
completion was only approximately forced. This script extracts the
EXACT round-0 code (commit 4d77f63, the first bench commit) into a temp
tree and times the identical single-chain f32 flat-packed 50-step scan
with the fetch-differencing clock, so `vs_baseline` divides
correct-clock by correct-clock.

Usage: python experiments/perf/rebaseline_r0.py
"""
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
R0_COMMIT = "4d77f63"

DRIVER = r'''
import json
import sys
import time

sys.path.insert(0, sys.argv[1])  # the extracted r0 tree

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", sys.argv[2])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bnn_priors_tpu import mcmc, models  # r0 code

batch_size = 128
n_timed_steps = 50

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


@jax.jit
def run(chain, mstate):
    (chain, mstate), pots = jax.lax.scan(
        one_step, (chain, mstate), None, length=n_timed_steps)
    return chain, mstate, pots[-1]


def chain_of(R, c, m):
    t0 = time.perf_counter()
    for _ in range(R):
        c, m, pot = run(c, m)
    float(pot)  # forced readback: the only reliable completion barrier
    return time.perf_counter() - t0, c, m

t, chain, model_state = chain_of(1, chain, model_state)  # compile
print(f"# compile+warm {t:.1f}s", file=sys.stderr, flush=True)
best = float("inf")
for _ in range(3):
    t1, chain, model_state = chain_of(1, chain, model_state)
    t3, chain, model_state = chain_of(3, chain, model_state)
    best = min(best, (t3 - t1) / 2)
print(json.dumps({
    "metric": "r0_single_chain_f32_steps_per_s_correct_clock",
    "value": round(n_timed_steps / best, 2), "unit": "steps/s/chip",
    "r0_commit": "COMMIT", "old_broken_clock_figure": 434.09}))
'''


def main():
    with tempfile.TemporaryDirectory() as td:
        tree = Path(td) / "r0"
        tree.mkdir()
        # extract the r0 package without touching the live worktree
        tar = subprocess.run(
            ["git", "archive", R0_COMMIT], cwd=REPO, check=True,
            stdout=subprocess.PIPE)
        subprocess.run(["tar", "-x", "-C", str(tree)], input=tar.stdout,
                       check=True)
        drv = Path(td) / "driver.py"
        drv.write_text(DRIVER.replace("COMMIT", R0_COMMIT))
        subprocess.run(
            [sys.executable, str(drv), str(tree), str(REPO / ".xla_cache")],
            check=True)


if __name__ == "__main__":
    main()
