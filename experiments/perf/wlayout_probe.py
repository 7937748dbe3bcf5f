"""Probe the cost of the per-step weight pipeline: flat packed vector
-> reshape -> (cast) -> conv -> grad -> flatten -> update, at K=8.

The op-profile shows weight-sized layout copies at ~10 GB/s effective
(tens of us each, ~1.3 ms/step total): XLA re-lays-out every conv
weight (and its gradient) between the flat f32 chain vector's tiling
and the convolution's internal layout, every step.

Variants (per stage shape):
  flat_oihw  — production: flat slice -> (O,I,3,3) -> conv OIHW dims
  flat_hwio  — flat slice -> (3,3,I,O) -> conv HWIO dims
  flat_ohwi  — flat slice -> (O,3,3,I) -> conv OHWI dims
  tree       — weights carried as native bf16 (O,I,3,3) arrays, update
               applied per-leaf (no flat vector at all): the formatting
               floor
"""
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import lax

K = 8
BATCH = 128
STAGES = {"s1_c16": (32, 16), "s2_c32": (16, 32), "s3_c64": (8, 64)}
N_ITERS = 50

SPECS = {
    "flat_oihw": ("OIHW", lambda C: (K, C, C, 3, 3)),
    "flat_hwio": ("HWIO", lambda C: (K, 3, 3, C, C)),
    "flat_ohwi": ("OHWI", lambda C: (K, C, 3, 3, C)),
}


def bench(stage, variant):
    H, C = STAGES[stage]
    x = jax.random.normal(jax.random.key(0), (K, BATCH, H, H, C),
                          jnp.bfloat16)
    D = C * C * 9

    def conv(xb, wb, spec):
        return lax.conv_general_dilated(
            xb, wb, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", spec, "NHWC"))

    if variant == "tree":
        w0 = jax.random.normal(jax.random.key(1), (K, C, C, 3, 3),
                               jnp.bfloat16) * 0.05

        def body(c, _):
            w = c

            def loss(w):
                y = jax.vmap(lambda a, b: conv(a, b, "OIHW"))(x, w)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(w)
            return w - 1e-3 * g, ()
    else:
        spec, shape = SPECS[variant]
        w0 = jax.random.normal(jax.random.key(1), (K, D),
                               jnp.float32) * 0.05

        def body(c, _):
            wf = c

            def loss(wf):
                w = wf.reshape(shape(C)).astype(jnp.bfloat16)
                y = jax.vmap(lambda a, b: conv(a, b, spec))(x, w)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(wf)       # grad arrives FLAT f32
            return wf - 1e-3 * g, ()

    @jax.jit
    def run(w):
        w, _ = lax.scan(body, w, None, length=N_ITERS)
        return w, jnp.sum(jax.tree_util.tree_leaves(w)[0].astype(jnp.float32))

    def chain_of(R, w):
        t0 = time.perf_counter()
        for _ in range(R):
            w, probe = run(w)
        float(probe)
        return time.perf_counter() - t0, w

    _, w = chain_of(1, w0)
    best = float("inf")
    for _ in range(3):
        t1, w = chain_of(1, w)
        t3, w = chain_of(3, w)
        best = min(best, (t3 - t1) / 2)
    return best / N_ITERS * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    for stage in STAGES:
        for variant in ("flat_oihw", "flat_hwio", "flat_ohwi", "tree"):
            ms = bench(stage, variant)
            print(json.dumps({"variant": variant, "stage": stage,
                              "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
