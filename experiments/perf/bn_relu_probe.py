"""Is a Pallas fused BN+ReLU (fwd+bwd) worth building? (VERDICT r4 item 4)

Isolates train-mode BatchNorm+ReLU fwd+bwd at the K=4 ResNet-20 stage
shapes and compares XLA's time against the HBM-traffic lower bound:

  fwd minimum: read x once, write y once           = 2 sweeps
  XLA fwd:     moments read + normalize read + y   = 3 sweeps
  bwd minimum: read x, read dy, write dx           = 3 sweeps
  XLA bwd:     x and dy each read twice (reduce pass + dx pass) + dx
                                                   = 5 sweeps

A VMEM-resident Pallas kernel can hit the minimum by keeping the
(N,H,W,Cb) channel block on-chip between the reduction and the
elementwise pass. Achievable saving therefore = 1/3 of fwd + 2/5 of bwd
time IF XLA is at its own 3/5-sweep bound; if XLA is already below the
minimum-bound × (sweeps ratio), the kernel cannot win (negative result).

Timing: differenced chained-dispatch clock (block_until_ready does not
block on this transport — PERF.md "Measurement methodology").
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

K = 4          # chains per dispatch (the measured sweet spot)
N = 128        # batch
STAGES = [(32, 32, 16), (16, 16, 32), (8, 8, 64)]
DTYPE = jnp.bfloat16
EPS = 1e-5


def timed(fn, args, iters=30):
    "differenced-dispatch wall clock: (T(2n)-T(n))/n with a forced fetch"
    out = fn(*args)
    force = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(force))  # compile + settle

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        return time.perf_counter() - t0

    t1 = run(iters)
    t2 = run(2 * iters)
    return (t2 - t1) / iters


def bn_relu(x, w, b):
    "train-mode BN (single-pass f32 moments, biased var) + ReLU"
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(xf * xf, axis=(0, 1, 2)) - mean * mean, 0.0)
    y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
        (var + EPS).astype(x.dtype))
    y = y * w + b
    return jnp.maximum(y, 0.0)


def main():
    results = {"device": str(jax.devices()[0]), "K": K, "N": N,
               "dtype": str(DTYPE.__name__), "stages": []}

    # reference HBM rate: big bf16 copy (read+write)
    big = jnp.ones((64 * 1024 * 1024,), DTYPE)  # 128 MB
    copy = jax.jit(lambda a: a + 1)
    t_copy = timed(copy, (big,))
    hbm_gbs = 2 * big.size * big.dtype.itemsize / t_copy / 1e9
    results["hbm_copy_GBs"] = round(hbm_gbs, 1)
    print(f"HBM copy rate: {hbm_gbs:.0f} GB/s", file=sys.stderr)

    for (H, W, C) in STAGES:
        shape = (K, N, H, W, C)
        kx, kd = jax.random.split(jax.random.key(0))
        x = jax.random.normal(kx, shape, DTYPE)
        dy = jax.random.normal(kd, shape, DTYPE)
        w = jnp.ones((K, C), DTYPE)
        b = jnp.zeros((K, C), DTYPE)

        vbn = jax.vmap(bn_relu)
        fwd = jax.jit(vbn)

        def fwd_bwd(x, w, b, dy):
            y, vjp = jax.vjp(lambda *a: vbn(*a), x, w, b)
            return vjp(dy)
        both = jax.jit(fwd_bwd)

        t_fwd = timed(fwd, (x, w, b))
        t_both = timed(both, (x, w, b, dy))
        t_bwd = t_both - t_fwd  # vjp re-runs fwd inside

        bytes_el = x.size * x.dtype.itemsize
        bound_fwd = 2 * bytes_el / (hbm_gbs * 1e9)
        bound_bwd = 3 * bytes_el / (hbm_gbs * 1e9)
        row = {
            "stage": f"{H}x{W}x{C}",
            "xla_fwd_us": round(t_fwd * 1e6, 1),
            "xla_bwd_us": round(t_bwd * 1e6, 1),
            "bound_fwd_us(2 sweeps)": round(bound_fwd * 1e6, 1),
            "bound_bwd_us(3 sweeps)": round(bound_bwd * 1e6, 1),
            "fwd_sweeps_equiv": round(t_fwd / (bound_fwd / 2), 2),
            "bwd_sweeps_equiv": round(t_bwd / (bound_bwd / 3), 2),
            "pallas_win_us_if_at_bound": round(
                max(t_fwd - bound_fwd, 0) * 1e6
                + max(t_bwd - bound_bwd, 0) * 1e6, 1),
        }
        results["stages"].append(row)
        print(json.dumps(row), file=sys.stderr)

    # per-step totals: ResNet-20 has ~{6,6,7} BN layers per stage + stem
    per_stage_counts = [7, 6, 7]
    win_us = sum(r["pallas_win_us_if_at_bound"] * c
                 for r, c in zip(results["stages"], per_stage_counts))
    results["est_step_win_us_upper"] = round(win_us, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
