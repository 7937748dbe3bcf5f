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
elementwise pass; the achievable saving is (XLA time) - (bound).

Timing: each op is iterated ITERS times inside ONE jitted `lax.scan`
with a carried data dependency (the output feeds the next input), so
the per-dispatch tunnel overhead — which exceeds the op time itself for
micro-ops and once produced negative differenced times — amortizes
away. The scan dispatch itself is then timed with the differenced-
dispatch clock (PERF.md "Measurement methodology").
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp

K = 4          # chains per dispatch (the measured sweet spot)
N = 128        # batch
STAGES = [(32, 32, 16), (16, 16, 32), (8, 8, 64)]
DTYPE = jnp.bfloat16
EPS = 1e-5
ITERS = 200    # op iterations per scan dispatch


def timed_scan(scan_fn, x0, repeats=3):
    """scan_fn: jitted (x0 -> xN, checksum). Differenced chained-dispatch
    wall per scan iteration."""
    x, c = scan_fn(x0)
    float(c)  # compile + settle

    def chain_of(R, x):
        t0 = time.perf_counter()
        for _ in range(R):
            x, c = scan_fn(x)
        float(c)
        return time.perf_counter() - t0, x

    best = float("inf")
    for _ in range(repeats):
        t1, x = chain_of(1, x)
        t3, x = chain_of(3, x)
        best = min(best, (t3 - t1) / 2)
    return best / ITERS


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
               "dtype": str(DTYPE.__name__), "iters": ITERS, "stages": []}

    # reference HBM rate: big bf16 triad a->a+1 scanned with a carry
    big_shape = (32 * 1024 * 1024,)  # 64 MB bf16

    @jax.jit
    def copy_scan(a):
        def body(a, _):
            return a + 1, ()
        a, _ = jax.lax.scan(body, a, None, length=ITERS)
        return a, jnp.sum(a[:8].astype(jnp.float32))

    t_copy = timed_scan(copy_scan, jnp.ones(big_shape, DTYPE))
    hbm_gbs = (2 * big_shape[0] * jnp.dtype(DTYPE).itemsize) / t_copy / 1e9
    results["hbm_copy_GBs"] = round(hbm_gbs, 1)
    print(f"HBM copy rate: {hbm_gbs:.0f} GB/s "
          f"({t_copy * 1e6:.1f} us/iter)", file=sys.stderr)

    for (H, W, C) in STAGES:
        shape = (K, N, H, W, C)
        x0 = jax.random.normal(jax.random.key(0), shape, DTYPE)
        dy = jax.random.normal(jax.random.key(1), shape, DTYPE)
        w = jnp.ones((K, C), DTYPE)
        b = jnp.full((K, C), 0.01, DTYPE)
        vbn = jax.vmap(bn_relu)

        @jax.jit
        def fwd_scan(x):
            def body(x, _):
                # output feeds the next input: nothing hoists, every
                # iteration re-reads/rewrites HBM like the real net
                return vbn(x, w, b) - 0.001, ()
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x, jnp.sum(x[0, 0, 0, 0].astype(jnp.float32))

        @jax.jit
        def both_scan(x):
            def body(x, _):
                dx, dw, db = jax.vjp(lambda *a: vbn(*a), x, w, b)[1](dy)
                return dx - 0.001, ()
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x, jnp.sum(x[0, 0, 0, 0].astype(jnp.float32))

        t_fwd = timed_scan(fwd_scan, x0)
        t_both = timed_scan(both_scan, x0)
        t_bwd = max(t_both - t_fwd, 0.0)  # vjp re-runs fwd inside

        bytes_el = x0.size * x0.dtype.itemsize
        bound_fwd = 2 * bytes_el / (hbm_gbs * 1e9)
        bound_bwd = 3 * bytes_el / (hbm_gbs * 1e9)
        row = {
            "stage": f"{H}x{W}x{C}",
            "xla_fwd_us": round(t_fwd * 1e6, 1),
            "xla_fwdbwd_us": round(t_both * 1e6, 1),
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

    # per-step totals: ResNet-20 has ~{7,6,7} BN layers per stage
    per_stage_counts = [7, 6, 7]
    win_us = sum(r["pallas_win_us_if_at_bound"] * c
                 for r, c in zip(results["stages"], per_stage_counts))
    results["est_step_win_us_upper"] = round(win_us, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
