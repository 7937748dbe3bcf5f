"""Probe alternative lowerings for the per-chain (K-batched weights)
convolution — the op that burns the chain axis (PERF.md "The chain
axis": vmap over per-chain conv weights lowers to feature_group_count=K
grouped conv, which XLA-TPU rewrites to a masked dense conv with K^2 MXU
work; measured per-chain efficiency at K=8 is 0.147).

Variants, each computing the SAME op — for every chain k:
    y[k] = conv2d(x[k], w[k]), 3x3, stride 1, pad SAME, NHWC
  1. vmap     — jax.vmap over (x, w): the current production lowering
  2. bgc      — lax.conv_general_dilated(batch_group_count=K): chains in
                the batch dim, per-chain weights in output-feature groups
  3. im2col   — explicit patches (K, M, 9*Ci) @ (K, 9*Ci, Co) batched dot
  4. im2colT  — transposed form (K, Co, 9*Ci) @ (K, 9*Ci, M): puts the
                huge spatial axis M in MXU lanes instead of Co (Co=16
                wastes 112/128 lanes; M is unbounded)
  5. single   — ONE chain, plain conv (cost floor reference: K * single
                is "perfect scaling")

Each at the three ResNet-20 stage shapes (channels 16/32/64), bf16,
forward and forward+backward.  Prints one JSON line per measurement:
  {"variant": ..., "stage": ..., "mode": "fwd"|"fwdbwd", "ms": ...,
   "gflops": ..., "tflops_per_s": ...}

Run on the TPU:  python experiments/perf/conv_probe.py
Correctness-only (CPU): JAX_PLATFORMS=cpu python ... --check
"""
import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K = 8
BATCH = 128
STAGES = {  # name -> (H, C):  ResNet-20 CIFAR stages
    "s1_c16": (32, 16),
    "s2_c32": (16, 32),
    "s3_c64": (8, 64),
}
N_ITERS = 50


def conv1(xb, wb):
    "Plain single-chain conv: x (N,H,W,Ci), w HWIO."
    return lax.conv_general_dilated(
        xb, wb, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def v_vmap(x, w):
    return jax.vmap(conv1)(x, w)


def v_bgc(x, w):
    K_, N, H, W, Ci = x.shape
    kh, kw, _, Co = w.shape[1:]
    xl = x.reshape(K_ * N, H, W, Ci)
    # out-feature group k must pair with lhs batch group k
    wl = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(kh, kw, Ci, K_ * Co)
    y = lax.conv_general_dilated(
        xl, wl, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), batch_group_count=K_)
    return jnp.transpose(y.reshape(N, H, W, K_, Co), (3, 0, 1, 2, 4))


def _patches(x):
    "x (K,N,H,W,Ci) -> (K, N*H*W, 9*Ci), pad SAME, taps ordered (dy,dx,Ci)."
    K_, N, H, W, Ci = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.stack(
        [xp[:, :, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)],
        axis=-2)                                  # (K,N,H,W,9,Ci)
    return cols.reshape(K_, N * H * W, 9 * Ci)


def v_im2col(x, w):
    K_, N, H, W, Ci = x.shape
    Co = w.shape[-1]
    cols = _patches(x)
    wm = w.reshape(K_, 9 * Ci, Co)
    y = lax.dot_general(cols, wm, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=x.dtype)
    return y.reshape(K_, N, H, W, Co)


def v_im2colT(x, w):
    K_, N, H, W, Ci = x.shape
    Co = w.shape[-1]
    colsT = jnp.swapaxes(_patches(x), 1, 2)        # (K, 9Ci, M)
    wT = jnp.swapaxes(w.reshape(K_, 9 * Ci, Co), 1, 2)  # (K, Co, 9Ci)
    y = lax.dot_general(wT, colsT, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=x.dtype)  # (K, Co, M)
    return jnp.swapaxes(y, 1, 2).reshape(K_, N, H, W, Co)


VARIANTS = {"vmap": v_vmap, "bgc": v_bgc, "im2col": v_im2col,
            "im2colT": v_im2colT}


def make_inputs(stage, dtype, k=K):
    H, C = STAGES[stage]
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (k, BATCH, H, H, C), dtype)
    w = jax.random.normal(kw, (k, 3, 3, C, C), dtype) * 0.1
    return x, w


def check():
    "Numerical agreement of every variant with the vmap reference."
    for stage in STAGES:
        x, w = make_inputs(stage, jnp.float32, k=2)
        ref = v_vmap(x, w)
        for name, fn in VARIANTS.items():
            got = fn(x, w)
            err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
            status = "ok" if err < 1e-5 else "FAIL"
            print(f"{stage:8s} {name:8s} rel_err={err:.2e} {status}")
            assert err < 1e-5, (stage, name, err)
    print("all variants agree")


def bench_one(fn, x, w, mode, n_iters=N_ITERS):
    """Time a scan of n_iters applications; returns ms per call.

    NB `jax.block_until_ready` does NOT block on the remote-tunnel
    backend (measured: 0.1 ms "dispatch" for work whose results then
    take seconds to fetch), so timing must force a device->host scalar
    readback. Fixed costs (enqueue + roundtrip + the readback) are
    cancelled by differencing two different dispatch counts.
    """
    if mode == "fwd":
        def body(c, _):
            xc, wc = c
            y = fn(xc, wc)
            # keep shapes, create a serial dependency
            return (y * 0.1 + xc * 0.9, wc), ()
    else:
        def loss(xc, wc):
            return jnp.sum(fn(xc, wc).astype(jnp.float32) ** 2) * 1e-6

        grad = jax.value_and_grad(loss, argnums=(0, 1))

        def body(c, _):
            xc, wc = c
            _, (gx, gw) = grad(xc, wc)
            return (xc - 1e-7 * gx.astype(xc.dtype),
                    wc - 1e-7 * gw.astype(wc.dtype)), ()

    @jax.jit
    def run(xc, wc):
        (xc, wc), _ = lax.scan(body, (xc, wc), None, length=n_iters)
        return xc, wc, jnp.mean(xc.astype(jnp.float32))

    def chain_of(R):
        "enqueue R dependent dispatches, force completion via scalar fetch"
        xc, wc = x, w
        t0 = time.perf_counter()
        for _ in range(R):
            xc, wc, probe = run(xc, wc)
        float(probe)
        return time.perf_counter() - t0

    chain_of(1)  # warmup/compile
    best = float("inf")
    for _ in range(3):
        t1 = chain_of(1)
        t4 = chain_of(4)
        best = min(best, (t4 - t1) / 3)
    return best / n_iters * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if "--check" in sys.argv:
        check()
        return
    dtype = jnp.bfloat16
    for stage in STAGES:
        H, C = STAGES[stage]
        flops = 2 * K * BATCH * H * H * 9 * C * C
        x, w = make_inputs(stage, dtype)
        x1, w1 = jax.tree.map(lambda a: a[0], (x, w))
        for mode in ("fwd", "fwdbwd"):
            mult = 3.0 if mode == "fwdbwd" else 1.0
            for name, fn in VARIANTS.items():
                ms = bench_one(fn, x, w, mode)
                print(json.dumps({
                    "variant": name, "stage": stage, "mode": mode,
                    "ms": round(ms, 4),
                    "tflops_per_s": round(mult * flops / ms / 1e9, 2)}),
                    flush=True)
            # single-chain floor: 1/K of the work
            ms = bench_one(lambda a, b: conv1(a, b), x1, w1, mode)
            print(json.dumps({
                "variant": "single_x1", "stage": stage, "mode": mode,
                "ms": round(ms, 4),
                "tflops_per_s": round(mult * flops / K / ms / 1e9, 2)}),
                flush=True)


if __name__ == "__main__":
    main()
