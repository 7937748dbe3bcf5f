"""Probe lowerings for the PER-CHAIN weight gradient — the measured hot
spot of the K-chain step (op_profile: the vmapped wgrad lowers to a
chain-dilated convolution `window=HxWxK lhs_dilate=1x1xK` running at
0.3-0.8% MXU; wgrad fusions are ~35% of the whole GGMC step).

For every chain k:  dW[k] = d/dW conv2d(x[k], w[k]) . dy[k]
  i.e. dW[k,kh,kw,ci,co] = sum_{n,h,w} Xp[k,n,h+kh,w+kw,ci] dy[k,n,h,w,co]

Variants:
  autodiff — jax.grad of the vmapped fwd conv wrt w (current production)
  bgc      — ONE conv: lhs = X^T (K*Ci, H, W, N), rhs = dY^T
             (Ho, Wo, N, K*Co), window Ho x Wo, batch_group_count=K
             (the classic wgrad-as-conv with chains in batch groups)
  taps     — 9 batched einsums over shifted slices:
             dW[:,dy,dx] = einsum('knhwc,knhwd->kcd', Xp_shift, dY)

Prints one JSON line per measurement.  Run: python .../wgrad_probe.py
Check only (CPU): JAX_PLATFORMS=cpu python .../wgrad_probe.py --check
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
N_ITERS = 30


def fwd_conv(xb, wb):
    return lax.conv_general_dilated(
        xb, wb, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def wgrad_autodiff(x, dy):
    "what production autodiff generates for the vmapped conv"
    def loss(w):
        y = jax.vmap(fwd_conv)(x, w)
        return jnp.sum((y * dy).astype(jnp.float32))
    w0 = jnp.zeros((K, 3, 3, x.shape[-1], dy.shape[-1]), x.dtype)
    return jax.grad(loss)(w0).astype(x.dtype)


def wgrad_bgc(x, dy):
    K_, N, H, W, Ci = x.shape
    Co = dy.shape[-1]
    lhs = jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(K_ * Ci, H, W, N)
    rhs = jnp.transpose(dy, (2, 3, 1, 0, 4)).reshape(H, W, N, K_ * Co)
    out = lax.conv_general_dilated(
        lhs, rhs, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), batch_group_count=K_)
    # out: (Ci, 3, 3, K*Co) -> (K, 3, 3, Ci, Co)
    return jnp.transpose(out.reshape(Ci, 3, 3, K_, Co), (3, 1, 2, 0, 4))


def wgrad_taps(x, dy):
    K_, N, H, W, Ci = x.shape
    Co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for ky in range(3):
        row = []
        for kx in range(3):
            xs = lax.dynamic_slice_in_dim(
                lax.dynamic_slice_in_dim(xp, ky, H, axis=2), kx, W, axis=3)
            row.append(jnp.einsum("knhwc,knhwd->kcd", xs, dy,
                                  preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row, axis=1))
    out = jnp.stack(taps, axis=1)  # (K, 3, 3, Ci, Co)
    return out.astype(x.dtype)


def _wgrad_one(xb, dyb):
    "single-chain wgrad via XLA's own conv transpose (efficient emitter)"
    w0 = jnp.zeros((3, 3, xb.shape[-1], dyb.shape[-1]), xb.dtype)
    return jax.vjp(lambda w: fwd_conv(xb, w), w0)[1](dyb)[0]


def wgrad_seq(x, dy):
    "sequential map over chains: K x the efficient single-chain wgrad"
    return lax.map(lambda a: _wgrad_one(*a), (x, dy))


def wgrad_single1(x, dy):
    "floor reference: ONE chain's wgrad (time x K for perfect scaling)"
    return _wgrad_one(x[0], dy[0])


VARIANTS = {"autodiff": wgrad_autodiff, "bgc": wgrad_bgc,
            "taps": wgrad_taps, "seq": wgrad_seq,
            "single1": wgrad_single1}


def make_inputs(stage, dtype, k=K):
    H, C = STAGES[stage]
    kx, kg = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (k, BATCH, H, H, C), dtype)
    dy = jax.random.normal(kg, (k, BATCH, H, H, C), dtype)
    return x, dy


def check():
    global K
    K = 2
    for stage in STAGES:
        x, dy = make_inputs(stage, jnp.float32, k=K)
        ref = wgrad_autodiff(x, dy)
        for name, fn in VARIANTS.items():
            got = fn(x, dy)
            if name == "single1":
                got, ref_c = got[None], ref[:1]
                err = float(jnp.max(jnp.abs(got - ref_c)) /
                            jnp.max(jnp.abs(ref_c)))
                print(f"{stage:8s} {name:9s} rel_err={err:.2e}")
                assert err < 1e-4
                continue
            err = float(jnp.max(jnp.abs(got - ref)) /
                        jnp.max(jnp.abs(ref)))
            print(f"{stage:8s} {name:9s} rel_err={err:.2e} "
                  f"{'ok' if err < 1e-4 else 'FAIL'}")
            assert err < 1e-4, (stage, name)
    print("all wgrad variants agree")


def bench_one(fn, x, dy, n_iters=N_ITERS):
    def body(c, _):
        xc, dyc = c
        dw = fn(xc, dyc)
        # serial dependency: perturb dy with a broadcast of dw stats
        dyc = dyc + jnp.mean(dw).astype(dyc.dtype) * 1e-6
        return (xc, dyc), ()

    @jax.jit
    def run(xc, dyc):
        (xc, dyc), _ = lax.scan(body, (xc, dyc), None, length=n_iters)
        return xc, dyc, jnp.mean(dyc.astype(jnp.float32))

    def chain_of(R):
        xc, dyc = x, dy
        t0 = time.perf_counter()
        for _ in range(R):
            xc, dyc, probe = run(xc, dyc)
        float(probe)
        return time.perf_counter() - t0

    chain_of(1)
    best = float("inf")
    for _ in range(3):
        t1, t4 = chain_of(1), chain_of(4)
        best = min(best, (t4 - t1) / 3)
    return best / n_iters * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if "--check" in sys.argv:
        check()
        return
    for stage in STAGES:
        H, C = STAGES[stage]
        flops = 2 * K * BATCH * H * H * 9 * C * C
        x, dy = make_inputs(stage, jnp.bfloat16)
        for name, fn in VARIANTS.items():
            ms = bench_one(fn, x, dy)
            print(json.dumps({
                "variant": name, "stage": stage, "ms": round(ms, 4),
                "tflops_per_s": round(flops / ms / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
