"""Does the flat-packed chain state cost real step time at K=8?

Runs the REAL ResNet-20 K=8 bf16 potential+gradient step in two forms:
  packed — production: positions in one flat f32 vector; every step
           unpacks (reshape+relayout) and packs the gradient back
  tree   — positions carried as the parameter pytree (f32 leaves, one
           momentum tree, per-leaf noise): no flat vector anywhere

Same model / batch / dtypes; the sampler math is an equivalent-FLOPs
SGLD-with-momentum update in both. Difference isolates the pack/unpack
relayout tax that op-profile attributes ~1.3 ms/step of weight-shaped
copies to.  Usage: python experiments/perf/tree_carry_probe.py [n_steps]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1].parent))

K = 8
N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from bnn_priors_tpu import mcmc, models

    model = models.ResNet(depth=20, softmax_temp=1.0)
    kernel = mcmc.VerletSGLD(num_data=50000, momentum=0.994)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        from bnn_priors_tpu.parallel import init_chains_diverse
        states = init_chains_diverse(kernel, model, jax.random.key(1), K,
                                     dtype=jnp.float32)
        params1 = kernel.unpack(states.position[0])
        params = jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v, (K,) + v.shape).copy(), params1)
        _, mstate = model.init(jax.random.key(0), dtype=jnp.float32)
        mstates = jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v, (K,) + v.shape).copy(), mstate)
    dev = jax.devices()[0]
    x = jax.random.normal(jax.random.key(2), (K, 128, 3, 32, 32),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(3), (K, 128), 0, 10)

    def potgrad(params_chain, ms_chain, xb, yb):
        fn = model.potential_avg_fn(ms_chain, xb, yb, 50000.0, train=True,
                                    compute_dtype=jnp.bfloat16)
        (pot, (new_ms, _)), g = jax.value_and_grad(fn, has_aux=True)(
            params_chain)
        return pot, new_ms, g

    # ---- packed (production shape) --------------------------------------
    states_d, mstates_d = jax.device_put((states, mstates), dev)

    def packed_step(c, _):
        st, ms = c

        def one(chain, msc, xb, yb):
            pot, new_ms, g = potgrad(kernel.unpack(chain.position), msc,
                                     xb, yb)
            gv = jnp.clip(kernel.pack(g), -1e6, 1e6)
            chain, _ = kernel.step(chain, gv, 0.01, 1.0, calc_metrics=False)
            return chain, new_ms, pot
        st, ms, pot = jax.vmap(one)(st, ms, x, y)
        return (st, ms), pot[-1]

    # ---- tree carry ------------------------------------------------------
    mom = jax.tree_util.tree_map(jnp.zeros_like, params)
    tree_c = jax.device_put((params, mom, mstates,
                             jax.random.split(jax.random.key(9), K)), dev)

    def tree_step(c, _):
        ps, mo, ms, keys = c

        def one(p, m, msc, key, xb, yb):
            pot, new_ms, g = potgrad(p, msc, xb, yb)
            key, sub = jax.random.split(key)
            leaves = list(p.keys())

            def upd(i, pk, mk, gk):
                n = jax.random.normal(jax.random.fold_in(sub, i), pk.shape,
                                      pk.dtype)
                mk = 0.994 * mk - 0.01 * jnp.clip(gk, -1e6, 1e6) + 1e-3 * n
                return pk + mk, mk
            out = {k: upd(i, p[k], m[k], g[k])
                   for i, k in enumerate(leaves)}
            return ({k: v[0] for k, v in out.items()},
                    {k: v[1] for k, v in out.items()}, new_ms, key, pot)
        ps, mo, ms, keys, pot = jax.vmap(one)(ps, mo, ms, keys, x, y)
        return (ps, mo, ms, keys), pot[-1]

    def bench(step, carry):
        @jax.jit
        def run(carry):
            carry, pots = jax.lax.scan(step, carry, None, length=N_STEPS)
            return carry, pots[-1]

        def chain_of(R, c):
            t0 = time.perf_counter()
            for _ in range(R):
                c, pot = run(c)
            float(pot)
            return time.perf_counter() - t0, c

        _, carry = chain_of(1, carry)
        best = float("inf")
        for _ in range(3):
            t1, carry = chain_of(1, carry)
            t3, carry = chain_of(3, carry)
            best = min(best, (t3 - t1) / 2)
        return best / N_STEPS * 1e3

    ms_packed = bench(packed_step, (states_d, mstates_d))
    print(json.dumps({"variant": "packed", "ms_per_step": round(ms_packed, 3),
                      "agg_steps_per_s": round(K * 1e3 / ms_packed, 1)}),
          flush=True)
    ms_tree = bench(tree_step, tree_c)
    print(json.dumps({"variant": "tree", "ms_per_step": round(ms_tree, 3),
                      "agg_steps_per_s": round(K * 1e3 / ms_tree, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
