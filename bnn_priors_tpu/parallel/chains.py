"""Multi-chain parallelism over device meshes.

The reference has NO multi-chain machinery — users launch independent
processes via bash/jug (`run_experiment.sh:15-41`; SURVEY §2.11). Here
parallel chains are first-class, the TPU-native scale axis (SURVEY §5.7):

* `vmap_chains`: K independent chains batched on one chip — one fused
  kernel for all chains' updates (the packed chain state gains a leading
  chain axis).
* `ChainMesh`: chains sharded across devices via `shard_map` over a
  (`chains`, `data`) mesh — chains are embarrassingly parallel on the
  `chains` axis; within a chain group the minibatch is sharded over the
  `data` axis and gradients are combined with `psum` (the only collective
  the algorithm needs; diagnostics aggregate with `pmean`). XLA schedules
  the collectives over ICI; multi-host runs only need
  `jax.distributed.initialize` before mesh construction.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_chain_shards: int, n_data_shards: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_chain_shards * n_data_shards, (
        f"need {n_chain_shards * n_data_shards} devices, "
        f"have {len(devices)}")
    dev = np.asarray(devices[: n_chain_shards * n_data_shards]).reshape(
        n_chain_shards, n_data_shards)
    return Mesh(dev, ("chains", "data"))


def init_chains(kernel, params_tree, key, n_chains: int, init_kwargs=None):
    """Stacked chain state: every field gains a leading (n_chains,) axis.
    Each chain gets an independent PRNG key; positions are identical (use
    `init_chains_diverse` for per-chain prior draws)."""
    init_kwargs = init_kwargs or {}
    base = kernel.init(params_tree, key, **init_kwargs)
    keys = jax.random.split(key, n_chains)

    def stack(leaf):
        return jnp.broadcast_to(leaf, (n_chains,) + leaf.shape)
    stacked = jax.tree_util.tree_map(stack, base)
    return stacked._replace(key=keys)


def init_chains_diverse(kernel, model, key, n_chains: int, init_kwargs=None,
                        dtype=None):
    "independent prior draw per chain (the ensemble workload's init)"
    keys = jax.random.split(key, n_chains)

    def params_fn(i, k):
        params, _ = model.init(k, dtype=dtype)
        return params
    return init_chains_from_fn(kernel, key, n_chains, params_fn, init_kwargs)


def init_chains_from_fn(kernel, key, n_chains: int, params_fn,
                        init_kwargs=None):
    """Stacked chain state with explicit per-chain initial parameters:
    `params_fn(chain_index, key) -> params dict` (he-initialization, warm
    starts, ...); each chain still gets an independent PRNG stream."""
    init_kwargs = init_kwargs or {}
    keys = jax.random.split(key, n_chains)
    states = []
    for i in range(n_chains):
        k_params, k_chain = jax.random.split(keys[i])
        states.append(kernel.init(params_fn(i, k_params), k_chain,
                                  **init_kwargs))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def vmap_chains(step_fn: Callable):
    """vmap a chain transition `(state, batch) -> (state, metrics)` over a
    leading chain axis. Hyperparameters must be closed over (shared)."""
    return jax.vmap(step_fn)


class ChainMesh:
    """shard_map-based multi-chain stepper over a (chains, data) mesh.

    `grad_fn(params_tree, xb, yb)` must return the *local* potential
    contribution's gradient pytree and aux dict; this class psums gradients
    over the `data` axis and runs the (replicated-over-data) kernel update.
    """

    def __init__(self, mesh: Mesh, kernel, model, eff_num_data: float,
                 grad_max: float = 1e6):
        self.mesh = mesh
        self.kernel = kernel
        self.model = model
        self.eff_num_data = float(eff_num_data)
        self.grad_max = grad_max
        self.n_data_shards = mesh.shape["data"]

    def sharding(self, spec):
        return NamedSharding(self.mesh, spec)

    def place_chains(self, stacked_state):
        "shard the stacked chain state on the `chains` axis"
        return jax.device_put(stacked_state, self.sharding(P("chains")))

    def place_batch(self, x):
        "(n_chains, B, ...): chains axis over `chains`, batch over `data`"
        return jax.device_put(x, self.sharding(P("chains", "data")))

    def _local_grad(self, position, model_state, xb, yb):
        """gradient of the full minibatch potential from this data shard:
        local  -(Σ_local ll)·(N_eff/B_global)/N_eff  - log_prior/(N_eff·d)
        psum over `data` gives the exact minibatch potential gradient."""
        B_global = xb.shape[0] * self.n_data_shards
        d = self.n_data_shards

        def fn(params):
            ll, new_state, fout = self.model.log_likelihood(
                params, model_state, xb, yb, eff_num_data=1.0, train=True)
            ll_avg_local = ll * (xb.shape[0] / B_global)
            lp = self.model.log_prior(params)
            pot_local = -(ll_avg_local + lp / (self.eff_num_data * d))
            acc = self.model.acc_fn(fout, yb, params)
            return pot_local, (new_state, jnp.sum(acc) / B_global)
        params = self.kernel.unpack(position)
        (pot, (new_state, acc)), g = jax.value_and_grad(
            fn, has_aux=True)(params)
        g = self.kernel.pack(g)
        g = jax.lax.psum(g, "data")
        pot = jax.lax.psum(pot, "data")
        acc = jax.lax.psum(acc, "data")
        return pot, acc, g, new_state

    def make_step(self, lr_fn, jit=True):
        """Returns `step(stacked_state, model_states, step_idx, xb, yb,
        temperature) -> (state, model_states, metrics)` running every chain
        in parallel across the mesh."""
        kernel = self.kernel

        def one_chain(state, model_state, step_idx, xb, yb, temperature):
            pot, acc, g, new_model_state = self._local_grad(
                state.position, model_state, xb, yb)
            g = jnp.clip(g, -self.grad_max, self.grad_max)
            lr = lr_fn(step_idx)
            state, _ = kernel.step(state, g, lr, temperature,
                                   calc_metrics=False)
            return state, new_model_state, {"potential": pot, "acc": acc}

        def stepper(states, model_states, step_idx, xb, yb, temperature):
            states, model_states, metrics = jax.vmap(
                one_chain, in_axes=(0, 0, None, 0, 0, None)
            )(states, model_states, step_idx, xb, yb, temperature)
            # cross-chain diagnostics ride the `chains` axis collectives
            metrics["mean_potential"] = jax.lax.pmean(
                jnp.mean(metrics["potential"]), "chains")
            return states, model_states, metrics

        sm = jax.shard_map(
            stepper, mesh=self.mesh,
            in_specs=(P("chains"), P("chains"), P(), P("chains", "data"),
                      P("chains", "data"), P()),
            out_specs=(P("chains"), P("chains"),
                       {"potential": P("chains"), "acc": P("chains"),
                        "mean_potential": P()}),
            check_vma=False,
        )
        return jax.jit(sm) if jit else sm
