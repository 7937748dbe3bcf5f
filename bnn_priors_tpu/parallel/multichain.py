"""Multi-chain cyclical SG-MCMC: the TPU-native replacement for the
reference's process-level sweep fan-out (`run_experiment.sh`, jug files —
SURVEY §2.11, §5.7).

K chains run *inside one jitted scan* with a leading chain axis: one fused
update for all chains, per-chain PRNG streams, per-chain minibatch orders
and (optionally) per-chain temperatures — so a tempering sweep
(5 temps × replicates) is one program instead of 30 processes. On a
device mesh the chain axis is sharded (`NamedSharding(P('chains'))`) and
XLA partitions the whole scan automatically; scaling efficiency is linear
because chains never communicate (diagnostics aggregate post-hoc).
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import mcmc
from ..inference.schedules import make_schedule
from .chains import init_chains_diverse


class MultiChainRunner:
    """Cyclical SG-MCMC over K vmapped chains (descent/warmup/sampling
    phases, cosine cycles). Non-reject kernels (SGLD / VerletSGLD mid
    steps); per-chain temperatures enable tempering-curve sweeps."""

    def __init__(self, model, train_data, n_chains, temperatures=1.0,
                 kernel="VerletSGLD", learning_rate=1e-2, momentum=0.994,
                 sampling_decay="cosine", batch_size=128, cycles=1,
                 epochs_per_cycle=1, warmup_epochs=0, sample_epochs=1,
                 skip=1, grad_max=1e6, precond_update=None,
                 data_mult=1.0, mesh: Optional[Mesh] = None, key=None,
                 dtype=jnp.float32, augment_fn=None, model_savers=None):
        self.model = model
        self.train_x, self.train_y = train_data
        self.n_chains = int(n_chains)
        self.N = int(self.train_x.shape[0])
        self.eff_num_data = self.N * data_mult
        self.batch_size = int(batch_size)
        self.n_full = self.N // self.batch_size
        self.grad_max = grad_max
        self.cycles = cycles
        self.epochs_per_cycle = epochs_per_cycle
        self.descent_epochs = epochs_per_cycle - warmup_epochs - sample_epochs
        self.warmup_epochs = warmup_epochs
        self.sample_epochs = sample_epochs
        self.skip = skip
        self.precond_update = precond_update
        self.learning_rate = learning_rate
        self.mesh = mesh
        self.augment_fn = augment_fn
        self.schedule = make_schedule(
            sampling_decay, self.n_full * epochs_per_cycle,
            steps_per_stair=150 * self.n_full)

        temps = jnp.broadcast_to(jnp.asarray(temperatures, dtype),
                                 (self.n_chains,))
        self.temperatures = temps

        self.key = key if key is not None else jax.random.key(0)
        k_chains, self.key = jax.random.split(self.key)
        kernel_cls = {"SGLD": mcmc.SGLD, "VerletSGLD": mcmc.VerletSGLD}[kernel]
        self.kernel = kernel_cls(num_data=self.eff_num_data,
                                 momentum=momentum)
        self.states = init_chains_diverse(self.kernel, model, k_chains,
                                          self.n_chains, dtype=dtype)
        _, model_state = model.init(jax.random.key(0), dtype=dtype)
        self.model_states = jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v, (self.n_chains,) + v.shape).copy(),
            model_state)
        if mesh is not None:
            sh = NamedSharding(mesh, P("chains"))
            self.states = jax.device_put(self.states, sh)
            self.model_states = jax.device_put(self.model_states, sh)
        # optional list of per-chain HDF5ModelSaver-like objects: samples
        # stream to disk instead of accumulating in host memory (a 300-
        # sample ResNet sweep would otherwise hold tens of GB)
        assert model_savers is None or len(model_savers) == self.n_chains
        self.model_savers = model_savers
        self._samples = []
        self._epoch_fn = None

    # -- jitted epoch ------------------------------------------------------
    def _build_epoch_fn(self):
        kernel, model = self.kernel, self.model
        lr0, schedule = self.learning_rate, self.schedule
        grad_max, eff = self.grad_max, self.eff_num_data
        augment_fn = self.augment_fn

        def chain_step(state, model_state, idx, step, temperature, tx, ty):
            xb = jnp.take(tx, idx, axis=0)
            yb = jnp.take(ty, idx, axis=0)
            if augment_fn is not None:
                k_aug = jax.random.fold_in(state.key, 12345)
                xb = augment_fn(k_aug, xb)
            fn = model.potential_avg_fn(model_state, xb, yb, eff, train=True)
            (pot, (new_ms, aux)), g = jax.value_and_grad(
                fn, has_aux=True)(kernel.unpack(state.position))
            g = jnp.clip(kernel.pack(g), -grad_max, grad_max)
            lr = lr0 * schedule(step)
            state, _ = kernel.step(state, g, lr, temperature,
                                   calc_metrics=False)
            # per-chain tempering diagnostics (aggregate over all params):
            # kinetic temperature ||m||^2/d, config temperature <theta,g>N/d
            d = jnp.asarray(kernel.packer.total, g.dtype)
            est_t = jnp.sum(state.momentum * state.momentum) / d
            est_c = jnp.sum(state.position * g) * (kernel.num_data / d)
            return state, new_ms, {"potential": pot, "acc": aux["acc"],
                                   "est_temperature": est_t,
                                   "est_config_temp": est_c}

        def epoch(states, model_states, idxs, step0, temperatures, tx, ty):
            # idxs: (n_chains, n_batches, B); train data as traced args so
            # the HLO carries no dataset-sized constants
            def body(carry, batch_i):
                states, model_states = carry
                idx = idxs[:, batch_i]
                states, model_states, m = jax.vmap(
                    chain_step, in_axes=(0, 0, 0, None, 0, None, None)
                )(states, model_states, idx, step0 + batch_i, temperatures,
                  tx, ty)
                return (states, model_states), m
            (states, model_states), ms = jax.lax.scan(
                body, (states, model_states), jnp.arange(idxs.shape[1]))
            return states, model_states, ms

        return jax.jit(epoch)

    def _epoch_idxs(self):
        "(n_chains, n_full, B) independent permutations per chain"
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, self.n_chains)
        perms = jax.vmap(lambda k: jax.random.permutation(k, self.N))(keys)
        return perms[:, : self.n_full * self.batch_size].reshape(
            self.n_chains, self.n_full, self.batch_size)

    def _is_sampling_epoch(self, epoch):
        epoch = epoch % self.epochs_per_cycle
        se = epoch - (self.descent_epochs + self.warmup_epochs)
        return (0 <= se) and (se % self.skip == 0)

    def run(self, progressbar=False):
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
        self.states = self._sample_momentum_all()
        step = 0
        metrics_hist = []
        it = range(self.cycles)
        if progressbar:
            import tqdm
            it = tqdm.tqdm(it, desc="cycles")
        for cycle in it:
            for epoch in range(self.epochs_per_cycle):
                temps = jnp.where(epoch < self.descent_epochs,
                                  jnp.zeros_like(self.temperatures),
                                  self.temperatures)
                idxs = self._epoch_idxs()
                self.states, self.model_states, ms = self._epoch_fn(
                    self.states, self.model_states, idxs,
                    jnp.asarray(step), temps, self.train_x, self.train_y)
                step += self.n_full
                metrics_hist.append(jax.tree_util.tree_map(
                    lambda a: np.asarray(a[-1]), ms))
                if (self.precond_update is not None
                        and epoch % self.precond_update == 0):
                    self.states = jax.vmap(self.kernel.update_preconditioner)(
                        self.states)
                if self._is_sampling_epoch(epoch):
                    if self.model_savers is not None:
                        self._stream_sample(step)
                    else:
                        self._samples.append(
                            (np.asarray(self.states.position),
                             {k: np.asarray(v) for k, v in
                              self.model_states.items()}, step))
        return metrics_hist

    def _stream_sample(self, step):
        positions = np.asarray(self.states.position)
        mstates = {k: np.asarray(v) for k, v in self.model_states.items()}
        for c, saver in enumerate(self.model_savers):
            params = self.kernel.unpack(jnp.asarray(positions[c]))
            sd = {k: np.asarray(v) for k, v in params.items()}
            sd.update({k: v[c] for k, v in mstates.items()})
            saver.add_state_dict(sd, step=step)

    def _sample_momentum_all(self):
        "per-chain momentum refresh at the chain's own temperature"
        states = self.states
        keys = jax.vmap(lambda k: jax.random.split(k))(states.key)
        noise_keys, new_keys = keys[:, 0], keys[:, 1]

        def refresh(m, k, T):
            return jnp.sqrt(T) * jax.random.normal(k, m.shape, m.dtype)
        new_m = jax.vmap(refresh)(states.momentum, noise_keys,
                                  self.temperatures)
        return states._replace(momentum=new_m, key=new_keys)

    # -- sample bank -------------------------------------------------------
    def get_samples(self) -> Dict[str, np.ndarray]:
        """stacked sample bank dict: each entry (n_samples, n_chains, ...);
        per-chain banks via `chain_samples(c)`."""
        out: Dict[str, list] = {}
        for position, mstate, step in self._samples:
            params = jax.vmap(self.kernel.unpack)(jnp.asarray(position))
            for k, v in params.items():
                out.setdefault(k, []).append(np.asarray(v))
            for k, v in mstate.items():
                out.setdefault(k, []).append(v)
        return {k: np.stack(v) for k, v in out.items()}

    def chain_samples(self, chain: int) -> Dict[str, np.ndarray]:
        bank = self.get_samples()
        return {k: v[:, chain] for k, v in bank.items()}
