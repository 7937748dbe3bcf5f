"""GGMC with exact-gradient Metropolis–Hastings boundaries — the paper's
main algorithm (`inference=VerletSGLDReject`; reference
`bnn_priors/inference_reject.py`, arXiv:2102.01691).

Differences from the plain `VerletSGLDRunner`:
* the proposal's initial and final gradients are **exact full-dataset
  gradients** (`_exact_model_potential_and_grad`, inference_reject.py:18-33)
  — here one jitted scan over all minibatches accumulating per-batch
  gradients (sum of gradients == gradient of the sum, with constant memory);
* the M-H boundary happens at the END of each sampling epoch (not the start
  of the next), so saved samples are already correctly rolled back;
* minibatch order is FIXED per cycle: every epoch within a cycle visits the
  data in the same order (inference_reject.py:68-84) — one permutation key
  per cycle;
* the LR schedule advances once per minibatch; the epoch's last minibatch,
  the exact `final_step`, ΔE and the M-H decision share one LR value, and
  the follow-up `initial_step` uses the next (inference_reject.py:110-113,
  150-157).

Each sampling-epoch boundary costs 2 extra full-dataset passes.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import mcmc
from ..mcmc.segmented import vclip
from .runner import SGLDRunner, VerletSGLDRunner


def exact_potential_and_grad(model, kernel, position, model_state, tx, ty, *,
                             n_full, batch_size, tail, N, eff_num_data,
                             grad_max):
    """Exact full-dataset potential + packed gradient
    (reference `_exact_model_potential_and_grad`, inference_reject.py:18-33):
    one `lax.scan` over all full batches (+ tail) accumulating per-batch
    gradients — sum of gradients == gradient of the sum, constant memory.
    Traceable; vmap over a leading chain axis for multi-chain boundaries.
    Returns (loss, log_prior, potential, acc, grads, new_model_state)."""
    idx_full = jnp.arange(n_full * batch_size).reshape(n_full, batch_size)
    params = kernel.unpack(position)

    def body(carry, idx):
        g_acc, loss_acc, acc_acc, mstate = carry
        xb = jnp.take(tx, idx, axis=0)
        yb = jnp.take(ty, idx, axis=0)

        def fn(p):
            ll, new_state, fout = model.log_likelihood(
                p, mstate, xb, yb, eff_num_data=1.0, train=True)
            this_loss = -ll * (xb.shape[0] / eff_num_data)
            acc = model.acc_fn(fout, yb, p)
            return this_loss, (new_state, jnp.sum(acc))
        (this_loss, (new_state, acc_sum)), g = jax.value_and_grad(
            fn, has_aux=True)(params)
        # keep the accumulators' dtypes (under x64, f32 chains could
        # otherwise be promoted mid-scan and break carry type stability)
        return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                loss_acc + this_loss.astype(loss_acc.dtype),
                acc_acc + acc_sum.astype(acc_acc.dtype),
                new_state), None

    g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    carry = (g0, jnp.asarray(0.0, position.dtype),
             jnp.asarray(0.0, position.dtype), model_state)
    carry, _ = jax.lax.scan(body, carry, idx_full)
    if tail:
        idx_tail = jnp.arange(n_full * batch_size, N)
        carry, _ = body(carry, idx_tail)
    g_ll, loss, acc_sum, model_state = carry

    def prior_fn(p):
        return model.log_prior(p) / -eff_num_data
    log_norm_prior, g_prior = jax.value_and_grad(prior_fn)(params)
    log_prior = -log_norm_prior * eff_num_data
    grads = kernel.pack(jax.tree_util.tree_map(jnp.add, g_ll, g_prior))
    grads = vclip(grads, -grad_max, grad_max)
    potential = loss + log_norm_prior
    return loss, log_prior, potential, acc_sum / N, grads, model_state


class VerletSGLDRunnerReject(VerletSGLDRunner):
    # reproduce the reference's post-rejection base-potential bug (A/B)
    reference_base_potential = False

    def _make_kernel(self):
        return mcmc.VerletSGLD(num_data=self.eff_num_data,
                               momentum=self.momentum,
                               packing=self.packing)

    def _init_kwargs(self):
        return {"save_state": self.reject_samples}

    # -- per-cycle fixed data order ---------------------------------------
    def _epoch_perm(self, cycle, epoch):
        if not hasattr(self, "_perm_key"):
            self._perm_key, self.key = jax.random.split(self.key)
        return jax.random.permutation(
            jax.random.fold_in(self._perm_key, cycle), self.N)

    def save_checkpoint(self, path, next_epoch_index, step, extra=None):
        extra = dict(extra or {})
        extra["precond_pending"] = getattr(self, "_precond_pending", False)
        if hasattr(self, "_perm_key"):
            # the fixed per-cycle permutation key is drawn lazily; persist
            # it so resumed runs revisit data in the identical order
            extra["perm_key"] = np.asarray(
                jax.random.key_data(self._perm_key))
        super().save_checkpoint(path, next_epoch_index, step, extra)

    def restore_checkpoint(self, path):
        out = super().restore_checkpoint(path)
        if "perm_key" in self._ckpt_meta:
            self._perm_key = jax.random.wrap_key_data(
                jnp.asarray(self._ckpt_meta["perm_key"]))
        return out

    # -- exact full-dataset gradient --------------------------------------
    def _exact_vg_impl(self, position, model_state, tx, ty):
        "traced body shared by the jitted wrapper and the boundary steps"
        return exact_potential_and_grad(
            self.model, self.kernel, position, model_state, tx, ty,
            n_full=self.n_full, batch_size=self.batch_size, tail=self.tail,
            N=self.N, eff_num_data=self.eff_num_data,
            grad_max=self.grad_max)

    def _exact_vg(self, chain_position, model_state):
        """(loss, log_prior, potential, acc, grads, new_model_state) with
        loss = Σ_batches −ll(batch)/N and potential = loss − log_prior/N.
        One scan over all full batches (+ tail), accumulating gradients."""

        def builder():
            def f(position, model_state, tx, ty):
                return self._exact_vg_impl(position, model_state, tx, ty)
            return f
        f = self._get_jit("exact_vg", builder, donate_argnums=(1,))
        return f(chain_position, model_state, self.train_x, self.train_y)

    # -- boundary pieces ---------------------------------------------------
    def _boundary_final(self, chain, model_state, lr_index, temperature,
                        initial_potential):
        "exact vg → final_step → ΔE → maybe_reject; returns host scalars too"
        def builder():
            def f(chain, model_state, lr_index, temperature,
                  initial_potential, tx, ty):
                loss, log_prior, pot, acc, grads, model_state = \
                    self._exact_vg_impl(chain.position, model_state, tx, ty)
                lr = self.learning_rate * self.schedule(lr_index)
                chain, km = self.kernel.final_step(chain, grads, lr,
                                                   temperature)
                de = self.kernel.delta_energy(chain, grads, lr,
                                              initial_potential, pot)
                if self.reject_samples:
                    chain, rejected, _ = self.kernel.maybe_reject(
                        chain, de, temperature,
                        flip_on_reject=self.flip_on_reject)
                else:
                    rejected = jnp.asarray(False)
                # base potential for the NEXT segment's ΔE: on rejection the
                # chain is rolled back to the saved state, whose potential is
                # the OLD initial_potential. (The reference always uses the
                # proposal's potential here — inference_reject.py:123 — which
                # biases the acceptance test of the segment after a
                # rejection; fixed deliberately. Set
                # `reference_base_potential=True` to reproduce the
                # reference's (buggy) bookkeeping, e.g. for A/B parity
                # attribution — see PARITY.md "accept_rate divergence".)
                if self.reference_base_potential:
                    next_initial_pot = pot
                else:
                    next_initial_pot = jnp.where(rejected,
                                                 initial_potential, pot)
                metrics = self._metric_dict(pot, {
                    "loss": loss, "acc": acc, "log_prior": log_prior}, lr, km)
                return (chain, model_state, metrics, pot, de, rejected,
                        next_initial_pot)
            return f
        f = self._get_jit("boundary_final_exact", builder,
                          donate_argnums=(0, 1))
        dt = self.chain.position.dtype
        return f(chain, model_state, jnp.asarray(lr_index),
                 jnp.asarray(temperature, dt),
                 jnp.asarray(initial_potential, dt),
                 self.train_x, self.train_y)

    def _boundary_initial(self, chain, lr_index, temperature):
        "(HMC momentum refresh +) initial_step with the same exact gradient"
        def builder():
            def f(chain, lr_index, temperature):
                lr = self.learning_rate * self.schedule(lr_index)
                if self._is_hmc():
                    chain = self.kernel.sample_momentum(chain, temperature)
                chain, _ = self.kernel.initial_step(
                    chain, chain.grads, lr, temperature,
                    save_state=self.reject_samples)
                return chain
            return f
        f = self._get_jit("boundary_initial_exact", builder,
                          donate_argnums=(0,))
        dt = self.chain.position.dtype
        return f(chain, jnp.asarray(lr_index), jnp.asarray(temperature, dt))

    # -- main loop ---------------------------------------------------------
    def run(self, progressbar=False, resume_from=None):
        mstep = 0  # metrics step counter (batches + boundaries)
        lr_index = 0
        start_e = 0
        self._precond_pending = False  # precond update owed to next boundary
        if resume_from is not None:
            start_e, lr_index = self.restore_checkpoint(resume_from)
            mstep = int(self._ckpt_meta.get("mstep", lr_index))
            self._precond_pending = bool(
                self._ckpt_meta.get("precond_pending", False))
        else:
            # initial exact-gradient step (inference_reject.py:56-66)
            loss, log_prior, pot, acc, grads, self.model_state = \
                self._exact_vg(self.chain.position, self.model_state)
            self.chain = self.kernel.sample_momentum(self.chain,
                                                     self.temperature)
            lr0 = self.learning_rate * float(self.schedule(0))
            self.chain, km = self.kernel.initial_step(
                self.chain, grads, jnp.asarray(lr0), self.temperature,
                save_state=self.reject_samples)
            self._initial_potential = float(pot)
            self._total_energy = 0.0
            self._log_row(mstep, {
                "loss": float(loss), "log_prior": float(log_prior),
                "potential": float(pot), "acc": float(acc), "lr": lr0,
            }, km, corresponds_to_sample=True, delta_energy=0.0,
                total_energy=0.0,
                rejected=(False if self.reject_samples else None))

        total_epochs = self.cycles * self.epochs_per_cycle
        iterator = range(start_e, total_epochs)
        if progressbar:
            import tqdm
            iterator = tqdm.tqdm(iterator, desc="epochs")
        for e in iterator:
            cycle, epoch = divmod(e, self.epochs_per_cycle)
            t_epoch = time.time()
            temperature = (0.0 if epoch < self.descent_epochs
                           else self.temperature)
            perm = self._epoch_perm(cycle, epoch)
            idx_full = perm[: self.n_full * self.batch_size].reshape(
                self.n_full, self.batch_size)
            chain, model_state = self.chain, self.model_state
            ms = None
            start = 0
            if (self.profile_dir is not None and e == self.profile_epoch
                    and self.n_full > self.profile_max_steps):
                # capped trace, like the base runner: a full-epoch device
                # trace hangs remote transports (PERF.md)
                cap = self.profile_max_steps
                with jax.profiler.trace(self.profile_dir):
                    chain, model_state, ms = self._scan_steps(
                        chain, model_state, lr_index, idx_full[:cap],
                        temperature)
                    jax.block_until_ready(chain.position)
                    np.asarray(ms["potential"][-1])
                start = cap
            if self.n_full - start > 0:
                chain, model_state, ms_rest = self._scan_steps(
                    chain, model_state, lr_index + start, idx_full[start:],
                    temperature)
                ms = ms_rest if ms is None else jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b]), ms, ms_rest)
            n_steps = self.n_full
            if self.tail:
                idx_tail = perm[self.n_full * self.batch_size:]
                chain, model_state, m = self._single_step(
                    chain, model_state, lr_index + self.n_full, idx_tail,
                    temperature)
                ms = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate(
                        [a, jnp.asarray(b)[None]]), ms, m)
                n_steps += 1
            self.chain, self.model_state = chain, model_state
            if not np.all(np.isfinite(np.asarray(ms["potential"]))):
                raise ValueError("Potential is NaN")
            self._log_scan_metrics(mstep + 1, ms)
            mstep += n_steps
            lr_index += n_steps

            precond_due = (self.precond_update is not None
                           and (epoch + 1) % self.precond_update == 0)
            # Deferring updates to M-H segment boundaries preserves ΔE
            # exactness, which only matters when an acceptance test exists:
            # with reject_samples=False (always true for SGLDRunnerReject)
            # or with no sampling epochs at all, follow the reference's
            # per-epoch cadence instead (inference_reject.py:167-168).
            defer_precond = self.reject_samples and self.sample_epochs > 0
            if self._is_sampling_epoch(epoch):
                mstep += 1
                (self.chain, self.model_state, metrics, pot, de,
                 rejected, next_pot) = self._boundary_final(
                    self.chain, self.model_state, lr_index - 1,
                    temperature, self._initial_potential)
                de = float(de)
                self._total_energy += de
                self._initial_potential = float(next_pot)
                self._log_row(
                    mstep,
                    {k: float(np.asarray(metrics[k])) for k in
                     ("loss", "log_prior", "potential", "acc", "lr")},
                    {"est_temperature": metrics["est_temperature"],
                     "est_config_temp": metrics["est_config_temp"]},
                    corresponds_to_sample=True, delta_energy=de,
                    total_energy=self._total_energy,
                    rejected=(bool(rejected) if self.reject_samples
                              else None))
                self._evaluate_and_log(mstep)
                self._save_sample(mstep)
                # When rejecting, preconditioner updates apply ONLY
                # between segments — after maybe_reject, before the next
                # initial_step — so M is constant within every M-H
                # proposal segment and ΔE is the segment's true energy
                # change. (The reference updates after the boundary's
                # initial_step, inference_reject.py:167-168, mixing
                # old-M and new-M terms in the next acceptance test;
                # with the paper's skip=1, precond_update=1, warmup
                # epochs shift WHICH boundary applies a due update by at
                # most one segment — the placement here is exact.)
                if defer_precond:
                    if precond_due or self._precond_pending:
                        self.chain = self.kernel.update_preconditioner(
                            self.chain)
                        self._precond_pending = False
                elif precond_due:
                    self.chain = self.kernel.update_preconditioner(
                        self.chain)
                self.chain = self._boundary_initial(
                    self.chain, lr_index, temperature)
            else:
                self._evaluate_and_log(mstep)
                if precond_due:
                    if defer_precond:
                        # defer to the next segment boundary
                        self._precond_pending = True
                    else:
                        # no acceptance test exists: reference cadence
                        self.chain = self.kernel.update_preconditioner(
                            self.chain)
            if self.metrics_saver is not None:
                epoch_s = time.time() - t_epoch
                self.metrics_saver.add_scalar(
                    "timings/epoch_s", epoch_s, mstep)
                self.metrics_saver.add_scalar(
                    "timings/steps_per_s",
                    n_steps / max(epoch_s, 1e-9), mstep)
                self.metrics_saver.flush(every_s=30, keep_last_row=True)
            if (self.checkpoint_path is not None
                    and self.checkpoint_every is not None
                    and (e + 1) % self.checkpoint_every == 0):
                self.save_checkpoint(self.checkpoint_path, e + 1,
                                     lr_index, extra={"mstep": mstep})
        if self.metrics_saver is not None:
            self.metrics_saver.flush()

    # -- logging helpers ---------------------------------------------------
    def _log_row(self, index, scalars, km, corresponds_to_sample,
                 delta_energy=None, total_energy=None, rejected=None):
        if self.metrics_saver is None:
            return
        add = self.metrics_saver.add_scalar
        names = self.kernel.packer.names
        precond = np.asarray(self.kernel.leaf_precond(self.chain))
        if km:
            est_t = np.asarray(self.kernel.packer.pack_leaf_scalars(
                km["est_temperature"]) if isinstance(km["est_temperature"], dict)
                else km["est_temperature"])
            est_c = np.asarray(self.kernel.packer.pack_leaf_scalars(
                km["est_config_temp"]) if isinstance(km["est_config_temp"], dict)
                else km["est_config_temp"])
            sizes = np.asarray(self.kernel.packer.sizes, dtype=np.float64)
            for j, name in enumerate(names):
                add("preconditioner/" + name, float(precond[j]), index)
                add("est_temperature/" + name, float(est_t[j]), index)
                add("est_config_temp/" + name, float(est_c[j]), index)
            add("est_temperature/all",
                float((est_t * sizes).sum() / sizes.sum()), index)
            add("est_config_temp/all",
                float((est_c * sizes).sum() / sizes.sum()), index)
        add("temperature", float(self.temperature), index)
        for k, v in scalars.items():
            add(k, float(v), index)
        add("acceptance/is_sample", int(corresponds_to_sample), index)
        if delta_energy is not None:
            add("delta_energy", float(delta_energy), index)
            add("total_energy", float(total_energy), index)
        if rejected is not None:
            add("acceptance/rejected", int(rejected), index)

    def _log_scan_metrics(self, base_index, ms):
        if self.metrics_saver is None:
            return
        est_t = np.asarray(ms["est_temperature"])
        est_c = np.asarray(ms["est_config_temp"])
        de_wo_pot = (np.asarray(ms["de_wo_pot"])
                     if "de_wo_pot" in ms else None)
        loss = np.asarray(ms["loss"])
        n = est_t.shape[0]
        for i in range(n):
            index = base_index + i
            if index % self.metrics_skip != 0:
                continue
            de_i = total_i = None
            if de_wo_pot is not None:
                # reference inference.py:352-354: per-step energy drift
                # within the current segment, using `loss` as the potential
                de_i = float(de_wo_pot[i]) + (
                    float(loss[i]) - self._initial_potential
                ) * self.kernel.num_data
                total_i = self._total_energy + de_i
            self._log_row(
                index,
                {k: float(np.asarray(ms[k])[i]) for k in
                 ("loss", "log_prior", "potential", "acc", "lr")},
                {"est_temperature": est_t[i], "est_config_temp": est_c[i]},
                corresponds_to_sample=False, delta_energy=de_i,
                total_energy=total_i)

class HMCRunnerReject(VerletSGLDRunnerReject):
    def _make_kernel(self):
        assert self.temperature == 1.0, "HMC only implemented for temperature=1."
        assert self.momentum == 1.0, "HMC only works with momentum=1."
        assert self.descent_epochs == 0, \
            "HMC not implemented for descent epochs with temp=0."
        return mcmc.HMC(num_data=self.eff_num_data, packing=self.packing)


class SGLDRunnerReject(VerletSGLDRunnerReject):
    "SGLD with the fixed-order protocol; cannot reject (ΔE = ∞)."

    def _make_kernel(self):
        assert not self.reject_samples
        return mcmc.SGLD(num_data=self.eff_num_data, momentum=self.momentum,
                         packing=self.packing)

    def _init_kwargs(self):
        return {}
