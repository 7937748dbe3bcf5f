"""Cyclical SG-MCMC training runners.

TPU-native re-design of reference `bnn_priors/inference.py`. Each cycle has
descent (T=0), warmup, and sampling phases with a cosine LR schedule
(`SGLDRunner` docstring, inference.py:15-51). The reference iterates a
torch DataLoader and calls a stateful optimizer per minibatch with ~dozens
of `.item()` host syncs per step; here:

* the full training set lives on device; each epoch draws a permutation on
  device and runs ONE jitted `lax.scan` over the minibatches (static batch
  count, static shapes; the ragged tail batch gets its own compiled step
  with its true static size so likelihood scaling and batchnorm statistics
  match the reference exactly);
* the LR schedule is evaluated inside the scan from the global step index;
* per-step diagnostics are accumulated on device and written to the
  metrics saver once per epoch;
* epoch boundaries (sample saving, preconditioner update, M-H boundary
  steps, evaluation) stay in a cheap Python loop, mirroring the reference
  protocol exactly (inference.py:110-187, 304-365).

Step protocol parity notes:
* scheduler order: the reference calls `optimizer.step()` then
  `scheduler.step()` (inference.py:238-243), so global step t uses
  lr₀·sched(t) with sched(0)=1.
* `VerletSGLDRunner` performs final_step → ΔE → (maybe_reject) →
  initial_step at the FIRST minibatch of the epoch following each sampling
  epoch, reusing that minibatch's gradient (inference.py:304-365).
* samples are saved at the END of each sampling epoch, *before* the next
  boundary's M-H decision — matching the reference, whose
  `reject_samples_` post-processing resolves rejected samples afterwards.
"""
from __future__ import annotations

import math
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import mcmc
from ..mcmc.segmented import vclip
from .schedules import make_schedule


class SGLDRunner:
    def __init__(self, model, train_data, test_data, epochs_per_cycle,
                 warmup_epochs, sample_epochs, learning_rate=1e-2, skip=1,
                 metrics_skip=1, temperature=1.0, data_mult=1.0, momentum=0.0,
                 sampling_decay=True, grad_max=1e6, cycles=1,
                 precond_update=None, metrics_saver=None, model_saver=None,
                 reject_samples=False, flip_on_reject=False,
                 batch_size=128, eval_batch_size=None,
                 augment_fn: Optional[Callable] = None,
                 init_params=None, init_model_state=None, key=None,
                 checkpoint_path=None, checkpoint_every=None,
                 profile_dir=None, profile_epoch=1, profile_max_steps=50,
                 matmul_precision=None, compute_dtype=None,
                 packing="hybrid"):
        self.model = model
        self.train_x, self.train_y = train_data
        if test_data is not None:
            self.test_x, self.test_y = test_data
        else:
            self.test_x = self.test_y = None

        assert warmup_epochs >= 0 and sample_epochs >= 0
        assert epochs_per_cycle >= warmup_epochs + sample_epochs
        self.epochs_per_cycle = epochs_per_cycle
        self.descent_epochs = epochs_per_cycle - warmup_epochs - sample_epochs
        self.warmup_epochs = warmup_epochs
        self.sample_epochs = sample_epochs
        self.skip = skip
        self.metrics_skip = metrics_skip
        self.num_samples = sample_epochs // skip
        assert sample_epochs % skip == 0

        self.learning_rate = learning_rate
        self.temperature = temperature
        self.N = int(self.train_x.shape[0])
        self.eff_num_data = self.N * data_mult
        self.momentum = momentum
        self.sampling_decay = sampling_decay
        self.grad_max = grad_max
        self.cycles = cycles
        self.precond_update = precond_update
        self.metrics_saver = metrics_saver
        self.model_saver = model_saver
        self.reject_samples = reject_samples
        # GHMC momentum-flip correction on rejection (verlet_sgld.py
        # maybe_reject flip_on_reject); the reference never flips
        self.flip_on_reject = flip_on_reject
        self.batch_size = int(batch_size)
        self.eval_batch_size = int(eval_batch_size or batch_size)
        self.augment_fn = augment_fn
        # full chain-state checkpointing (strictly better than the
        # reference's sample-warm-start resume, see io/checkpoint.py)
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = checkpoint_every
        # jax.profiler trace of one epoch (reference has no tracing, §5.1).
        # The trace covers at most `profile_max_steps` minibatches: a
        # full-epoch device trace of a real model hangs remote-device
        # transports on event volume (PERF.md), so the profiled epoch
        # runs its first chunk in a separate traced dispatch.
        self.profile_dir = profile_dir
        self.profile_epoch = profile_epoch
        self.profile_max_steps = int(profile_max_steps)
        # 'bfloat16' runs MXU matmuls/convs at native bf16 (the standard
        # JAX/TPU default and the analogue of the reference's TF32-on-GPU):
        # measured grad error 5e-2 relative, 5x below the minibatch noise
        # SG-MCMC is built to tolerate. None = leave the JAX default.
        self.matmul_precision = matmul_precision
        # e.g. 'bfloat16': run the net forward/backward in reduced
        # precision (params+inputs cast down, likelihood/prior reductions
        # stay f32) — see models/base.py log_likelihood(compute_dtype=...).
        self.compute_dtype = (jnp.dtype(compute_dtype)
                              if compute_dtype is not None else None)
        # chain-state representation: 'flat' (single packed vector, ONE
        # fused update — measured fastest for a single chain) or
        # 'segmented' (per-leaf pytree — removes the flat<->conv-layout
        # relayouts that dominate VMAPPED chains; the multi-chain runner
        # defaults to it. PERF.md "The flat-pack tax"). Same
        # distributions; PRNG streams differ (tests/test_segmented.py).
        self.packing = packing

        self.n_full = self.N // self.batch_size
        self.tail = self.N - self.n_full * self.batch_size
        self.steps_per_epoch = self.n_full + (1 if self.tail else 0)
        self.schedule = make_schedule(
            sampling_decay, self.steps_per_epoch * epochs_per_cycle,
            steps_per_stair=150 * self.steps_per_epoch)

        self.key = key if key is not None else jax.random.key(0)
        k_init, k_chain, self._aug_key, self.key = jax.random.split(
            self.key, 4)
        if init_params is None:
            init_params, model_state = model.init(k_init)
            if init_model_state is None:
                init_model_state = model_state
        if init_model_state is None:
            init_model_state = {}
        self.kernel = self._make_kernel()
        self.chain = self.kernel.init(init_params, k_chain,
                                      **self._init_kwargs())
        self.model_state = init_model_state
        self._samples: Dict[str, list] = {}
        self._sample_steps: list = []
        self._jit_cache: Dict[Any, Callable] = {}
        self._initial_potential = 0.0
        self._total_energy = 0.0

    # -- kernel factory ----------------------------------------------------
    def _make_kernel(self):
        assert self.reject_samples is False, "SGLD cannot reject samples"
        return mcmc.SGLD(num_data=self.eff_num_data, momentum=self.momentum,
                         packing=self.packing)

    def _init_kwargs(self):
        return {}

    # -- jitted pieces -----------------------------------------------------
    def _value_grad_of_batch(self, position, model_state, xb, yb, aug_key):
        if self.augment_fn is not None:
            xb = self.augment_fn(aug_key, xb)
        params = self.kernel.unpack(position)
        fn = self.model.potential_avg_fn(model_state, xb, yb,
                                         self.eff_num_data, train=True,
                                         compute_dtype=self.compute_dtype)
        (pot, (new_model_state, aux)), grads = jax.value_and_grad(
            fn, has_aux=True)(params)
        g = vclip(self.kernel.pack(grads), -self.grad_max, self.grad_max)
        return pot, aux, new_model_state, g

    def _plain_step(self, carry, idx, temperature, tx, ty):
        """one minibatch transition (kernel mid-step) + metrics.
        `tx`/`ty` are the train arrays as TRACED arguments — closing over
        them would bake 100s of MB of constants into the HLO."""
        chain, model_state, step = carry
        # augmentation noise: per-step stream derived from the RUNNER's seed
        # (a fixed key here would correlate augmentations across replicate
        # runs with different seeds); fold_in(step) keeps it deterministic
        # per step so resumed runs replay identical augmentations
        key_aug = jax.random.fold_in(self._aug_key, step) \
            if self.augment_fn is not None else None
        xb = jnp.take(tx, idx, axis=0)
        yb = jnp.take(ty, idx, axis=0)
        pot, aux, model_state, g = self._value_grad_of_batch(
            chain.position, model_state, xb, yb, key_aug)
        lr = self.learning_rate * self.schedule(step)
        chain, kmetrics = self.kernel.step(chain, g, lr, temperature)
        metrics = {
            "loss": aux["loss"], "acc": aux["acc"],
            "log_prior": aux["log_prior"], "potential": pot, "lr": lr,
            "est_temperature": self.kernel.packer.pack_leaf_scalars(
                kmetrics["est_temperature"]),
            "est_config_temp": self.kernel.packer.pack_leaf_scalars(
                kmetrics["est_config_temp"]),
        }
        return (chain, model_state, step + 1), metrics

    def _get_jit(self, name, builder, donate_argnums=()):
        """jit with per-dispatch caching. `donate_argnums` marks the
        chain/model-state carries for buffer donation (in-place update,
        like the reference's `p.add_()` — see jit_utils.donating_jit);
        it is dropped automatically on backends that reject donation."""
        if name not in self._jit_cache:
            from ..jit_utils import donating_jit
            fn = builder()
            if self.matmul_precision is not None:
                prec, fn0 = self.matmul_precision, fn

                def fn(*args, _fn0=fn0, _prec=prec, **kw):
                    with jax.default_matmul_precision(_prec):
                        return _fn0(*args, **kw)
            self._jit_cache[name] = donating_jit(
                fn, donate_argnums=donate_argnums)
        return self._jit_cache[name]

    def _scan_steps(self, chain, model_state, step, idxs, temperature):
        "jitted scan over a (n, B) batch-index array of plain steps"
        n = idxs.shape[0]
        B = idxs.shape[1]

        def builder():
            def f(chain, model_state, step, idxs, temperature, tx, ty):
                def body(carry, idx):
                    return self._plain_step(carry, idx, temperature, tx, ty)
                carry, ms = jax.lax.scan(
                    body, (chain, model_state, step), idxs)
                return carry, ms
            return f
        f = self._get_jit(("scan", n, B), builder, donate_argnums=(0, 1))
        (chain, model_state, step), ms = f(
            chain, model_state, jnp.asarray(step), idxs,
            jnp.asarray(temperature, self.chain.position.dtype),
            self.train_x, self.train_y)
        return chain, model_state, ms

    def _single_step(self, chain, model_state, step, idx, temperature):
        B = idx.shape[0]

        def builder():
            def f(chain, model_state, step, idx, temperature, tx, ty):
                carry, m = self._plain_step((chain, model_state, step), idx,
                                            temperature, tx, ty)
                return carry, m
            return f
        f = self._get_jit(("single", B), builder, donate_argnums=(0, 1))
        (chain, model_state, step), m = f(
            chain, model_state, jnp.asarray(step), idx,
            jnp.asarray(temperature, self.chain.position.dtype),
            self.train_x, self.train_y)
        return chain, model_state, m

    # -- epoch orchestration ----------------------------------------------
    def _epoch_perm(self, cycle, epoch):
        self.key, sub = jax.random.split(self.key)
        return jax.random.permutation(sub, self.N)

    def _is_sampling_epoch(self, epoch):
        epoch = epoch % self.epochs_per_cycle
        sampling_epoch = epoch - (self.descent_epochs + self.warmup_epochs)
        return (0 <= sampling_epoch) and (sampling_epoch % self.skip == 0)

    def _run_epoch(self, cycle, epoch, step, boundary, profile=False):
        """Run one epoch; returns (new_step, epoch_metrics_dict).
        `boundary` marks that the first minibatch must perform the
        runner-specific boundary transition (no-op for plain SGLD).
        `profile` wraps the first <= profile_max_steps minibatches in a
        jax.profiler trace (its own dispatch, so the trace stays small
        enough not to hang remote transports)."""
        temperature = 0.0 if epoch < self.descent_epochs else self.temperature
        perm = self._epoch_perm(cycle, epoch)
        idx_full = perm[: self.n_full * self.batch_size].reshape(
            self.n_full, self.batch_size)
        metrics_list = []
        boundary_metrics = None

        chain, model_state = self.chain, self.model_state
        start = 0
        if boundary is not None:
            chain, model_state, m, boundary_metrics = self._boundary(
                chain, model_state, step, idx_full[0], temperature, boundary)
            metrics_list.append(jax.tree_util.tree_map(
                lambda a: jnp.asarray(a)[None], m))
            step += 1
            start = 1
        if profile and self.n_full - start > self.profile_max_steps:
            cap = self.profile_max_steps
            with jax.profiler.trace(self.profile_dir):
                chain, model_state, ms = self._scan_steps(
                    chain, model_state, step, idx_full[start:start + cap],
                    temperature)
                jax.block_until_ready(chain.position)
                np.asarray(ms["potential"][-1])  # force readback: trace ends
            metrics_list.append(ms)
            step += cap
            start += cap
            profile = False  # remainder runs untraced below
        if self.n_full - start > 0:
            scan = self._scan_steps
            if profile:  # short epoch: trace fits in one dispatch
                def scan(*a, **k):
                    with jax.profiler.trace(self.profile_dir):
                        out = self._scan_steps(*a, **k)
                        jax.block_until_ready(out[0].position)
                        return out
            chain, model_state, ms = scan(
                chain, model_state, step, idx_full[start:], temperature)
            metrics_list.append(ms)
            step += self.n_full - start
        if self.tail:
            idx_tail = perm[self.n_full * self.batch_size:]
            chain, model_state, m = self._single_step(
                chain, model_state, step, idx_tail, temperature)
            metrics_list.append(jax.tree_util.tree_map(
                lambda a: jnp.asarray(a)[None], m))
            step += 1
        self.chain, self.model_state = chain, model_state

        metrics = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *metrics_list)
        return step, metrics, boundary_metrics

    def _boundary(self, chain, model_state, step, idx, temperature, kind):
        "plain SGLD has no boundary transitions; run a normal step"
        chain, model_state, m = self._single_step(
            chain, model_state, step, idx, temperature)
        return chain, model_state, m, {"rejected": None, "delta_energy": None,
                                       "total_energy": None}

    # -- checkpoint / resume ------------------------------------------------
    def save_checkpoint(self, path, next_epoch_index, step, extra=None):
        from ..io.checkpoint import save_chain_checkpoint
        meta = {"next_epoch_index": int(next_epoch_index), "step": int(step),
                "initial_potential": float(self._initial_potential),
                "total_energy": float(self._total_energy)}
        meta.update(extra or {})
        save_chain_checkpoint(path, self.chain, self.model_state, self.key,
                              meta)

    def restore_checkpoint(self, path):
        """returns (next_epoch_index, step); restores all runner state.
        The full metadata dict is kept in `self._ckpt_meta` for
        subclass-specific fields."""
        from ..io.checkpoint import load_chain_checkpoint
        chain, mstate, rkey, meta = load_chain_checkpoint(
            path, self.chain, self.model_state, self.key)
        self.chain, self.model_state, self.key = chain, mstate, rkey
        self._initial_potential = float(meta["initial_potential"])
        self._total_energy = float(meta["total_energy"])
        self._ckpt_meta = meta
        return int(meta["next_epoch_index"]), int(meta["step"])

    # -- public API --------------------------------------------------------
    def run(self, progressbar=False, resume_from=None):
        step = 0
        start_e = 0
        if resume_from is not None:
            start_e, step = self.restore_checkpoint(resume_from)
        else:
            # initial momentum refresh at self.temperature — even when the
            # first epochs are descent (T=0) epochs. Verified against the
            # reference: it constructs the optimizer with
            # temperature=self.temperature (inference.py:94) and calls
            # sample_momentum() (inference.py:120) BEFORE the epoch loop
            # lowers the group temperature to 0 (inference.py:142).
            self.chain = self.kernel.sample_momentum(self.chain,
                                                     self.temperature)
        total_epochs = self.cycles * self.epochs_per_cycle
        iterator = range(start_e, total_epochs)
        if progressbar:
            import tqdm
            iterator = tqdm.tqdm(iterator, desc="epochs")
        for e in iterator:
            cycle, epoch = divmod(e, self.epochs_per_cycle)
            boundary = None
            if e == 0:
                boundary = "first"
            elif self._is_sampling_epoch(epoch - 1):
                boundary = "sample"
            profile = (self.profile_dir is not None
                       and e == self.profile_epoch)
            step = self._finish_epoch(cycle, epoch, step, boundary,
                                      profile=profile)
            if (self.checkpoint_path is not None
                    and self.checkpoint_every is not None
                    and (e + 1) % self.checkpoint_every == 0):
                self.save_checkpoint(self.checkpoint_path, e + 1, step)
        # final boundary step to log metrics for the last sample
        # (reference inference.py:182-187)
        perm = self._epoch_perm(self.cycles, 0)
        idx = perm[: self.batch_size]
        boundary = "sample" if self._is_sampling_epoch(-1) else None
        if boundary:
            self.chain, self.model_state, m, bm = self._boundary(
                self.chain, self.model_state, step, idx, self.temperature,
                boundary)
        else:
            self.chain, self.model_state, m = self._single_step(
                self.chain, self.model_state, step, idx, self.temperature)
            bm = None
        self._log_metrics(step, jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], m), bm, corresponds_to_sample=bool(boundary))
        if self.metrics_saver is not None:
            self.metrics_saver.flush()

    def _finish_epoch(self, cycle, epoch, step, boundary, profile=False):
        step0 = step
        t0 = time.perf_counter()
        step, metrics, boundary_metrics = self._run_epoch(
            cycle, epoch, step, boundary, profile=profile)
        jax.block_until_ready(self.chain.position)
        epoch_s = time.perf_counter() - t0
        if not np.all(np.isfinite(np.asarray(metrics["potential"]))):
            raise ValueError("Potential is NaN")
        self._log_metrics(step0, metrics, boundary_metrics,
                          corresponds_to_sample=(boundary is not None))
        if self.metrics_saver is not None:
            # after _log_metrics: the saver's step cursor is monotone
            self.metrics_saver.add_scalar("timings/epoch_s", epoch_s,
                                          step - 1)
            self.metrics_saver.add_scalar(
                "timings/steps_per_s", (step - step0) / max(epoch_s, 1e-9),
                step - 1)
        if self.precond_update is not None and self._precond_due(epoch):
            self.chain = self.kernel.update_preconditioner(self.chain)
        if self._is_sampling_epoch(epoch):
            self._save_sample(step - 1)
        self._evaluate_and_log(step - 1)
        if self.metrics_saver is not None:
            self.metrics_saver.flush(every_s=10, keep_last_row=True)
        return step

    def _precond_due(self, epoch):
        return epoch % self.precond_update == 0

    # -- samples -----------------------------------------------------------
    def current_state_dict(self):
        "params + model buffers, like the reference state_dict"
        params = self.kernel.params_of(self.chain)
        out = {k: np.asarray(v) for k, v in params.items()}
        out.update({k: np.asarray(v) for k, v in self.model_state.items()})
        return out

    def _save_sample(self, step):
        sd = self.current_state_dict()
        if self.model_saver is None:
            for k, v in sd.items():
                self._samples.setdefault(k, []).append(v)
            self._sample_steps.append(step)
        else:
            self.model_saver.add_state_dict(sd, step)
            self.model_saver.flush()

    def get_samples(self, keep_steps=False):
        if self.model_saver is None:
            out = {k: np.stack(v) for k, v in self._samples.items()}
            if keep_steps:
                out["steps"] = np.asarray(self._sample_steps)
            return out
        return self.model_saver.load_samples(keep_steps=keep_steps)

    # -- evaluation --------------------------------------------------------
    def _evaluate_and_log(self, step):
        if self.test_x is None:
            return {}
        acc, lp = self._eval_current()
        if self.metrics_saver is not None:
            self.metrics_saver.add_scalar("test/loss", -lp, step)
            self.metrics_saver.add_scalar("test/acc", acc, step)
        return {"test/acc": acc, "test/loss": -lp}

    def _eval_current(self):
        B = self.eval_batch_size
        n = self.test_x.shape[0]
        n_batches = math.ceil(n / B)
        pad = n_batches * B - n

        def builder():
            def f(position, model_state, xs, ys, mask):
                params = self.kernel.unpack(position)

                def body(_, batch):
                    xb, yb, mb = batch
                    fout, _ = self.model.net_apply(params, model_state, xb,
                                                   train=False)
                    lps = self.model.likelihood_log_prob(params, fout, yb)
                    acc = self.model.acc_fn(fout, yb, params)
                    return None, (jnp.sum(lps * mb), jnp.sum(acc * mb))
                _, (lps, accs) = jax.lax.scan(body, None, (xs, ys, mask))
                return jnp.sum(lps) / n, jnp.sum(accs) / n
            return f
        f = self._get_jit(("eval", B, n_batches), builder)
        # zero-pad to whole batches (the mask removes the padding's
        # contribution; slicing test_x[:pad] breaks when pad > n)
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a
        xs = zpad(self.test_x)
        ys = zpad(self.test_y)
        mask = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])
        xs = xs.reshape((n_batches, B) + xs.shape[1:])
        ys = ys.reshape((n_batches, B) + ys.shape[1:])
        mask = mask.reshape(n_batches, B)
        lp, acc = f(self.chain.position, self.model_state, xs, ys, mask)
        return float(acc), float(lp)

    # -- metric logging ----------------------------------------------------
    def _log_metrics(self, step0, metrics, boundary_metrics,
                     corresponds_to_sample=False):
        if self.metrics_saver is None:
            return
        add = self.metrics_saver.add_scalar
        names = self.kernel.packer.names
        est_t = np.asarray(metrics["est_temperature"])
        est_c = np.asarray(metrics["est_config_temp"])
        precond = np.asarray(self.kernel.leaf_precond(self.chain))
        sizes = np.asarray(self.kernel.packer.sizes, dtype=np.float64)
        n_steps = est_t.shape[0]
        scalars = {k: np.asarray(metrics[k])
                   for k in ("loss", "acc", "log_prior", "potential", "lr")}
        # boundary metrics belong to step0-1 — log them BEFORE the per-step
        # loop advances the saver's monotonic step cursor
        if boundary_metrics:
            li = step0 - 1
            if boundary_metrics.get("delta_energy") is not None:
                add("delta_energy", float(boundary_metrics["delta_energy"]), li)
                add("total_energy", float(boundary_metrics["total_energy"]), li)
            if boundary_metrics.get("rejected") is not None:
                add("acceptance/rejected",
                    int(boundary_metrics["rejected"]), li)
        de_wo_pot = (np.asarray(metrics["de_wo_pot"])
                     if "de_wo_pot" in metrics else None)
        for i in range(n_steps):
            step = step0 + i
            # metrics of step t are logged under index t-1, like the
            # reference ("the metrics are valid for the previous step",
            # inference.py:244-248)
            if (step % self.metrics_skip != 0) and i != 0:
                continue
            li = step - 1
            for j, name in enumerate(names):
                add("preconditioner/" + name, float(precond[j]), li)
                add("est_temperature/" + name, float(est_t[i, j]), li)
                add("est_config_temp/" + name, float(est_c[i, j]), li)
            add("est_temperature/all",
                float((est_t[i] * sizes).sum() / sizes.sum()), li)
            add("est_config_temp/all",
                float((est_c[i] * sizes).sum() / sizes.sum()), li)
            add("temperature", float(self.temperature), li)
            for k, v in scalars.items():
                add(k, float(v[i]), li)
            add("acceptance/is_sample",
                int(corresponds_to_sample and i == 0), li)
            # per-step energy drift, like the reference's intermediate-step
            # `delta_energy(initial_potential, loss)` (inference.py:352-354;
            # NB the reference passes `loss`, not `potential`, here — kept);
            # the boundary row (i==0 with boundary_metrics) was logged above
            if de_wo_pot is not None and not (boundary_metrics and i == 0):
                de_i = float(de_wo_pot[i]) + (
                    float(scalars["loss"][i]) - self._initial_potential
                ) * self.kernel.num_data
                add("delta_energy", de_i, li)
                add("total_energy", self._total_energy + de_i, li)


class VerletSGLDRunner(SGLDRunner):
    "GGMC runner with three-phase boundaries (reference inference.py:297-365)."

    def _make_kernel(self):
        return mcmc.VerletSGLD(num_data=self.eff_num_data,
                               momentum=self.momentum,
                               packing=self.packing)

    def _plain_step(self, carry, idx, temperature, tx, ty):
        """Intermediate GGMC step + the potential-free part of the running
        ΔE: the reference logs `delta_energy(initial_potential, loss)` at
        every metrics step (inference.py:352-354); the accumulator and point
        energy are on-device, the potential-difference term is added at log
        time on the host."""
        carry, metrics = super()._plain_step(carry, idx, temperature, tx, ty)
        chain = carry[0]
        # SGLDRunnerReject inherits this with an SGLD kernel, which carries
        # no energy accumulator (ΔE = ∞, reference sgld.py:54-55)
        if isinstance(self.kernel, mcmc.VerletSGLD):
            metrics["de_wo_pot"] = chain.delta_energy_acc + \
                self.kernel._point_energy(chain, chain.grads, metrics["lr"])
        return carry, metrics

    def _init_kwargs(self):
        return {"save_state": self.reject_samples}

    def _is_hmc(self):
        return isinstance(self.kernel, mcmc.HMC)

    def _boundary(self, chain, model_state, step, idx, temperature, kind):
        """kind='first': very first step → initial_step.
        kind='sample': final_step + ΔE (+maybe_reject) + initial_step,
        reusing this minibatch's gradient."""
        B = idx.shape[0]

        def builder_first():
            def f(chain, model_state, step, idx, temperature, tx, ty):
                xb = jnp.take(tx, idx, axis=0)
                yb = jnp.take(ty, idx, axis=0)
                pot, aux, model_state, g = self._value_grad_of_batch(
                    chain.position, model_state, xb, yb, None)
                lr = self.learning_rate * self.schedule(step)
                if self._is_hmc():
                    chain = self.kernel.sample_momentum(chain, temperature)
                chain, km = self.kernel.initial_step(
                    chain, g, lr, temperature,
                    save_state=self.reject_samples)
                de = self.kernel.delta_energy(chain, g, lr, 0.0, 0.0)
                metrics = self._metric_dict(pot, aux, lr, km, chain, g)
                return chain, model_state, metrics, pot, de
            return f

        def builder_boundary():
            def f(chain, model_state, step, idx, temperature,
                  initial_potential, tx, ty):
                xb = jnp.take(tx, idx, axis=0)
                yb = jnp.take(ty, idx, axis=0)
                pot, aux, model_state, g = self._value_grad_of_batch(
                    chain.position, model_state, xb, yb, None)
                lr = self.learning_rate * self.schedule(step)
                chain, km = self.kernel.final_step(chain, g, lr, temperature)
                de = self.kernel.delta_energy(chain, g, lr,
                                              initial_potential, pot)
                if self.reject_samples:
                    chain, rejected, _ = self.kernel.maybe_reject(
                        chain, de, temperature,
                        flip_on_reject=self.flip_on_reject)
                else:
                    rejected = jnp.asarray(False)
                if self._is_hmc():
                    chain = self.kernel.sample_momentum(chain, temperature)
                # initial step reuses the same gradient (possibly rolled
                # back by the rejection)
                chain, _ = self.kernel.initial_step(
                    chain, chain.grads, lr, temperature,
                    save_state=self.reject_samples)
                metrics = self._metric_dict(pot, aux, lr, km, chain,
                                            chain.grads)
                return chain, model_state, metrics, pot, de, rejected
            return f

        dt = self.chain.position.dtype
        if kind == "first":
            f = self._get_jit(("boundary_first", B), builder_first,
                              donate_argnums=(0, 1))
            chain, model_state, metrics, pot, de = f(
                chain, model_state, jnp.asarray(step), idx,
                jnp.asarray(temperature, dt),
                self.train_x, self.train_y)
            self._initial_potential = float(pot)
            self._total_energy = 0.0
            return chain, model_state, metrics, {
                "delta_energy": float(de), "total_energy": 0.0,
                "rejected": (False if self.reject_samples else None)}
        else:
            f = self._get_jit(("boundary_sample", B), builder_boundary,
                              donate_argnums=(0, 1))
            chain, model_state, metrics, pot, de, rejected = f(
                chain, model_state, jnp.asarray(step), idx,
                jnp.asarray(temperature, dt),
                jnp.asarray(self._initial_potential, dt),
                self.train_x, self.train_y)
            # base potential for the next segment's ΔE: on rejection the
            # chain rolled back to the saved state, whose potential is the
            # OLD initial_potential. (The reference overwrites it with the
            # rejected proposal's potential — inference.py:344-346 — biasing
            # the segment after a rejection; fixed deliberately, same as
            # reject.py and parallel/multichain.py.)
            if not (self.reject_samples and bool(rejected)):
                self._initial_potential = float(pot)
            self._total_energy += float(de)
            return chain, model_state, metrics, {
                "delta_energy": float(de),
                "total_energy": self._total_energy,
                "rejected": (bool(rejected) if self.reject_samples else None)}

    def _metric_dict(self, pot, aux, lr, km, chain=None, g=None):
        out = {
            "loss": aux["loss"], "acc": aux["acc"],
            "log_prior": aux["log_prior"], "potential": pot, "lr": lr,
            "est_temperature": self.kernel.packer.pack_leaf_scalars(
                km["est_temperature"]),
            "est_config_temp": self.kernel.packer.pack_leaf_scalars(
                km["est_config_temp"]),
        }
        if chain is not None:
            # same key as _plain_step so boundary and scan metrics share a
            # pytree structure (they are concatenated per epoch); the
            # boundary row's logged ΔE comes from boundary_metrics instead
            out["de_wo_pot"] = chain.delta_energy_acc + \
                self.kernel._point_energy(chain, g, lr)
        return out


class HMCRunner(VerletSGLDRunner):
    def _make_kernel(self):
        assert self.temperature == 1.0, "HMC only implemented for temperature=1."
        assert self.momentum == 1.0, "HMC only works with momentum=1."
        assert self.descent_epochs == 0, \
            "HMC not implemented for descent epochs with temp=0."
        return mcmc.HMC(num_data=self.eff_num_data, packing=self.packing)
