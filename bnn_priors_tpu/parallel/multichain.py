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
import time
import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import mcmc
from ..mcmc.segmented import SegVec, vclip, vdot, vsum
from ..inference.reject import exact_potential_and_grad
from ..inference.schedules import make_schedule
from ..jit_utils import donating_jit
from .chains import init_chains_diverse
from .distributed import host_value, local_chain_rows, put_chains


def _regroup(tree, G, Kg):
    "leading chain axis (K, ...) -> (G, Kg, ...) dispatch groups"
    return jax.tree_util.tree_map(
        lambda a: a.reshape((G, Kg) + a.shape[1:]), tree)


def _ungroup(tree, lead=0):
    "(..., G, Kg, ...) -> (..., G*Kg, ...) with `lead` leading dims kept"
    return jax.tree_util.tree_map(
        lambda a: a.reshape(a.shape[:lead] + (a.shape[lead] * a.shape[lead + 1],)
                            + a.shape[lead + 2:]), tree)


class MultiChainRunner:
    """Cyclical SG-MCMC over K vmapped chains (descent/warmup/sampling
    phases, cosine cycles). Non-reject kernels (SGLD / VerletSGLD mid
    steps); per-chain temperatures enable tempering-curve sweeps."""

    kernel_init_kwargs: dict = {}  # reject variants add save_state slots

    # Measured on TPU v5e (PERF.md r5 K-curve, hybrid state + bf16):
    # aggregate steps/s/chip peaks at K=3-4/dispatch (K=1 1081, K=2 1312,
    # K=3 1362, K=4 1334, K=5 1313, K=6 1247, K=8 1177). The warning threshold
    # matches the measured peak = CHAIN_GROUP_TARGET: anything above it
    # means dispatch grouping was disabled or could not split the bank,
    # and aggregate throughput regresses off the peak.
    MAX_EFFICIENT_CHAINS_PER_DEVICE = 4
    # measured aggregate steps/s/chip per chains-per-dispatch (PERF.md r5
    # hybrid K-curve); _dispatch_groups prefers the fastest divisor
    MEASURED_GROUP_RATES = {1: 1081, 2: 1312, 3: 1362, 4: 1334,
                            5: 1313, 6: 1247, 8: 1177}

    def __init__(self, model, train_data, n_chains, temperatures=1.0,
                 kernel="VerletSGLD", learning_rate=1e-2, momentum=0.994,
                 sampling_decay="cosine", batch_size=128, cycles=1,
                 epochs_per_cycle=1, warmup_epochs=0, sample_epochs=1,
                 skip=1, grad_max=1e6, precond_update=None,
                 data_mult=1.0, mesh: Optional[Mesh] = None, key=None,
                 dtype=jnp.float32, augment_fn=None, model_savers=None,
                 init_params_fn=None, compute_dtype=None,
                 metrics_savers=None, metrics_skip=1, test_data=None,
                 eval_batch_size=None, packing="hybrid",
                 chain_group_size=None, eval_skip=1, pipeline=True):
        self.model = model
        # chain-state representation; 'hybrid' (default) keeps conv
        # kernels native (no flat<->conv relayout) and fuses the small
        # leaves into one packed segment - measured fastest at every K
        # (PERF.md r5 packing x K grid)
        self.packing = packing
        # per-device chains per dispatch group (None = auto sweet spot,
        # 0 = one big vmap); see _dispatch_groups
        self.chain_group_size = chain_group_size
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
        # e.g. 'bfloat16': mixed-precision net forward/backward for the
        # minibatch steps (models/base.py log_likelihood); the exact-grad
        # M-H boundary (reject.py) always stays full precision.
        self.compute_dtype = (jnp.dtype(compute_dtype)
                              if compute_dtype is not None else None)
        self.schedule = make_schedule(
            sampling_decay, self.n_full * epochs_per_cycle,
            steps_per_stair=150 * self.n_full)

        temps = jnp.broadcast_to(jnp.asarray(temperatures, dtype),
                                 (self.n_chains,))
        self.temperatures = temps

        self.key = key if key is not None else jax.random.key(0)
        k_chains, self.key = jax.random.split(self.key)
        kernel_cls = {"SGLD": mcmc.SGLD, "VerletSGLD": mcmc.VerletSGLD,
                      "HMC": mcmc.HMC}[kernel]
        if kernel == "HMC":
            # OurHMC semantics (reference HMCRunner, inference.py): T=1,
            # momentum=1, no descent phase; momenta are fully refreshed
            # between trajectories (here: after every sampling epoch, plus
            # the initial refresh — the single-chain boundary cadence).
            assert bool(jnp.all(temps == 1.0)), \
                "HMC kernel requires temperature=1 for every chain"
            assert self.descent_epochs == 0, \
                "HMC not implemented for descent (T=0) epochs"
            # `momentum` is ignored: the HMC kernel forces momentum=1
            self.kernel = mcmc.HMC(num_data=self.eff_num_data,
                                   packing=self.packing)
        else:
            self.kernel = kernel_cls(num_data=self.eff_num_data,
                                     momentum=momentum,
                                     packing=self.packing)
        # Chain init is hundreds of tiny eager prior-sample ops per chain;
        # through a remote device transport that is ~25 s PER CHAIN. Build
        # the states on the host CPU backend and ship only the packed
        # vectors to the accelerator in one transfer.
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            if init_params_fn is not None:
                # explicit per-chain init (he-initialization, warm
                # starts): params_fn(chain_index, key) -> params dict
                from .chains import init_chains_from_fn
                self.states = init_chains_from_fn(
                    self.kernel, k_chains, self.n_chains, init_params_fn,
                    init_kwargs=self.kernel_init_kwargs)
            else:
                self.states = init_chains_diverse(
                    self.kernel, model, k_chains, self.n_chains,
                    dtype=dtype, init_kwargs=self.kernel_init_kwargs)
            _, model_state = model.init(jax.random.key(0), dtype=dtype)
            self.model_states = jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(
                    v, (self.n_chains,) + v.shape).copy(), model_state)
        if mesh is not None:
            self.states = put_chains(self.states, mesh)
            self.model_states = put_chains(self.model_states, mesh)
        else:
            dev = jax.devices()[0]
            self.states, self.model_states = jax.device_put(
                (self.states, self.model_states), dev)
        # multi-host (jax.distributed): this process owns only the chains
        # on its local devices — sample streaming is rank-aware (each host
        # writes its own chains' banks), diagnostics use tiny replicated
        # gathers (distributed.host_value)
        self._multiprocess = mesh is not None and jax.process_count() > 1
        if self._multiprocess:
            self.local_chains = sorted(local_chain_rows(
                jax.tree_util.tree_leaves(self.states.position)[0]).keys())
        else:
            self.local_chains = list(range(self.n_chains))
        # optional list of per-chain HDF5ModelSaver-like objects: samples
        # stream to disk instead of accumulating in host memory (a 300-
        # sample ResNet sweep would otherwise hold tens of GB). On
        # multi-host runs, entries for chains NOT local to this process
        # may be None (they are never touched here).
        assert model_savers is None or len(model_savers) == self.n_chains
        self.model_savers = model_savers
        # optional per-chain metrics savers (HDF5Metrics-like): turns on
        # STEP-granular diagnostic streaming (est_temperature/…,
        # est_config_temp/…, loss/potential/lr per minibatch step, subject
        # to `metrics_skip`) — the reference's logging cadence
        # (inference.py:262-294), which the kinetic-temperature χ²
        # diagnostic (reference plot.py:85-141) needs. Entries for
        # non-local chains may be None on multi-host runs.
        assert metrics_savers is None or len(metrics_savers) == self.n_chains
        self.metrics_savers = metrics_savers
        self.metrics_skip = int(metrics_skip)
        # optional test set: per-epoch per-chain test/acc + test/loss
        # (reference inference.py:199-213), one vmapped eval per epoch
        if test_data is not None:
            self.test_x, self.test_y = test_data
            self.eval_batch_size = int(eval_batch_size or batch_size)
        else:
            self.test_x = self.test_y = None
        self._eval_fn = None
        self._total_energies = np.zeros(self.n_chains)
        self._samples = []
        self._epoch_fn = None
        self.nan_chains: set = set()
        # eval cadence: test eval every `eval_skip` epochs (+ always the
        # final epoch); 0/None disables. The reference evaluates every
        # epoch (inference.py:199-213) = eval_skip=1, the default.
        self.eval_skip = 0 if eval_skip is None else int(eval_skip)
        # one-epoch-deep dispatch pipeline (see run()); False = strictly
        # synchronous per-epoch host work, for debugging
        self.pipeline = bool(pipeline)
        self._snap_fn = None
        self._snap_unpack_fn = None
        self._temps_cache = None
        self._warn_chain_regime()

    def _warn_chain_regime(self):
        """Measured-throughput guard (VERDICT r3 #8): the chain axis has a
        measured efficient regime on TPU; configs outside it silently run
        slower than sequential chains. Dispatch-group batching
        (_dispatch_groups) handles large banks automatically, so this
        only fires when grouping is disabled or cannot split the bank.
        CPU runs (tests) are exempt."""
        if jax.default_backend() not in ("tpu", "axon"):
            return
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        _, Kg = self._dispatch_groups()
        k_per_dev = Kg / max(n_dev, 1)
        if k_per_dev > self.MAX_EFFICIENT_CHAINS_PER_DEVICE:
            warnings.warn(
                f"{Kg} chains per dispatch on {n_dev} device(s) = "
                f"{k_per_dev:.0f}/chip exceeds the measured throughput "
                f"sweet spot (~{self.CHAIN_GROUP_TARGET}/chip, PERF.md "
                "K-curve): aggregate steps/s regresses. Leave "
                "chain_group_size=None for automatic dispatch grouping, "
                "or use more devices (n_devices).")
        if k_per_dev > 1 and self.compute_dtype != jnp.dtype(jnp.bfloat16):
            warnings.warn(
                "multi-chain vmap in float32 is sequential-equivalent on "
                "TPU (PERF.md: the masked-dense grouped-conv rewrite "
                "cancels the chain-axis win); set compute_dtype='bfloat16' "
                "for the measured 1.7x chain-axis speedup.")
        # watchdog guard: some transports (the axon tunnel: measured
        # ~60s, PERF.md r5) kill any single dispatch that runs too long.
        # One epoch is one dispatch covering ALL chains, so estimate its
        # duration from the measured per-chip rates and warn early
        # instead of dying mid-run with "TPU worker process crashed".
        rate = self.MEASURED_GROUP_RATES.get(
            int(k_per_dev), min(self.MEASURED_GROUP_RATES.values()))
        est_s = self.n_chains * self.n_full / (rate * max(n_dev, 1))
        if est_s > 50.0:
            warnings.warn(
                f"one epoch dispatch covers {self.n_chains} chains x "
                f"{self.n_full} steps ~= {est_s:.0f}s of device time; "
                "transports with a per-dispatch watchdog (~60s on the "
                "axon tunnel) will kill the worker. Split the bank into "
                "sequential programs (sweep_tempering "
                "max_chains_per_program) or use more devices.")

    def _host(self, tree):
        "device->host; works for multi-host global arrays (tiny gathers)"
        return host_value(tree, self.mesh if self._multiprocess else None)

    # -- jitted epoch ------------------------------------------------------
    def _build_epoch_fn(self):
        kernel, model = self.kernel, self.model
        lr0, schedule = self.learning_rate, self.schedule
        grad_max, eff = self.grad_max, self.eff_num_data
        augment_fn = self.augment_fn
        compute_dtype = self.compute_dtype

        # metrics savers present → compute the full per-leaf reference
        # metric set inside the scan (kernel calc_metrics: segment
        # reductions, ~1% of step cost) and stream it; otherwise keep the
        # cheap aggregate diagnostics only.
        granular = self.metrics_savers is not None

        def chain_step(state, model_state, idx, step, temperature, tx, ty):
            xb = jnp.take(tx, idx, axis=0)
            yb = jnp.take(ty, idx, axis=0)
            if augment_fn is not None:
                k_aug = jax.random.fold_in(state.key, 12345)
                xb = augment_fn(k_aug, xb)
            fn = model.potential_avg_fn(model_state, xb, yb, eff, train=True,
                                        compute_dtype=compute_dtype)
            (pot, (new_ms, aux)), g = jax.value_and_grad(
                fn, has_aux=True)(kernel.unpack(state.position))
            g = vclip(kernel.pack(g), -grad_max, grad_max)
            # cast: under x64 the f64 cosine schedule must not promote an
            # f32 chain state (the CLI runs f32 even when x64 is enabled)
            lr = jnp.asarray(lr0 * schedule(step), g.dtype)
            state, km = kernel.step(state, g, lr, temperature,
                                    calc_metrics=granular)
            out = {"potential": pot, "acc": aux["acc"]}
            if granular:
                # per-leaf (n_leaves,) vectors, reference inference.py
                # logging scheme; '/all' aggregates happen at log time
                out["est_temperature"] = kernel.packer.pack_leaf_scalars(
                    km["est_temperature"])
                out["est_config_temp"] = kernel.packer.pack_leaf_scalars(
                    km["est_config_temp"])
                out["loss"] = aux["loss"]
                out["log_prior"] = aux["log_prior"]
                out["lr"] = lr
            else:
                # per-chain tempering diagnostics (aggregate over all
                # params): kinetic temperature ||m||^2/d, config
                # temperature <theta,g>N/d
                d = jnp.asarray(kernel.packer.total, g.dtype)
                out["est_temperature"] = \
                    vsum(state.momentum * state.momentum) / d
                out["est_config_temp"] = \
                    vdot(state.position, g) * (kernel.num_data / d)
            return state, new_ms, out

        # Dispatch-group batching: aggregate throughput per chip PEAKS at
        # ~4 vmapped chains and falls beyond (measured K-curve, PERF.md:
        # 1295 agg steps/s at K=4 vs 1010 at K=16). Chains are
        # independent, so a big bank steps as SEQUENTIAL sweet-spot-sized
        # groups inside the same scan — identical trajectories (each
        # chain's update reads only its own state/minibatch/temperature),
        # better MXU economics. G=1 reproduces the plain vmap.
        G, Kg = self._dispatch_groups()
        mesh = self.mesh
        regroup = lambda tree: _regroup(tree, G, Kg)
        ungroup = _ungroup

        def constrain(tree, spec):
            if mesh is None:
                return tree
            sh = NamedSharding(mesh, spec)
            return jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, sh), tree)

        def epoch(states, model_states, idxs, step0, temperatures, tx, ty):
            # idxs: (n_chains, n_batches, B); train data as traced args so
            # the HLO carries no dataset-sized constants
            if G > 1:
                # groups on axis 0 (sequential), sharded chains on axis 1
                states, model_states, idxs, temperatures = constrain(
                    regroup((states, model_states, idxs, temperatures)),
                    P(None, "chains"))

            def body(carry, batch_i):
                states, model_states = carry
                if G == 1:
                    idx = idxs[:, batch_i]
                    states, model_states, m = jax.vmap(
                        chain_step, in_axes=(0, 0, 0, None, 0, None, None)
                    )(states, model_states, idx, step0 + batch_i,
                      temperatures, tx, ty)
                else:
                    def group_step(args):
                        st, ms_g, idx_g, t_g = args
                        return jax.vmap(
                            chain_step, in_axes=(0, 0, 0, None, 0, None,
                                                 None)
                        )(st, ms_g, idx_g, step0 + batch_i, t_g, tx, ty)
                    states, model_states, m = jax.lax.map(
                        group_step,
                        (states, model_states, idxs[:, :, batch_i],
                         temperatures))
                return (states, model_states), m
            (states, model_states), ms = jax.lax.scan(
                body, (states, model_states), jnp.arange(idxs.shape[-2]))
            if G > 1:
                states, model_states = constrain(
                    ungroup((states, model_states)), P("chains"))
                ms = ungroup(ms, lead=1)  # (n_batches, G, Kg, ...) -> K
            return states, model_states, ms

        # donate the chain/model-state carries: the epoch scan updates the
        # chain bank in place (reference torch kernels mutate in place —
        # mcmc/sgld.py:150-152; donation is the XLA analogue and halves
        # peak HBM for the K-chain state). Dropped automatically on
        # backends that reject donation (jit_utils.donating_jit).
        return donating_jit(epoch, donate_argnums=(0, 1))

    # measured per-dispatch chain sweet spot (PERF.md K-curve)
    CHAIN_GROUP_TARGET = 4

    def _dispatch_groups(self):
        """(G, Kg): split the K chains into G sequential dispatch groups
        of Kg = (chains/device ≤ CHAIN_GROUP_TARGET) × n_devices each.
        Honors `chain_group_size` (per-device; None = auto, 0/False =
        no grouping)."""
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        n_local = self.n_chains // max(n_dev, 1)
        if self.n_chains % max(n_dev, 1) != 0 or n_local == 0:
            return 1, self.n_chains
        explicit = self.chain_group_size is not None
        target = self.chain_group_size
        if target is None:
            target = self.CHAIN_GROUP_TARGET
        if not target or n_local <= target:
            return 1, self.n_chains
        divisors = [g for g in range(1, target + 1) if n_local % g == 0]
        if explicit:
            # honor the user's request literally: largest divisor <= it
            d = max(divisors)
        else:
            # auto: among group sizes <= target that divide n_local, pick
            # the one with the highest MEASURED aggregate rate (PERF.md r5
            # hybrid K-curve), e.g. 12 local chains -> groups of 3 (1362)
            # over 4 (1334); unknown sizes fall back to largest-divides
            d = max(divisors,
                    key=lambda g: (self.MEASURED_GROUP_RATES.get(g, 0), g))
        Kg = d * n_dev
        return self.n_chains // Kg, Kg

    def _epoch_idxs(self, cycle=0, epoch=0):
        "(n_chains, n_full, B) independent permutations per chain"
        self.key, sub = jax.random.split(self.key)
        if not hasattr(self, "_perm_fn"):
            def perm(sub):
                keys = jax.random.split(sub, self.n_chains)
                perms = jax.vmap(
                    lambda k: jax.random.permutation(k, self.N))(keys)
                return perms[:, : self.n_full * self.batch_size].reshape(
                    self.n_chains, self.n_full, self.batch_size)
            # jitted: the eager version costs several dispatches per epoch
            # through a remote transport
            self._perm_fn = jax.jit(perm)
        return self._perm_fn(sub)

    def _is_sampling_epoch(self, epoch):
        epoch = epoch % self.epochs_per_cycle
        se = epoch - (self.descent_epochs + self.warmup_epochs)
        return (0 <= se) and (se % self.skip == 0)

    # -- checkpoint/resume (io/checkpoint.py; all chains in one file) -------
    def _checkpoint_meta(self, next_e, step):
        return {"next_epoch_index": next_e, "step": step}

    def _restore_meta(self, meta):
        return int(meta["next_epoch_index"]), int(meta["step"])

    def save_checkpoint(self, path, next_epoch_index, step):
        """Snapshot ALL chains' full state (positions, momenta, RMSProp
        EMAs, preconditioners, rollback slots, PRNG keys) + loop metadata.
        In-memory sample history is NOT checkpointed — stream samples with
        `model_savers` for resumable banks. Multi-host: every process
        participates in the gather, rank 0 writes the file."""
        from ..io import save_chain_checkpoint
        # ALL processes run the gathers (collectives must match across
        # ranks — _checkpoint_meta gathers too); only rank 0 writes
        meta = self._checkpoint_meta(next_epoch_index, step)
        states = self._host(self.states)
        mstates = self._host(dict(self.model_states))
        if jax.process_index() == 0:
            save_chain_checkpoint(path, states, mstates, self.key, meta)

    def restore_checkpoint(self, path):
        """returns (next_epoch_index, step); trajectory continues
        bit-for-bit. Multi-host: every process loads the file (shared
        filesystem) and re-places the state on the global mesh."""
        from ..io import load_chain_checkpoint
        self.states, self.model_states, self.key, meta = \
            load_chain_checkpoint(path, self.states, self.model_states,
                                  self.key)
        if self.mesh is not None:
            self.states = put_chains(self.states, self.mesh)
            self.model_states = put_chains(self.model_states, self.mesh)
        return self._restore_meta(meta)

    def run(self, progressbar=False, resume_from=None, checkpoint_path=None,
            checkpoint_every=None):
        """Run all epochs (see _run_impl). Guarantees the drain worker is
        stopped (pending records written or abandoned) BEFORE an exception
        propagates — callers close the HDF5 savers in their own `finally`,
        which must not race worker-thread writes."""
        try:
            return self._run_impl(progressbar=progressbar,
                                  resume_from=resume_from,
                                  checkpoint_path=checkpoint_path,
                                  checkpoint_every=checkpoint_every)
        except BaseException:
            self._stop_drain_worker_noraise()
            raise

    def _run_impl(self, progressbar=False, resume_from=None,
                  checkpoint_path=None, checkpoint_every=None):
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
        start_e = 0
        step = 0
        if resume_from is not None:
            start_e, step = self.restore_checkpoint(resume_from)
        else:
            self.states = self._sample_momentum_all()
        metrics_hist = []
        total_epochs = self.cycles * self.epochs_per_cycle
        it = range(start_e, total_epochs)
        if progressbar:
            import tqdm
            it = tqdm.tqdm(it, desc="epochs")
        pending = None
        for e in it:
            cycle, epoch = divmod(e, self.epochs_per_cycle)
            temps = self._temps_for(epoch)
            idxs = self._epoch_idxs(cycle, epoch)
            t0 = time.perf_counter()
            self.states, self.model_states, ms = self._epoch_fn(
                self.states, self.model_states, idxs,
                jnp.asarray(step), temps, self.train_x, self.train_y)
            step0 = step
            step += self.n_full
            # dispatch everything that reads this epoch's device state
            # BEFORE mutating/donating it below
            rec = self._dispatch_epoch_tail(e, epoch, step0, step, ms,
                                            temps, t0)
            if (self.precond_update is not None
                    and epoch % self.precond_update == 0):
                self.states = jax.vmap(self.kernel.update_preconditioner)(
                    self.states)
            if (isinstance(self.kernel, mcmc.HMC)
                    and self._is_sampling_epoch(epoch)):
                # OurHMC: trajectory boundary after each sampling epoch —
                # full momentum resample (no M-H; the single-chain
                # HMCRunner refreshes at the same boundaries,
                # runner.py:611,638)
                self.states = self._sample_momentum_all()
            pending = self._advance_pipeline(metrics_hist, pending, rec)
            if (checkpoint_path is not None and checkpoint_every is not None
                    and (e + 1) % checkpoint_every == 0):
                if pending is not None:
                    pending["wall_s"] = time.perf_counter() - pending["t0"]
                    self._submit_drain(metrics_hist, pending)
                    pending = None
                self._flush_drains()  # checkpoint sees all writes
                self.save_checkpoint(checkpoint_path, e + 1, step)
        if pending is not None:
            pending["wall_s"] = time.perf_counter() - pending["t0"]
            self._submit_drain(metrics_hist, pending)
        self._stop_drain_worker()
        self._flush_metrics()
        return metrics_hist

    # -- pipelined epoch tail / drain --------------------------------------
    def _advance_pipeline(self, metrics_hist, pending, rec):
        """One-epoch-deep pipeline: the previous epoch's host work (HDF5
        writes, sample streaming, eval fetch) runs on a DRAIN WORKER
        THREAD after this epoch's device work is dispatched, so it
        overlaps both device compute and the main thread's dispatch work
        (the measured ~0.85 s/epoch production tax, PERF.md r4; the
        inline drain still left ~0.4 s/epoch of host serialization).
        `pipeline=False` drains immediately on the calling thread."""
        if pending is not None:
            # true steady-state wall per epoch = dispatch-to-dispatch delta
            # (epoch_s measures fetch-forced completion, which on a FIFO
            # transport includes any already-enqueued next epoch)
            pending["wall_s"] = rec["t0"] - pending["t0"]
            self._submit_drain(metrics_hist, pending)
        if self.pipeline:
            return rec
        metrics_hist.append(self._drain_epoch(rec))
        return None

    # -- drain worker thread ------------------------------------------------
    def _start_drain_worker(self, metrics_hist):
        import queue
        import threading
        # a worker left over from an exception-aborted run() holds the OLD
        # history list; retire it before starting fresh
        self._stop_drain_worker_noraise()
        self._drain_q = queue.Queue(maxsize=2)  # bounds pipeline depth
        self._drain_errors = []

        def worker():
            while True:
                item = self._drain_q.get()
                try:
                    if item is None:
                        return
                    try:
                        metrics_hist.append(self._drain_epoch(item))
                    except BaseException as e:  # noqa: BLE001 — re-raised
                        self._drain_errors.append(e)
                finally:
                    self._drain_q.task_done()

        self._drain_thread = threading.Thread(
            target=worker, name="drain-worker", daemon=True)
        self._drain_thread.start()

    def _submit_drain(self, metrics_hist, rec):
        # Multi-host: the drain fetches replicated values via collectives
        # (host_value); issuing them from a worker thread would race the
        # main thread's dispatches and the collective ORDER would differ
        # across processes — a deadlock. Drain inline (still after the
        # next epoch's dispatch, so device overlap is kept).
        if not self.pipeline or self._multiprocess:
            metrics_hist.append(self._drain_epoch(rec))
            return
        if getattr(self, "_drain_thread", None) is None:
            self._start_drain_worker(metrics_hist)
        self._raise_drain_errors()
        self._drain_q.put(rec)

    def _flush_drains(self):
        "block until all queued drains are written (checkpoint/end-of-run)"
        if getattr(self, "_drain_thread", None) is not None:
            self._drain_q.join()
            self._raise_drain_errors()

    def _stop_drain_worker(self):
        if getattr(self, "_drain_thread", None) is not None:
            self._drain_q.put(None)
            self._drain_thread.join()
            self._drain_thread = None
            self._raise_drain_errors()

    def _raise_drain_errors(self):
        if getattr(self, "_drain_errors", None):
            err = self._drain_errors[0]
            self._drain_errors = []
            self._stop_drain_worker_noraise()
            raise err

    def _stop_drain_worker_noraise(self):
        if getattr(self, "_drain_thread", None) is not None:
            try:
                self._drain_q.put(None)
                self._drain_thread.join(timeout=30)
            finally:
                self._drain_thread = None

    def _temps_for(self, epoch):
        "per-chain temperatures for the epoch (0 during descent epochs)"
        if self._temps_cache is None:
            self._temps_cache = (
                (jnp.zeros_like(self.temperatures),
                 np.zeros(self.n_chains)),
                (self.temperatures, np.asarray(self.temperatures)))
        return self._temps_cache[int(epoch >= self.descent_epochs)][0]

    def _temps_np(self, epoch):
        return self._temps_cache[int(epoch >= self.descent_epochs)][1]

    def _eval_due(self, e, epoch):
        if self.test_x is None or self.eval_skip <= 0:
            return False
        total = self.cycles * self.epochs_per_cycle
        return ((e + 1) % self.eval_skip == 0) or (e == total - 1)

    def _dispatch_epoch_tail(self, e, epoch, step0, step, ms, temps, t0,
                             include_sample=True):
        """Dispatch (no host sync) all device work that reads the
        just-finished epoch's state: metric-row gather, per-leaf
        preconditioner values, the test evaluation, and a device-side
        staging copy of the sample (the next epoch's buffer donation
        invalidates the live arrays before the pipelined drain fetches
        them). Returns the drain record."""
        ms_sel, sel = self._select_epoch_metrics(ms, step0)
        fetch = {"ms": ms_sel}
        if self.metrics_savers is not None:
            fetch["precond"] = jax.vmap(self.kernel.leaf_precond)(self.states)
        if self._eval_due(e, epoch):
            if self._eval_fn is None:
                self._eval_fn = self._build_eval_fn()
            fetch["eval"] = self._eval_fn(self.states.position,
                                          self.model_states,
                                          *self._eval_batches)
        rec = {"epoch": epoch, "step0": step0, "step": step,
               "temps": self._temps_np(epoch), "t0": t0, "sel": sel,
               "fetch": fetch}
        if include_sample and self._is_sampling_epoch(epoch):
            rec["sample"] = self._snapshot_sample()
        self._start_host_copies(rec)
        return rec

    def _start_host_copies(self, rec):
        "kick off async device->host transfers for everything drain reads"
        for leaf in jax.tree_util.tree_leaves(
                (rec["fetch"], rec.get("sample"))):
            start = getattr(leaf, "copy_to_host_async", None)
            if start is not None:
                try:
                    start()
                except Exception:  # transport may not support it
                    pass

    def _drain_epoch(self, rec):
        """Host work for a completed epoch: fetch the (already finished)
        device results, write metrics/eval/samples, return the epoch-end
        entry. The first fetch forces epoch completion, so epoch_s is real
        device wall time even on transports whose block_until_ready
        returns early (bench.py timing note) — but when the drain worker
        is backlogged it additionally includes queue wait; `wall_s`
        (dispatch-to-dispatch) is the authoritative production rate and
        extract_record.py prefers it."""
        host = self._host(rec["fetch"])
        epoch_s = time.perf_counter() - rec["t0"]
        ms_host = host["ms"]
        entry = self._epoch_end_entry(ms_host)
        self._check_finite(entry["potential"])
        self._stream_step_metrics(rec["step0"], ms_host, rec["temps"],
                                  rec["sel"], precond=host.get("precond"))
        if "eval" in host:
            lp, acc = (np.asarray(v) for v in host["eval"])
            entry["test/acc"] = acc
            entry["test/loss"] = -lp
            self._stream_eval(rec["step"], lp, acc)
        self._drain_boundary(rec, host, entry)
        if "sample" in rec:
            self._store_sample(rec["sample"], rec["step"])
        self._stream_timings(rec["step"], epoch_s, rec.get("wall_s"))
        return entry

    def _drain_boundary(self, rec, host, entry):
        "hook: the Reject runner streams its M-H boundary row here"

    def _select_epoch_metrics(self, ms, step0):
        """Device-side gather of ONLY the metric rows that will be used:
        the rows `_stream_step_metrics` logs (metrics_skip cadence) plus
        the epoch's last row (epoch-end diagnostics). With no metrics
        savers just the last row crosses the wire — the full per-step
        tensor is (n_batches, K, n_leaves)-sized and a remote transport
        pays for every byte. Returns (ms_sel_device, sel_indices)."""
        n = self.n_full
        if self.metrics_savers is not None and self.metrics_skip <= 1:
            return ms, None  # every row is logged anyway
        if self.metrics_savers is None:
            keep = [n - 1]
        else:
            keep = [i for i in range(n)
                    if ((step0 + i) % self.metrics_skip == 0) or i == 0]
            if keep[-1] != n - 1:
                keep.append(n - 1)
        sel = np.asarray(keep, dtype=np.int32)
        idx = jnp.asarray(sel)
        ms_sel = jax.tree_util.tree_map(lambda a: a[idx], ms)
        return ms_sel, sel

    def _epoch_end_entry(self, ms_host):
        """last-step diagnostics per chain, with per-leaf est_* vectors
        aggregated to the '/all' scalar (size-weighted mean, the
        single-chain runner's aggregate) for sweep compatibility."""
        entry = {k: np.asarray(v)[-1] for k, v in ms_host.items()}
        if entry["est_temperature"].ndim == 2:  # granular: (K, n_leaves)
            w = np.asarray(self.kernel.packer.sizes, dtype=np.float64)
            for k in ("est_temperature", "est_config_temp"):
                entry[k] = (entry[k] * w).sum(-1) / w.sum()
        return entry

    def _stream_step_metrics(self, step0, ms_host, temps, sel=None,
                             precond=None):
        """Write the per-step per-chain reference metric series
        (inference.py:262-294 cadence: step t's metrics under index t-1,
        every `metrics_skip` steps but always the epoch's first).
        `sel` maps fetched rows to their in-epoch indices when only a
        subset was brought to the host (_select_epoch_metrics).
        Vectorized: one `HDF5Metrics.add_rows` block per chain per epoch
        (column slices of the fetched arrays) instead of tens of
        thousands of per-scalar Python calls (VERDICT r4 item 1)."""
        if self.metrics_savers is None:
            return
        names = self.kernel.packer.names
        sizes = np.asarray(self.kernel.packer.sizes, dtype=np.float64)
        if precond is None:
            precond = self._host(
                jax.vmap(self.kernel.leaf_precond)(self.states))
        precond = np.asarray(precond)
        est_t = np.asarray(ms_host["est_temperature"])  # (n, K, L)
        est_c = np.asarray(ms_host["est_config_temp"])
        scalars = {k: np.asarray(ms_host[k])
                   for k in ("loss", "acc", "log_prior", "potential", "lr")
                   if k in ms_host}
        temps = np.asarray(temps)
        rows = (np.arange(est_t.shape[0], dtype=np.int64) if sel is None
                else np.asarray(sel, dtype=np.int64))
        s_abs = step0 + rows
        r_idx = np.flatnonzero((s_abs % self.metrics_skip == 0) | (rows == 0))
        if r_idx.size == 0:
            return
        li = s_abs[r_idx] - 1
        wsum = sizes.sum()
        n_rows = r_idx.size
        for c in self.local_chains:
            sv = self.metrics_savers[c]
            if sv is None:
                continue
            et, ec = est_t[r_idx, c, :], est_c[r_idx, c, :]
            cols = {}
            for j, nm in enumerate(names):
                cols["preconditioner/" + nm] = np.full(n_rows, precond[c, j])
                cols["est_temperature/" + nm] = et[:, j]
                cols["est_config_temp/" + nm] = ec[:, j]
            cols["est_temperature/all"] = et @ sizes / wsum
            cols["est_config_temp/all"] = ec @ sizes / wsum
            cols["temperature"] = np.full(n_rows, temps[c])
            for k, v in scalars.items():
                cols[k] = v[r_idx, c]
            add_rows = getattr(sv, "add_rows", None)
            if add_rows is not None:
                add_rows(cols, li)
            else:  # duck-typed savers without the batch API
                for r in range(n_rows):
                    for k, v in cols.items():
                        sv.add_scalar(k, float(v[r]), int(li[r]))

    def _stream_timings(self, step, epoch_s, wall_s=None):
        if self.metrics_savers is None:
            return
        for c in self.local_chains:
            sv = self.metrics_savers[c]
            if sv is None:
                continue
            sv.add_scalar("timings/epoch_s", epoch_s, step - 1)
            sv.add_scalar("timings/steps_per_s",
                          self.n_full / max(epoch_s, 1e-9), step - 1)
            sv.add_scalar("timings/aggregate_steps_per_s",
                          self.n_chains * self.n_full / max(epoch_s, 1e-9),
                          step - 1)
            if wall_s is not None:
                # dispatch-to-dispatch: the true pipelined production rate
                sv.add_scalar("timings/wall_s", wall_s, step - 1)
                sv.add_scalar("timings/wall_aggregate_steps_per_s",
                              self.n_chains * self.n_full
                              / max(wall_s, 1e-9), step - 1)
            sv.flush(every_s=10, keep_last_row=True)

    def _flush_metrics(self):
        if self.metrics_savers is None:
            return
        for c in self.local_chains:
            if self.metrics_savers[c] is not None:
                self.metrics_savers[c].flush()

    def _stream_eval(self, step, lp, acc):
        """stream per-chain test/acc + test/loss rows (reference
        inference.py:199-213 cadence; the eval itself is dispatched in the
        epoch tail and fetched in the drain)"""
        if self.metrics_savers is None:
            return
        for c in self.local_chains:
            sv = self.metrics_savers[c]
            if sv is None:
                continue
            sv.add_scalar("test/loss", float(-lp[c]), step - 1)
            sv.add_scalar("test/acc", float(acc[c]), step - 1)

    def _build_eval_fn(self):
        model, kernel = self.model, self.kernel
        B = self.eval_batch_size
        n = int(self.test_x.shape[0])
        n_batches = math.ceil(n / B)
        pad = n_batches * B - n
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a
        xs = zpad(self.test_x).reshape(
            (n_batches, B) + self.test_x.shape[1:])
        ys = zpad(self.test_y).reshape(
            (n_batches, B) + self.test_y.shape[1:])
        mask = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)]).reshape(
            n_batches, B)
        self._eval_batches = (xs, ys, mask)

        def one(position, model_state, xs, ys, mask):
            params = kernel.unpack(position)

            def body(_, batch):
                xb, yb, mb = batch
                fout, _ = model.net_apply(params, model_state, xb,
                                          train=False)
                lps = model.likelihood_log_prob(params, fout, yb)
                acc = model.acc_fn(fout, yb, params)
                return None, (jnp.sum(lps * mb), jnp.sum(acc * mb))
            _, (lps, accs) = jax.lax.scan(body, None, (xs, ys, mask))
            return jnp.sum(lps) / n, jnp.sum(accs) / n

        compute_dtype = self.compute_dtype

        def f(positions, model_states, xs, ys, mask):
            if compute_dtype == jnp.dtype(jnp.bfloat16):
                # evaluation follows the training MXU precision (the
                # single-chain runner applies matmul_precision to its
                # eval dispatch the same way)
                with jax.default_matmul_precision("bfloat16"):
                    return jax.vmap(one, in_axes=(0, 0, None, None, None))(
                        positions, model_states, xs, ys, mask)
            return jax.vmap(one, in_axes=(0, 0, None, None, None))(
                positions, model_states, xs, ys, mask)
        return jax.jit(f)

    def _check_finite(self, potentials):
        """Reference parity (inference.py:221-222) adapted to many chains:
        a NaN potential in one chain must not kill the independent others,
        so warn (once per chain) instead of raising."""
        bad = np.flatnonzero(~np.isfinite(np.asarray(potentials)))
        for c in bad:
            if c not in self.nan_chains:
                self.nan_chains.add(int(c))
                warnings.warn(f"chain {c}: potential is NaN/inf "
                              "(diverged; its samples will be unusable)")

    def _snapshot_sample(self):
        """Stage this epoch's sample into fresh device buffers (an HBM-rate
        copy): the next epoch's donation invalidates the live state before
        the pipelined drain reads it. For streaming savers the snapshot is
        the vmapped `unpack` itself — per-parameter (K, ...) arrays whose
        host fetch is one transfer per parameter, sliced per chain in
        numpy (instead of K×L device-side row gathers)."""
        # NOTE: every leaf must be FORCED through a computation (a+0 /
        # double-not): jit FORWARDS pass-through outputs — `dict(ms)` and
        # a same-shape reshape (the hybrid/segmented native-leaf unpack)
        # return the INPUT buffer, which the next donating dispatch would
        # overwrite under the drain's feet (verified by buffer-pointer
        # identity; caught in the round-5 code review).
        def copy_leaf(a):
            if a.dtype == jnp.bool_:
                return jnp.logical_not(jnp.logical_not(a))
            return a + jnp.zeros((), a.dtype)

        if self.model_savers is not None:
            if self._snap_unpack_fn is None:
                kernel = self.kernel
                self._snap_unpack_fn = jax.jit(
                    lambda pos, ms: jax.tree_util.tree_map(
                        copy_leaf,
                        (jax.vmap(kernel.unpack)(pos), dict(ms))))
            params, ms = self._snap_unpack_fn(self.states.position,
                                              dict(self.model_states))
            return ("unpacked", params, ms)
        if self._snap_fn is None:
            self._snap_fn = jax.jit(
                lambda t: jax.tree_util.tree_map(copy_leaf, t))
        pos, ms = self._snap_fn((self.states.position,
                                 dict(self.model_states)))
        return ("packed", pos, ms)

    def _store_sample(self, sample, step):
        kind, position, model_states = sample
        if kind == "packed":  # in-memory bank keeps packed positions
            self._samples.append((self._host(position),
                                  self._host(dict(model_states)), step))
            return
        sd_all = {**position, **model_states}  # {name: (K, ...)} on device
        if self._multiprocess:
            # rank-aware: each process writes ONLY its local chains' banks
            # (no cross-host sample traffic; the multi-host scale-out
            # story)
            rows = {k: local_chain_rows(v) for k, v in sd_all.items()}
            host_rows = {c: {k: r[c] for k, r in rows.items()}
                         for c in self.local_chains}
        else:
            host = {k: np.asarray(v) for k, v in sd_all.items()}
            host_rows = {c: {k: v[c] for k, v in host.items()}
                         for c in self.local_chains}
        for c in self.local_chains:
            saver = self.model_savers[c]
            if saver is None or c in self.nan_chains:
                # quarantined: a diverged chain's samples must not land
                # in the on-disk bank where post-hoc eval would silently
                # ensemble NaNs
                continue
            saver.add_state_dict(host_rows[c], step=step)

    def _sample_momentum_all(self):
        "per-chain momentum refresh at the chain's own temperature"
        states = self.states
        keys = jax.vmap(lambda k: jax.random.split(k))(states.key)
        noise_keys, new_keys = keys[:, 0], keys[:, 1]

        packer = self.kernel.packer

        def refresh(m, k, T):
            return jnp.sqrt(T) * packer.normal_like(k, m)
        new_m = jax.vmap(refresh)(states.momentum, noise_keys,
                                  self.temperatures)
        return states._replace(momentum=new_m, key=new_keys)

    # -- sample bank -------------------------------------------------------
    def get_samples(self, drop_nan_chains=True) -> Dict[str, np.ndarray]:
        """stacked sample bank dict: each entry (n_samples, n_chains, ...);
        per-chain banks via `chain_samples(c)`. Diverged (NaN) chains are
        dropped from the chain axis by default so they cannot silently
        enter posterior-predictive ensembles; pass drop_nan_chains=False
        for the raw bank."""
        out: Dict[str, list] = {}
        for position, mstate, step in self._samples:
            if not isinstance(position, SegVec):
                position = jnp.asarray(position)
            params = jax.vmap(self.kernel.unpack)(position)
            for k, v in params.items():
                out.setdefault(k, []).append(np.asarray(v))
            for k, v in mstate.items():
                out.setdefault(k, []).append(v)
        bank = {k: np.stack(v) for k, v in out.items()}
        if drop_nan_chains and self.nan_chains:
            keep = [c for c in range(self.n_chains)
                    if c not in self.nan_chains]
            warnings.warn(
                f"dropping diverged chains {sorted(self.nan_chains)} "
                "from the sample bank")
            bank = {k: v[:, keep] for k, v in bank.items()}
        return bank

    def chain_samples(self, chain: int) -> Dict[str, np.ndarray]:
        if chain in self.nan_chains:
            raise ValueError(
                f"chain {chain} diverged (NaN potential); its samples "
                "are quarantined — use get_samples(drop_nan_chains=False)"
                " to inspect them")
        bank = self.get_samples(drop_nan_chains=False)
        return {k: v[:, chain] for k, v in bank.items()}


class MultiChainRunnerReject(MultiChainRunner):
    """The paper's main algorithm — GGMC with exact-gradient M-H boundaries
    (`inference=VerletSGLDReject`, reference `inference_reject.py`) — over K
    vmapped/mesh-sharded chains.

    Everything the single-chain `VerletSGLDRunnerReject` does happens here
    per chain, batched: the exact full-dataset boundary gradient is one
    vmapped scan (K chains sweep the dataset together), `final_step` → ΔE →
    `maybe_reject` → `initial_step` run under vmap so every chain
    accepts/rejects INDEPENDENTLY (the rollback is a `jnp.where` over the
    chain's saved state — impossible with the reference's CPU-copy
    rollback), and minibatch order is fixed per (chain, cycle): each chain
    revisits its own fixed order every epoch of a cycle
    (inference_reject.py:68-84).

    Temperatures may differ per chain, so a whole tempering grid of
    exact-M-H chains is one program."""

    kernel_init_kwargs = {"save_state": True}

    def __init__(self, *args, reject_samples=True, flip_on_reject=False,
                 **kwargs):
        self.flip_on_reject = flip_on_reject
        kwargs.setdefault("kernel", "VerletSGLD")
        self._kernel_name = kwargs["kernel"]
        assert self._kernel_name in ("VerletSGLD", "HMC", "SGLD")
        if self._kernel_name == "SGLD":
            reject_samples = False  # SGLD cannot reject (ΔE = ∞)
        if not reject_samples:
            self.kernel_init_kwargs = {}  # no rollback slots needed
        self.reject_samples = reject_samples
        super().__init__(*args, **kwargs)
        if self._kernel_name == "HMC":
            assert bool(jnp.all(self.temperatures == 1.0)), \
                "HMC only implemented for temperature=1"
        self._perm_key, self.key = jax.random.split(self.key)
        self._chain_perm_keys = jax.random.split(self._perm_key,
                                                 self.n_chains)
        self.tail = self.N - self.n_full * self.batch_size > 0
        self._initial_pots = None
        self._precond_pending = False
        self.delta_energies: list = []   # (n_chains,) per boundary
        self.rejections: list = []       # (n_chains,) bool per boundary
        self.boundary_metrics: list = []  # exact loss/log_prior/potential/acc
        self._exact_fn = None
        self._bfinal_fn = None
        self._binit_fn = None

    def _defer_precond(self):
        return self.reject_samples and self.sample_epochs > 0

    # -- fixed data order per (chain, cycle) --------------------------------
    def _epoch_idxs(self, cycle=0, epoch=0):
        if not hasattr(self, "_perm_fn"):
            def perms_of(keys, cycle):
                perms = jax.vmap(lambda k: jax.random.permutation(
                    jax.random.fold_in(k, cycle), self.N))(keys)
                return perms[:, : self.n_full * self.batch_size].reshape(
                    self.n_chains, self.n_full, self.batch_size)
            self._perm_fn = jax.jit(perms_of)
        return self._perm_fn(self._chain_perm_keys, jnp.asarray(cycle))

    # -- vmapped exact gradient + boundaries ---------------------------------
    def _exact_one(self, position, model_state, tx, ty):
        return exact_potential_and_grad(
            self.model, self.kernel, position, model_state, tx, ty,
            n_full=self.n_full, batch_size=self.batch_size, tail=self.tail,
            N=self.N, eff_num_data=self.eff_num_data, grad_max=self.grad_max)

    def _build_exact_fn(self):
        G, Kg = self._dispatch_groups()

        def f(states, model_states, tx, ty):
            vm = jax.vmap(self._exact_one, in_axes=(0, 0, None, None))
            if G == 1:
                return vm(states.position, model_states, tx, ty)
            # the exact pass is a full-data sweep per chain — run it in
            # the same sweet-spot-sized dispatch groups as the epoch
            grouped = _regroup((states.position, model_states), G, Kg)
            out = jax.lax.map(lambda a: vm(a[0], a[1], tx, ty), grouped)
            return _ungroup(out)
        # states (arg 0) stays live at the caller — donate model_states only
        return donating_jit(f, donate_argnums=(1,))

    def _build_bfinal_fn(self):
        kernel = self.kernel
        lr0, schedule = self.learning_rate, self.schedule

        def one(state, model_state, temperature, initial_pot, lr, tx, ty):
            loss, log_prior, pot, acc, g, model_state = self._exact_one(
                state.position, model_state, tx, ty)
            state, _ = kernel.final_step(state, g, lr, temperature,
                                         calc_metrics=False)
            de = kernel.delta_energy(state, g, lr, initial_pot, pot)
            if self.reject_samples:
                state, rejected, _ = kernel.maybe_reject(
                    state, de, temperature,
                    flip_on_reject=self.flip_on_reject)
            else:
                rejected = jnp.asarray(False)
            # on rejection the chain returns to the saved state, whose
            # potential is the old initial_pot (see inference/reject.py)
            next_pot = jnp.where(rejected, initial_pot, pot)
            m = {"loss": loss, "log_prior": log_prior, "potential": pot,
                 "acc": acc}
            return state, model_state, m, de, rejected, next_pot

        G, Kg = self._dispatch_groups()

        def f(states, model_states, lr_index, temps, initial_pots, tx, ty):
            lr = jnp.asarray(lr0 * schedule(lr_index),
                             states.position.dtype)
            vm = jax.vmap(one, in_axes=(0, 0, 0, 0, None, None, None))
            if G == 1:
                return vm(states, model_states, temps, initial_pots, lr,
                          tx, ty)
            grouped = _regroup((states, model_states, temps, initial_pots),
                               G, Kg)
            out = jax.lax.map(
                lambda a: vm(a[0], a[1], a[2], a[3], lr, tx, ty), grouped)
            return _ungroup(out)
        return donating_jit(f, donate_argnums=(0, 1))

    def _build_binit_fn(self):
        kernel = self.kernel
        lr0, schedule = self.learning_rate, self.schedule
        is_hmc = self._kernel_name == "HMC"

        def one(state, temperature, lr):
            if is_hmc:
                state = kernel.sample_momentum(state, temperature)
            state, _ = kernel.initial_step(state, state.grads, lr,
                                           temperature,
                                           save_state=self.reject_samples,
                                           calc_metrics=False)
            return state

        def f(states, lr_index, temps):
            lr = jnp.asarray(lr0 * schedule(lr_index),
                             states.position.dtype)
            return jax.vmap(one, in_axes=(0, 0, None))(states, temps, lr)
        return donating_jit(f, donate_argnums=(0,))

    # -- checkpoint extras ---------------------------------------------------
    def _checkpoint_meta(self, next_e, step):
        meta = super()._checkpoint_meta(next_e, step)
        meta["initial_pots"] = self._host(self._initial_pots)
        meta["precond_pending"] = self._precond_pending
        meta["perm_key"] = np.asarray(jax.random.key_data(self._perm_key))
        if self.rejections:
            meta["rejections"] = np.stack(self.rejections)
            meta["delta_energies"] = np.stack(self.delta_energies)
        return meta

    def _restore_meta(self, meta):
        self._initial_pots = jnp.asarray(meta["initial_pots"])
        self._precond_pending = bool(meta.get("precond_pending", False))
        self._perm_key = jax.random.wrap_key_data(
            jnp.asarray(meta["perm_key"]))
        self._chain_perm_keys = jax.random.split(self._perm_key,
                                                 self.n_chains)
        if "rejections" in meta:
            self.rejections = list(np.asarray(meta["rejections"]))
            self.delta_energies = list(np.asarray(meta["delta_energies"]))
        return super()._restore_meta(meta)

    # -- main loop -----------------------------------------------------------
    def _run_impl(self, progressbar=False, resume_from=None,
                  checkpoint_path=None, checkpoint_every=None):
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
        if self._exact_fn is None:
            self._exact_fn = self._build_exact_fn()
            self._bfinal_fn = self._build_bfinal_fn()
            self._binit_fn = self._build_binit_fn()

        start_e = 0
        step = 0
        if resume_from is not None:
            start_e, step = self.restore_checkpoint(resume_from)
        else:
            # initial exact gradient + momentum refresh + initial_step
            (loss, log_prior, pot, acc, grads,
             self.model_states) = self._exact_fn(
                self.states, self.model_states, self.train_x, self.train_y)
            self.states = self.states._replace(grads=grads)
            self.states = self._sample_momentum_all()
            self.states = self._binit_fn(self.states, jnp.asarray(0),
                                         self.temperatures)
            self._initial_pots = pot

        metrics_hist = []
        total_epochs = self.cycles * self.epochs_per_cycle
        it = range(start_e, total_epochs)
        if progressbar:
            import tqdm
            it = tqdm.tqdm(it, desc="epochs")
        pending = None
        for e in it:
            cycle, epoch = divmod(e, self.epochs_per_cycle)
            temps = self._temps_for(epoch)
            idxs = self._epoch_idxs(cycle, epoch)
            t0 = time.perf_counter()
            self.states, self.model_states, ms = self._epoch_fn(
                self.states, self.model_states, idxs,
                jnp.asarray(step), temps, self.train_x, self.train_y)
            step0 = step
            step += self.n_full
            # tail reads the PRE-boundary state (eval/precond values match
            # the reference's per-epoch cadence); the sample is staged
            # post-boundary below
            rec = self._dispatch_epoch_tail(e, epoch, step0, step, ms,
                                            temps, t0, include_sample=False)
            precond_due = (self.precond_update is not None
                           and (epoch + 1) % self.precond_update == 0)
            if self._is_sampling_epoch(epoch):
                (self.states, self.model_states, bm, de, rejected,
                 self._initial_pots) = self._bfinal_fn(
                    self.states, self.model_states,
                    jnp.asarray(step - 1), temps, self._initial_pots,
                    self.train_x, self.train_y)
                rec["fetch"]["boundary"] = (bm, de, rejected)
                # sample AFTER maybe_reject: stored samples are already
                # correctly rolled back (inference_reject.py:140-146)
                rec["sample"] = self._snapshot_sample()
                self._start_host_copies(rec)
                # When rejecting, preconditioner updates apply only
                # BETWEEN segments (after maybe_reject, before
                # initial_step) so M stays constant within every M-H
                # segment — see inference/reject.py for the rationale.
                # Without an acceptance test the deferral buys nothing,
                # so follow the reference's per-epoch cadence instead
                # (inference_reject.py:167-168).
                if self._defer_precond():
                    if precond_due or self._precond_pending:
                        self.states = jax.vmap(
                            self.kernel.update_preconditioner)(self.states)
                        self._precond_pending = False
                elif precond_due:
                    self.states = jax.vmap(
                        self.kernel.update_preconditioner)(self.states)
                self.states = self._binit_fn(
                    self.states, jnp.asarray(step), temps)
            elif precond_due:
                if self._defer_precond():
                    self._precond_pending = True
                else:
                    self.states = jax.vmap(
                        self.kernel.update_preconditioner)(self.states)
            pending = self._advance_pipeline(metrics_hist, pending, rec)
            if (checkpoint_path is not None and checkpoint_every is not None
                    and (e + 1) % checkpoint_every == 0):
                if pending is not None:
                    pending["wall_s"] = time.perf_counter() - pending["t0"]
                    self._submit_drain(metrics_hist, pending)
                    pending = None
                self._flush_drains()  # checkpoint sees all writes
                self.save_checkpoint(checkpoint_path, e + 1, step)
        if pending is not None:
            pending["wall_s"] = time.perf_counter() - pending["t0"]
            self._submit_drain(metrics_hist, pending)
        self._stop_drain_worker()
        self._flush_metrics()
        return metrics_hist

    def _drain_boundary(self, rec, host, entry):
        if "boundary" not in host:
            return
        bm, de, rejected = host["boundary"]
        de = np.asarray(de)
        rejected = np.asarray(rejected)
        bm = jax.tree_util.tree_map(np.asarray, bm)
        self.delta_energies.append(de)
        self.rejections.append(rejected)
        self.boundary_metrics.append(bm)
        self._stream_boundary(rec["step"], bm, de, rejected)

    def _stream_boundary(self, step, bm, de, rejected):
        """Stream the M-H boundary row per chain: exact full-data metrics
        under exact/*, plus delta_energy / total_energy /
        acceptance/rejected / acceptance/is_sample, at index step-1 (the
        boundary reuses the epoch's final state)."""
        self._total_energies = self._total_energies + np.asarray(de)
        if self.metrics_savers is None:
            return
        li = step - 1
        for c in self.local_chains:
            sv = self.metrics_savers[c]
            if sv is None:
                continue
            for k in ("loss", "log_prior", "potential", "acc"):
                sv.add_scalar("exact/" + k, float(bm[k][c]), li)
            sv.add_scalar("delta_energy", float(de[c]), li)
            sv.add_scalar("total_energy", float(self._total_energies[c]), li)
            sv.add_scalar("acceptance/is_sample", 1, li)
            if self.reject_samples:
                sv.add_scalar("acceptance/rejected", int(rejected[c]), li)

    def acceptance_rates(self) -> np.ndarray:
        "(n_chains,) fraction of accepted M-H boundaries"
        if not self.rejections:
            return np.ones(self.n_chains)
        rej = np.stack(self.rejections)
        return 1.0 - rej.mean(axis=0)
