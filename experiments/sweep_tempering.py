"""TPU-native tempering sweep: the whole (temperatures x replicates) grid
for one prior runs as vmapped parallel chains in ONE jitted program.

The reference fans the same grid out as ~30 independent processes per
prior (`run_experiment.sh:15-41`, jug task files); here the grid is a
chain axis — one fused update for all chains, per-chain temperature and
PRNG stream, optional `chains` mesh axis over multiple devices. Each chain
still gets its own numbered run directory (config.json / run.json /
samples.pt / result) so `eval_bnn.py` and `notebook_utils.collect_runs`
work unchanged.

    python experiments/sweep_tempering.py with data=cifar10 \
        model=googleresnet weight_prior=gaussian \
        temperatures='[0.001,0.01,0.03,0.1,0.3,1.0]' replicates=5 \
        cycles=60 warmup=45 n_samples=300 lr=0.01
"""
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bnn_priors_tpu.exp.config import RunDirectory, parse_cli

DEFAULTS = dict(
    data="cifar10",
    model="googleresnet",
    compute_dtype=None,   # 'bfloat16': mixed-precision minibatch steps
    width=50,
    depth=3,
    weight_prior="gaussian",
    bias_prior="gaussian",
    weight_loc=0.0,
    weight_scale=1.41,
    bias_loc=0.0,
    bias_scale=1.0,
    weight_prior_params={},
    bias_prior_params={},
    temperatures=[0.001, 0.01, 0.03, 0.1, 0.3, 1.0],
    replicates=5,
    inference="VerletSGLD",  # SGLD | VerletSGLD | VerletSGLDReject |
                             # HMCReject | SGLDReject (exact-gradient M-H)
    n_samples=300,
    cycles=60,
    burnin=0,
    warmup=45,
    skip=1,
    skip_first=50,
    metrics_skip=10,   # per-chain step-granular metrics cadence
    eval_skip=1,       # test-eval every N epochs (0 = off; final epoch always)
    pipeline=True,     # one-epoch-deep dispatch pipeline (False = sync debug)
    lr=0.01,
    momentum=0.994,
    precond_update=1,
    batch_size=128,
    batchnorm=True,
    n_devices=None,                # chains mesh axis size (None = all)
    max_chains_per_program=60,     # partition bigger banks into sequential
                                   # programs: this transport's watchdog
                                   # kills any single dispatch >~60s
                                   # (PERF.md r5; 60-chain epochs are ~27s)
    chain_group_size=None,         # chains/device per dispatch group
                                   # (None = measured sweet spot)
    checkpoint_every=None,         # epochs between full chain-state snapshots
    resume_from=None,              # checkpoint path: continue bit-for-bit
    device="tpu",
    seed=0,
    save_samples=True,
    progressbar=True,
    log_dir=str(Path(__file__).resolve().parent.parent / "logs_sweep"),
    # multi-host (SURVEY §5.8): run the SAME command on every host with
    # num_processes=N process_id=<rank> coordinator_address=host:port;
    # the chains mesh then spans all hosts and each host streams its own
    # chains' sample banks (rank-aware writers).
    coordinator_address=None,
    num_processes=None,
    process_id=None,
)


def main(cfg):
    import jax
    if cfg["device"] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from bnn_priors_tpu.jit_utils import enable_persistent_cache
    enable_persistent_cache()  # tunnel compiles are minutes; warm loads seconds
    from bnn_priors_tpu.parallel import distributed
    # multi-host: must run before the first jax computation; afterwards
    # jax.devices() is the GLOBAL device set spanning all hosts
    distributed.initialize_from_config(cfg)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from bnn_priors_tpu import exp_utils
    from bnn_priors_tpu.evaluate import evaluate_model
    from bnn_priors_tpu.io import HDF5Metrics, HDF5ModelSaver, load_samples
    from bnn_priors_tpu.parallel import (MultiChainRunner,
                                         MultiChainRunnerReject)

    # seed-aware (data=random regenerates identically at eval re-hydration)
    data, _ = exp_utils.get_data_from_config(cfg)
    x_train = jnp.asarray(data.norm.train_X, dtype=jnp.float32)
    y_train = data.norm.train_y
    x_test = jnp.asarray(data.norm.test_X, dtype=jnp.float32)
    y_test = jnp.asarray(data.norm.test_y)

    model = exp_utils.get_model(
        x_train, y_train, cfg["model"], cfg["width"], cfg["depth"],
        cfg["weight_prior"], cfg["weight_loc"], cfg["weight_scale"],
        cfg["bias_prior"], cfg["bias_loc"], cfg["bias_scale"],
        cfg["batchnorm"], cfg["weight_prior_params"],
        cfg["bias_prior_params"])

    temps = [float(t) for t in cfg["temperatures"]]
    reps = int(cfg["replicates"])
    assert temps and reps >= 1, \
        f"need a non-empty temperature grid and replicates>=1, got " \
        f"temperatures={temps} replicates={reps}"
    # chain c = (replicate r, temperature t): c = r * len(temps) + t
    chain_temps = jnp.asarray(temps * reps, jnp.float32)
    n_chains = len(temps) * reps

    devices = jax.devices()  # global set when jax.distributed is up
    n_dev = cfg["n_devices"] or len(devices)
    mesh = None
    local_chains = list(range(n_chains))
    if n_dev > 1:
        assert n_chains % n_dev == 0, (n_chains, n_dev)
        mesh = Mesh(np.asarray(devices[:n_dev]), ("chains",))
        if jax.process_count() > 1:
            local_chains = distributed.local_chain_indices_for_mesh(
                mesh, n_chains)

    assert (cfg["n_samples"] * cfg["skip"]) % cfg["cycles"] == 0
    sample_epochs = cfg["n_samples"] * cfg["skip"] // cfg["cycles"]
    epochs_per_cycle = cfg["warmup"] + cfg["burnin"] + sample_epochs

    augment_fn = getattr(type(data), "augment_fn", None)
    if augment_fn is not None:
        augment_fn = getattr(data, "augment_fn")

    # one reference-compatible run dir per chain, created up front so the
    # sample banks STREAM to disk as the sweep runs (no host-memory
    # blowup). Multi-host: each process creates dirs/savers ONLY for the
    # chains it owns (rank-aware writers; dir numbering is mkdir-atomic).
    runs, savers, msavers = {}, [], []
    for c in range(n_chains):
        if c not in local_chains:
            savers.append(None)
            msavers.append(None)
            continue
        r, t = divmod(c, len(temps))
        chain_cfg = {**cfg, "temperature": temps[t], "replicate": r,
                     "chain_index": c, "n_chains": n_chains,
                     "temperatures": temps}
        run = RunDirectory(cfg["log_dir"], chain_cfg)
        runs[c] = run
        savers.append(HDF5ModelSaver(run.artifact("samples.pt"))
                      if cfg["save_samples"] else None)
        # step-granular per-chain metrics stream during the run: the
        # kinetic-temperature χ² diagnostic needs per-step series
        msavers.append(HDF5Metrics(run.artifact("metrics.h5")))
    if not cfg["save_samples"]:
        savers = []

    # reject variants: the paper's exact-gradient M-H algorithm per chain
    reject_kernels = {"VerletSGLDReject": "VerletSGLD", "HMCReject": "HMC",
                      "SGLDReject": "SGLD"}
    is_reject = cfg["inference"] in reject_kernels
    runner_cls = MultiChainRunnerReject if is_reject else MultiChainRunner
    kernel_name = reject_kernels.get(cfg["inference"], cfg["inference"])
    # partition oversized banks into sequential programs: chains are
    # independent, so a 150-chain grid as 3 sequential 50-chain programs
    # is semantically identical and stays under the transport's measured
    # ~60s single-dispatch watchdog (PERF.md round-5 sweep section)
    max_cpp = int(cfg.get("max_chains_per_program") or 0) or n_chains
    n_parts = -(-n_chains // max_cpp)
    bounds = np.linspace(0, n_chains, n_parts + 1).astype(int)
    parts = [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_parts)]
    if n_parts > 1:
        assert jax.process_count() == 1, \
            "bank partitioning not supported with multi-host runs"
        assert cfg["resume_from"] is None, \
            "resume of a partitioned sweep is not supported; raise " \
            "max_chains_per_program or resume each part manually"
        print(f"# {n_chains} chains as {n_parts} sequential programs of "
              f"<= {max_cpp}", file=sys.stderr)
    part_results = {}
    try:
        for p, (lo, hi) in enumerate(parts):
            if mesh is not None:
                assert (hi - lo) % mesh.devices.size == 0, \
                    (lo, hi, mesh.devices.size)
            runner = runner_cls(
                model, (x_train, y_train), n_chains=hi - lo,
                temperatures=chain_temps[lo:hi], kernel=kernel_name,
                learning_rate=cfg["lr"], momentum=cfg["momentum"],
                batch_size=cfg["batch_size"], cycles=cfg["cycles"],
                epochs_per_cycle=epochs_per_cycle,
                warmup_epochs=cfg["warmup"],
                sample_epochs=sample_epochs, skip=cfg["skip"],
                precond_update=cfg["precond_update"], mesh=mesh,
                key=jax.random.fold_in(jax.random.key(cfg["seed"]), p),
                augment_fn=augment_fn,
                model_savers=(savers[lo:hi] or None) if savers else None,
                metrics_savers=msavers[lo:hi],
                metrics_skip=cfg["metrics_skip"],
                test_data=(x_test, y_test),
                chain_group_size=cfg["chain_group_size"],
                eval_skip=cfg["eval_skip"], pipeline=cfg["pipeline"],
                compute_dtype=cfg.get("compute_dtype"))
            ckpt = None
            if cfg["checkpoint_every"]:
                suffix = f"_part{p}" if n_parts > 1 else ""
                ckpt = str(Path(cfg["log_dir"])
                           / f"sweep_checkpoint{suffix}.npz")
            metrics_hist = runner.run(
                progressbar=cfg["progressbar"], checkpoint_path=ckpt,
                checkpoint_every=cfg["checkpoint_every"],
                resume_from=cfg["resume_from"])
            # finish this part's chains NOW and release the runner: a
            # completed part's device state (positions/momenta/rollback
            # slots) must not stay resident while later parts run
            acc_rates = (np.asarray(runner.acceptance_rates())
                         if is_reject else None)
            for c in range(lo, hi):
                run = runs[c]
                r, t = divmod(c, len(temps))
                if savers:
                    bank = load_samples(str(run.dir / "samples.pt"))
                else:
                    bank = runner.chain_samples(c - lo)
                if not bank or next(iter(bank.values())).shape[0] == 0:
                    # e.g. resumed at/after the final epoch
                    res = {"n_samples": 0, "temperature": temps[t],
                           "replicate": r}
                else:
                    skip_first = min(cfg["skip_first"],
                                     next(iter(bank.values())).shape[0] - 1)
                    eval_bank = {k: np.asarray(v)[skip_first:]
                                 for k, v in bank.items()}
                    res = evaluate_model(model, (x_test, y_test), eval_bank)
                    res.update(temperature=temps[t], replicate=r)
                    if is_reject:
                        res["acceptance"] = float(acc_rates[c - lo])
                run.finish(res)
                part_results[c] = res
            del runner
    finally:
        for s in savers:
            if s is not None:
                s.close()
        # metrics were streamed during the run (step-granular per-chain
        # series incl. est_temperature/* and boundary ΔE/rejection rows)
        for m in msavers:
            if m is not None:
                m.close()

    results = []
    for c in sorted(part_results):
        res = part_results[c]
        results.append(res)
        print(json.dumps(res))
    return results


if __name__ == "__main__":
    cfg = parse_cli(DEFAULTS)
    main(cfg)
