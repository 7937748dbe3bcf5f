"""Training script for BNN experiments with different datasets and priors.

TPU-native equivalent of reference `experiments/train_bnn.py` with the same
sacred-style CLI and config names, e.g.:

    python experiments/train_bnn.py with data=mnist model=classificationdensenet \
        weight_prior=gaussian inference=SGLD warmup=45 burnin=0 skip=1 \
        n_samples=300 lr=0.01 momentum=0.994 weight_scale=1.41 cycles=60 \
        batch_size=128 temperature=1.0

Artifacts per run dir (reference contract): config.json, run.json,
metrics.h5, samples.pt (HDF5). The result dict is the final evaluation.
"""
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bnn_priors_tpu.exp.config import RunDirectory, parse_cli

DEFAULTS = dict(
    data="mnist",                  # dataset name (see exp_utils.get_data)
    inference="VerletSGLDReject",  # GGMC from arXiv:2102.01691 by default
    model="classificationconvnet",
    width=50,
    depth=3,
    weight_prior="gaussian",
    bias_prior="gaussian",
    weight_loc=0.0,
    weight_scale=2.0 ** 0.5,
    bias_loc=0.0,
    bias_scale=1.0,
    weight_prior_params={},
    bias_prior_params={},
    n_samples=300,                 # total posterior samples
    cycles=60,                     # cosine LR cycles
    burnin=0,                      # descent epochs per cycle (T=0)
    warmup=45,                     # warmup epochs per cycle
    skip=1,                        # sample thinning
    metrics_skip=10,
    eval_skip=1,       # test-eval every N epochs (0 = off; final epoch always)
    pipeline=True,     # one-epoch-deep dispatch pipeline (False = sync debug)
    skip_first=50,                 # samples discarded at evaluation
    temperature=1.0,
    sampling_decay="cosine",
    momentum=0.994,
    precond_update=1,
    lr=5e-4,
    init_method="he",              # he | he_uniform | he_zerobias | prior
    load_samples=None,             # warm start from a previous sample bank
    batch_size=128,
    reject_samples=False,
    batchnorm=True,
    device="tpu",                  # tpu | cpu (jax backend)
    matmul_precision="bfloat16",   # MXU precision; 'float32' for exact
    compute_dtype=None,            # e.g. 'bfloat16': mixed-precision net
                                   # forward/backward (reductions stay f32);
                                   # M-H boundary grads always full precision
    save_samples=True,
    checkpoint_every=None,         # epochs between full chain checkpoints
    resume_from=None,              # resume a run from chain.ckpt.npz
    profile_dir=None,              # jax.profiler trace dir (one epoch)
    progressbar=True,
    seed=0,
    n_chains=1,                    # vmapped parallel chains (TPU-native):
                                   # >1 dispatches to MultiChainRunner(Reject)
                                   # with one run dir per chain
    n_devices=None,                # chains mesh axis size (None = 1 device)
    chain_group_size=None,         # chains/device per dispatch group
                                   # (None = measured sweet spot; 0 = one
                                   # big vmap over all chains)
    # multi-host (SURVEY §5.8): same command on every host with
    # num_processes=N process_id=<rank> coordinator_address=host:port
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    log_dir=str(Path(__file__).resolve().parent.parent / "logs"),
)


def main(cfg):
    import jax
    if cfg["device"] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from bnn_priors_tpu.jit_utils import enable_persistent_cache
    enable_persistent_cache()  # tunnel compiles are minutes; warm loads seconds
    from bnn_priors_tpu.parallel import distributed
    distributed.initialize_from_config(cfg)  # no-op unless num_processes>1
    import jax.numpy as jnp
    import numpy as np

    from bnn_priors_tpu import exp_utils, inference
    from bnn_priors_tpu.data import Synthetic
    from bnn_priors_tpu.evaluate import evaluate_model
    from bnn_priors_tpu.io import HDF5Metrics, HDF5ModelSaver, load_samples

    assert cfg["inference"] in ["SGLD", "VerletSGLD", "OurHMC", "HMC",
                                "HMCReject", "VerletSGLDReject",
                                "SGLDReject"]
    run = RunDirectory(cfg["log_dir"], cfg)
    try:
        return _main_inner(cfg, run)
    except Exception as e:  # noqa: BLE001 — record FAILED status in run.json
        run.fail(e)
        raise


def _main_inner(cfg, run):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bnn_priors_tpu import exp_utils, inference
    from bnn_priors_tpu.data import Synthetic
    from bnn_priors_tpu.evaluate import evaluate_model
    from bnn_priors_tpu.io import HDF5Metrics, HDF5ModelSaver, load_samples

    key = jax.random.key(cfg["seed"])

    # -- data --------------------------------------------------------------
    data, key = exp_utils.get_data_from_config(cfg, key)

    x_train = jnp.asarray(data.norm.train_X, dtype=jnp.float32)
    y_train = data.norm.train_y
    x_test = jnp.asarray(data.norm.test_X, dtype=jnp.float32)
    y_test = data.norm.test_y

    # -- model -------------------------------------------------------------
    model = exp_utils.get_model(
        x_train, y_train, cfg["model"], cfg["width"], cfg["depth"],
        cfg["weight_prior"], cfg["weight_loc"], cfg["weight_scale"],
        cfg["bias_prior"], cfg["bias_loc"], cfg["bias_scale"],
        cfg["batchnorm"], cfg["weight_prior_params"], cfg["bias_prior_params"])
    k_init, k_he, k_run, key = jax.random.split(key, 4)
    params, model_state = model.init(k_init, dtype=jnp.float32)

    if cfg["load_samples"] is None:
        if cfg["init_method"] == "he":
            params = exp_utils.he_initialize(params, k_he)
        elif cfg["init_method"] == "he_uniform":
            params = exp_utils.he_uniform_initialize(params, k_he)
        elif cfg["init_method"] == "he_zerobias":
            params = exp_utils.he_zerobias_initialize(params, k_he)
        elif cfg["init_method"] == "prior":
            pass
        else:
            raise ValueError(f"unknown init_method={cfg['init_method']}")
    else:
        bank = load_samples(cfg["load_samples"], keep_steps=False)
        loaded = 0
        new_params, new_state = dict(params), dict(model_state)
        for k, v in bank.items():
            last = jnp.asarray(v[-1])
            if k in new_params and new_params[k].shape == last.shape:
                new_params[k] = last.astype(new_params[k].dtype)
                loaded += 1
            elif k in new_state and new_state[k].shape == last.shape:
                new_state[k] = last.astype(new_state[k].dtype)
                loaded += 1
            else:
                print(f"warning: ignoring loaded key {k}", file=sys.stderr)
        params, model_state = new_params, new_state
        print(f"warm start: loaded {loaded} arrays", file=sys.stderr)

    if int(cfg["n_chains"]) > 1:
        return _run_multichain(cfg, run, data, model, params, model_state,
                               x_train, y_train, x_test, y_test, k_he, k_run)

    # -- runner ------------------------------------------------------------
    # "HMC" = classical full-batch HMC with exact M-H: the reference
    # dispatches it to pyro's HMC over model.get_potential
    # (train_bnn.py:216-221); here it is HMCRunnerReject with
    # batch_size = N (every gradient is the exact full-data gradient).
    runner_class = {
        "SGLD": inference.SGLDRunner,
        "VerletSGLD": inference.VerletSGLDRunner,
        "OurHMC": inference.HMCRunner,
        "HMC": inference.HMCRunnerReject,
        "VerletSGLDReject": inference.VerletSGLDRunnerReject,
        "HMCReject": inference.HMCRunnerReject,
        "SGLDReject": inference.SGLDRunnerReject,
    }[cfg["inference"]]
    batch_size = cfg["batch_size"]
    if cfg["inference"] == "HMC":
        batch_size = int(x_train.shape[0])
        assert cfg["temperature"] == 1.0 and cfg["burnin"] == 0, \
            "classical HMC requires temperature=1 and no descent epochs"

    assert (cfg["n_samples"] * cfg["skip"]) % cfg["cycles"] == 0
    sample_epochs = cfg["n_samples"] * cfg["skip"] // cfg["cycles"]
    epochs_per_cycle = cfg["warmup"] + cfg["burnin"] + sample_epochs

    augment_fn = getattr(type(data), "augment_fn", None)
    if augment_fn is not None:
        augment_fn = getattr(data, "augment_fn")

    with HDF5Metrics(run.artifact("metrics.h5")) as metrics_saver:
        saver_path = run.artifact("samples.pt") if cfg["save_samples"] else None
        model_saver = HDF5ModelSaver(saver_path) if saver_path else None
        try:
            runner = runner_class(
                model, (x_train, y_train), (x_test, y_test),
                epochs_per_cycle=epochs_per_cycle,
                warmup_epochs=cfg["warmup"], sample_epochs=sample_epochs,
                learning_rate=cfg["lr"], skip=cfg["skip"],
                metrics_skip=cfg["metrics_skip"],
                sampling_decay=cfg["sampling_decay"], cycles=cfg["cycles"],
                temperature=cfg["temperature"], momentum=cfg["momentum"],
                precond_update=cfg["precond_update"],
                metrics_saver=metrics_saver, model_saver=model_saver,
                reject_samples=(cfg["reject_samples"]
                                or cfg["inference"] == "HMC"),
                batch_size=batch_size, augment_fn=augment_fn,
                init_params=params, init_model_state=model_state, key=k_run,
                checkpoint_path=run.artifact("chain.ckpt.npz"),
                checkpoint_every=cfg["checkpoint_every"],
                profile_dir=cfg["profile_dir"],
                matmul_precision=(cfg["matmul_precision"]
                                  if cfg["device"] != "cpu" else None),
                compute_dtype=cfg["compute_dtype"])
            runner.run(progressbar=cfg["progressbar"],
                       resume_from=cfg["resume_from"])
            samples = runner.get_samples()
        finally:
            if model_saver is not None:
                model_saver.close()

    n_saved = min(v.shape[0] for v in samples.values())
    skip_first = cfg["skip_first"]
    if skip_first >= n_saved:
        # keep at least the final sample (tiny runs save < skip_first)
        print(f"WARNING: skip_first={skip_first} >= {n_saved} saved samples;"
              f" clamping to {n_saved - 1}")
        skip_first = n_saved - 1
    samples = {k: v[skip_first:] for k, v in samples.items()}
    result = evaluate_model(model, (x_test, jnp.asarray(y_test)), samples,
                            likelihood_eval=True, accuracy_eval=True,
                            calibration_eval=False)
    run.finish(result)
    print(json.dumps(result))
    return result


def _run_multichain(cfg, run, data, model, loaded_params, model_state,
                    x_train, y_train, x_test, y_test, k_he, k_run):
    """n_chains > 1: the paper CLI over K vmapped (optionally mesh-sharded)
    chains — MultiChainRunner(Reject). One reference-compatible run dir per
    chain (config.json / samples.pt / metrics.h5 / run.json, the
    sweep_tempering.py layout) so `eval_bnn.py` evaluates each chain dir
    unchanged; the parent run records the pooled all-chain ensemble."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from bnn_priors_tpu import exp_utils
    from bnn_priors_tpu.evaluate import evaluate_model
    from bnn_priors_tpu.io import HDF5Metrics, HDF5ModelSaver, load_samples
    from bnn_priors_tpu.parallel import (MultiChainRunner,
                                         MultiChainRunnerReject)

    n_chains = int(cfg["n_chains"])
    reject_kernels = {"VerletSGLDReject": "VerletSGLD", "HMCReject": "HMC",
                      "SGLDReject": "SGLD", "HMC": "HMC"}
    # OurHMC = HMC kernel without M-H; MultiChainRunner refreshes momenta
    # at the single-chain HMCRunner's trajectory boundaries
    plain_kernels = {"SGLD": "SGLD", "VerletSGLD": "VerletSGLD",
                     "OurHMC": "HMC"}
    assert cfg["inference"] in {**reject_kernels, **plain_kernels}, \
        f"inference={cfg['inference']!r} not supported with n_chains>1"
    is_reject = cfg["inference"] in reject_kernels
    batch_size = int(cfg["batch_size"])
    if cfg["inference"] == "HMC":  # classical HMC: exact full-data grads
        batch_size = int(x_train.shape[0])
        assert cfg["temperature"] == 1.0 and cfg["burnin"] == 0
        # memory guard: batch=N means every chain materializes FULL-dataset
        # activations per scan step (e.g. CIFAR10: 50k x 3 x 32 x 32 per
        # chain). HMCReject computes the same exact gradients by scanning
        # minibatches at constant memory — use it for real datasets.
        est_gb = (n_chains * batch_size *
                  float(np.prod(x_train.shape[1:])) * 4 / 1e9)
        assert est_gb < 2.0, (
            f"inference=HMC with n_chains={n_chains} needs full-batch "
            f"gradients: >= {est_gb:.1f} GB of input activations alone "
            f"(batch={batch_size}/chain) would not fit. Use "
            "inference=HMCReject (minibatch-scanned exact gradients, "
            "constant memory) or fewer chains/smaller data.")

    assert (cfg["n_samples"] * cfg["skip"]) % cfg["cycles"] == 0
    sample_epochs = cfg["n_samples"] * cfg["skip"] // cfg["cycles"]
    epochs_per_cycle = cfg["warmup"] + cfg["burnin"] + sample_epochs

    augment_fn = getattr(type(data), "augment_fn", None)
    if augment_fn is not None:
        augment_fn = getattr(data, "augment_fn")

    # per-chain initial parameters: warm starts replicate the loaded
    # sample; otherwise each chain gets an independent init_method draw
    def init_params_fn(c, key):
        if cfg["load_samples"] is not None:
            return loaded_params
        params, _ = model.init(jax.random.fold_in(key, 0),
                               dtype=jnp.float32)
        k_he_c = jax.random.fold_in(k_he, c)
        if cfg["init_method"] == "he":
            return exp_utils.he_initialize(params, k_he_c)
        if cfg["init_method"] == "he_uniform":
            return exp_utils.he_uniform_initialize(params, k_he_c)
        if cfg["init_method"] == "he_zerobias":
            return exp_utils.he_zerobias_initialize(params, k_he_c)
        assert cfg["init_method"] == "prior", cfg["init_method"]
        return params

    from bnn_priors_tpu.parallel import distributed
    devices = jax.devices()  # global set when jax.distributed is up
    n_dev = int(cfg["n_devices"] or 1)
    mesh = None
    local_chains = list(range(n_chains))
    if n_dev > 1:
        assert n_chains % n_dev == 0, (n_chains, n_dev)
        mesh = Mesh(np.asarray(devices[:n_dev]), ("chains",))
        if jax.process_count() > 1:
            local_chains = distributed.local_chain_indices_for_mesh(
                mesh, n_chains)

    # one run dir per chain, samples streaming to disk; multi-host: each
    # process creates dirs/savers only for the chains it owns
    chain_runs, savers, msavers = {}, [], []
    for c in range(n_chains):
        if c not in local_chains:
            savers.append(None)
            msavers.append(None)
            continue
        chain_cfg = {**cfg, "chain_index": c}
        crun = RunDirectory(cfg["log_dir"], chain_cfg)
        chain_runs[c] = crun
        savers.append(HDF5ModelSaver(crun.artifact("samples.pt"))
                      if cfg["save_samples"] else None)
        # per-chain step-granular metrics stream (reference
        # inference.py:262-294 cadence) + per-epoch test eval rows
        msavers.append(HDF5Metrics(crun.artifact("metrics.h5")))
    if not cfg["save_samples"]:
        savers = []

    import time as _time
    _t0 = _time.perf_counter()

    def _phase(name):
        print(f"[timing] {name}: {_time.perf_counter() - _t0:.1f}s",
              file=sys.stderr, flush=True)

    runner_cls = MultiChainRunnerReject if is_reject else MultiChainRunner
    extra = {}
    if is_reject:
        extra["reject_samples"] = bool(cfg["reject_samples"]
                                       or cfg["inference"] == "HMC")
    try:
        runner = runner_cls(
            model, (x_train, jnp.asarray(y_train)), n_chains=n_chains,
            temperatures=float(cfg["temperature"]),
            kernel=(reject_kernels.get(cfg["inference"])
                    or plain_kernels[cfg["inference"]]),
            learning_rate=cfg["lr"], momentum=cfg["momentum"],
            sampling_decay=cfg["sampling_decay"], batch_size=batch_size,
            cycles=cfg["cycles"], epochs_per_cycle=epochs_per_cycle,
            warmup_epochs=cfg["warmup"], sample_epochs=sample_epochs,
            skip=cfg["skip"], precond_update=cfg["precond_update"],
            mesh=mesh, key=k_run, augment_fn=augment_fn,
            model_savers=savers or None, init_params_fn=init_params_fn,
            metrics_savers=msavers, metrics_skip=cfg["metrics_skip"],
            test_data=(x_test, jnp.asarray(y_test)),
            chain_group_size=cfg["chain_group_size"],
            eval_skip=cfg["eval_skip"], pipeline=cfg["pipeline"],
            compute_dtype=cfg["compute_dtype"], **extra)
        _phase("runner constructed (chain init + data upload)")
        ckpt = (run.artifact("chains.ckpt.npz")
                if cfg["checkpoint_every"] else None)
        metrics_hist = runner.run(progressbar=cfg["progressbar"],
                                  checkpoint_path=ckpt,
                                  checkpoint_every=cfg["checkpoint_every"],
                                  resume_from=cfg["resume_from"])
    finally:
        for s in savers:
            if s is not None:
                s.close()
        # metrics were streamed during the run (per-step series, per-epoch
        # test/acc + test/loss, and boundary ΔE/rejection rows)
        for m in msavers:
            if m is not None:
                m.close()

    _phase("training epochs done")
    # per-chain evaluation + pooled ensemble over this host's chains
    results = []
    pooled_banks = []
    for c, crun in sorted(chain_runs.items()):
        if c in runner.nan_chains:
            res = {"diverged": True, "chain_index": c}
            crun.finish(res)
            results.append(res)
            continue
        if savers:
            bank = load_samples(str(crun.dir / "samples.pt"))
        else:
            bank = runner.chain_samples(c)
        n_saved = min(v.shape[0] for v in bank.values())
        skip_first = min(cfg["skip_first"], n_saved - 1)
        bank = {k: np.asarray(v)[skip_first:] for k, v in bank.items()}
        pooled_banks.append(bank)
        res = evaluate_model(model, (x_test, jnp.asarray(y_test)), bank,
                             likelihood_eval=True, accuracy_eval=True,
                             calibration_eval=False)
        res["chain_index"] = c
        if is_reject and extra.get("reject_samples"):
            res["acceptance"] = float(runner.acceptance_rates()[c])
        crun.finish(res)
        results.append(res)
        print(json.dumps(res))

    pooled = {}
    if pooled_banks:
        all_bank = {k: np.concatenate([b[k] for b in pooled_banks])
                    for k in pooled_banks[0]}
        pooled = evaluate_model(model, (x_test, jnp.asarray(y_test)),
                                all_bank, likelihood_eval=True,
                                accuracy_eval=True, calibration_eval=False)
    _phase("final per-chain + pooled evaluation done")
    summary = {"chains": results, "pooled": pooled,
               "chain_dirs": [str(chain_runs[c].dir)
                              for c in sorted(chain_runs)],
               "n_diverged": len(runner.nan_chains)}
    run.finish(summary)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(parse_cli(DEFAULTS))
