"""Evaluation script: re-load a training run's samples and evaluate the
posterior predictive (reference `experiments/eval_bnn.py`).

    python experiments/eval_bnn.py with config_file=logs/1/config.json \
        eval_data=mnist calibration_eval=False ood_eval=False

Applies post-hoc rejected-sample resolution (`reject_samples_`) before
ensembling, like the reference (eval_bnn.py:104-110).
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bnn_priors_tpu.exp.config import RunDirectory, parse_cli

DEFAULTS = dict(
    config_file=None,       # path to the training run's config.json
    run_dir=None,           # alternatively: the run directory itself
    eval_data=None,         # dataset for evaluation (default: training data)
    eval_samples=None,      # override the samples file
    skip_first=50,
    calibration_eval=False,
    ood_eval=False,
    marglik_eval=False,
    device="tpu",
    batch_size=512,
    n_devices=None,        # >1: shard the sample bank over devices for eval
    log_dir=str(Path(__file__).resolve().parent.parent / "logs_eval"),
)


def main(cfg):
    import h5py
    import jax
    if cfg["device"] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from bnn_priors_tpu.jit_utils import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from bnn_priors_tpu import exp_utils
    from bnn_priors_tpu.evaluate import (evaluate_marglik, evaluate_model,
                                         evaluate_ood, reject_samples_)
    from bnn_priors_tpu.io import load_samples

    if cfg["run_dir"] is not None and cfg["config_file"] is None:
        cfg["config_file"] = str(Path(cfg["run_dir"]) / "config.json")
    assert cfg["config_file"], "config_file or run_dir required"
    with open(cfg["config_file"]) as f:
        train_cfg = json.load(f)
    run_dir = Path(cfg["config_file"]).parent
    samples_file = cfg["eval_samples"] or str(run_dir / "samples.pt")

    run = RunDirectory(cfg["log_dir"], {**train_cfg, **cfg})

    mesh = None
    if cfg.get("n_devices") and int(cfg["n_devices"]) > 1:
        from jax.sharding import Mesh
        n_dev = int(cfg["n_devices"])
        assert n_dev <= len(jax.devices()), (
            f"n_devices={n_dev} but only {len(jax.devices())} device(s) "
            "are available — refusing to silently evaluate on fewer")
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("samples",))

    if cfg["eval_data"]:
        # pin toy eval datasets to the train seed so repeated evals score
        # the same points (signature-checked; deterministic datasets take
        # no seed)
        data = exp_utils.get_data_seeded(cfg["eval_data"],
                                         train_cfg["seed"])
    else:
        # regenerates synthetic.<base>.<prior> datasets from the train seed
        data, _ = exp_utils.get_data_from_config(train_cfg)
    x_train = jnp.asarray(data.norm.train_X, dtype=jnp.float32)
    y_train = data.norm.train_y
    x_test = jnp.asarray(data.norm.test_X, dtype=jnp.float32)
    y_test = jnp.asarray(data.norm.test_y)

    model = exp_utils.get_model(
        x_train, y_train, train_cfg["model"], train_cfg["width"],
        train_cfg["depth"], train_cfg["weight_prior"],
        train_cfg["weight_loc"], train_cfg["weight_scale"],
        train_cfg["bias_prior"], train_cfg["bias_loc"],
        train_cfg["bias_scale"], train_cfg["batchnorm"],
        train_cfg["weight_prior_params"], train_cfg["bias_prior_params"])

    samples = load_samples(samples_file, keep_steps=True)
    metrics_path = run_dir / "metrics.h5"
    if metrics_path.exists():
        with h5py.File(metrics_path, "r") as metrics:
            metrics_np = {k: np.asarray(metrics[k]) for k in
                          ("steps", "acceptance/is_sample",
                           "acceptance/rejected") if k in metrics}
        if "acceptance/rejected" in metrics_np:
            samples = reject_samples_(samples, metrics_np)
    samples = {k: v[cfg["skip_first"]:] for k, v in samples.items()}
    n_left = min((v.shape[0] for v in samples.values()), default=0)
    assert n_left > 0, (
        f"skip_first={cfg['skip_first']} leaves no samples to evaluate "
        f"(the bank in {samples_file} is smaller); pass skip_first=0 "
        "or rerun training with more n_samples")

    if cfg["ood_eval"]:
        # like the reference (eval_bnn.py:120-124): OOD runs score-only —
        # the OOD set's labels may not even be class labels
        result = {}
    else:
        result = evaluate_model(
            model, (x_test, y_test), samples, likelihood_eval=True,
            accuracy_eval=True, calibration_eval=cfg["calibration_eval"],
            batch_size=cfg["batch_size"], mesh=mesh)

    if cfg["ood_eval"]:
        # in-dist score uses the *training data's test split*
        train_data, _ = exp_utils.get_data_from_config(train_cfg)
        tx = jnp.asarray(train_data.norm.test_X, dtype=jnp.float32)
        ty = jnp.asarray(train_data.norm.test_y)
        result.update(evaluate_ood(model, (tx, ty), (x_test, y_test),
                                   samples, batch_size=cfg["batch_size"],
                                   mesh=mesh))
    if cfg["marglik_eval"]:
        result.update(evaluate_marglik(model, samples, samples))

    run.finish(result)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(parse_cli(DEFAULTS))
