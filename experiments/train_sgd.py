"""SGD baseline with the same model zoo, writing the same artifact contract
(metrics.h5 / samples.pt / config.json / run.json); reference
`experiments/train_sgd.py`.

The optimizer is SGD-with-momentum == SGLD at temperature 0 (proven
equivalent in tests/test_sgld.py::test_sgd_equivalence), run through the
same jitted epoch scans; checkpoints saved every `epochs_per_sample`
epochs form an "SGD ensemble" evaluated at the end.
"""
import argparse
import atexit
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def optional_int(s):
    return None if s in ("None", "") else int(s)


def main():
    parser = argparse.ArgumentParser(description="SGD baseline training")
    parser.add_argument("--lr", default=0.05, type=float)
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--model", default="thin_resnet18", type=str)
    parser.add_argument("--data", default="cifar10_augmented", type=str)
    parser.add_argument("--width", default=64, type=int)
    parser.add_argument("--batch_size", default=128, type=optional_int)
    parser.add_argument("--sampling_decay", default="stairs", type=str)
    parser.add_argument("--n_epochs", default=150 * 3, type=int)
    parser.add_argument("--epochs_per_sample", default=50, type=int)
    parser.add_argument("--skip_first", default=3, type=int)
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--log_dir", default=".", type=str)
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args()

    log_dir = Path(args.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    with open(log_dir / "config.json", "w") as f:
        json.dump({**vars(args), "temperature": 0.0}, f)
    with open(log_dir / "run.json", "w") as f:
        json.dump({"status": "RUNNING"}, f)

    @atexit.register
    def _error_exit():
        with open(log_dir / "run.json", "w") as f:
            f.write('{"status": "FAILED"}\n')

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from bnn_priors_tpu.jit_utils import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from bnn_priors_tpu import exp_utils
    from bnn_priors_tpu.evaluate import evaluate_model
    from bnn_priors_tpu.inference import SGLDRunner
    from bnn_priors_tpu.io import HDF5Metrics, HDF5ModelSaver

    data = exp_utils.get_data(args.data)
    x_train = jnp.asarray(data.norm.train_X, dtype=jnp.float32)
    y_train = data.norm.train_y
    x_test = jnp.asarray(data.norm.test_X, dtype=jnp.float32)
    y_test = data.norm.test_y

    # improper priors => pure maximum likelihood; restore He init
    model = exp_utils.get_model(
        x_train, y_train, model=args.model, width=args.width, depth=3,
        weight_prior="improper", weight_loc=0.0, weight_scale=1.0,
        bias_prior="improper", bias_loc=0.0, bias_scale=1.0,
        batchnorm=True, weight_prior_params={}, bias_prior_params={})
    key = jax.random.key(args.seed)
    k_init, k_he, k_run = jax.random.split(key, 3)
    params, model_state = model.init(k_init, dtype=jnp.float32)
    params = exp_utils.he_uniform_initialize(params, k_he)

    augment_fn = getattr(type(data), "augment_fn", None)
    if augment_fn is not None:
        augment_fn = data.augment_fn

    # SGD == SGLD(T=0); stairs schedule decays /10 every 150 epochs
    with HDF5Metrics(log_dir / "metrics.h5") as metrics_saver, \
            HDF5ModelSaver(log_dir / "samples.pt") as model_saver:
        runner = SGLDRunner(
            model, (x_train, y_train), (x_test, y_test),
            epochs_per_cycle=args.n_epochs, warmup_epochs=0,
            sample_epochs=args.n_epochs, skip=args.epochs_per_sample,
            learning_rate=args.lr, temperature=0.0, momentum=args.momentum,
            sampling_decay=args.sampling_decay, cycles=1, precond_update=None,
            metrics_saver=metrics_saver, model_saver=model_saver,
            batch_size=args.batch_size or len(x_train),
            augment_fn=augment_fn, init_params=params,
            init_model_state=model_state, key=k_run)
        runner.run(progressbar=True)
        samples = runner.get_samples()

    samples = {k: v[args.skip_first:] for k, v in samples.items()}
    result = evaluate_model(model, (x_test, jnp.asarray(y_test)), samples)
    atexit.unregister(_error_exit)
    with open(log_dir / "run.json", "w") as f:
        json.dump({"status": "COMPLETED", "result": result}, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
