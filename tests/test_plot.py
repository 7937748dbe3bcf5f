"""Smoke tests for the diagnostics plotting and notebook-collection layer
(reference `plot.py` / `notebook_utils.py`), driven off a real tiny run's
metrics.h5 so the HDF5 key scheme and the plots stay wired together."""
import json

import jax
import jax.numpy as jnp
import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from bnn_priors_tpu import models, notebook_utils, plot  # noqa: E402
from bnn_priors_tpu.exp.config import RunDirectory  # noqa: E402
from bnn_priors_tpu.inference import VerletSGLDRunner  # noqa: E402
from bnn_priors_tpu.io import HDF5Metrics  # noqa: E402


def _tiny_run(tmp_path):
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (48, 3), jnp.float32)
    y = jnp.sin(x.sum(-1, keepdims=True))
    model = models.DenseNet(3, 1, width=6, depth=2)
    path = tmp_path / "metrics.h5"
    with HDF5Metrics(path) as ms:
        r = VerletSGLDRunner(model, (x, y), None, epochs_per_cycle=2,
                             warmup_epochs=1, sample_epochs=1, cycles=2,
                             learning_rate=1e-3, momentum=0.9, batch_size=16,
                             metrics_saver=ms, key=jax.random.key(1))
        r.run(progressbar=False)
        params = {k: np.asarray(v) for k, v in
                  r.kernel.params_of(r.chain).items()}
    return path, params


def test_plot_temperature_diagnostics(tmp_path):
    path, params = _tiny_run(tmp_path)
    metrics = plot.load_metrics(path)
    assert "est_temperature" in metrics and "temperature" in metrics
    sizes = plot.get_sizes(params)
    assert sum(sizes.values()) == sum(int(np.size(v)) for v in params.values())

    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    plot.temperature_stderr(axes[0], metrics, "est_temperature", sizes)
    plot.kinetic_temperature_intervals(axes[1], metrics, sizes)
    plot.metric(axes[2], metrics, "potential")
    plot.vlines(axes[2], metrics,
                np.asarray(metrics["acceptance"]["is_sample"]) > 0)
    fig.savefig(tmp_path / "diag.png")
    plt.close(fig)
    assert (tmp_path / "diag.png").stat().st_size > 0


def test_collect_runs(tmp_path):
    for i, temp in enumerate([0.1, 1.0]):
        run = RunDirectory(tmp_path, {"temperature": temp, "lr": 0.01,
                                      "weight_prior": "gaussian"})
        (run.dir / "metrics.h5").touch()
        run.finish({"acc_ensemble": 0.9 + 0.01 * i})
    df = notebook_utils.collect_runs(tmp_path)
    assert len(df) == 2
    assert set(df["temperature"]) == {0.1, 1.0}
    assert "result.acc_ensemble" in df.columns
    uniq = notebook_utils.unique_cols(df)
    assert any("temperature" in c for c in uniq)


def test_gp_posterior_band(tmp_path):
    """gp_posterior (reference plot.py:181-207): sorted mean line + ±2σ
    band from a RaoB predictive — smoke + geometry checks."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp
    from bnn_priors_tpu import models

    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 1))
    y = (2.0 * x[:, 0] + 0.1 * rng.normal(size=20))
    model = models.RaoBLinearRegression(
        jnp.asarray(x), jnp.asarray(y)[:, None], noise_std=0.3, std_w=1.0)
    params, state = model.init(__import__("jax").random.key(0))
    xs = rng.normal(size=(15, 1))
    mean, std = model.predictive(params, state, jnp.asarray(xs))

    fig, ax = plt.subplots()
    line = plot.gp_posterior(ax, xs, mean, std, label="pred")
    xdata, ydata = line.get_data()
    assert np.all(np.diff(xdata) >= 0)          # sorted
    order = np.argsort(xs[:, 0])
    np.testing.assert_allclose(ydata, np.asarray(mean)[order, 0])
    # 1 mean line + 2 band edges
    assert len(ax.lines) == 3
    fig.savefig(tmp_path / "gp.png")
    plt.close(fig)
    assert (tmp_path / "gp.png").stat().st_size > 0
