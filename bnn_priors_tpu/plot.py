"""Tempering/temperature-diagnostic plotting (reference: `bnn_priors/plot.py`).

The key sampler-health observables from the papers: weighted-mean kinetic /
configurational temperature with Cochran-1977 standard errors, and χ²(d)
confidence-interval coverage counts for the per-parameter kinetic
temperature. Pure numpy/scipy/matplotlib (the reference additionally pulls
in torch+gpytorch for a diagonal-Gaussian band — here computed directly).

`load_metrics(path)` adapts a metrics.h5 file into the nested dict layout
these functions consume.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np
import scipy.signal
import scipy.stats

__all__ = ("load_metrics", "get_sizes", "weighted_var_se", "ewma",
           "temperature_stderr", "kinetic_temperature_intervals", "metric",
           "vlines")


def load_metrics(path) -> Dict:
    """metrics.h5 → nested dict: scalar series at top level, per-parameter
    series grouped under 'est_temperature'/'est_config_temp'/'preconditioner'."""
    import h5py
    out: Dict = {}
    with h5py.File(path, "r") as f:
        def visit(k, obj):
            if not isinstance(obj, h5py.Dataset):
                return
            arr = np.asarray(obj)
            if "/" in k:
                group, name = k.split("/", 1)
                out.setdefault(group, {})[name] = arr
            else:
                out[k] = arr
        f.visititems(visit)
    # 'acceptance/...' stays grouped; est_* groups keyed by parameter name
    return out


def get_sizes(params: Dict[str, np.ndarray]) -> Dict[str, int]:
    "parameter name → element count (weights for temperature averaging)"
    return {k: int(np.prod(np.shape(v))) for k, v in params.items()}


def weighted_var_se(w, x):
    """Mean and variance of a weighted mean (Cochran 1977).

    w: (n,) weights; x: (..., n) per-parameter series. Returns (mean, var)."""
    n, = w.shape
    assert x.shape[-1] == n
    xWbar = (x @ w) / w.sum()
    wbar = w.mean()
    w__wbar = w - wbar
    wx__wbar_xWbar = w * x - wbar * xWbar[..., None]
    se = n / ((n - 1) * w.sum() ** 2) * (
        (wx__wbar_xWbar ** 2).sum(-1)
        - 2 * xWbar * (wx__wbar_xWbar @ w__wbar)
        + xWbar ** 2 * (w__wbar @ w__wbar))
    return xWbar, se


def ewma(array, alpha):
    "exponential moving average smoothing with decay alpha (0 = off)"
    if alpha == 0.0:
        return array
    b = [1 - alpha]
    a = [1, -alpha]
    zi = scipy.signal.lfiltic(b, a, array[0:1], [0])
    return scipy.signal.lfilter(b, a, array, zi=zi)[0]


def _plot_band(ax, x, mean, var, ewma_alpha, color=None, label=None,
               fill_alpha=0.05, **kwargs):
    "mean ± 2σ band (the reference's gp_posterior on a diagonal Gaussian)"
    mean_s = ewma(mean, ewma_alpha)
    line, *_ = ax.plot(x, mean_s, color=color, **kwargs)
    if label is not None:
        line.set_label(label)
    C = line.get_color()
    sd = 2 * np.sqrt(var)
    lower = ewma(mean - sd, ewma_alpha)
    upper = ewma(mean + sd, ewma_alpha)
    ax.fill_between(x, lower, upper, alpha=fill_alpha, color=C)
    ax.plot(x, lower, color=C, linewidth=0.5)
    ax.plot(x, upper, color=C, linewidth=0.5)


def gp_posterior(ax, x, mean, std, ewma_alpha: float = 0.0,
                 label: Optional[str] = None, sort=True, fill_alpha=0.05,
                 **kwargs):
    """Posterior-predictive band: mean line ± 2σ confidence region over
    sorted inputs (reference `plot.py:181-207`, which takes a gpytorch
    MultivariateNormal; here mean/std arrays — e.g. the output of
    `RaoBRegressionModel.predictive` — mean ± 2σ is gpytorch's
    `confidence_region()`)."""
    x = np.asarray(x).reshape(-1)
    mean = np.asarray(mean).reshape(-1)
    std = np.asarray(std).reshape(-1)
    if sort:
        i = np.argsort(x)
        x, mean, std = x[i], mean[i], std[i]
    mean_s = ewma(mean, ewma_alpha)
    line, *_ = ax.plot(x, mean_s, **kwargs)
    if label is not None:
        line.set_label(label)
    C = line.get_color()
    lower = ewma(mean - 2 * std, ewma_alpha)
    upper = ewma(mean + 2 * std, ewma_alpha)
    ax.fill_between(x, lower, upper, alpha=fill_alpha, color=C)
    ax.plot(x, lower, color=C, linewidth=0.5)
    ax.plot(x, upper, color=C, linewidth=0.5)
    return line


def temperature_stderr(ax, metrics, temp_group, sizes: Dict[str, int],
                       ewma_alpha: float = 0.0, mask=slice(None), label=None,
                       legend=True, line_kwargs={}, confidence_kwargs={}):
    """Weighted mean ± SE of the per-parameter temperatures
    ('est_temperature' or 'est_config_temp') against the target temperature."""
    temperatures = metrics[temp_group]
    if label is None:
        label = temp_group
    mean = temperatures["all"][mask]
    keys = [k for k in temperatures.keys() if k != "all"]
    if keys:
        temps = np.stack([temperatures[k][mask] for k in keys], axis=1)
        weights = np.array([sizes[k] for k in keys], dtype=float)
        _mean, var_se = weighted_var_se(weights, temps)
    else:
        # aggregate-only metrics (e.g. the multichain sweep): no
        # per-parameter spread available, draw the mean with zero band
        var_se = np.zeros_like(mean)

    steps = metrics["steps"][mask]
    line, *_ = ax.plot(steps, metrics["temperature"][mask], linestyle="--",
                       **line_kwargs)
    _plot_band(ax, steps, mean, var_se, ewma_alpha, color=line.get_color(),
               label=label, **confidence_kwargs)
    if legend:
        ax.legend()


def _gamma_confidence(sizes: Dict[str, int], c=0.95):
    "per-parameter χ²(d) confidence intervals for kinetic temperature (T=1)"
    d = {}
    for k, df in sizes.items():
        lower = scipy.stats.chi2.ppf((1 - c) / 2, df=df, scale=1 / df)
        upper = scipy.stats.chi2.ppf((1 + c) / 2, df=df, scale=1 / df)
        d[k] = (lower, upper)
    return d


def kinetic_temperature_intervals(ax, metrics, sizes: Dict[str, int],
                                  mask=slice(None), ewma_alpha: float = 0.0,
                                  confidences=(0.05, 0.25, 0.50, 0.75, 0.95),
                                  label="confidence", legend=True, cmap=None,
                                  hline_kwargs={}, plot_kwargs={}):
    """Fraction of parameters whose kinetic temperature falls inside each
    χ²(d) confidence interval — should track the confidence level if the
    sampler is healthy (the paper's key diagnostic)."""
    import matplotlib.pyplot as plt
    confidences = np.array(confidences)
    intervals = _gamma_confidence(sizes, confidences)
    temperature = metrics["temperature"][mask]
    keys = [k for k in metrics["est_temperature"].keys() if k != "all"]

    counts = None
    for k in keys:
        adjusted = metrics["est_temperature"][k][mask] / temperature
        lower, upper = intervals[k]
        within = np.logical_and(lower[:, None] <= adjusted,
                                adjusted <= upper[:, None])
        counts = within.astype(float) if counts is None else counts + within
    counts /= len(keys)

    cmap = cmap or plt.get_cmap("plasma")
    colors = cmap(confidences)
    steps = metrics["steps"][mask]
    for confidence, count, color in zip(confidences, counts, colors):
        line = ax.axhline(confidence, linestyle="--", linewidth=0.5,
                          color=color, **hline_kwargs)
        count = ewma(count, ewma_alpha)
        kwargs = dict(linestyle="-", color=line.get_color(),
                      label=f"{label} {confidence:.2f}")
        kwargs.update(plot_kwargs)
        ax.plot(steps, count, **kwargs)
    if legend:
        ax.legend()


def metric(ax, metrics, name, mask=slice(None), ewma_alpha: float = 0.0,
           legend=True, iqr_ylim=None, transform=(lambda x: x),
           plot_kwargs={}):
    "plot one named metric series with optional EWMA smoothing/IQR clipping"
    val = ewma(transform(metrics[name][mask]), ewma_alpha)
    kwargs = dict(label=name)
    kwargs.update(plot_kwargs)
    ax.plot(metrics["steps"][mask], val, **kwargs)
    if legend:
        ax.legend()
    if iqr_ylim is not None:
        all_min, q25, median, q75, all_max = np.nanpercentile(
            val, (0, 25, 50, 75, 100))
        iqr = q75 - q25
        ax.set_ylim((max(median - iqr_ylim * iqr, all_min - 0.05 * iqr),
                     min(median + iqr_ylim * iqr, all_max + 0.05 * iqr)))


def vlines(ax, metrics, mask, plot_kwargs={}):
    "vertical markers at the masked steps (e.g. sample boundaries)"
    from matplotlib.collections import LineCollection
    x_vlines = metrics["steps"][mask]
    segs = np.zeros((len(x_vlines), 2, 2))
    segs[:, :, 0] = x_vlines[:, None]
    segs[:, 1, 1] = 1.0
    trans = ax.get_xaxis_transform(which="grid")
    kwargs = dict(color="red", linestyle="--", transform=trans)
    kwargs.update(plot_kwargs)
    ax.add_collection(LineCollection(segs, **kwargs))
