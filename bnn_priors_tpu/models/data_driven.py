"""Data-driven models: priors fitted offline to trained-network weights
(reference: `bnn_priors/models/data_driven_conv_nets.py`, `mvt_resnets.py`,
`conv_nets.py:258-330`).

These consume the fitted-prior parameter files shipped with the reference
(`cifar10_opt_mvt.pkl`, `mean_covs_mnist_classification.pkl.gz`, ...; see
SURVEY §2.9). Loaders accept a `fits_root` directory and default to the
read-only reference checkout. Prior replacement is a static-graph edit:
walk the module tree and swap the Prior object *before* `init`.
"""
from __future__ import annotations

import math
import os
from numbers import Number
from pathlib import Path

import numpy as np

from .. import priors as prior
from ..priors.base import Prior
from .base import ClassificationModel, Module
from .conv_nets import Conv2dPrior, _ImageInput
from .dense_nets import LinearPrior
from .google_resnet import ResNet
from .layers import Flatten, MaxPool2d, ReLU, Sequential

__all__ = ("DataDrivenGaussianClassificationConvNet",
           "DataDrivenDoubleGammaClassificationConvNet",
           "DataDrivenMVTGoogleResNet", "DecreasingMVTGoogleResNet",
           "DataDrivenPreActResNet18", "replace_prior", "load_lengthscales",
           "default_fits_root")


def default_fits_root():
    # the fitted-prior parameter files (92 KB of data artifacts, SURVEY
    # §2.9) ship with the package under models/fits/
    bundled = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fits")
    for root in (os.environ.get("BNN_PRIORS_FITS", ""), bundled):
        if root and os.path.isdir(root):
            return root
    raise FileNotFoundError("fitted-prior files not found; set BNN_PRIORS_FITS")


def _read_pickle(path):
    import pandas as pd
    return pd.read_pickle(path)


def _to_np(x):
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _module_by_path(root: Module, path: str) -> Module:
    mod = root
    for part in path.split(".") if path else []:
        mod = getattr(mod, part)
    return mod


def replace_prior(model: Module, prior_path: str, new_prior: Prior):
    """Swap the Prior at dotted `prior_path` (e.g. 'net.0.weight_prior')
    for `new_prior`, before `model.init` is called."""
    *parent, name = prior_path.split(".")
    owner = _module_by_path(model, ".".join(parent))
    assert name in owner._priors, f"no prior {name} at {prior_path}"
    setattr(owner, name, new_prior)


def _strip_module(key: str) -> str:
    "reference keys use DataParallel 'net.module.X...' naming; ours 'net.X...'"
    if key.startswith("net.module."):
        return "net." + key[len("net.module."):]
    return key


def load_lengthscales(model, lengthscale_dict_file):
    """Set per-layer fitted lengthscales on ConvCorrelatedNormal priors
    (reference conv_nets.py:247-254)."""
    d = _read_pickle(lengthscale_dict_file)
    for k, v in d.items():
        key = _strip_module(k)
        assert key.endswith(".p")
        prior_path = key[: -len(".p")]
        *parent, name = prior_path.split(".")
        owner = _module_by_path(model, ".".join(parent))
        p = owner._priors[name]
        p.hypers["lengthscale"] = np.asarray(_to_np(v))
    return model


def DataDrivenGaussianClassificationConvNet(
        in_channels, img_height, out_features, width, depth=3,
        softmax_temp=1.0, fits_root=None, **_unused):
    "MNIST convnet with FixedCovNormal conv priors (data_driven_conv_nets.py:15-57)."
    assert depth == 3, "fitted data exists for depth=3 only"
    root = fits_root or default_fits_root()
    mean_covs = _read_pickle(Path(root) / "mean_covs_mnist_classification.pkl.gz")
    no_scaling = lambda std, dim: std
    reshaped_size = width * (img_height // 2 ** (depth - 1)) ** 2

    def mc(key):
        m, c = mean_covs[key]
        return _to_np(m), _to_np(c)

    m1, c1 = mc("net.module.1.weight_prior.p")
    mb1, cb1 = mean_covs["net.module.1.bias_prior.p"]
    m4, c4 = mc("net.module.4.weight_prior.p")
    mb4, cb4 = mean_covs["net.module.4.bias_prior.p"]
    m8, c8 = mean_covs["net.module.8.weight_prior.p"]
    mb8, cb8 = mean_covs["net.module.8.bias_prior.p"]

    layers = [
        _ImageInput(in_channels, img_height),
        Conv2dPrior(in_channels, width, kernel_size=3, padding=1,
                    prior_w=prior.FixedCovNormal, loc_w=m1, std_w=c1,
                    prior_b=prior.Normal, loc_b=float(mb1),
                    std_b=float(cb1) ** 0.5, scaling_fn=no_scaling),
        ReLU(), MaxPool2d(2),
        Conv2dPrior(width, width, kernel_size=3, padding=1,
                    prior_w=prior.FixedCovNormal, loc_w=m4, std_w=c4,
                    prior_b=prior.Normal, loc_b=float(mb4),
                    std_b=float(cb4) ** 0.5, scaling_fn=no_scaling),
        ReLU(), MaxPool2d(2), Flatten(),
        LinearPrior(reshaped_size, out_features,
                    prior_w=prior.Normal, loc_w=float(m8),
                    std_w=float(c8) ** 0.5,
                    prior_b=prior.Normal, loc_b=float(mb8),
                    std_b=float(cb8) ** 0.5, scaling_fn=no_scaling),
    ]
    return ClassificationModel(Sequential(*layers), softmax_temp)


def DataDrivenDoubleGammaClassificationConvNet(
        in_channels, img_height, out_features, width, depth=3,
        softmax_temp=1.0, fits_root=None, **_unused):
    "heavy-tailed fitted priors (data_driven_conv_nets.py:60-109)."
    assert depth == 3
    root = fits_root or default_fits_root()
    mean_covs = _read_pickle(Path(root) / "mean_covs_mnist_classification.pkl.gz")
    _, fits = _read_pickle(Path(root) / "fits_mnist_classification.pkl.gz")
    no_scaling = lambda std, dim: std
    reshaped_size = width * (img_height // 2 ** (depth - 1)) ** 2

    m1, c1 = (_to_np(v) for v in mean_covs["net.module.1.weight_prior.p"])
    mb1, cb1 = mean_covs["net.module.1.bias_prior.p"]
    m4, c4 = (_to_np(v) for v in mean_covs["net.module.4.weight_prior.p"])
    mb4, cb4 = mean_covs["net.module.4.bias_prior.p"]
    mb8, cb8 = mean_covs["net.module.8.bias_prior.p"]
    dg4 = fits["net.module.4.weight_prior.p"]["dgamma"]
    dg8 = fits["net.module.8.weight_prior.p"]["dgamma"]

    layers = [
        _ImageInput(in_channels, img_height),
        Conv2dPrior(in_channels, width, kernel_size=3, padding=1,
                    prior_w=prior.FixedCovLaplace, loc_w=m1, std_w=c1,
                    prior_b=prior.Normal, loc_b=float(mb1),
                    std_b=float(cb1) ** 0.5, scaling_fn=no_scaling),
        ReLU(), MaxPool2d(2),
        Conv2dPrior(width, width, kernel_size=3, padding=1,
                    prior_w=prior.FixedCovDoubleGamma, loc_w=m4, std_w=c4,
                    prior_b=prior.Normal, loc_b=float(mb4),
                    std_b=float(cb4) ** 0.5, scaling_fn=no_scaling,
                    weight_prior_params=dict(concentration=float(dg4[0]))),
        ReLU(), MaxPool2d(2), Flatten(),
        LinearPrior(reshaped_size, out_features,
                    prior_w=prior.DoubleGamma, loc_w=float(dg8[1]),
                    std_w=float(dg8[2]),
                    prior_b=prior.Normal, loc_b=float(mb8),
                    std_b=float(cb8) ** 0.5, scaling_fn=no_scaling,
                    weight_prior_params=dict(concentration=float(dg8[0]))),
    ]
    return ClassificationModel(Sequential(*layers), softmax_temp)


def _prior_paths(model):
    "dict of '<path>.p' -> (path, prior) for all top-level priors"
    return {p + ".p": (p, pr) for p, pr in model.named_priors()}


def DataDrivenMVTGoogleResNet(softmax_temp=1.0, depth=20, num_classes=10,
                              bn=True, fits_root=None):
    """ResNet-20 with optimized multivariate-t priors loaded from
    `cifar10_opt_mvt.pkl` (reference mvt_resnets.py:12-49)."""
    assert depth == 20, "fitted data exists for depth=20 only"
    import torch
    root = fits_root or default_fits_root()
    mvt = torch.load(Path(root) / "cifar10_opt_mvt.pkl", weights_only=False)
    model = ResNet(softmax_temp=softmax_temp, depth=depth,
                   num_classes=num_classes, bn=bn)
    paths = _prior_paths(model)
    import torch.nn.functional as F
    for key, (_lik, params) in mvt.items():
        key = _strip_module(key)
        if key not in paths:
            continue  # fitted file may use a different architecture naming
        path, old = paths[key]
        shape = old.shape
        is_conv = len(shape) == 4
        if is_conv and params["event_dim"] == "t":
            permute, event_dim = (1, 0, 2, 3), 3
        else:
            permute, event_dim = None, int(params["event_dim"])
        df = float(F.softplus(params["df"]))
        new = prior.MultivariateT(
            shape, _to_np(params["loc"]), _to_np(params["scale_tril"]),
            df=df, event_dim=event_dim, permute=permute)
        replace_prior(model, path, new)
    return model


def DecreasingMVTGoogleResNet(softmax_temp=1.0, depth=20, num_classes=10,
                              prior_w=prior.ConvCorrelatedNormal, loc_w=0.0,
                              std_w=2 ** 0.5, prior_b=prior.Normal,
                              loc_b=0.0, std_b=1.0, scaling_fn=None, bn=True,
                              weight_prior_params={}, bias_prior_params={},
                              dense_prior_w=prior.Normal):
    """ResNet-20 with hand-specified per-depth MVT degrees of freedom
    (reference mvt_resnets.py:51-109): early layers heavy-tailed, later
    layers progressively Gaussian."""
    assert depth == 20
    model = ResNet(softmax_temp=softmax_temp, depth=depth,
                   num_classes=num_classes, prior_w=prior_w, loc_w=loc_w,
                   std_w=std_w, prior_b=prior_b, loc_b=loc_b, std_b=std_b,
                   scaling_fn=scaling_fn, bn=bn,
                   weight_prior_params=weight_prior_params,
                   bias_prior_params=bias_prior_params, conv_prior_w=prior_w)
    df_map = {"0": 3.55, "3": 3.0, "4": 5.5, "5": 20.0, "6": 32.0, "7": 50.0,
              "8": 60.0, "9": 70.0, "10": 80.0, "11": 90.0, "14": 1000.0}
    for key, (path, old) in list(_prior_paths(model).items()):
        parts = key.split(".")
        if parts[0] != "net" or parts[1] not in df_map:
            continue
        df = df_map[parts[1]]
        if df > 32.0:
            continue  # leave the Normal prior
        shape = old.shape
        is_conv = len(shape) == 4
        if is_conv:
            permute, event_dim = (1, 0, 2, 3), 3
        else:
            permute, event_dim = None, len(shape)
        in_dim = int(np.prod(shape[1:]))
        scale_tril = std_w / in_dim ** 0.5
        loc = loc_w
        if is_conv and shape[-1] != 1 and prior_w is prior.ConvCorrelatedNormal:
            from .. import distributions as D
            dmat = D.grid_distance_matrix(shape[-2], shape[-1])
            kernel = np.exp(-dmat / 1.0)
            scale_tril = np.linalg.cholesky(
                kernel + 1e-9 * np.eye(len(kernel))) * scale_tril
            loc = np.zeros([1]) + loc_w
        new = prior.MultivariateT(shape, loc, scale_tril, df=df,
                                  event_dim=event_dim, permute=permute)
        replace_prior(model, path, new)
    return model


def DataDrivenPreActResNet18(softmax_temp=1.0, width=64,
                             prior_w=prior.Normal, loc_w=0.0, std_w=2 ** 0.5,
                             prior_b=prior.Normal, loc_b=0.0, std_b=1.0,
                             scaling_fn=None, bn=True,
                             weight_prior_params={}, bias_prior_params={}):
    """PreActResNet18 with fitted per-layer means/covariances or gennorm
    fits loaded into its priors (reference conv_nets.py:258-330)."""
    from .conv_nets import PreActBlock, PreActResNet
    assert scaling_fn is None
    scaling_fn = lambda std, dim: std

    load_file_keys = ["mean_covs_file", "fits_dict_file"]
    load_file = {k: v for k, v in weight_prior_params.items()
                 if k in load_file_keys}
    weight_prior_params = {k: v for k, v in weight_prior_params.items()
                           if k not in load_file_keys}
    model = ClassificationModel(
        PreActResNet(PreActBlock, [2, 2, 2, 2], bn=bn, prior_w=prior_w,
                     loc_w=loc_w, std_w=std_w, prior_b=prior_b, loc_b=loc_b,
                     std_b=std_b, scaling_fn=scaling_fn, in_planes=width,
                     weight_prior_params=weight_prior_params,
                     bias_prior_params=bias_prior_params),
        softmax_temp)

    paths = _prior_paths(model)
    if "mean_covs_file" in load_file:
        mean_covs = _read_pickle(load_file["mean_covs_file"])
        for k, (mean, cov) in mean_covs.items():
            key = _strip_module(k)
            if key not in paths:
                continue
            path, p = paths[key]
            if isinstance(mean, Number):
                p.hypers["loc"] = np.asarray(float(mean))
            else:
                p.hypers["loc"] = _to_np(mean)
            if isinstance(cov, Number):
                p.hypers["scale"] = np.asarray(float(cov) ** 0.5)
            else:
                assert hasattr(p, "assign_cov") or isinstance(
                    p, prior.ConvCovariance)
                p.assign_cov(_to_np(cov))
    if "fits_dict_file" in load_file:
        assert prior_w is prior.FixedCovGenNorm
        _, fits_dict = _read_pickle(load_file["fits_dict_file"])
        for k, fit in fits_dict.items():
            key = _strip_module(k)
            if key not in paths:
                continue
            path, p = paths[key]
            beta, gn_loc, gn_scale = fit["gennorm"][:3]
            p.hypers["beta"] = np.asarray(float(beta))
            if isinstance(p, prior.FixedCovGenNorm):
                p.hypers["base_scale"] = np.asarray(float(gn_scale))
            else:
                p.hypers["loc"] = np.asarray(float(gn_loc))
                p.hypers["scale"] = np.asarray(float(gn_scale))
    return model
