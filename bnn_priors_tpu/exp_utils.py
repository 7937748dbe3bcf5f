"""Experiment glue: string registries and initializers
(reference: `bnn_priors/exp_utils.py`).

`get_data` / `get_model` preserve the reference's registry names so paper
commands translate 1:1 (SURVEY §5.6). Initializers replicate the He
variants operating on `*.weight_prior.p` / `*.bias_prior.p` leaves
(exp_utils.py:63-96).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import data as data_mod
from . import models
from .priors import LogNormal, get_prior

__all__ = ("get_data", "get_model", "he_initialize", "he_zerobias_initialize",
           "he_uniform_initialize")


_DATA_REGISTRY = {
    "cifar10": data_mod.CIFAR10,
    "cifar10_augmented": data_mod.CIFAR10Augmented,
    "cifar10_small": data_mod.CIFAR10Small,
    "mnist": data_mod.MNIST,
    "rotated_mnist": data_mod.RotatedMNIST,
    "fashion_mnist": data_mod.FashionMNIST,
    "svhn": data_mod.SVHN,
    "random": data_mod.RandomData,
    "random_ood_test": data_mod.RandomOODTestData,
    # synthetic stand-ins (no downloads in the build environment)
    "fake_mnist": data_mod.FakeMNIST,
    "fake_cifar10": data_mod.FakeCIFAR10,
}


def get_data(data: str, synthetic_ok=True, **kwargs):
    "string → dataset (reference exp_utils.py:30-60 + Fake* extensions)"
    if data[:3] == "UCI":
        uci_dataset = data.split("_")[1]
        assert uci_dataset in ["boston", "concrete", "energy", "kin8nm",
                               "naval", "power", "protein", "wine", "yacht"]
        return data_mod.UCI(uci_dataset, 0, **kwargs)
    if data[:8] == "cifar10c":
        corruption = data.split("-")[1]
        return data_mod.CIFAR10_C(corruption, **kwargs)
    if data not in _DATA_REGISTRY:
        raise ValueError(f"Unknown data={data!r}")
    return _DATA_REGISTRY[data](**kwargs)


def get_data_seeded(data: str, seed):
    """get_data, passing `seed=` only when the dataset's constructor
    accepts it (signature-checked — a blanket `except TypeError` would
    swallow genuine TypeErrors raised INSIDE a seed-accepting
    constructor and silently return an unseeded dataset, the exact
    train/eval mismatch the seeding exists to prevent)."""
    import inspect
    cls = _DATA_REGISTRY.get(data)
    if cls is not None and "seed" in inspect.signature(cls).parameters:
        return get_data(data, seed=int(seed))
    return get_data(data)  # deterministic (file-backed/UCI/corrupted)


def get_data_from_config(cfg, key=None):
    """Dataset from a training config, including `synthetic.<base>.<prior>`
    names (reference train_bnn.py:132-142): the true model's parameters are
    drawn from the config seed, so train and eval regenerate the IDENTICAL
    synthetic dataset. Returns (data, key_after)."""
    import jax
    import jax.numpy as jnp
    from .data import Synthetic

    if key is None:
        key = jax.random.key(cfg["seed"])
    data_name = cfg["data"]
    if not data_name.startswith("synthetic."):
        # toy datasets (random/random_ood_test) draw their points from a
        # numpy RNG; pin it to the config seed so `eval_bnn.py` re-hydration
        # evaluates the SAME dataset the model trained on. (The reference
        # leaves these unseeded — toy_data.py:91-99 — so its eval on
        # data=random silently scores a fresh dataset; deliberate fix.)
        return get_data_seeded(data_name, cfg["seed"]), key
    _, base_name, prior_name = data_name.split(".")
    # toy bases draw random inputs — pin them to the config seed so
    # eval regenerates the same dataset; file-backed bases (UCI, MNIST)
    # are deterministic and take no seed (signature-checked)
    base = get_data_seeded(base_name, cfg["seed"])
    model_true = get_model(
        base.norm.train_X, base.norm.train_y, cfg["model"], cfg["width"],
        cfg["depth"], prior_name, cfg["weight_loc"], cfg["weight_scale"],
        cfg["bias_prior"], cfg["bias_loc"], cfg["bias_scale"],
        cfg["batchnorm"], {}, cfg["bias_prior_params"])
    k_p, k_s, key = jax.random.split(key, 3)
    params, mstate = model_true.init(k_p, dtype=jnp.float32)
    params = model_true.sample_all_priors(k_s, params)
    return Synthetic(base, model_true, params, mstate, key=key), key


def get_model(x_train, y_train, model: str, width, depth, weight_prior,
              weight_loc, weight_scale, bias_prior, bias_loc, bias_scale,
              batchnorm, weight_prior_params: Dict, bias_prior_params: Dict):
    "string → model (reference exp_utils.py:108-234)"
    if weight_prior in ["cauchy"]:
        # anything with infinite variance scales by 1/dim
        scaling_fn = lambda std, dim: std / dim
    else:
        scaling_fn = lambda std, dim: std / dim ** 0.5
    weight_prior_cls = get_prior(weight_prior)
    bias_prior_cls = get_prior(bias_prior)
    kw = dict(prior_w=weight_prior_cls, loc_w=weight_loc, std_w=weight_scale,
              prior_b=bias_prior_cls, loc_b=bias_loc, std_b=bias_scale,
              scaling_fn=scaling_fn, weight_prior_params=weight_prior_params,
              bias_prior_params=bias_prior_params)

    def img_dims():
        if x_train.ndim == 4:
            return x_train.shape[1], x_train.shape[-2]
        return 1, int(math.sqrt(x_train.shape[-1]))

    # reference uses y.max()+1 (exp_utils.py:117); tolerate (N,1)-shaped or
    # float toy targets (synthetic.<data>.<prior> resamples labels anyway)
    n_classes = max(int(jnp.max(jnp.ravel(y_train))) + 1, 2)

    if model == "densenet":
        return models.DenseNet(x_train.shape[-1], y_train.shape[-1], width,
                               depth, noise_std=LogNormal((), -1.0, 0.2), **kw)
    if model == "raobdensenet":
        return models.RaoBDenseNet(x_train, y_train, width,
                                   noise_std=LogNormal((), -1.0, 0.2))
    if model == "classificationdensenet":
        return models.ClassificationDenseNet(
            x_train.shape[-1], n_classes, width, depth, softmax_temp=1.0, **kw)
    if model in ("classificationconvnet", "correlatedclassificationconvnet",
                 "datadrivengaussconv", "datadrivendoublegammaconv"):
        in_channels, img_height = img_dims()
        cls = {
            "classificationconvnet": models.ClassificationConvNet,
            "correlatedclassificationconvnet":
                models.CorrelatedClassificationConvNet,
            "datadrivengaussconv":
                models.DataDrivenGaussianClassificationConvNet,
            "datadrivendoublegammaconv":
                models.DataDrivenDoubleGammaClassificationConvNet,
        }[model]
        return cls(in_channels, img_height, n_classes, width, depth,
                   softmax_temp=1.0, **kw)
    if model == "resnet18":
        return models.PreActResNet18(bn=batchnorm, softmax_temp=1.0, **kw)
    if model == "vwidth_resnet18":
        return models.PreActResNet18(width=width, bn=batchnorm,
                                     softmax_temp=1.0, **kw)
    if model == "datadriven_resnet18":
        kw2 = dict(kw)
        kw2["scaling_fn"] = None
        return models.DataDrivenPreActResNet18(bn=batchnorm, softmax_temp=1.0,
                                               **kw2)
    if model == "vwidth_datadriven_resnet18":
        kw2 = dict(kw)
        kw2["scaling_fn"] = None
        return models.DataDrivenPreActResNet18(width=width, bn=batchnorm,
                                               softmax_temp=1.0, **kw2)
    if model == "thin_resnet18":
        return models.ThinPreActResNet18(bn=batchnorm, softmax_temp=1.0, **kw)
    if model == "resnet34":
        return models.PreActResNet34(bn=batchnorm, softmax_temp=1.0, **kw)
    if model == "googleresnet":
        return models.ResNet(depth=20, bn=batchnorm, softmax_temp=1.0, **kw)
    if model == "datadriven_mvt_googleresnet":
        return models.DataDrivenMVTGoogleResNet(
            softmax_temp=1.0, depth=20, num_classes=10, bn=batchnorm)
    if model == "decreasing_mvt_googleresnet":
        return models.DecreasingMVTGoogleResNet(
            depth=20, bn=batchnorm, softmax_temp=1.0, **kw)
    if model == "correlatedgoogleresnet":
        return models.CorrelatedResNet(depth=20, bn=batchnorm,
                                       softmax_temp=1.0, **kw)
    if model == "linear":
        return models.LinearRegression(
            x_train.shape[-1], y_train.shape[-1], noise_std=0.5, **kw)
    if model == "logistic":
        return models.LogisticRegression(
            x_train.shape[-1], n_classes, softmax_temp=1.0, **kw)
    if model == "raob_linear":
        return models.RaoBLinearRegression(x_train, y_train, noise_std=0.5)
    if model == "test_gaussian":
        return models.GaussianModel(N=1, D=100)
    raise ValueError(f"model={model!r}")


# -- initializers (reference exp_utils.py:63-96) ---------------------------

def _kaiming_normal(key, shape, mode="fan_in"):
    "torch kaiming_normal_(mode='fan_in', nonlinearity='relu')"
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
    gain = math.sqrt(2.0)
    std = gain / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape)


def _kaiming_uniform(key, shape, a=math.sqrt(5)):
    "torch kaiming_uniform_(a=sqrt(5)) — the conv default init"
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
    gain = math.sqrt(2.0 / (1 + a ** 2))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def he_initialize(params: Dict, key):
    "kaiming-normal weights, uniform ±1/√fan_out biases"
    out = dict(params)
    for i, (name, p) in enumerate(params.items()):
        k = jax.random.fold_in(key, i)
        if "weight_prior.p" in name:
            out[name] = _kaiming_normal(k, p.shape).astype(p.dtype)
        elif "bias_prior.p" in name:
            bound = 1 / math.sqrt(p.shape[0])
            out[name] = jax.random.uniform(
                k, p.shape, minval=-bound, maxval=bound).astype(p.dtype)
    return out


def he_zerobias_initialize(params: Dict, key):
    out = dict(params)
    for i, (name, p) in enumerate(params.items()):
        k = jax.random.fold_in(key, i)
        if "weight_prior.p" in name:
            out[name] = _kaiming_normal(k, p.shape).astype(p.dtype)
        elif "bias_prior.p" in name:
            out[name] = jnp.zeros_like(p)
    return out


def he_uniform_initialize(params: Dict, key):
    "the torch-default init family (reference exp_utils.py:80-96)"
    out = dict(params)
    for i, (name, p) in enumerate(params.items()):
        k = jax.random.fold_in(key, i)
        if "weight_prior.p" in name:
            if "conv" in name or "shortcut" in name or p.ndim == 4:
                out[name] = _kaiming_uniform(k, p.shape).astype(p.dtype)
            elif "linear" in name or p.ndim == 2:
                bound = 1 / math.sqrt(p.shape[1])
                out[name] = jax.random.uniform(
                    k, p.shape, minval=-bound, maxval=bound).astype(p.dtype)
            else:
                raise NotImplementedError(name)
        elif "bias_prior.p" in name:
            if "conv" in name or "shortcut" in name:
                raise NotImplementedError(name)
            elif "linear" in name or p.ndim == 1:
                bound = 1 / math.sqrt(p.shape[0])
                out[name] = jax.random.uniform(
                    k, p.shape, minval=-bound, maxval=bound).astype(p.dtype)
            else:
                raise NotImplementedError(name)
    return out
