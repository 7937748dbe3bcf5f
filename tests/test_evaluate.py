"""Evaluation-layer tests: ensemble predictive metrics, calibration errors
(cross-checked against hand-computable cases), OOD AUROC, marginal
likelihood, and post-hoc sample rejection.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_priors_tpu import models
from bnn_priors_tpu.evaluate import (ace, ece, evaluate_marglik,
                                     evaluate_model, evaluate_ood,
                                     reject_samples_, rmsce, sce, tace)


def _bank(model, E, key=0):
    "stack E independent inits as a fake sample bank"
    banks = None
    for i in range(E):
        params, state = model.init(jax.random.key(key + i))
        sd = {**params, **state}
        if banks is None:
            banks = {k: [] for k in sd}
        for k, v in sd.items():
            banks[k].append(np.asarray(v))
    return {k: np.stack(v) for k, v in banks.items()}


def test_evaluate_model_classification():
    model = models.LogisticRegression(4, 3)
    samples = _bank(model, E=5)
    x = jax.random.normal(jax.random.key(9), (23, 4))
    y = jnp.asarray(np.random.default_rng(0).integers(0, 3, 23))
    res = evaluate_model(model, (x, y), samples, calibration_eval=True,
                         batch_size=8)
    for k in ("lp_ensemble", "lp_last", "acc_ensemble", "acc_last",
              "ece", "ace", "rmsce"):
        assert k in res and np.isfinite(res[k])
    assert res["lp_ensemble"] <= 0
    # ensemble log-prob should match a direct computation
    f = np.stack([
        np.asarray(jax.nn.log_softmax(
            model.net_apply({k: jnp.asarray(v[i]) for k, v in samples.items()},
                            {}, x)[0], -1))
        for i in range(5)])
    lps = np.take_along_axis(f, np.asarray(y)[None, :, None], axis=2)[:, :, 0]
    expected = (np.logaddexp.reduce(lps, axis=0) - math.log(5)).mean()
    np.testing.assert_allclose(res["lp_ensemble"], expected, rtol=1e-5)


def test_evaluate_model_regression():
    model = models.LinearRegression(3, 2, noise_std=0.5)
    samples = _bank(model, E=4)
    x = jax.random.normal(jax.random.key(2), (11, 3))
    y = jax.random.normal(jax.random.key(3), (11, 2))
    res = evaluate_model(model, (x, y), samples)
    assert np.isfinite(res["lp_ensemble"]) and np.isfinite(res["acc_ensemble"])


def test_evaluate_model_with_batchnorm():
    "sample bank carries batchnorm buffers; eval must route them per sample"
    model = models.ResNet(depth=8)
    samples = _bank(model, E=2)
    assert any("running_mean" in k for k in samples)
    x = jax.random.normal(jax.random.key(4), (6, 3, 32, 32), dtype=jnp.float64)
    y = jnp.asarray([0, 1, 2, 3, 4, 5])
    res = evaluate_model(model, (x, y), samples, batch_size=3)
    assert np.isfinite(res["lp_ensemble"])


def test_calibration_perfect():
    "a perfectly calibrated hard classifier has ~zero ECE"
    rng = np.random.default_rng(0)
    n = 3000
    labels = rng.integers(0, 2, n)
    probs = np.zeros((n, 2))
    # predict the true label with confidence 1: ECE -> 0 requires acc=conf
    probs[np.arange(n), labels] = 1.0
    assert ece(labels, probs) < 1e-6
    assert sce(labels, probs) < 1e-6


def test_calibration_known_value():
    "constant 0.7 confidence, 50% accuracy → |0.5-0.7| = 0.2 ECE"
    n = 1000
    labels = np.concatenate([np.zeros(n // 2), np.ones(n // 2)]).astype(int)
    probs = np.full((n, 2), [0.7, 0.3])
    # max prob always class 0, accuracy 0.5, confidence 0.7
    val = ece(labels, probs)
    np.testing.assert_allclose(val, 0.2, atol=1e-6)
    assert 0.15 < rmsce(labels, probs) < 0.25
    assert np.isfinite(ace(labels, probs))
    assert np.isfinite(tace(labels, probs))


def test_evaluate_ood():
    model = models.LogisticRegression(4, 3)
    samples = _bank(model, E=3)
    k1, k2 = jax.random.split(jax.random.key(11))
    x_in = jax.random.normal(k1, (40, 4)) * 0.1      # near zero: confident?
    x_ood = jax.random.normal(k2, (40, 4)) * 10.0
    y = jnp.zeros((40,), dtype=jnp.int32)
    res = evaluate_ood(model, (x_in, y), (x_ood, y), samples)
    assert 0.0 <= res["auroc"] <= 1.0
    assert 0.0 <= res["auprc"] <= 1.0


def test_evaluate_marglik():
    model = models.GaussianModel(N=2, D=3)
    samples = _bank(model, E=4)
    res = evaluate_marglik(model, samples, samples)
    assert np.isfinite(res["simple_logmarglik"])
    assert res["simple_logmarglik"] <= res["mean_loglik"] + 50


def test_reject_samples():
    samples = {
        "w": np.arange(5, dtype=np.float64)[:, None].repeat(2, 1),
        "steps": np.asarray([10, 20, 30, 40, 50]),
    }
    metrics = {
        "steps": np.asarray([10, 20, 30, 40, 50]),
        "acceptance/is_sample": np.ones(5, dtype=int),
        "acceptance/rejected": np.asarray([0, 0, 1, 0, 1]),
    }
    out = reject_samples_(samples, metrics)
    np.testing.assert_allclose(out["w"][:, 0], [0, 1, 1, 3, 3])


def test_evaluate_model_mesh_sharded_bank():
    """mesh= shards the sample bank over devices; results identical to the
    single-device path (eval is embarrassingly parallel over samples)."""
    from jax.sharding import Mesh

    model = models.ClassificationDenseNet(5, 3, 8, depth=2)
    key = jax.random.key(0)
    E = 11  # deliberately not divisible by 8 (pad-and-trim path)
    banks = []
    for i in range(E):
        p, _ = model.init(jax.random.fold_in(key, i))
        banks.append(p)
    samples = {k: np.stack([np.asarray(b[k]) for b in banks])
               for k in banks[0]}
    x = jax.random.normal(jax.random.key(1), (37, 5))
    y = jax.random.randint(jax.random.key(2), (37,), 0, 3)

    ref = evaluate_model(model, (x, y), samples, likelihood_eval=True,
                         accuracy_eval=True, calibration_eval=True,
                         batch_size=16)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("samples",))
    out = evaluate_model(model, (x, y), samples, likelihood_eval=True,
                         accuracy_eval=True, calibration_eval=True,
                         batch_size=16, mesh=mesh)
    for k in ref:
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-12, err_msg=k)
