"""Posterior-predictive evaluation over a sample bank.

TPU-native re-design of reference `bnn_priors/exp_utils.py:250-406`: the
reference loads each sample's state_dict into the model sequentially and
loops over test batches on the host; here the whole sample bank is a
stacked pytree on device and ONE jitted `lax.scan` over samples (inner scan
over test batches) produces the per-sample log-prob matrix `lps[E, N]` and
prediction tensor — no per-sample host round trips.

Metric semantics match the reference exactly:
  * ensemble log-prob  = mean_n [ logsumexp_e lps[e,n] − log E ]
  * ensemble prediction: classification — logsumexp of *normalized* logits
    over samples − log E (i.e. the mean predictive distribution);
    regression — mean of means, unit variance (exp_utils.py:300-321)
  * ece/ace/rmsce on the ensemble probabilities
  * OOD score = max softmax prob of the mean predictive
    (exp_utils.py:343-380): AUROC/AUPRC of in-dist vs OOD
  * simple log-marginal-likelihood from prior log-probs (exp_utils.py:383-406)
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.metrics import average_precision_score, roc_auc_score

from .calibration import ace, ece, rmsce


def _n_samples(samples: Dict[str, np.ndarray]) -> int:
    return min(len(v) for v in samples.values())


def split_sample_bank(model, samples):
    "split a stacked state_dict bank into (params_bank, state_bank)"
    param_keys = set()
    mod_prefixes = []
    for prefix, mod in model.named_modules():
        for name, p in mod._priors.items():
            from ..priors.base import join
            for leaf in p.leaf_shapes(join(prefix, name)):
                param_keys.add(leaf)
        for name in mod._params:
            from ..priors.base import join
            param_keys.add(join(prefix, name))
    params_bank = {k: v for k, v in samples.items()
                   if k in param_keys}
    state_bank = {k: v for k, v in samples.items()
                  if k not in param_keys and k not in ("steps", "timestamps")}
    return params_bank, state_bank


def _predict_all(model, x, y, samples, batch_size=512, mesh=None):
    """Per-sample predictions over the full test set.
    Returns (lps[E,N], preds[E,N,C]) as device arrays; preds are normalized
    log-probs for classification, means for regression.

    `mesh`: optional 1-axis `jax.sharding.Mesh` — the sample bank is
    sharded over its devices and each device evaluates its own samples
    (posterior-predictive evaluation is embarrassingly parallel over the
    bank; the reference evaluates strictly sequentially,
    exp_utils.py:273-298). Results match the single-device path to
    rtol 1e-12 (tests/test_evaluate.py)."""
    from ..models.base import ClassificationModel
    is_classification = isinstance(model, ClassificationModel)

    E = _n_samples(samples)
    params_bank, state_bank = split_sample_bank(model, samples)
    params_bank = {k: jnp.asarray(v[:E]) for k, v in params_bank.items()}
    state_bank = {k: jnp.asarray(v[:E]) for k, v in state_bank.items()}

    n = x.shape[0]
    B = min(batch_size, n)
    n_batches = math.ceil(n / B)
    pad = n_batches * B - n
    xs = jnp.concatenate([x, x[:pad]]) if pad else x
    ys = jnp.concatenate([y, y[:pad]]) if pad else y
    xs = xs.reshape((n_batches, B) + x.shape[1:])
    ys = ys.reshape((n_batches, B) + y.shape[1:])

    # ONE jitted predictor per model object, with the test batches as
    # ARGUMENTS: evaluating many chains' banks (train_bnn's per-chain +
    # pooled loop) re-traced a fresh closure per call — 9 ResNet-scan
    # traces per CLI run, the dominant cost of its final-eval phase.
    # Cached on the model, same-shape calls now hit jit's own cache.
    run = getattr(model, "_predict_all_jit", None)
    if run is None:
        @jax.jit
        def run(params_bank, state_bank, xs, ys):
            def per_sample(_, sample):
                params, state = sample

                def per_batch(_, batch):
                    xb, yb = batch
                    f, _ = model.net_apply(params, state, xb, train=False)
                    if is_classification:
                        logits = model._logits(f, params)
                        preds = jax.nn.log_softmax(logits, axis=-1)
                        lps = jnp.take_along_axis(
                            preds, yb[:, None], axis=-1)[:, 0]
                    else:
                        preds = f
                        lps = model.likelihood_log_prob(params, f, yb)
                    return None, (lps, preds)
                _, (lps, preds) = jax.lax.scan(per_batch, None, (xs, ys))
                return None, (lps.reshape(-1),
                              preds.reshape((-1,) + preds.shape[2:]))
            _, (lps, preds) = jax.lax.scan(per_sample, None,
                                           (params_bank, state_bank))
            return lps, preds
        model._predict_all_jit = run

    if mesh is None:
        lps, preds = run(params_bank, state_bank, xs, ys)
    else:
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        n_dev = int(np.prod(mesh.devices.shape))
        padE = (-E) % n_dev
        if padE:  # replicate the last sample; trimmed below
            def _padE(v):
                return jnp.concatenate(
                    [v, jnp.broadcast_to(v[-1:], (padE,) + v.shape[1:])])
            params_bank = {k: _padE(v) for k, v in params_bank.items()}
            state_bank = {k: _padE(v) for k, v in state_bank.items()}
        # same retrace trap as the single-device path: cache the sharded
        # wrapper per (model, mesh) so repeated multi-device evaluations
        # hit jit's cache instead of re-tracing the whole predictor
        cache = getattr(model, "_predict_sharded_jit", None)
        if cache is None:
            cache = model._predict_sharded_jit = {}
        mesh_key = (id(mesh), axis, n_dev)
        sharded = cache.get(mesh_key)
        if sharded is None:
            sharded = cache[mesh_key] = jax.jit(jax.shard_map(
                run, mesh=mesh, in_specs=(P(axis), P(axis), P(), P()),
                out_specs=P(axis), check_vma=False))
        lps, preds = sharded(params_bank, state_bank, xs, ys)
        if padE:
            lps = lps[:E]
            preds = preds[:E]
    if pad:
        lps = lps[:, :n]
        preds = preds[:, :n]
    return lps, preds, is_classification


def evaluate_model(model, test_data, samples, likelihood_eval=True,
                   accuracy_eval=True, calibration_eval=False,
                   batch_size=512, mesh=None):
    """Reference `evaluate_model` (exp_utils.py:250-340) over a sample bank.
    `mesh` shards the bank's sample axis over devices (see _predict_all)."""
    x, y = test_data
    lps, preds, is_classification = _predict_all(model, x, y, samples,
                                                 batch_size, mesh=mesh)
    E = lps.shape[0]
    lps = np.asarray(lps, dtype=np.float64)
    preds = np.asarray(preds, dtype=np.float64)
    labels = np.asarray(y)

    lps_each_model = lps.mean(axis=1)
    lp_ensemble = float(
        (np.logaddexp.reduce(lps, axis=0) - math.log(E)).mean())

    if is_classification:
        ens_logits = np.logaddexp.reduce(preds, axis=0) - math.log(E)
        ens_logp = ens_logits - np.logaddexp.reduce(ens_logits, axis=-1,
                                                    keepdims=True)
        acc_ensemble = float((np.argmax(ens_logp, -1) == labels).mean())
        acc_last = float((np.argmax(preds[-1], -1) == labels).mean())
        probs_mean = np.exp(ens_logp)
    else:
        mean_pred = preds.mean(axis=0)
        diff = mean_pred - labels
        acc_ensemble = float(np.einsum("nd,nd->n", diff, diff).mean())
        diff = preds[-1] - labels
        acc_last = float(np.einsum("nd,nd->n", diff, diff).mean())

    results = {}
    if likelihood_eval:
        results["lp_ensemble"] = lp_ensemble
        results["lp_last"] = float(lps_each_model[-1])
    if accuracy_eval:
        results["acc_ensemble"] = acc_ensemble
        results["acc_last"] = acc_last
    if calibration_eval:
        if not is_classification:
            raise ValueError("calibration metrics need classification")
        results["ece"] = float(ece(labels, probs_mean))
        results["ace"] = float(ace(labels, probs_mean))
        results["rmsce"] = float(rmsce(labels, probs_mean))
    return results


def evaluate_ood(model, train_data, ood_data, samples, batch_size=512,
                 mesh=None):
    """AUROC/AUPRC of in-distribution vs OOD, scored by the sample-averaged
    max softmax probability (reference exp_utils.py:343-380)."""
    scores = {}
    for name, (x, y) in (("train", train_data), ("eval", ood_data)):
        if y is None or not jnp.issubdtype(jnp.asarray(y).dtype, jnp.integer):
            # labels are unused for the max-softmax score; OOD sets may
            # carry non-class (regression) targets
            y = jnp.zeros((x.shape[0],), dtype=jnp.int32)
        _, preds, is_classification = _predict_all(model, x, y, samples,
                                                   batch_size, mesh=mesh)
        assert is_classification, "OOD eval needs a classification model"
        probs = np.exp(np.asarray(preds, dtype=np.float64))
        probs = probs.mean(axis=0)      # over samples
        scores[name] = probs.max(axis=-1)  # max class probability

    labels = np.concatenate([np.ones_like(scores["train"]),
                             np.zeros_like(scores["eval"])])
    joint = np.concatenate([scores["train"], scores["eval"]])
    return {"auroc": float(roc_auc_score(labels, joint)),
            "auprc": float(average_precision_score(labels, joint))}


def evaluate_marglik(model, train_samples, eval_samples):
    "Simple log-marginal-likelihood estimate (reference exp_utils.py:383-406)."
    E = _n_samples(train_samples)
    assert E == _n_samples(eval_samples)
    log_priors = []
    for i in range(E):
        sd = {k: jnp.asarray(v[i]) for k, v in train_samples.items()
              if k not in ("steps", "timestamps")}
        sd.update({k: jnp.asarray(v[i]) for k, v in eval_samples.items()
                   if k not in ("steps", "timestamps")})
        log_priors.append(float(model.log_prior(sd)))
    log_priors = np.asarray(log_priors)
    return {
        "simple_logmarglik": float(
            np.logaddexp.reduce(log_priors) - math.log(E)),
        "mean_loglik": float(log_priors.mean()),
        "simple_marglik": float(np.exp(log_priors).mean()),
    }


def reject_samples_(samples: Dict[str, np.ndarray], metrics) -> Dict:
    """Post-hoc rejected-sample resolution: replace each rejected sample
    with its predecessor, keyed by step index, using the `acceptance/*`
    metrics time series (reference exp_utils.py:565-580, with its
    use-before-assign bug fixed)."""
    if "acceptance/rejected" not in metrics or "steps" not in samples:
        return samples
    is_sample = np.asarray(metrics["acceptance/is_sample"]) == 1
    rejected_arr = np.asarray(metrics["acceptance/rejected"])[is_sample]
    metric_steps = np.asarray(metrics["steps"])[is_sample]
    rejected = {int(s): bool(r) for s, r in zip(metric_steps, rejected_arr)}
    for i in range(_n_samples(samples)):
        step = int(np.asarray(samples["steps"])[i])
        if rejected.get(step, False) and i > 0:
            for k in samples:
                samples[k][i] = samples[k][i - 1]
    return samples
