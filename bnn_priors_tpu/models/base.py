"""Functional model layer: module tree + likelihood wrappers.

TPU-first re-design of `/root/reference/bnn_priors/models/base.py`. The
reference couples `torch.nn.Module` state with Prior sub-modules; here a
`Module` is a *static description* and all array state lives in two flat
dicts with reference-compatible dotted names:

* ``params`` — every sampled parameter: prior leaves (``....weight_prior.p``)
  and free parameters without priors (e.g. batchnorm ``weight``/``bias``),
* ``state``  — non-sampled buffers (batchnorm running stats), carried
  functionally: ``apply`` returns ``(out, new_state)``.

Everything is pure and jit/vmap/grad-safe; `potential` and friends are the
functions the MCMC kernels differentiate.
"""
from __future__ import annotations

import math
from collections import OrderedDict
from typing import Callable, Dict, Iterator, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import distributions as D
from ..priors.base import Prior, join

Array = jnp.ndarray
ParamStore = Dict[str, Array]


class Module:
    """Static network description. Attribute assignment auto-registers
    sub-`Module`s and `Prior`s (like torch's `nn.Module`), preserving
    insertion order so dotted names match the reference's state_dict."""

    def __init__(self):
        object.__setattr__(self, "_modules", OrderedDict())
        object.__setattr__(self, "_priors", OrderedDict())
        object.__setattr__(self, "_params", OrderedDict())   # name -> (shape, init_fn)
        object.__setattr__(self, "_buffers", OrderedDict())  # name -> (shape, init_fn, dtype)

    def __setattr__(self, name, value):
        if isinstance(value, Prior):
            self._priors[name] = value
        elif isinstance(value, Module):
            self._modules[name] = value
        object.__setattr__(self, name, value)

    # -- declarations ------------------------------------------------------
    def declare_param(self, name: str, shape, init_fn: Callable):
        """A free parameter with no prior term (flat prior); still sampled
        by the MCMC kernel (reference: plain nn.Parameter)."""
        self._params[name] = (tuple(shape), init_fn)

    def declare_buffer(self, name: str, shape, init_fn: Callable, dtype=None):
        """Non-sampled state (running stats)."""
        self._buffers[name] = (tuple(shape), init_fn, dtype)

    # -- traversal ---------------------------------------------------------
    def named_modules(self, prefix: str = "") -> Iterator[Tuple[str, "Module"]]:
        yield prefix, self
        for name, mod in self._modules.items():
            yield from mod.named_modules(join(prefix, name))

    def named_priors(self, prefix: str = "") -> Iterator[Tuple[str, Prior]]:
        """Top-level priors only (each yields its own hyper-sub-priors via
        `Prior.log_prob`); parent-first order like the reference."""
        for mod_prefix, mod in self.named_modules(prefix):
            for name, p in mod._priors.items():
                yield join(mod_prefix, name), p

    # -- init --------------------------------------------------------------
    def init(self, key, prefix: str = "", dtype=None) -> Tuple[ParamStore, ParamStore]:
        from ..priors.base import default_dtype
        dtype = dtype or default_dtype()
        params: ParamStore = {}
        state: ParamStore = {}
        mods = list(self.named_modules(prefix))
        n_keys = sum(len(m._priors) + len(m._params) for _, m in mods)
        keys = iter(jax.random.split(key, max(n_keys, 1)))
        for mod_prefix, mod in mods:
            for name, p in mod._priors.items():
                params.update(p.init(next(keys), join(mod_prefix, name), dtype))
            for name, (shape, init_fn) in mod._params.items():
                params[join(mod_prefix, name)] = jnp.asarray(
                    init_fn(next(keys), shape), dtype=dtype)
            for name, (shape, init_fn, bdtype) in mod._buffers.items():
                state[join(mod_prefix, name)] = jnp.asarray(
                    init_fn(None, shape), dtype=bdtype or dtype)
        return params, state

    # -- forward -----------------------------------------------------------
    def apply(self, params: ParamStore, state: ParamStore, prefix: str,
              x: Array, train: bool = False) -> Tuple[Array, ParamStore]:
        raise NotImplementedError


def named_priors_of(root: Union[Module, "Model"], prefix: str = ""):
    if isinstance(root, Model):
        return root.named_priors()
    return root.named_priors(prefix)


class Model(Module):
    """Likelihood wrapper; subclasses define `likelihood_log_prob` etc.

    `potential(params, state, x, y, eff_num_data)` is the -log joint used
    by the samplers (reference models/base.py:64-70), with the unbiased
    minibatch scaling `eff_num_data / batch_size`.
    """

    def __init__(self, net: Module):
        super().__init__()
        self.net = net

    # -- priors ------------------------------------------------------------
    def log_prior(self, params: ParamStore) -> Array:
        total = jnp.asarray(0.0, dtype=jnp.result_type(*jax.tree_util.tree_leaves(params)) if params else jnp.float32)
        for prefix, p in self.named_priors():
            total = total + p.log_prob(params, prefix)
        return total

    def init(self, key, prefix: str = "", dtype=None):
        return super().init(key, prefix, dtype)

    def sample_all_priors(self, key, params: ParamStore) -> ParamStore:
        out = dict(params)
        priors = list(self.named_priors())
        keys = jax.random.split(key, max(len(priors), 1))
        for k, (prefix, p) in zip(keys, priors):
            out = p.sample(k, out, prefix)
        return out

    # -- likelihood (subclass API) ----------------------------------------
    def net_apply(self, params, state, x, train=False):
        return self.net.apply(params, state, "net", x, train)

    def likelihood_log_prob(self, params, f: Array, y: Array) -> Array:
        "per-datapoint log p(y_i | f_i); shape (batch,)"
        raise NotImplementedError

    def predictions(self, f: Array, params: ParamStore):
        "representation of p(y|f): logits or (mean, std)"
        raise NotImplementedError

    def acc_fn(self, f: Array, y: Array, params: ParamStore) -> Array:
        "per-datapoint accuracy / negative squared error proxy"
        raise NotImplementedError

    # -- potential ---------------------------------------------------------
    def log_likelihood(self, params, state, x, y, eff_num_data, train=False,
                       mask: Optional[Array] = None, compute_dtype=None):
        """Unbiased minibatch estimate of log p(y | x, params)
        (reference models/base.py:42-62). `mask` supports padded batches:
        masked-out rows contribute 0 and the scaling divides by the true
        batch size.

        `compute_dtype` (e.g. ``jnp.bfloat16``) runs the *net forward* in
        reduced precision — the TPU-native mixed-precision scheme: params
        and inputs are cast down for the conv/matmul-heavy net, while the
        likelihood itself, its reduction, and the prior stay in the
        parameter dtype. Gradients w.r.t. the original params flow through
        the casts (standard mixed precision); the resulting gradient error
        is far below the minibatch noise SG-MCMC already tolerates."""
        if compute_dtype is not None and compute_dtype != x.dtype:
            def down(v):
                return (v.astype(compute_dtype)
                        if jnp.issubdtype(v.dtype, jnp.floating) else v)
            f, new_state = self.net_apply(
                jax.tree_util.tree_map(down, params), state, down(x), train)
            f = f.astype(x.dtype)
            # restore each state leaf's storage dtype; keys a model's
            # net_apply introduces beyond the input state keep their
            # computed dtype instead of raising
            new_state = {k: (v.astype(state[k].dtype) if k in state else v)
                         for k, v in new_state.items()}
        else:
            f, new_state = self.net_apply(params, state, x, train)
        lps = self.likelihood_log_prob(params, f, y)
        if mask is not None:
            lps = lps * mask
            batch_size = jnp.sum(mask)
        else:
            batch_size = x.shape[0]
        ll = jnp.sum(lps) * (eff_num_data / batch_size)
        return ll, new_state, f

    def potential(self, params, state, x, y, eff_num_data, train=False,
                  mask: Optional[Array] = None, compute_dtype=None):
        ll, new_state, _ = self.log_likelihood(
            params, state, x, y, eff_num_data, train, mask, compute_dtype)
        return -(ll + self.log_prior(params)), new_state

    def potential_avg(self, params, state, x, y, eff_num_data, train=False,
                      mask: Optional[Array] = None, compute_dtype=None):
        "-log p(y, params | x) / eff_num_data — what the samplers differentiate"
        ll, new_state, _ = self.log_likelihood(params, state, x, y, 1.0,
                                               train, mask, compute_dtype)
        return -(ll + self.log_prior(params) / eff_num_data), new_state

    def split_potential_and_acc(self, params, state, x, y, eff_num_data,
                                train=False, mask: Optional[Array] = None):
        """Returns (loss, log_prior, potential_avg, acc_mean, f, new_state);
        reference models/base.py:72-81."""
        ll_avg, new_state, f = self.log_likelihood(
            params, state, x, y, 1.0, train, mask)
        loss = -ll_avg
        log_prior = self.log_prior(params)
        potential_avg = loss - log_prior / eff_num_data
        acc = self.acc_fn(f, y, params)
        if mask is not None:
            acc_mean = jnp.sum(acc * mask) / jnp.sum(mask)
        else:
            acc_mean = jnp.mean(acc)
        return loss, log_prior, potential_avg, acc_mean, f, new_state

    def get_potential(self, x, y, eff_num_data=None, state=None):
        "returns potential_fn(params) -> scalar, for classical full-batch HMC"
        if eff_num_data is None:
            eff_num_data = x.shape[0]
        state = state if state is not None else {}

        def potential_fn(params):
            pot, _ = self.potential(params, state, x, y, eff_num_data)
            return pot
        return potential_fn

    def potential_avg_fn(self, state, x, y, eff_num_data, train=True,
                         mask: Optional[Array] = None, compute_dtype=None):
        """The closure the SG-MCMC kernels differentiate:
        params -> (potential_avg, (new_state, aux))."""

        def fn(params):
            ll_avg, new_state, f = self.log_likelihood(
                params, state, x, y, 1.0, train, mask, compute_dtype)
            loss = -ll_avg
            log_prior = self.log_prior(params)
            pot = loss - log_prior / eff_num_data
            acc = self.acc_fn(f, y, params)
            if mask is not None:
                acc_mean = jnp.sum(acc * mask) / jnp.sum(mask)
            else:
                acc_mean = jnp.mean(acc)
            return pot, (new_state, {"loss": loss, "log_prior": log_prior,
                                     "acc": acc_mean})
        return fn


class RegressionModel(Model):
    """Independent Gaussian likelihood; `noise_std` may be a Prior
    (reference models/base.py:139-165)."""

    def __init__(self, net: Module, noise_std: Union[float, Prior]):
        super().__init__(net)
        self.noise_std = noise_std

    def _noise_std(self, params):
        if isinstance(self.noise_std, Prior):
            return self.noise_std.forward(params, "noise_std")
        return jnp.asarray(self.noise_std)

    def likelihood_log_prob(self, params, f, y):
        std = self._noise_std(params)
        lp = D.Normal(f, std).log_prob(y)
        return jnp.sum(lp.reshape(lp.shape[0], -1), axis=-1)

    def predictions(self, f, params):
        return f, self._noise_std(params)

    def acc_fn(self, f, y, params):
        diff = f - y
        return jnp.einsum("nd,nd->n", diff, diff)  # MSE per point


class ClassificationModel(Model):
    """Categorical likelihood with softmax temperature
    (reference models/base.py:168-191)."""

    def __init__(self, net: Module, softmax_temp: Union[float, Prior] = 1.0):
        super().__init__(net)
        self.softmax_temp = softmax_temp

    def _logits(self, f, params):
        if isinstance(self.softmax_temp, Prior):
            temp = self.softmax_temp.forward(params, "softmax_temp")
        else:
            temp = jnp.asarray(self.softmax_temp)
        return f / temp

    def likelihood_log_prob(self, params, f, y):
        logits = self._logits(f, params)
        logZ = jax.scipy.special.logsumexp(logits, axis=-1)
        return jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0] - logZ

    def predictions(self, f, params):
        return self._logits(f, params)

    def acc_fn(self, f, y, params):
        logits = self._logits(f, params)
        return (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
