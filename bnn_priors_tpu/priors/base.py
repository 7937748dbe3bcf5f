"""Prior DSL over flat parameter stores.

The reference implementation (`/root/reference/bnn_priors/prior/base.py`)
makes every NN parameter a `torch.nn.Module` holding `self.p`, with
hyperparameters that may themselves be sub-Priors. That stateful
module-graph design does not fit XLA's compilation model, so here a
`Prior` is a *static description* (plain Python object, fixed at trace
time) and all array state lives in a flat ``params: dict[str, Array]``
("param store") keyed by dotted names that mirror the reference's
``state_dict`` naming (e.g. ``net.0.weight_prior.p``,
``net.0.weight_prior.scale.p`` for hierarchical priors).

All methods are pure functions of ``(params, prefix)`` and are safe under
``jit`` / ``grad`` / ``vmap``:

* ``log_prob(params, prefix)``  — own density term + all sub-prior terms
* ``forward(params, prefix)``  — effective (possibly reparameterized) value
* ``init(key, prefix, dtype)`` — initial store entries (non-jitted, run once)
* ``sample(key, params, prefix)`` — fresh draw of every leaf

Semantics notes (parity with the reference):
  * Reparameterized priors define their density *in p-space including the
    reference's conventions*: LogNormal subtracts ``sum(p)``
    (`prior/loc_scale.py:86-91`); Gamma/HalfCauchy evaluate the density at
    ``softplus(p)`` with **no** Jacobian correction
    (`prior/transformed.py:50-80`); Uniform uses the analytic
    ``-log(high-low)`` (`prior/transformed.py:33-44`).
  * Hierarchical hypers resolve through the child prior's ``forward``.
"""
from __future__ import annotations

from numbers import Number
from typing import Dict, Iterator, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import distributions as D

Array = jnp.ndarray
ParamStore = Dict[str, Array]


def join(prefix: str, name: str) -> str:
    return name if prefix == "" else prefix + "." + name


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class Prior:
    """Base class. Subclasses define `_dist(**hypers)` returning a
    distribution from `bnn_priors_tpu.distributions`, evaluated lazily so
    hierarchical hypers stay traceable."""

    #: if True this prior shares its `p` leaf with a parent (mixtures) and
    #: contributes no own leaf / own log-prob term.
    suppress_own: bool = False

    def __init__(self, shape, **hypers):
        self.shape: Tuple[int, ...] = tuple(int(s) for s in shape)
        self.hypers: Dict[str, object] = {}
        self.pinned_init: Optional[np.ndarray] = None
        for key, arg in hypers.items():
            assert key != "p", "repeated name of parameter"
            if isinstance(arg, Number):
                arg = np.asarray(arg)
            self.hypers[key] = arg

    # ---- structure -------------------------------------------------------
    def children(self) -> Dict[str, "Prior"]:
        return {k: v for k, v in self.hypers.items() if isinstance(v, Prior)}

    def named_priors(self, prefix: str = "") -> Iterator[Tuple[str, "Prior"]]:
        """Parent-first iteration, mirroring torch `named_modules` order."""
        yield prefix, self
        for name, child in self.children().items():
            yield from child.named_priors(join(prefix, name))

    def leaf_shapes(self, prefix: str = "") -> Dict[str, Tuple[int, ...]]:
        out: Dict[str, Tuple[int, ...]] = {}
        if not self.suppress_own:
            out[join(prefix, "p")] = self.shape
        for name, shape in self.extra_leaf_shapes().items():
            out[join(prefix, name)] = shape
        for name, child in self.children().items():
            out.update(child.leaf_shapes(join(prefix, name)))
        return out

    def extra_leaf_shapes(self) -> Dict[str, Tuple[int, ...]]:
        return {}

    # ---- hyper resolution ------------------------------------------------
    def resolve(self, params: ParamStore, prefix: str, name: str):
        v = self.hypers[name]
        if isinstance(v, Prior):
            return v.forward(params, join(prefix, name))
        if isinstance(v, np.ndarray) or isinstance(v, (int, float)):
            return jnp.asarray(v)
        return v

    def resolved_hypers(self, params: ParamStore, prefix: str) -> Dict[str, Array]:
        return {k: self.resolve(params, prefix, k) for k in self.hypers}

    # ---- density / value -------------------------------------------------
    def _dist(self, **hypers):
        raise NotImplementedError

    def _dist_obj(self, params: ParamStore, prefix: str):
        return self._dist(**self.resolved_hypers(params, prefix))

    def p(self, params: ParamStore, prefix: str) -> Array:
        return params[join(prefix, "p")]

    def forward(self, params: ParamStore, prefix: str) -> Array:
        """Effective value of the parameter carrying this prior."""
        return self.p(params, prefix)

    def log_prob_value(self, params: ParamStore, prefix: str, value: Array) -> Array:
        """Density of this prior's own term evaluated at `value` (p-space)."""
        return jnp.sum(self._dist_obj(params, prefix).log_prob(value))

    def log_prob_own(self, params: ParamStore, prefix: str) -> Array:
        if self.suppress_own:
            return jnp.asarray(0.0)
        return self.log_prob_value(params, prefix, self.p(params, prefix))

    def log_prob(self, params: ParamStore, prefix: str = "") -> Array:
        """Own term + all sub-prior terms (what `Model.log_prior` sums)."""
        total = self.log_prob_own(params, prefix)
        for name, child in self.children().items():
            total = total + child.log_prob(params, join(prefix, name))
        return total

    # ---- initialization / sampling --------------------------------------
    def _sample_p(self, key, params: ParamStore, prefix: str, dtype) -> Array:
        """Draw an initial/fresh value for the `p` leaf, conditioned on the
        current hyper values in `params`. Mirrors `Prior._sample_value`."""
        dist = self._dist_obj(params, prefix)
        extra = len(dist.batch_shape()) + len(dist.event_shape())
        sample_shape = self.shape[: len(self.shape) - extra] if extra else self.shape
        value = dist.sample(key, sample_shape)
        return jnp.broadcast_to(value, self.shape).astype(dtype)

    def init(self, key, prefix: str = "", dtype=None) -> ParamStore:
        """Initial values for every leaf under this prior (children first so
        the own draw can condition on the childrens' initial values)."""
        dtype = dtype or default_dtype()
        out: ParamStore = {}
        kids = self.children()
        keys = jax.random.split(key, len(kids) + 1 + len(self.extra_leaf_shapes()))
        for i, (name, child) in enumerate(kids.items()):
            out.update(child.init(keys[i], join(prefix, name), dtype))
        for j, (name, shape) in enumerate(self.extra_leaf_shapes().items()):
            out[join(prefix, name)] = self._init_extra_leaf(
                keys[len(kids) + 1 + j], name, shape, dtype
            )
        if not self.suppress_own:
            if self.pinned_init is not None:
                out[join(prefix, "p")] = jnp.asarray(self.pinned_init, dtype=dtype)
            else:
                out[join(prefix, "p")] = self._sample_p(keys[len(kids)], out, prefix, dtype)
        return out

    def _init_extra_leaf(self, key, name, shape, dtype) -> Array:
        return jnp.zeros(shape, dtype=dtype)

    def sample(self, key, params: ParamStore, prefix: str = "") -> ParamStore:
        """Fresh draw of every leaf under this prior, *parent-first*, each
        conditioned on the store as updated so far (matches the iteration
        order of the reference's `sample_all_priors`)."""
        out = dict(params)
        priors = list(self.named_priors(prefix))
        keys = jax.random.split(key, len(priors))
        for k, (pfx, prior) in zip(keys, priors):
            if not prior.suppress_own:
                dtype = out[join(pfx, "p")].dtype
                out[join(pfx, "p")] = prior._sample_p(k, out, pfx, dtype)
        return out


def named_priors(prior_tree: Dict[str, Prior]) -> Iterator[Tuple[str, Prior]]:
    """Iterate over (prefix, Prior) in a dict of top-level priors."""
    for prefix, p in prior_tree.items():
        yield from p.named_priors(prefix)


def value_or_call(v, params: ParamStore = None, prefix: str = ""):
    """Resolve a value that may be a Prior (reference `value_or_call`)."""
    if isinstance(v, Prior):
        return v.forward(params, prefix)
    return jnp.asarray(v)
