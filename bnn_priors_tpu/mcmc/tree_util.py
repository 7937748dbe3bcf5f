"""Pytree helpers for the samplers: whole-tree and per-leaf reductions.

The reference computes `dot(a,b).item()` per tensor — one host sync each
(`mcmc/sgld.py:9-11`). Here every reduction stays on device; per-leaf
diagnostics come back as pytrees of scalars that the runner logs in bulk.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_dot(a, b):
    "Σ over leaves of <a_leaf, b_leaf> (flat inner product)."
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves, jnp.asarray(0.0))


def tree_leaf_dot(a, b):
    "per-leaf flat inner products, as a pytree of scalars"
    return jax.tree_util.tree_map(lambda x, y: jnp.sum(x * y), a, b)


def tree_scale_add(a, b, alpha):
    "a + alpha * b, leafwise (alpha scalar or per-leaf pytree)"
    if isinstance(alpha, (int, float)) or hasattr(alpha, "ndim"):
        return jax.tree_util.tree_map(lambda x, y: x + alpha * y, a, b)
    return jax.tree_util.tree_map(lambda x, y, al: x + al * y, a, b, alpha)


def tree_randn_like(key, tree):
    "standard normal noise with the tree's structure/shapes/dtypes"
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    noise = [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, noise)


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def tree_ones_scalar_like(tree):
    "a pytree of scalar 1.0 with the same structure (per-leaf preconditioner)"
    return jax.tree_util.tree_map(lambda l: jnp.ones((), l.dtype), tree)


def tree_select(pred, a, b):
    "leafwise where(pred, a, b) — rollback under vmapped rejection"
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def tree_numel(tree):
    return sum(int(jnp.size(l)) for l in jax.tree_util.tree_leaves(tree))


def tree_clip(tree, bound):
    return jax.tree_util.tree_map(
        lambda g: jnp.clip(g, -bound, bound), tree)
