"""Flat-vector packing of parameter pytrees for the sampler hot path.

The sampler updates (SGLD/GGMC/HMC) are elementwise over *all* parameters;
per-tensor structure only enters through (a) the scalar-per-tensor
preconditioner and (b) per-tensor temperature diagnostics. Keeping the
chain state as one packed vector gives XLA a single fused elementwise
kernel and a single PRNG stream per step — instead of `n_leaves` small
kernels and `n_leaves` threefry streams, which is both slow to compile and
far from speed-of-light on TPU HBM bandwidth.

`Packer` is a static object: pack/unpack are `jnp.concatenate`/slice-
reshape chains that XLA folds away; `segment_ids` maps each element to its
leaf index for segment reductions; `expand` broadcasts per-leaf scalars to
elements.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Packer:
    def __init__(self, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        self.treedef = treedef
        self.shapes: List[Tuple[int, ...]] = [tuple(l.shape) for l in leaves]
        self.sizes: List[int] = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.n_leaves = len(leaves)
        self.total = int(sum(self.sizes))
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)]).astype(np.int32)
        self.segment_ids = jnp.asarray(
            np.repeat(np.arange(self.n_leaves, dtype=np.int32), self.sizes))
        # leaf names (for metric logging) if the tree is a flat dict
        paths = jax.tree_util.tree_flatten_with_path(tree)[0]
        self.names = [jax.tree_util.keystr(p, simple=True, separator=".")
                      for p, _ in paths]
        self.sizes_arr = jnp.asarray(np.asarray(self.sizes, dtype=np.float64))

    def pack(self, tree) -> jnp.ndarray:
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate([jnp.ravel(l) for l in leaves])

    def unpack(self, vec) -> Any:
        leaves = [
            jnp.reshape(vec[int(self.offsets[i]):int(self.offsets[i + 1])],
                        self.shapes[i])
            for i in range(self.n_leaves)
        ]
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    # per-leaf scalar helpers -------------------------------------------------
    def pack_leaf_scalars(self, tree_of_scalars) -> jnp.ndarray:
        "pytree of per-leaf scalars -> (n_leaves,) vector"
        leaves = jax.tree_util.tree_leaves(tree_of_scalars)
        return jnp.stack([jnp.asarray(l) for l in leaves])

    def unpack_leaf_scalars(self, vec) -> Any:
        return jax.tree_util.tree_unflatten(
            self.treedef, [vec[i] for i in range(self.n_leaves)])

    def expand(self, leaf_scalars: jnp.ndarray) -> jnp.ndarray:
        "(n_leaves,) -> (total,) by repeating each scalar over its leaf"
        return leaf_scalars[self.segment_ids]

    def segment_sum(self, vec: jnp.ndarray) -> jnp.ndarray:
        "(total,) -> (n_leaves,) sums"
        return jax.ops.segment_sum(vec, self.segment_ids,
                                   num_segments=self.n_leaves)

    def leaf_means(self, vec: jnp.ndarray) -> jnp.ndarray:
        return self.segment_sum(vec) / self.sizes_arr.astype(vec.dtype)
