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


PACK_ALIGN = 1024  # pad packed vectors to (8,128)-tile-aligned length


class Packer:
    def __init__(self, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        self.treedef = treedef
        self.shapes: List[Tuple[int, ...]] = [tuple(l.shape) for l in leaves]
        self.sizes: List[int] = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.n_leaves = len(leaves)
        self.total = int(sum(self.sizes))
        # packed length, padded so the (T//128,128) view used by the Pallas
        # fused-update kernel is tile-aligned with a zero-copy reshape;
        # elements in [total, total_padded) are identically zero everywhere
        # (noise is masked), so dot products over packed vectors are exact
        self.total_padded = -(-self.total // PACK_ALIGN) * PACK_ALIGN
        self.n_pad = self.total_padded - self.total
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)]).astype(np.int32)
        # padding elements map to a dummy segment that reductions drop
        self.segment_ids = jnp.asarray(np.concatenate([
            np.repeat(np.arange(self.n_leaves, dtype=np.int32), self.sizes),
            np.full((self.n_pad,), self.n_leaves, dtype=np.int32)]))
        # leaf names (for metric logging) if the tree is a flat dict
        paths = jax.tree_util.tree_flatten_with_path(tree)[0]
        self.names = [jax.tree_util.keystr(p, simple=True, separator=".")
                      for p, _ in paths]
        self.sizes_arr = jnp.asarray(np.asarray(self.sizes, dtype=np.float64))

    def pack(self, tree) -> jnp.ndarray:
        leaves = jax.tree_util.tree_leaves(tree)
        flat = [jnp.ravel(l) for l in leaves]
        if self.n_pad:
            flat.append(jnp.zeros((self.n_pad,), flat[0].dtype))
        return jnp.concatenate(flat)

    def valid_mask(self, dtype=bool) -> jnp.ndarray:
        "(total_padded,) mask, False/0 on the padding tail"
        m = jnp.arange(self.total_padded) < self.total
        return m if dtype is bool else m.astype(dtype)

    def mask_pad(self, vec: jnp.ndarray) -> jnp.ndarray:
        "zero the padding tail of a packed vector"
        if not self.n_pad:
            return vec
        return jnp.where(self.valid_mask(), vec, jnp.zeros_like(vec))

    def is_packed(self, x) -> bool:
        "True if `x` is already in this packer's packed representation"
        return isinstance(x, jnp.ndarray) and x.ndim == 1

    def normal_like(self, key, like) -> jnp.ndarray:
        "standard-normal noise in packed form (padding tail zeroed)"
        return self.mask_pad(jax.random.normal(key, like.shape, like.dtype))

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
        """(n_leaves,) -> (total_padded,) by repeating each scalar over its
        leaf; the padding tail gets 1.0 (it multiplies exact zeros)."""
        ext = jnp.concatenate([leaf_scalars,
                               jnp.ones((1,), leaf_scalars.dtype)])
        return ext[self.segment_ids]

    def segment_sum(self, vec: jnp.ndarray) -> jnp.ndarray:
        "(total_padded,) -> (n_leaves,) sums; the padding segment is dropped"
        return jax.ops.segment_sum(vec, self.segment_ids,
                                   num_segments=self.n_leaves + 1)[:-1]

    def leaf_means(self, vec: jnp.ndarray) -> jnp.ndarray:
        return self.segment_sum(vec) / self.sizes_arr.astype(vec.dtype)

    def leaf_firsts(self, vec: jnp.ndarray) -> jnp.ndarray:
        """(total_padded,) -> (n_leaves,) first element of each leaf — the
        inverse of `expand` for leaf-constant vectors (preconditioner)."""
        return vec[jnp.asarray(self.offsets[:-1])]
