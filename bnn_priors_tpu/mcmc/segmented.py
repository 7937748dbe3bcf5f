"""Segmented (per-leaf pytree) chain-state representation.

The flat packed vector (`packing.Packer`) gives the sampler ONE fused
elementwise update — but forces XLA to re-lay-out every parameter tensor
between the flat vector's linear tiling and the convolution's internal
weight layout on EVERY step, in both directions (unpack for the forward,
pack for the gradient). Measured on the K=8 bf16 ResNet-20 GGMC step this
relayout tax is ~1 ms of an 8 ms step (PERF.md "The flat-pack tax";
`experiments/perf/tree_carry_probe.py`).

`SegVec` keeps the chain state AS the parameter leaves: scan carries then
hold every weight in the layout its consumer wants and pack/unpack are
O(0). The sampler arithmetic is unchanged — `SegVec` overloads the
elementwise operators leaf-wise, and the few whole-vector reductions go
through the `vsum`/`vdot` helpers below (which are `jnp.sum` on flat
vectors). XLA still fuses each leaf's update into one kernel; with ~70
leaves instead of 1 the update is marginally less fused, which measures
as noise next to the relayout win.

PRNG note: the flat representation draws one normal vector over the
packed layout; the segmented one draws per leaf (`fold_in(key, i)`).
Trajectories therefore differ stream-wise between representations (same
distributions; deterministic parts are bitwise identical —
tests/test_segmented.py).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .packing import Packer

__all__ = ("SegVec", "SegPacker", "HybridPacker", "vsum", "vdot", "vclip",
           "vwhere")


@jax.tree_util.register_pytree_node_class
class SegVec:
    """A 'packed vector' that is really the tuple of parameter leaves.
    Supports leaf-wise elementwise arithmetic with scalars and other
    SegVecs, so sampler update rules written for flat vectors work
    unchanged."""

    __slots__ = ("leaves",)

    def __init__(self, leaves):
        self.leaves = tuple(leaves)

    def tree_flatten(self):
        return self.leaves, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)

    @property
    def dtype(self):
        return self.leaves[0].dtype

    def astype(self, dtype):
        return SegVec(l.astype(dtype) for l in self.leaves)

    # -- elementwise algebra ------------------------------------------------
    def _bin(self, other, op):
        if isinstance(other, SegVec):
            return SegVec(op(a, b) for a, b in zip(self.leaves, other.leaves))
        return SegVec(op(a, other) for a in self.leaves)

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._bin(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._bin(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._bin(o, lambda a, b: b / a)

    def __pow__(self, o):
        return self._bin(o, lambda a, b: a ** b)

    def __neg__(self):
        return SegVec(-a for a in self.leaves)


# -- representation-generic vector helpers ---------------------------------
def vsum(v):
    "Σ over all elements (jnp.sum for flat vectors)."
    if isinstance(v, SegVec):
        return sum(jnp.sum(l) for l in v.leaves)
    return jnp.sum(v)


def vdot(a, b):
    "<a, b> over all elements."
    if isinstance(a, SegVec):
        return sum(jnp.sum(x * y) for x, y in zip(a.leaves, b.leaves))
    return jnp.sum(a * b)


def vclip(v, lo, hi):
    if isinstance(v, SegVec):
        return SegVec(jnp.clip(l, lo, hi) for l in v.leaves)
    return jnp.clip(v, lo, hi)


def vwhere(pred, a, b):
    "elementwise select with a scalar predicate (rollback under vmap)."
    if isinstance(a, SegVec):
        return SegVec(jnp.where(pred, x, y)
                      for x, y in zip(a.leaves, b.leaves))
    return jnp.where(pred, a, b)


class SegPacker(Packer):
    """Packer whose packed representation is `SegVec` (pack/unpack are
    free reorganizations, no concatenation/relayout). Interface-compatible
    with `Packer` for everything the runners use (names, sizes,
    pack_leaf_scalars, segment_sum, expand, leaf_firsts, ...)."""

    segmented = True

    def __init__(self, tree):
        super().__init__(tree)
        # no flat padding in this representation
        self.total_padded = self.total
        self.n_pad = 0

    # -- pack/unpack --------------------------------------------------------
    def pack(self, tree) -> SegVec:
        if isinstance(tree, SegVec):
            return tree
        return SegVec(jax.tree_util.tree_leaves(tree))

    def unpack(self, vec) -> Any:
        leaves = vec.leaves if isinstance(vec, SegVec) else \
            jax.tree_util.tree_leaves(vec)
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def is_packed(self, x) -> bool:
        return isinstance(x, SegVec)

    # -- elementwise helpers -------------------------------------------------
    def mask_pad(self, vec):
        return vec  # no padding tail

    def valid_mask(self, dtype=bool):
        m = jnp.ones((self.total,), bool)
        return m if dtype is bool else m.astype(dtype)

    def normal_like(self, key, like: SegVec) -> SegVec:
        "one independent stream per leaf (fold_in by leaf index)"
        return SegVec(
            jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype)
            for i, l in enumerate(like.leaves))

    # -- per-leaf reductions --------------------------------------------------
    def segment_sum(self, vec: SegVec) -> jnp.ndarray:
        return jnp.stack([jnp.sum(l) for l in vec.leaves])

    def leaf_means(self, vec: SegVec) -> jnp.ndarray:
        sizes = self.sizes_arr.astype(vec.dtype)
        return self.segment_sum(vec) / sizes

    def leaf_firsts(self, vec: SegVec) -> jnp.ndarray:
        return jnp.stack([jnp.ravel(l)[0] for l in vec.leaves])

    def expand(self, leaf_scalars: jnp.ndarray) -> SegVec:
        "leaf-constant vector: one () scalar per leaf (broadcasts in ops)"
        return SegVec(leaf_scalars[i] for i in range(self.n_leaves))


class HybridPacker(SegPacker):
    """Grouped-segment chain state: conv kernels (ndim >= `native_ndim`)
    stay native leaves — no flat<->conv relayout, the segmented win — while
    all SMALL leaves (BN scale/bias, biases, the dense head) are
    concatenated into ONE flat segment, so their updates are one fused
    kernel + one PRNG stream instead of dozens of tiny ones — the flat
    win. Motivation (PERF.md r4): at K=1 the fully-segmented layout is
    ~10% slower than flat purely from per-leaf kernel/PRNG overhead, while
    flat pays a ~1 ms/step conv-relayout tax at K>=2; the hybrid removes
    both costs. The packed representation is still a `SegVec`
    ([native conv leaves..., small_flat]) so the kernels' arithmetic and
    the runners' checkpoint/vmap machinery are unchanged."""

    def __init__(self, tree, native_ndim: int = 3):
        super().__init__(tree)
        self.native_ndim = int(native_ndim)
        self.native_idx = [i for i, s in enumerate(self.shapes)
                          if len(s) >= self.native_ndim]
        self.small_idx = [i for i in range(self.n_leaves)
                          if i not in set(self.native_idx)]
        small_sizes = [self.sizes[i] for i in self.small_idx]
        self.small_offsets = np.concatenate(
            [[0], np.cumsum(small_sizes)]).astype(np.int64)
        self._small_seg_ids = jnp.asarray(np.repeat(
            np.arange(len(self.small_idx), dtype=np.int32), small_sizes))
        self.n_segments = len(self.native_idx) + (1 if self.small_idx else 0)

    # -- pack/unpack --------------------------------------------------------
    def pack(self, tree) -> SegVec:
        if isinstance(tree, SegVec):
            return tree
        leaves = jax.tree_util.tree_leaves(tree)
        parts = [leaves[i] for i in self.native_idx]
        if self.small_idx:
            parts.append(jnp.concatenate(
                [jnp.ravel(leaves[i]) for i in self.small_idx]))
        return SegVec(parts)

    def unpack(self, vec) -> Any:
        parts = vec.leaves if isinstance(vec, SegVec) else \
            tuple(jax.tree_util.tree_leaves(vec))
        out = [None] * self.n_leaves
        for j, i in enumerate(self.native_idx):
            out[i] = jnp.reshape(parts[j], self.shapes[i])
        if self.small_idx:
            flat = parts[len(self.native_idx)]
            for k, i in enumerate(self.small_idx):
                seg = flat[int(self.small_offsets[k]):
                           int(self.small_offsets[k + 1])]
                out[i] = jnp.reshape(seg, self.shapes[i])
        return jax.tree_util.tree_unflatten(self.treedef, out)

    # noise: the inherited SegPacker.normal_like already draws one stream
    # per SegVec leaf — which for the hybrid rep means one per SEGMENT
    # (n_native + 1), not one per original parameter leaf.

    # -- per-ORIGINAL-leaf reductions (diagnostics stay leaf-granular) ------
    def segment_sum(self, vec: SegVec) -> jnp.ndarray:
        parts = vec.leaves
        out = [None] * self.n_leaves
        for j, i in enumerate(self.native_idx):
            out[i] = jnp.sum(parts[j])
        if self.small_idx:
            flat = parts[len(self.native_idx)]
            ss = jax.ops.segment_sum(flat, self._small_seg_ids,
                                     num_segments=len(self.small_idx))
            for k, i in enumerate(self.small_idx):
                out[i] = ss[k]
        return jnp.stack(out)

    def leaf_firsts(self, vec: SegVec) -> jnp.ndarray:
        parts = vec.leaves
        out = [None] * self.n_leaves
        for j, i in enumerate(self.native_idx):
            out[i] = jnp.ravel(parts[j])[0]
        if self.small_idx:
            flat = parts[len(self.native_idx)]
            firsts = flat[jnp.asarray(self.small_offsets[:-1])]
            for k, i in enumerate(self.small_idx):
                out[i] = firsts[k]
        return jnp.stack(out)

    def expand(self, leaf_scalars: jnp.ndarray) -> SegVec:
        """(n_leaves,) per-ORIGINAL-leaf scalars -> hybrid rep: () scalars
        for native leaves (broadcast in ops), a segment-expanded vector
        for the flat small segment."""
        parts = [leaf_scalars[i] for i in self.native_idx]
        if self.small_idx:
            small = leaf_scalars[jnp.asarray(self.small_idx)]
            parts.append(small[self._small_seg_ids])
        return SegVec(parts)
