"""Full chain-state checkpointing.

The reference's only resume mechanism is warm-starting from the last saved
*sample* (`train_bnn.py:187-203`): sampler internals (momentum, RMSProp
EMA, preconditioner, PRNG state, step counter) are lost and the dynamics
restart. Here the checkpoint is the complete chain state — resuming
continues the exact same trajectory, bit for bit.

Format: a single `.npz` with the flattened chain-state leaves (typed PRNG
keys stored as their uint32 key data), the model state (batchnorm
statistics etc.), the runner's own PRNG key, and loop metadata. Files are
written atomically (tmp + rename) so a crash mid-write never corrupts the
previous checkpoint.
"""
from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_chain_checkpoint", "load_chain_checkpoint"]

_KEY_PREFIX = "__prngkey__"


def _encode_leaf(leaf):
    "typed PRNG keys -> (tagged) uint32 key data; everything else as numpy"
    if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                 jax.dtypes.prng_key):
        return True, np.asarray(jax.random.key_data(leaf))
    return False, np.asarray(leaf)


def _flatten(tree) -> Tuple[list, Any]:
    return jax.tree_util.tree_flatten(tree)


def save_chain_checkpoint(path, chain, model_state, runner_key,
                          meta: Dict[str, Any]) -> None:
    """Write chain + model_state + runner PRNG key + loop metadata.

    `meta` values must be ints/floats/bools (stored as npz scalars with a
    `meta_` prefix)."""
    arrays: Dict[str, np.ndarray] = {}
    for group, tree in (("chain", chain), ("mstate", model_state),
                        ("rkey", runner_key)):
        leaves, _ = _flatten(tree)
        for i, leaf in enumerate(leaves):
            is_key, arr = _encode_leaf(leaf)
            name = f"{group}_{i}"
            if is_key:
                name = _KEY_PREFIX + name
            arrays[name] = arr
    for k, v in meta.items():
        arrays["meta_" + k] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _restore_group(data, group, template):
    leaves, treedef = _flatten(template)
    out = []
    for i, tleaf in enumerate(leaves):
        plain, tagged = f"{group}_{i}", _KEY_PREFIX + f"{group}_{i}"
        if tagged in data:
            out.append(jax.random.wrap_key_data(jnp.asarray(data[tagged])))
        elif plain in data:
            arr = jnp.asarray(data[plain])
            if arr.shape != tuple(np.shape(tleaf)):
                raise ValueError(
                    f"checkpoint leaf {group}_{i} has shape {arr.shape} but "
                    f"the current model expects {tuple(np.shape(tleaf))} — "
                    f"resume requires the identical model/config")
            out.append(arr.astype(tleaf.dtype)
                       if hasattr(tleaf, "dtype") else arr)
        else:
            raise KeyError(f"checkpoint missing leaf {group}_{i} "
                           f"(structure mismatch)")
    return jax.tree_util.tree_unflatten(treedef, out)


def load_chain_checkpoint(path, chain_template, model_state_template,
                          runner_key_template):
    """Load a checkpoint against templates with the same pytree structure
    (e.g. a freshly `kernel.init(...)`-ed chain). Returns
    (chain, model_state, runner_key, meta)."""
    with np.load(path) as data:
        chain = _restore_group(data, "chain", chain_template)
        mstate = _restore_group(data, "mstate", model_state_template)
        rkey = _restore_group(data, "rkey", runner_key_template)
        meta = {k[len("meta_"):]: data[k][()] for k in data.files
                if k.startswith("meta_")}
    return chain, mstate, rkey, meta
