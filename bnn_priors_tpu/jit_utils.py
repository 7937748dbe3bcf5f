"""Donation-aware jit dispatch.

The reference's torch kernels mutate parameters in place
(`p.add_(...)`, reference bnn_priors/mcmc/sgld.py:150-152), so a chain
holds ONE copy of its state. The XLA analogue is buffer donation:
`donate_argnums` lets the compiled epoch scan reuse the input chain
state's buffers for the output, halving peak HBM for the chain state
(position/momentum/preconditioner/EMA + model buffers) — which is what
bounds how many chains and how large a model fit on a chip.

Not every backend accepts donated buffers (the remote-tunnel device
transport used in some dev environments rejects them with
InvalidArgument), so donation is applied after a one-time capability
probe on the default backend, with env override
``BNN_PRIORS_TPU_DONATE=0|1``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ("donation_supported", "donating_jit")


@functools.lru_cache(maxsize=None)
def _probe(backend: str) -> bool:
    try:
        f = jax.jit(lambda x: x + 1, donate_argnums=0)
        x = jnp.zeros((8,), jnp.float32)
        r = f(x)
        jax.block_until_ready(r)
        # remote transports may surface the rejection only on readback
        float(r[0])
        return True
    except Exception:  # noqa: BLE001 — any failure means "don't donate"
        return False


def donation_supported() -> bool:
    """True if the default backend executes donated-buffer programs.
    ``BNN_PRIORS_TPU_DONATE=0`` forces off (e.g. for A/B testing),
    ``=1`` forces on, skipping the probe."""
    env = os.environ.get("BNN_PRIORS_TPU_DONATE")
    if env is not None:
        return env.lower() not in ("0", "false", "")
    return _probe(jax.default_backend())


def _buffer_id(x):
    "stable identifier of the device buffer backing an array, or None"
    try:
        return x.unsafe_buffer_pointer()
    except Exception:  # noqa: BLE001 — e.g. sharded array
        try:
            return x.addressable_shards[0].data.unsafe_buffer_pointer()
        except Exception:  # noqa: BLE001
            return None


def _unalias_donated(args, donate_argnums):
    """Copy any donated leaf whose buffer aliases another donated leaf.
    Freshly-initialized chain states contain identical constant vectors
    (zeros momentum/grads, ones precond/EMA) that runtimes deduplicate
    into ONE buffer; donating it twice is an XLA error ("Attempt to
    donate the same buffer twice"). Only the first dispatch after init
    typically pays a copy — afterwards all outputs are distinct."""
    seen = set()
    new_args = list(args)
    for i in donate_argnums:
        if i >= len(args):
            continue
        leaves, treedef = jax.tree_util.tree_flatten(args[i])
        changed = False
        for j, leaf in enumerate(leaves):
            bid = _buffer_id(leaf) if isinstance(leaf, jax.Array) else None
            if bid is None:
                continue
            if bid in seen:
                leaves[j] = jnp.array(leaf, copy=True)
                changed = True
            else:
                seen.add(bid)
        if changed:
            new_args[i] = jax.tree_util.tree_unflatten(treedef, leaves)
    return tuple(new_args)


def donating_jit(fn, donate_argnums=(), **jit_kwargs):
    """`jax.jit` that donates `donate_argnums` when the backend supports
    donation (capability-probed once), else falls back to plain jit.
    Donated and undonated programs are bitwise-identical in results
    (tests/test_donation.py) — donation only changes buffer reuse."""
    if not (donate_argnums and donation_supported()):
        return jax.jit(fn, **jit_kwargs)
    donate_argnums = tuple(donate_argnums)
    jf = jax.jit(fn, donate_argnums=donate_argnums, **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return jf(*_unalias_donated(args, donate_argnums), **kwargs)
    wrapper._jitted = jf  # for tooling (lower/compile inspection)
    return wrapper


def enable_persistent_cache(path=None):
    """Turn on JAX's persistent compilation cache. Compiles through the
    remote-device tunnel take 15-420 s per program shape; warm reloads
    are seconds, so every entry point should call this. Default
    location: $BNN_XLA_CACHE or <repo>/.xla_cache (gitignored)."""
    if path is None:
        path = os.environ.get("BNN_XLA_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # config may be frozen after backend init
        pass
