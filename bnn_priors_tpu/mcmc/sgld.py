"""SGLD (SGHMC) kernel: symplectic-Euler underdamped Langevin with RMSProp
preconditioning and temperature diagnostics.

TPU-native re-design of the reference `bnn_priors/mcmc/sgld.py` (Wenzel et
al. 2020 semantics). The stateful `torch.optim.Optimizer` becomes a pure
step function over a flat-packed chain-state; the per-parameter Python
loops of the reference (`sgld.py:94-105`) become ONE fused elementwise
update over the packed vector with a single PRNG stream, and the `.item()`
host syncs of the diagnostics (`sgld.py:9-11,127-146`) become on-device
segment reductions returned as metrics.

Update rule (reference `sgld.py:114-154`), elementwise over the packed θ:
    hn = sqrt(lr·N),  h = sqrt(lr/N),  σ = sqrt(2(1-a)T)
    m ← a·m − hn·M^{-1/2}·g + σ·ξ          (ξ ~ N(0,I))
    θ ← θ + h·M^{-1/2}·m
    v ← α·v + (1-α)·g²                       (RMSProp EMA)
with g = ∇ potential_avg (per-datapoint potential) and a scalar-per-tensor
preconditioner M^{-1/2} expanded over elements.

`lr` and `temperature` are traced (schedules); `momentum`, `num_data`,
`rmsprop_alpha` are static.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .packing import Packer
from .segmented import HybridPacker, SegPacker, vsum, vwhere


class SGLDState(NamedTuple):
    position: jnp.ndarray      # packed θ, (total,)
    momentum: jnp.ndarray      # packed m, (total,)
    grads: jnp.ndarray         # packed last-seen gradient
    square_avg: jnp.ndarray    # packed RMSProp EMA, (total,)
    precond: jnp.ndarray       # M^{-1/2}, pre-expanded to (total,) —
                               # leaf-constant; kept in hot-path form so no
                               # per-step gather feeds the update kernel
    key: jax.Array


class SGLD:
    """Pure-function SGLD kernel over packed state; jit/vmap/scan-safe."""

    def __init__(self, num_data: float, momentum: float = 0.0,
                 rmsprop_alpha: float = 0.99, rmsprop_eps: float = 1e-8,
                 use_pallas: Optional[bool] = None,
                 pallas_interpret: bool = False, packing: str = "flat"):
        assert num_data >= 0 and momentum >= 0
        assert packing in ("flat", "segmented", "hybrid")
        self.num_data = float(num_data)
        self.momentum = float(momentum)
        self.rmsprop_alpha = float(rmsprop_alpha)
        self.rmsprop_eps = float(rmsprop_eps)
        # 'segmented': the chain state is the per-leaf pytree (SegVec) —
        # removes the flat-vector<->conv-layout relayouts XLA otherwise
        # performs every step (PERF.md "The flat-pack tax", ~1 ms/step on
        # the K=8 ResNet-20 workload). 'flat' keeps the single packed
        # vector (one fused update kernel; required by the Pallas fused
        # update and byte-stable with older checkpoints).
        self.packing = packing
        # Opt-in: the hand-written Pallas fused update (ops/fused_update).
        # Measured on TPU v5e: the default XLA path (packed state, scan-
        # carry buffer donation, hoisted preconditioner) streams at ~82% of
        # HBM peak — FASTER than the Pallas kernel (~60%), whose per-step
        # seed/coefficient plumbing costs more than the fusion saves. Kept
        # for chips/workloads where XLA fusion is weaker.
        self.use_pallas = use_pallas
        self.pallas_interpret = bool(pallas_interpret)
        self.packer: Optional[Packer] = None

    def _fused_enabled(self, dtype) -> bool:
        if self.use_pallas is None or isinstance(self.packer, SegPacker):
            return False  # XLA path wins on v5e (see __init__ note)
        return self.use_pallas and dtype == jnp.float32

    @staticmethod
    def _seed_pair(key) -> jnp.ndarray:
        "(2,) uint32 seed words from a PRNG key (typed or raw)"
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)
        return key.reshape(-1)[:2].astype(jnp.uint32)

    # -- packing ----------------------------------------------------------
    def _ensure_packer(self, params_tree):
        if self.packer is None:
            cls = {"flat": Packer, "segmented": SegPacker,
                   "hybrid": HybridPacker}[self.packing]
            self.packer = cls(params_tree)
        return self.packer

    def pack(self, tree):
        return self.packer.pack(tree)

    def unpack(self, vec):
        return self.packer.unpack(vec)

    def params_of(self, state) -> Any:
        "unpacked parameter pytree of a chain state"
        return self.packer.unpack(state.position)

    def leaf_precond(self, state) -> jnp.ndarray:
        "per-leaf (n_leaves,) preconditioner scalars, for diagnostics"
        return self.packer.leaf_firsts(state.precond)

    # -- state ------------------------------------------------------------
    def init(self, params_tree, key) -> SGLDState:
        packer = self._ensure_packer(params_tree)
        theta = packer.pack(params_tree)
        zeros_like = lambda: jax.tree_util.tree_map(jnp.zeros_like, theta)
        return SGLDState(
            position=theta,
            momentum=zeros_like(),
            grads=zeros_like(),
            square_avg=jax.tree_util.tree_map(jnp.ones_like, theta),
            # leaf-constant M^{-1/2}: full vector (flat) / per-leaf scalars
            precond=packer.expand(jnp.ones((packer.n_leaves,), theta.dtype)),
            key=key,
        )

    def sample_momentum(self, state, temperature, keep=0.0):
        "m ← sqrt(keep)·m + sqrt(T(1-keep))·ξ (reference sgld.py:57-69)"
        key, sub = jax.random.split(state.key)
        noise = self.packer.normal_like(sub, state.momentum)
        std = jnp.sqrt(temperature * (1.0 - keep))
        new_m = math.sqrt(keep) * state.momentum + std * noise
        return state._replace(momentum=new_m, key=key)

    # -- metrics ----------------------------------------------------------
    def _metrics(self, state, grads, momentum_vec):
        """est_temperature = ‖m‖²/d and est_config_temp = ⟨θ,g⟩·N/d per leaf
        (reference sgld.py:127-146), via segment reductions."""
        pk = self.packer
        d = pk.sizes_arr.astype(state.position.dtype)
        est_temp = pk.segment_sum(momentum_vec * momentum_vec) / d
        est_conf = pk.segment_sum(state.position * grads) * (self.num_data / d)
        return {
            "est_temperature": pk.unpack_leaf_scalars(est_temp),
            "est_config_temp": pk.unpack_leaf_scalars(est_conf),
        }

    # -- step -------------------------------------------------------------
    def step(self, state: SGLDState, grads, lr, temperature,
             calc_metrics: bool = True, is_final: bool = False,
             save_state: bool = False):
        """One SGLD transition. `grads` may be the gradient pytree or the
        packed vector; already clipped by the caller."""
        assert not save_state, "SGLD keeps no rejection state (sgld.py:72-74)"
        if not self.packer.is_packed(grads):
            grads = self.pack(grads)
        a = self.momentum
        hn = jnp.sqrt(lr * self.num_data)
        h = jnp.sqrt(lr / self.num_data)
        noise_std = jnp.sqrt(2.0 * (1.0 - a) * temperature)
        M = state.precond

        key, sub = jax.random.split(state.key)

        metrics = {}
        if calc_metrics:
            # diagnostics use the momentum of the previous time step
            mom_nominal = (state.momentum if a > 0 else -hn * M * grads)
            metrics = self._metrics(state, grads, mom_nominal)

        if is_final:
            return state._replace(grads=grads, key=key), metrics

        alpha = self.rmsprop_alpha
        if self._fused_enabled(state.position.dtype):
            from ..ops import fused_langevin_update
            new_pos, new_m, new_sq, _ = fused_langevin_update(
                state.position, state.momentum, state.square_avg, grads, M,
                self._seed_pair(sub), (a, -hn, noise_std, h, alpha),
                total=self.packer.total, interpret=self.pallas_interpret)
        else:
            noise = self.packer.normal_like(sub, state.position)
            if a > 0:
                new_m = a * state.momentum - hn * M * grads + noise_std * noise
            else:
                new_m = -hn * M * grads + noise_std * noise
            new_pos = state.position + h * M * new_m
            new_sq = alpha * state.square_avg + (1 - alpha) * grads * grads

        return SGLDState(new_pos, new_m, grads, new_sq, state.precond,
                         key), metrics

    def initial_step(self, state, grads, lr, temperature, save_state=False,
                     calc_metrics=True):
        return self.step(state, grads, lr, temperature, calc_metrics,
                         save_state=save_state)

    def final_step(self, state, grads, lr, temperature, calc_metrics=True):
        return self.step(state, grads, lr, temperature, calc_metrics,
                         is_final=True)

    def delta_energy(self, state, grads, lr, prev_potential, potential):
        "SGLD never passes M-H (reference sgld.py:54-55)."
        return jnp.asarray(jnp.inf)

    # -- preconditioner ----------------------------------------------------
    def update_preconditioner(self, state: SGLDState) -> SGLDState:
        """M^{-1/2}_leaf = ((mean(v_leaf)+eps) / min_over_leaves)^(-1/4)
        (reference sgld.py:156-179): segment means + a global min."""
        means = self.packer.leaf_means(state.square_avg) + self.rmsprop_eps
        min_s = jnp.min(means)
        return state._replace(
            precond=self.packer.expand((means / min_s) ** (-0.25)))
