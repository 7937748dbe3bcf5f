"""GGMC / VerletSGLD kernel: OBABO symmetric-splitting underdamped Langevin
(Leimkuhler–Matthews; "Exact Langevin dynamics with stochastic gradients",
arXiv:2102.01691), with incremental energy accounting for exact
Metropolis–Hastings correction.

TPU-native re-design of reference `bnn_priors/mcmc/verlet_sgld.py` over a
flat-packed chain state (see `packing.py`). The three-phase transition
protocol is preserved:

  initial_step  θ(n),m(n) → θ(n+1),u(n+1)    (mom_decay=√a, grad_v=1,   σ²=(1-a)T)
  step          θ(n),u(n) → θ(n+1),u(n+1)    (mom_decay=a,  grad_v=1+a, σ²=(1-a²)T)
  final_step    θ(n),u(n) → θ(n),m(n)        (mom_decay=√a, grad_v=√a,  σ²=(1-a)T)

Energy bookkeeping (verlet_sgld.py:27-47,169-176): the reference stores the
running ΔE per parameter tensor and sums at the end; the sum is linear, so
two *scalar* accumulators suffice:
    point_energy      = Σ M⁻¹·N²·b²h²/8·g²        (recomputed from grads)
    delta_energy_acc += prev_nmd + Σ c_gm·g·m_old
    prev_nmd          = Σ c_gm·g·m_new              (c_gm = -½·bhn·M^{-1/2})
    ΔE(prev_U, U)     = delta_energy_acc + point_energy + (U - prev_U)·N
Accumulators inherit the param dtype (float64 under x64 — the energy
identity test demands it).

Rejection state (`saved`) is kept **on-device** (the reference copies to
CPU, verlet_sgld.py:72-83), so vmapped chains accept/reject independently
via `jnp.where`.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .segmented import vsum, vwhere
from .sgld import SGLD


class VerletSGLDState(NamedTuple):
    position: jnp.ndarray
    momentum: jnp.ndarray
    grads: jnp.ndarray           # packed gradient at `position` (ΔE/rollback)
    square_avg: jnp.ndarray
    precond: jnp.ndarray         # M^{-1/2}, pre-expanded to (total,)
    delta_energy_acc: jnp.ndarray  # scalar
    prev_nmd: jnp.ndarray          # scalar
    saved: Any                   # None or (position, momentum, grads)
    key: jax.Array


class VerletSGLD(SGLD):
    """GGMC kernel. `temperature`/`lr` traced; `momentum` static."""

    def init(self, params_tree, key, save_state: bool = False) -> VerletSGLDState:
        packer = self._ensure_packer(params_tree)
        theta = packer.pack(params_tree)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, theta)
        zero = jnp.zeros((), theta.dtype)
        return VerletSGLDState(
            position=theta, momentum=zeros, grads=zeros,
            square_avg=jax.tree_util.tree_map(jnp.ones_like, theta),
            precond=packer.expand(jnp.ones((packer.n_leaves,), theta.dtype)),
            delta_energy_acc=zero, prev_nmd=zero,
            saved=((theta, zeros, zeros) if save_state else None),
            key=key,
        )

    # -- phase constants ---------------------------------------------------
    def _constants(self, lr, temperature, kind: str):
        a = self.momentum
        bh = jnp.sqrt(lr / self.num_data)
        bhn = jnp.sqrt(lr * self.num_data)
        if kind == "mid":
            mom_decay, grad_v = a, 1.0 + a
            noise_std = jnp.sqrt((1 - a ** 2) * temperature)
        elif kind == "initial":
            mom_decay, grad_v = a ** 0.5, 1.0
            noise_std = jnp.sqrt((1 - a) * temperature)
        elif kind == "final":
            mom_decay = grad_v = a ** 0.5
            noise_std = jnp.sqrt((1 - a) * temperature)
        else:  # pragma: no cover
            raise ValueError(kind)
        return bh, bhn, mom_decay, grad_v, noise_std

    def _point_energy(self, state, grads, lr):
        "Σ M⁻¹·N²·b²h²/8·g² (verlet_sgld.py:44-47)"
        M = state.precond
        curv_c = self.num_data * lr / 8.0  # N²·(lr/N)/8
        return curv_c * vsum((M * grads) ** 2)

    # -- the shared transition --------------------------------------------
    def _step(self, state: VerletSGLDState, grads, lr, temperature,
              kind: str, save_state: bool = False, calc_metrics: bool = True
              ) -> Tuple[VerletSGLDState, dict]:
        if not self.packer.is_packed(grads):
            grads = self.pack(grads)
        bh, bhn, mom_decay, grad_v, noise_std = self._constants(
            lr, temperature, kind)
        M = state.precond
        key, sub = jax.random.split(state.key)

        saved = state.saved
        if save_state:
            assert kind == "initial"
            saved = (state.position, state.momentum, grads)

        grad_lr = -0.5 * grad_v * bhn
        c_gm = -0.5 * bhn
        is_final = kind == "final"
        pos_c = 0.0 if is_final else bh
        alpha = 1.0 if is_final else self.rmsprop_alpha

        if self._fused_enabled(state.position.dtype):
            # single-pass Pallas kernel: update + energy partial sums
            from ..ops import fused_langevin_update
            new_pos, new_m, new_sq, partials = fused_langevin_update(
                state.position, state.momentum, state.square_avg, grads, M,
                self._seed_pair(sub),
                (mom_decay, grad_lr, noise_std, pos_c, alpha),
                total=self.packer.total, interpret=self.pallas_interpret)
            g_mold = c_gm * partials[0]
            g_mnew = c_gm * partials[1]
            pe_initial = (self.num_data * lr / 8.0) * partials[2]
        else:
            noise = self.packer.normal_like(sub, state.position)
            # new momentum: σ·ξ + grad_lr·g + mom_decay·m_old
            new_m = (noise_std * noise + grad_lr * (M * grads)
                     + mom_decay * state.momentum)
            new_pos = state.position + pos_c * (M * new_m)
            new_sq = (alpha * state.square_avg
                      + (1 - alpha) * grads * grads)
            g_mold = c_gm * vsum(M * grads * state.momentum)
            g_mnew = c_gm * vsum(M * grads * new_m)
            pe_initial = self._point_energy(state, grads, lr)

        # incremental energy accounting
        if kind == "initial":
            de_acc = -pe_initial
        else:
            de_acc = state.delta_energy_acc + state.prev_nmd + g_mold
        prev_nmd = g_mnew

        metrics = {}
        if calc_metrics:
            mom_for_temp = new_m if kind == "final" else state.momentum
            metrics = self._metrics(state, grads, mom_for_temp)

        new_state = VerletSGLDState(
            position=new_pos, momentum=new_m, grads=grads, square_avg=new_sq,
            precond=state.precond, delta_energy_acc=de_acc,
            prev_nmd=prev_nmd, saved=saved, key=key)
        return new_state, metrics

    # -- public API (reference protocol) ----------------------------------
    def initial_step(self, state, grads, lr, temperature, save_state=False,
                     calc_metrics=True):
        return self._step(state, grads, lr, temperature, "initial",
                          save_state, calc_metrics)

    def step(self, state, grads, lr, temperature, calc_metrics=True):
        return self._step(state, grads, lr, temperature, "mid", False,
                          calc_metrics)

    def final_step(self, state, grads, lr, temperature, calc_metrics=True):
        return self._step(state, grads, lr, temperature, "final", False,
                          calc_metrics)

    def delta_energy(self, state: VerletSGLDState, grads, lr,
                     prev_potential, potential):
        "ΔE since the last initial_step (verlet_sgld.py:27-42)."
        if grads is not None and not self.packer.is_packed(grads):
            grads = self.pack(grads)
        if grads is None:
            grads = state.grads
        pe = self._point_energy(state, grads, lr)
        return (state.delta_energy_acc + pe
                + (potential - prev_potential) * self.num_data)

    def maybe_reject(self, state: VerletSGLDState, delta_energy, temperature,
                     flip_on_reject: bool = False):
        """M-H test; on rejection roll back (position, momentum, grads) from
        `state.saved` (verlet_sgld.py:49-70). Under vmap every chain
        decides independently. Returns (state, rejected, log_accept_prob).

        `flip_on_reject` negates the restored momentum on rejection, as
        GHMC-style detailed balance over persistent-momentum trajectories
        requires (Horowitz 1991). The reference restores the forward
        momentum unflipped (verlet_sgld.py:62-69), leaving an
        O(rejection-rate) reversibility bias for momentum ∈ (0,1); the
        default keeps that parity (and is exactly correct whenever momentum
        is fully refreshed at boundaries, e.g. HMC)."""
        assert state.saved is not None, "init(..., save_state=True) required"
        key, sub = jax.random.split(state.key)
        log_accept_prob = -delta_energy / temperature
        u = jax.random.uniform(sub, (), dtype=state.position.dtype)
        reject = jnp.logical_and(jnp.asarray(temperature) > 0.0,
                                 jnp.log(u) > log_accept_prob)
        saved_pos, saved_mom, saved_grads = state.saved
        if flip_on_reject:
            saved_mom = -saved_mom
        return (state._replace(
            position=vwhere(reject, saved_pos, state.position),
            momentum=vwhere(reject, saved_mom, state.momentum),
            grads=vwhere(reject, saved_grads, state.grads),
            key=key), reject, log_accept_prob)
