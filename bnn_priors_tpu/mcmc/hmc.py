"""HMC kernel: Verlet/leapfrog integration with exact M-H acceptance.

Re-design of reference `bnn_priors/mcmc/hmc.py`: VerletSGLD restricted to
momentum=1, temperature=1, with kinetic-energy bookkeeping
(`_point_energy = ½‖m‖²`, hmc.py:32-33) so ΔE is the exact ΔH. The caller
must refresh momenta with `sample_momentum` between trajectories.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .segmented import vsum
from .verlet_sgld import VerletSGLD, VerletSGLDState


class HMC(VerletSGLD):
    def __init__(self, num_data: float, rmsprop_alpha: float = 0.99,
                 rmsprop_eps: float = 1e-8, packing: str = "flat"):
        super().__init__(num_data, momentum=1.0, rmsprop_alpha=rmsprop_alpha,
                         rmsprop_eps=rmsprop_eps, packing=packing)

    def _point_energy(self, state, grads, lr):
        "½‖m‖² — kinetic energy of the *current* momentum"
        return 0.5 * vsum(state.momentum * state.momentum)

    def _step(self, state: VerletSGLDState, grads, lr, temperature, kind,
              save_state=False, calc_metrics=True):
        del temperature  # always 1 for HMC
        if not self.packer.is_packed(grads):
            grads = self.pack(grads)
        bh, bhn, _, grad_v, _ = self._constants(lr, 1.0, kind)
        M = state.precond

        saved = state.saved
        if save_state:
            assert kind == "initial"
            saved = (state.position, state.momentum, grads)

        if kind == "initial":
            de_acc = -self._point_energy(state, grads, lr)
        else:
            de_acc = state.delta_energy_acc

        # half/whole gradient kick on the momentum (no noise, no decay)
        grad_lr = -0.5 * grad_v * bhn
        new_m = state.momentum + grad_lr * (M * grads)

        metrics = {}
        if calc_metrics:
            mom_for_temp = new_m if kind == "final" else state.momentum
            metrics = self._metrics(state, grads, mom_for_temp)

        if kind == "final":
            new_pos = state.position
            new_sq = state.square_avg
        else:
            new_pos = state.position + bh * (M * new_m)
            alpha = self.rmsprop_alpha
            new_sq = alpha * state.square_avg + (1 - alpha) * grads * grads

        new_state = VerletSGLDState(
            position=new_pos, momentum=new_m, grads=grads, square_avg=new_sq,
            precond=state.precond, delta_energy_acc=de_acc,
            prev_nmd=jnp.zeros((), state.position.dtype), saved=saved,
            key=state.key)
        return new_state, metrics
