"""HMC kernel tests, porting reference `testing/test_hmc.py`:
exact leapfrog reversibility (float64) and distribution preservation with
M-H rejection (acceptance ≥ 0.6).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from _stat_utils import anderson_normal_p15

from bnn_priors_tpu.mcmc import HMC
from bnn_priors_tpu.models import DenseNet, GaussianModel


def _tree_np(t):
    return jax.tree_util.tree_map(np.asarray, t)


def _allclose_tree(a, b, neg=False):
    return all(np.allclose(a[k], -b[k] if neg else b[k]) for k in a)


def test_reversible(N=10):
    x = jax.random.normal(jax.random.key(0), (N, 1))
    y = jnp.sin(x)
    model = DenseNet(1, 1, 10, noise_std=0.1)
    params, state0 = model.init(jax.random.key(1))
    pot_fn = model.potential_avg_fn(state0, x, y, eff_num_data=1.0)
    grad_fn = jax.jit(jax.grad(lambda p: pot_fn(p)[0]))

    kernel = HMC(num_data=N)
    lr = 0.01
    chain = kernel.init(params, jax.random.key(2))
    precs = {k: jax.random.uniform(jax.random.key(3 + i), (), dtype=jnp.float64)
             + 0.2 for i, k in enumerate(params)}
    chain = chain._replace(precond=kernel.packer.expand(
        kernel.packer.pack_leaf_scalars(precs)))
    chain = kernel.sample_momentum(chain, temperature=1.0)

    snap = lambda c: (_tree_np(kernel.params_of(c)),
                      _tree_np(kernel.unpack(c.momentum)))
    gf = lambda c: grad_fn(kernel.params_of(c))
    p0, m0 = snap(chain)
    chain, _ = kernel.initial_step(chain, gf(chain), lr, 1.0)
    p1, m_half = snap(chain)
    chain, _ = kernel.step(chain, gf(chain), lr, 1.0)
    p2, m_3halves = snap(chain)
    chain, _ = kernel.final_step(chain, gf(chain), lr, 1.0)
    p2_alt, m2 = snap(chain)

    assert not _allclose_tree(p0, p1)
    assert not _allclose_tree(p1, p2)
    assert _allclose_tree(p2, p2_alt)
    assert not _allclose_tree(m0, m_half)
    assert not _allclose_tree(m_half, m_3halves)
    assert not _allclose_tree(m_3halves, m2)

    # negate momenta and integrate back
    chain = chain._replace(momentum=-chain.momentum)
    chain, _ = kernel.initial_step(chain, gf(chain), lr, 1.0)
    p1_alt, m_3h_neg = snap(chain)
    assert _allclose_tree(p1, p1_alt)
    assert _allclose_tree(m_3halves, m_3h_neg, neg=True)

    chain, _ = kernel.step(chain, gf(chain), lr, 1.0)
    p0_alt, m_half_neg = snap(chain)
    assert _allclose_tree(p0, p0_alt)
    assert _allclose_tree(m_half, m_half_neg, neg=True)

    chain, _ = kernel.final_step(chain, gf(chain), lr, 1.0)
    p0_alt2, m0_neg = snap(chain)
    assert _allclose_tree(p0, p0_alt2)
    assert _allclose_tree(m0, m0_neg, neg=True)


def test_distribution_preservation(n_vars=50, n_dim=1000, n_samples=100,
                                   momentum_resample=4, seed=123,
                                   store_success=False):
    mean, std = 1.0, 2.0
    lr = 1 / 32
    model = GaussianModel(N=n_vars, D=n_dim, mean=mean, std=std)
    key = jax.random.key(seed)
    k_init, k_chain, k_prec = jax.random.split(key, 3)
    params, _ = model.init(k_init)

    kernel = HMC(num_data=1)
    state = kernel.init(params, k_chain, save_state=True)
    precs = jax.random.uniform(k_prec, (n_vars,), dtype=jnp.float64)
    state = state._replace(precond=kernel.packer.expand(kernel.packer.pack_leaf_scalars(
        {k: (precs[i] + 0.2) / math.sqrt(std) for i, k in enumerate(params)})))

    pot_fn = model.potential_avg_fn(eff_num_data=1.0)
    _vg = jax.value_and_grad(pot_fn, has_aux=True)
    vg = jax.jit(lambda s: _vg(kernel.params_of(s)))

    mid = jax.jit(lambda s, g: kernel.step(s, g, lr, 1.0))
    fin = jax.jit(lambda s, g: kernel.final_step(s, g, lr, 1.0))
    ini = jax.jit(lambda s, g: kernel.initial_step(s, g, lr, 1.0,
                                                   save_state=True))

    sum_acceptance, n_acceptance = 0.0, 0
    assert n_samples % momentum_resample == 0
    prev_loss = None
    metrics = None
    for step in range(n_samples + 1):
        (loss, _), grads = vg(state)
        if step % momentum_resample == 0:
            if step != 0:
                state, metrics = fin(state, grads)
                delta_energy = float(kernel.delta_energy(
                    state, grads, lr, prev_loss, float(loss)))
                state, rejected, _ = kernel.maybe_reject(
                    state, jnp.asarray(delta_energy), 1.0)
                if bool(rejected):
                    (loss_rb, _), _ = vg(state)
                    assert np.allclose(prev_loss, float(loss_rb))
                n_acceptance += 1
                sum_acceptance += min(1.0, math.exp(-delta_energy))
                if step == n_samples:
                    break
                (loss, _), grads = vg(state)
            state = kernel.sample_momentum(state, temperature=1.0)
            prev_loss = float(loss)
            state, _ = ini(state, grads)
        else:
            state, _ = mid(state, grads)

    checks = {"acceptance>0.6": sum_acceptance / n_acceptance > 0.6}

    params_out = kernel.params_of(state)
    parameters = np.concatenate(
        [np.asarray(v).ravel() for v in params_out.values()])
    kinetic_temp = np.asarray([metrics["est_temperature"][k] for k in params_out])
    config_temp = np.asarray([metrics["est_config_temp"][k] for k in params_out])

    checks["anderson_normal_p15"] = anderson_normal_p15(parameters)

    def norm_cdf(x):
        return scipy.stats.norm.cdf(x, loc=mean, scale=std)
    checks["ks_normal_p30"] = bool(scipy.stats.ks_1samp(
        parameters, norm_cdf, mode="asymp").pvalue >= 0.3)

    def chi2_cdf(x):
        return scipy.stats.chi2.cdf(x, df=n_dim, loc=0.0, scale=1 / n_dim)
    checks["ks_config_temp_p30"] = bool(scipy.stats.ks_1samp(
        config_temp, chi2_cdf, mode="exact").pvalue >= 0.3)
    checks["ks_kinetic_temp_p30"] = bool(scipy.stats.ks_1samp(
        kinetic_temp, chi2_cdf, mode="exact").pvalue >= 0.3)
    if store_success:
        return checks
    for name, ok in checks.items():
        assert ok, f"{name} failed (seed={seed}; see __main__ calibration)" 


if __name__ == "__main__":
    # Flake-rate calibration (reference testing/test_verlet_sgld.py:214-247
    # pattern). Measured 2026-08-20 (seeds 0-39, CPU float64):
    #   acceptance>0.6        40/40 (100%)
    #   anderson_normal_p15   34/40 (85%)
    #   ks_normal_p30         24/40 (60%)
    #   ks_config_temp_p30    29/40 (72%)
    #   ks_kinetic_temp_p30   28/40 (70%)
    # CI pins seed=123, for which all checks pass with margin.
    import sys
    from collections import defaultdict
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    succ = defaultdict(int)
    for seed in range(n_seeds):
        for k, v in test_distribution_preservation(
                seed=seed, store_success=True).items():
            succ[k] += int(v)
    for k, v in succ.items():
        print(f"{k}: {v}/{n_seeds} ({100 * v / n_seeds:.0f}%)")
