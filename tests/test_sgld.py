"""SGLD kernel tests, porting reference `testing/test_sgld.py`:
(1) distribution preservation on an exact tempered Gaussian posterior
    (Anderson-Darling + exact KS + χ² configurational temperature);
(2) exact SGD-with-momentum equivalence at temperature=0 (vs torch.optim.SGD).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from _stat_utils import anderson_normal_p15

from bnn_priors_tpu.mcmc import SGLD
from bnn_priors_tpu.models import GaussianModel


def test_distribution_preservation(n_vars=50, n_dim=1000, n_samples=200,
                                   seed=123, store_success=False):
    mean, std = 1.0, 2.0
    temperature = 3 / 4
    model = GaussianModel(N=n_vars, D=n_dim, mean=mean, std=std)
    key = jax.random.key(seed)
    k_init, k_chain, k_prec = jax.random.split(key, 3)
    params, _ = model.init(k_init)
    # start at the exact tempered posterior: scale spread by sqrt(T)
    params = {k: (v - mean) * temperature ** 0.5 + mean for k, v in params.items()}

    kernel = SGLD(num_data=1, momentum=0.9)
    state = kernel.init(params, k_chain)
    # random per-leaf preconditioner to exercise the M^{-1/2} paths
    precs = jax.random.uniform(k_prec, (n_vars,), dtype=jnp.float64)
    state = state._replace(precond=kernel.packer.expand(kernel.packer.pack_leaf_scalars(
        {k: (precs[i] + 0.2) / math.sqrt(std) for i, k in enumerate(params)})))
    state = kernel.sample_momentum(state, temperature)

    pot_fn = model.potential_avg_fn(eff_num_data=1.0)
    grad_fn = jax.grad(lambda p: pot_fn(p)[0])

    def one_step(state, _):
        grads = grad_fn(kernel.params_of(state))
        state, metrics = kernel.step(state, grads, lr=1 / 512,
                                     temperature=temperature)
        return state, None

    run = jax.jit(lambda s: jax.lax.scan(one_step, s, None, length=n_samples)[0])
    state = run(state)
    # metrics from a final evaluation step
    grads = grad_fn(kernel.params_of(state))
    _, metrics = kernel.final_step(state, grads, lr=1 / 512,
                                   temperature=temperature)

    params_out = kernel.params_of(state)
    parameters = np.concatenate(
        [np.asarray(v).ravel() for v in params_out.values()])
    config_temp = np.asarray(
        [metrics["est_config_temp"][k] for k in params_out])

    checks = {}
    checks["anderson_normal_p15"] = anderson_normal_p15(parameters)

    def norm_cdf(x):
        return scipy.stats.norm.cdf(x, loc=mean, scale=std * temperature ** 0.5)
    checks["ks_normal_p30"] = bool(scipy.stats.ks_1samp(
        parameters, norm_cdf, mode="asymp").pvalue >= 0.3)

    def chi2_cdf(x):
        return scipy.stats.chi2.cdf(x, df=n_dim, loc=0.0, scale=temperature / n_dim)
    checks["ks_config_temp_p30"] = bool(scipy.stats.ks_1samp(
        config_temp, chi2_cdf, mode="exact").pvalue >= 0.3)
    if store_success:
        return checks
    for name, ok in checks.items():
        assert ok, f"{name} failed (seed={seed}; see __main__ calibration)"


def test_sgd_equivalence(n_vars=1, n_dim=5):
    import torch

    model = GaussianModel(N=n_vars, D=n_dim, mean=0.5, std=0.25)
    params, _ = model.init(jax.random.key(7))
    lr, momentum = 1.25, 0.9

    kernel = SGLD(num_data=1, momentum=momentum)
    state = kernel.init(params, jax.random.key(8))
    state = kernel.sample_momentum(state, temperature=0.0)

    pot_fn = model.potential_avg_fn(eff_num_data=1.0)
    grad_fn = jax.grad(lambda p: pot_fn(p)[0])
    for _ in range(4):
        state, _ = kernel.step(state, grad_fn(kernel.params_of(state)), lr=lr,
                               temperature=0.0)

    # same trajectory with torch.optim.SGD on the same quadratic potential
    tparams = [torch.nn.Parameter(torch.from_numpy(np.asarray(params[k]).copy()))
               for k in params]
    opt = torch.optim.SGD(tparams, lr=lr, momentum=momentum)
    for _ in range(4):
        opt.zero_grad()
        loss = sum(((p - 0.5) ** 2 / (2 * 0.25 ** 2)).sum() for p in tparams)
        loss.backward()
        opt.step()

    params_out = kernel.params_of(state)
    for k, tp in zip(params, tparams):
        np.testing.assert_allclose(
            np.asarray(params_out[k]), tp.detach().numpy(), rtol=1e-10)


def test_preconditioner_update():
    "scalar-per-tensor preconditioner with global-min normalization ^(-1/4)"
    model = GaussianModel(N=3, D=4)
    params, _ = model.init(jax.random.key(0))
    kernel = SGLD(num_data=1, momentum=0.9)
    state = kernel.init(params, jax.random.key(1))
    sq = {k: jnp.full((4,), float(i + 1)) for i, k in enumerate(params)}
    state = state._replace(square_avg=kernel.pack(sq))
    state = kernel.update_preconditioner(state)
    eps = kernel.rmsprop_eps
    mins = 1.0 + eps
    precond = kernel.packer.unpack_leaf_scalars(kernel.leaf_precond(state))
    for i, k in enumerate(params):
        expected = ((i + 1 + eps) / mins) ** (-1 / 4)
        np.testing.assert_allclose(float(precond[k]), expected, rtol=1e-6)


def test_sample_momentum_keep():
    model = GaussianModel(N=2, D=1000)
    params, _ = model.init(jax.random.key(0))
    kernel = SGLD(num_data=1, momentum=0.9)
    state = kernel.init(params, jax.random.key(1))
    state = kernel.sample_momentum(state, temperature=1.0)
    m0 = np.asarray(state.momentum)
    assert abs(m0.var() - 1.0) < 0.1
    # partial refresh keeps sqrt(keep) of the old momentum
    state2 = kernel.sample_momentum(state, temperature=1.0, keep=0.5)
    m1 = np.asarray(state2.momentum)
    corr = np.corrcoef(m0, m1)[0, 1]
    assert abs(corr - math.sqrt(0.5)) < 0.05
    assert abs(m1.var() - 1.0) < 0.1


if __name__ == "__main__":
    # Flake-rate calibration (reference testing/test_verlet_sgld.py:214-247
    # pattern): success rates of the probabilistic assertions over seeds.
    # Measured 2026-08-20 (seeds 0-39, CPU float64):
    #   anderson_normal_p15   30/40 (75%)
    #   ks_normal_p30         27/40 (68%)
    #   ks_config_temp_p30    26/40 (65%)
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
