"""Inference-runner tests: end-to-end cyclical SG-MCMC on small problems.

Checks the full training loop machinery (epoch scans, boundary protocol,
schedules, sample bank, metrics, preconditioner updates) and that the
sampled posterior on a conjugate problem is statistically correct.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from bnn_priors_tpu import models
from bnn_priors_tpu.inference import SGLDRunner, VerletSGLDRunner
from bnn_priors_tpu.inference.schedules import get_cosine_schedule
from bnn_priors_tpu.io import HDF5Metrics, HDF5ModelSaver


def _toy_data(n=64, d=4, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    x = jax.random.normal(k1, (n, d))
    y = (jax.random.normal(k2, (n,)) > 0).astype(jnp.int32)
    return x, y


def test_cosine_schedule():
    sched = get_cosine_schedule(10)
    assert float(sched(0)) == 1.0
    np.testing.assert_allclose(float(sched(5)), 0.5, atol=1e-6)
    assert float(sched(10)) == 1.0  # restart
    assert 0 < float(sched(9)) < 0.05


def test_sgld_runner_end_to_end(tmp_path):
    x, y = _toy_data()
    model = models.LogisticRegression(4, 2)
    with HDF5Metrics(tmp_path / "metrics.h5") as metrics, \
            HDF5ModelSaver(tmp_path / "samples.h5") as saver:
        runner = SGLDRunner(
            model, (x, y), (x, y), epochs_per_cycle=3, warmup_epochs=1,
            sample_epochs=1, learning_rate=1e-3, temperature=1.0,
            momentum=0.9, cycles=2, precond_update=1, batch_size=16,
            metrics_saver=metrics, model_saver=saver,
            key=jax.random.key(5))
        runner.run()
        samples = runner.get_samples()
    # 2 cycles × 1 sampling epoch each
    assert samples["net.weight_prior.p"].shape == (2, 2, 4)
    assert samples["net.bias_prior.p"].shape == (2, 2)

    import h5py
    with h5py.File(tmp_path / "metrics.h5", "r") as f:
        assert "loss" in f and "lr" in f and "potential" in f
        assert "est_temperature/net.weight_prior.p" in f
        assert "preconditioner/net.bias_prior.p" in f
        assert len(f["steps"]) > 0
        # cosine decays within a cycle
        lrs = np.asarray(f["lr"])
        lrs = lrs[~np.isnan(lrs)]
        assert lrs[0] > lrs[1] or lrs[0] == 1e-3


def test_sgld_runner_tail_batch():
    "N not divisible by batch size exercises the separate tail step."
    x, y = _toy_data(n=50)
    model = models.LogisticRegression(4, 2)
    runner = SGLDRunner(model, (x, y), None, epochs_per_cycle=2,
                        warmup_epochs=1, sample_epochs=1, batch_size=16,
                        learning_rate=1e-3, cycles=1, key=jax.random.key(0))
    assert runner.n_full == 3 and runner.tail == 2
    runner.run()
    assert runner.get_samples()["net.weight_prior.p"].shape[0] == 1


def test_verlet_runner_rejection_protocol():
    x, y = _toy_data()
    model = models.LogisticRegression(4, 2)
    runner = VerletSGLDRunner(
        model, (x, y), None, epochs_per_cycle=2, warmup_epochs=1,
        sample_epochs=1, learning_rate=1e-4, temperature=1.0, momentum=0.9,
        cycles=2, batch_size=16, reject_samples=True, key=jax.random.key(1))
    runner.run()
    samples = runner.get_samples()
    assert samples["net.weight_prior.p"].shape[0] == 2
    assert np.isfinite(runner._total_energy)


def test_sgld_runner_gaussian_posterior():
    """Cyclical SGLD on GaussianModel with flat schedule: the chain should
    sample from the tempered Gaussian (KS test, as in the reference
    sampler tests but through the full runner machinery)."""
    model = models.GaussianModel(N=8, D=100, mean=1.0, std=2.0)
    # prior-only model: x/y are dummies; num_data=1 via data_mult
    x = jnp.zeros((1, 1))
    y = jnp.zeros((1,), dtype=jnp.int32)

    runner = SGLDRunner(
        model, (x, y), None, epochs_per_cycle=300, warmup_epochs=300,
        sample_epochs=0, learning_rate=1 / 512, temperature=3 / 4,
        data_mult=1.0, momentum=0.9, sampling_decay="flat", cycles=1,
        batch_size=1, key=jax.random.key(3))
    runner.run()
    params = runner.kernel.params_of(runner.chain)
    samples = np.concatenate([np.asarray(v).ravel() for v in params.values()])
    cdf = lambda v: scipy.stats.norm.cdf(v, loc=1.0, scale=2.0 * (3 / 4) ** 0.5)
    assert scipy.stats.ks_1samp(samples, cdf).pvalue > 0.01


def test_hdf5_metrics_roundtrip(tmp_path):
    "Port of reference test_exp_utils HDF5Metrics round-trip semantics."
    import h5py
    path = tmp_path / "m.h5"
    with HDF5Metrics(path, chunk_size=13) as m:
        for i in range(40):
            m.add_scalar("a", float(i), i)
            if i % 2 == 0:
                m.add_scalar("b", float(-i), i)
            if i == 20:
                m.flush()
        m.flush()
    with h5py.File(path, "r") as f:
        a = np.asarray(f["a"])
        b = np.asarray(f["b"])
        steps = np.asarray(f["steps"])
        assert len(steps) == 40
        np.testing.assert_allclose(a, np.arange(40.0))
        assert np.isnan(b[1::2]).all()
        np.testing.assert_allclose(b[::2], -np.arange(0, 40, 2.0))


def test_hdf5_model_saver(tmp_path):
    import h5py
    path = tmp_path / "s.h5"
    with HDF5ModelSaver(path) as s:
        s.add_state_dict({"w": np.ones((2, 3)), "b": np.zeros(4)}, step=7)
        s.add_state_dict({"w": 2 * np.ones((2, 3)), "b": np.ones(4)}, step=9)
    from bnn_priors_tpu.io import load_samples
    samples = load_samples(path, keep_steps=True)
    assert samples["w"].shape == (2, 2, 3)
    np.testing.assert_allclose(samples["steps"], [7, 9])
    np.testing.assert_allclose(samples["w"][1], 2.0)


def test_verlet_reject_runner_exact_boundary(tmp_path):
    "paper algorithm: exact-gradient boundaries + M-H + fixed cycle order"
    from bnn_priors_tpu.inference import VerletSGLDRunnerReject
    from bnn_priors_tpu.io import HDF5Metrics
    x, y = _toy_data(n=50)
    model = models.LogisticRegression(4, 2)
    with HDF5Metrics(tmp_path / "metrics.h5") as metrics:
        runner = VerletSGLDRunnerReject(
            model, (x, y), (x, y), epochs_per_cycle=2, warmup_epochs=1,
            sample_epochs=1, learning_rate=1e-4, temperature=1.0,
            momentum=0.9, cycles=2, batch_size=16, reject_samples=True,
            metrics_saver=metrics, key=jax.random.key(2))
        runner.run()
        samples = runner.get_samples(keep_steps=True)
    assert samples["net.weight_prior.p"].shape[0] == 2
    import h5py
    with h5py.File(tmp_path / "metrics.h5", "r") as f:
        rejected = np.asarray(f["acceptance/rejected"])
        is_sample = np.asarray(f["acceptance/is_sample"])
        steps = np.asarray(f["steps"])
        # initial step + one boundary per sampling epoch are flagged
        n_flagged = int(np.nansum(np.where(is_sample == 1, 1, 0)))
        assert n_flagged == 3  # initial + 2 boundaries
        assert np.isfinite(np.asarray(f["delta_energy"])).any()
    # sample steps match flagged metric steps (for reject_samples_)
    flagged_steps = steps[is_sample == 1]
    assert set(samples["steps"]).issubset(set(flagged_steps.tolist()))


def test_exact_gradient_matches_sum_of_batches():
    "the exact-gradient scan equals the full-batch gradient"
    from bnn_priors_tpu.inference import VerletSGLDRunnerReject
    x, y = _toy_data(n=50)
    model = models.LogisticRegression(4, 2)
    runner = VerletSGLDRunnerReject(
        model, (x, y), None, epochs_per_cycle=2, warmup_epochs=1,
        sample_epochs=1, learning_rate=1e-4, batch_size=16,
        key=jax.random.key(3))
    loss, log_prior, pot, acc, grads, _ = runner._exact_vg(
        runner.chain.position, runner.model_state)
    params = runner.kernel.params_of(runner.chain)
    fn = model.potential_avg_fn({}, x, y, eff_num_data=50.0, train=True)
    (pot_ref, _), g_ref = jax.value_and_grad(fn, has_aux=True)(params)
    np.testing.assert_allclose(float(pot), float(pot_ref), rtol=1e-8)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-7),
        runner.kernel.unpack(grads), g_ref)


def test_flip_on_reject_negates_momentum():
    "GHMC-style momentum flip on rejection (opt-in; parity default = no flip)"
    from bnn_priors_tpu import mcmc
    model = models.GaussianModel(N=4, D=3)
    params, _ = model.init(jax.random.key(0))
    kernel = mcmc.VerletSGLD(num_data=1.0, momentum=0.9)
    state = kernel.init(params, jax.random.key(1), save_state=True)
    state = kernel.sample_momentum(state, 1.0)
    g = kernel.pack(jax.tree_util.tree_map(lambda a: 0.1 * a, params))
    state, _ = kernel.initial_step(state, g, 1e-3, 1.0, save_state=True)
    saved_mom = state.saved[1]
    huge = jnp.asarray(1e9)  # force rejection
    st_flip, rej, _ = kernel.maybe_reject(state, huge, 1.0,
                                          flip_on_reject=True)
    assert bool(rej)
    np.testing.assert_array_equal(np.asarray(st_flip.momentum),
                                  -np.asarray(saved_mom))
    st_plain, rej2, _ = kernel.maybe_reject(state, huge, 1.0)
    assert bool(rej2)
    np.testing.assert_array_equal(np.asarray(st_plain.momentum),
                                  np.asarray(saved_mom))


def test_initial_potential_kept_on_rejection(monkeypatch):
    """After a rejected boundary the next segment's base potential must be
    the restored state's (old) potential, not the rejected proposal's."""
    from bnn_priors_tpu import mcmc
    x, y = _toy_data()
    model = models.LogisticRegression(4, 2)
    runner = VerletSGLDRunner(
        model, (x, y), None, epochs_per_cycle=2, warmup_epochs=1,
        sample_epochs=1, learning_rate=1e-3, temperature=1.0, momentum=0.9,
        cycles=2, batch_size=16, reject_samples=True, key=jax.random.key(3))

    real = runner.kernel.maybe_reject

    def always_reject(state, de, temperature, **kw):
        st, _, lap = real(state, jnp.asarray(jnp.inf), temperature, **kw)
        return st, jnp.asarray(True), lap

    monkeypatch.setattr(runner.kernel, "maybe_reject", always_reject)

    seen = []
    real_boundary = runner._boundary

    def spying_boundary(*args, **kw):
        out = real_boundary(*args, **kw)
        seen.append(runner._initial_potential)
        return out

    monkeypatch.setattr(runner, "_boundary", spying_boundary)
    runner.run()
    # every boundary rejected ⇒ the chain rolls back to the state saved at
    # the very first initial_step every time, so the base potential must
    # stay pinned at the first boundary's value instead of tracking the
    # rejected proposals (the reference overwrites it, inference.py:344-346)
    assert len(seen) >= 3
    assert all(np.isfinite(v) for v in seen)
    assert all(v == seen[0] for v in seen[1:]), seen


def test_per_step_delta_energy_logged(tmp_path):
    "reference logs delta_energy/total_energy at every metrics step"
    x, y = _toy_data()
    model = models.LogisticRegression(4, 2)
    with HDF5Metrics(tmp_path / "metrics.h5") as metrics:
        runner = VerletSGLDRunner(
            model, (x, y), None, epochs_per_cycle=2, warmup_epochs=1,
            sample_epochs=1, learning_rate=1e-3, temperature=1.0,
            momentum=0.9, cycles=2, batch_size=16, metrics_skip=1,
            metrics_saver=metrics, key=jax.random.key(5))
        runner.run()
    import h5py
    with h5py.File(tmp_path / "metrics.h5", "r") as f:
        de = np.asarray(f["delta_energy"])
        finite = np.isfinite(de)
        # intermediate steps (not only the 4 boundary rows) carry ΔE
        assert finite.sum() > 2 * 4
        assert "total_energy" in f
