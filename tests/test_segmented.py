"""Segmented (per-leaf pytree) chain state vs the flat packed vector:
identical sampler semantics, different memory representation
(mcmc/segmented.py; PERF.md "The flat-pack tax")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_priors_tpu import mcmc, models
from bnn_priors_tpu.mcmc.segmented import SegPacker, SegVec, vclip, vsum


def _setup(packing, kernel_cls=mcmc.VerletSGLD, **kw):
    model = models.GaussianModel(N=8, D=5)
    params, _ = model.init(jax.random.key(0))
    kernel = kernel_cls(num_data=8.0, momentum=0.9, packing=packing, **kw)
    state = kernel.init(params, jax.random.key(1),
                        **({"save_state": True}
                           if kernel_cls is mcmc.VerletSGLD else {}))
    return model, params, kernel, state


def _grad(model, kernel, state):
    fn = jax.grad(lambda p: -model.log_prior(p) / 8.0)
    return vclip(kernel.pack(fn(kernel.unpack(state.position))), -1e6, 1e6)


def test_pack_unpack_roundtrip():
    model, params, kernel, state = _setup("segmented")
    assert isinstance(kernel.packer, SegPacker)
    assert isinstance(state.position, SegVec)
    rt = kernel.unpack(kernel.pack(params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), rt, params)


@pytest.mark.parametrize("kernel_cls", [mcmc.SGLD, mcmc.VerletSGLD])
def test_deterministic_steps_match_flat(kernel_cls):
    """T=0 removes the (stream-dependent) noise: positions after several
    steps must be IDENTICAL between representations; energy accumulators
    differ only by floating reduction order."""
    mf, pf, kf, sf = _setup("flat", kernel_cls)
    ms, ps, ks, ss = _setup("segmented", kernel_cls)
    for i in range(5):
        gf = _grad(mf, kf, sf)
        gs = _grad(ms, ks, ss)
        sf, _ = kf.step(sf, gf, 1e-3, 0.0)
        ss, _ = ks.step(ss, gs, 1e-3, 0.0)
        if (i + 1) % 2 == 0:
            sf = kf.update_preconditioner(sf)
            ss = ks.update_preconditioner(ss)
    pos_f = kf.unpack(sf.position)
    pos_s = ks.unpack(ss.position)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-12),
        pos_f, pos_s)
    np.testing.assert_allclose(np.asarray(kf.leaf_precond(sf)),
                               np.asarray(ks.leaf_precond(ss)), rtol=1e-6)
    if kernel_cls is mcmc.VerletSGLD:
        np.testing.assert_allclose(float(sf.delta_energy_acc),
                                   float(ss.delta_energy_acc), rtol=1e-6)


def test_metrics_match_flat():
    mf, pf, kf, sf = _setup("flat")
    ms, ps, ks, ss = _setup("segmented")
    gf, gs = _grad(mf, kf, sf), _grad(ms, ks, ss)
    _, mtf = kf.step(sf, gf, 1e-3, 0.0, calc_metrics=True)
    _, mts = ks.step(ss, gs, 1e-3, 0.0, calc_metrics=True)
    for k in ("est_temperature", "est_config_temp"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-12),
            mtf[k], mts[k])


def test_reject_rollback_segmented():
    model, params, kernel, state = _setup("segmented")
    state = kernel.sample_momentum(state, 1.0)
    g = _grad(model, kernel, state)
    state, _ = kernel.initial_step(state, g, 1e-3, 1.0, save_state=True)
    saved_pos = state.saved[0]
    state, _ = kernel.step(state, g, 1e-3, 1.0)
    huge = jnp.asarray(1e9)  # force rejection
    state, rejected, _ = kernel.maybe_reject(state, huge, 1.0)
    assert bool(rejected)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        kernel.unpack(state.position), kernel.unpack(saved_pos))


def test_sample_momentum_distribution():
    "per-leaf streams: marginals still N(0, T)"
    model, params, kernel, state = _setup("segmented")
    import scipy.stats
    vals = []
    for i in range(200):
        state = kernel.sample_momentum(state._replace(
            key=jax.random.key(i)), temperature=1.0)
        vals.append(np.concatenate(
            [np.ravel(l) for l in state.momentum.leaves]))
    vals = np.concatenate(vals)
    assert scipy.stats.kstest(vals, "norm").pvalue > 1e-4
    d = vals.size / 200
    est_t = float(vsum(state.momentum * state.momentum)) / d
    assert 0.2 < est_t < 5.0


def test_runner_flat_mode_still_works():
    "the flat representation stays selectable through the runners"
    from bnn_priors_tpu.inference import SGLDRunner
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (48, 4))
    y = (jax.random.normal(k2, (48,)) > 0).astype(jnp.int32)
    r = SGLDRunner(models.LogisticRegression(4, 2), (x, y), None,
                   epochs_per_cycle=2, warmup_epochs=1, sample_epochs=1,
                   learning_rate=1e-3, batch_size=16, cycles=1,
                   packing="flat")
    assert not isinstance(r.kernel.packer, SegPacker)
    r.run()
    bank = r.get_samples()
    assert bank["net.weight_prior.p"].shape == (1, 2, 4)


def test_multichain_segmented_vs_flat_distribution():
    "same Gaussian posterior KS health in both representations"
    import scipy.stats
    from bnn_priors_tpu.parallel import MultiChainRunnerReject
    model = models.GaussianModel(N=8, D=40, mean=1.0, std=2.0)

    def run(packing):
        r = MultiChainRunnerReject(
            model, (jnp.zeros((1, 1)), jnp.zeros((1,), jnp.int32)),
            n_chains=4, temperatures=1.0, learning_rate=0.5, momentum=0.9,
            sampling_decay="flat", batch_size=1, cycles=8,
            epochs_per_cycle=2, warmup_epochs=1, sample_epochs=1,
            key=jax.random.key(3), dtype=jnp.float64, packing=packing)
        r.run()
        bank = r.get_samples()
        return np.concatenate([np.asarray(v)[-1].ravel()
                               for v in bank.values()])

    a, b = run("segmented"), run("flat")
    # two-sample KS between the representations' last posterior snapshots
    assert scipy.stats.ks_2samp(a, b).pvalue > 1e-3


# -- hybrid representation (VERDICT r4 item 3) ------------------------------

def _conv_setup(packing):
    kx = jax.random.key(0)
    x = jax.random.normal(kx, (4, 3 * 8 * 8))  # flat NCHW pixels
    y = jnp.zeros((4,), jnp.int32)
    model = models.ClassificationConvNet(3, 8, 10, width=8, depth=3)
    params, mstate = model.init(jax.random.key(2))
    kernel = mcmc.VerletSGLD(num_data=4.0, momentum=0.9, packing=packing)
    state = kernel.init(params, jax.random.key(1), save_state=True)
    return model, params, mstate, kernel, state, (x, y)


def test_hybrid_structure_and_roundtrip():
    from bnn_priors_tpu.mcmc.segmented import HybridPacker
    _, params, _, kernel, state, _ = _conv_setup("hybrid")
    pk = kernel.packer
    assert isinstance(pk, HybridPacker)
    assert isinstance(state.position, SegVec)
    # conv kernels native, everything else in ONE flat segment
    n_native = len(pk.native_idx)
    assert n_native >= 1 and pk.small_idx
    assert len(state.position.leaves) == n_native + 1
    for j, i in enumerate(pk.native_idx):
        assert state.position.leaves[j].ndim >= 3
    rt = kernel.unpack(kernel.pack(params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), rt, params)


def test_hybrid_reductions_match_flat_packer():
    "segment_sum / leaf_firsts / expand agree with the flat Packer's"
    from bnn_priors_tpu.mcmc.packing import Packer
    _, params, _, kernel, state, _ = _conv_setup("hybrid")
    pk = kernel.packer
    flat_pk = Packer(params)
    v = jax.tree_util.tree_map(
        lambda a: jnp.arange(a.size, dtype=jnp.float64).reshape(a.shape)
        * 1e-3, params)
    np.testing.assert_allclose(
        np.asarray(pk.segment_sum(pk.pack(v))),
        np.asarray(flat_pk.segment_sum(flat_pk.pack(v))), rtol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(pk.leaf_firsts(pk.pack(v))),
        np.asarray(flat_pk.leaf_firsts(flat_pk.pack(v))))
    scalars = jnp.arange(pk.n_leaves, dtype=jnp.float64) + 1.0
    exp_h = pk.expand(scalars)
    exp_f = flat_pk.unpack(flat_pk.expand(scalars))
    # expanding per-leaf scalars then unpacking gives leaf-constant trees
    got = pk.unpack(exp_h * pk.pack(jax.tree_util.tree_map(
        jnp.ones_like, params)))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-12),
        got, exp_f)


@pytest.mark.parametrize("kernel_cls", [mcmc.SGLD, mcmc.VerletSGLD])
def test_hybrid_deterministic_steps_match_flat(kernel_cls):
    "T=0 conv-model trajectories: hybrid == flat to float tolerance"
    mf, pf, msf, kf, sf, (x, y) = _conv_setup("flat")
    mh, ph, msh, kh, sh, _ = _conv_setup("hybrid")
    if kernel_cls is mcmc.SGLD:
        kf = mcmc.SGLD(num_data=4.0, momentum=0.9, packing="flat")
        sf = kf.init(pf, jax.random.key(1))
        kh = mcmc.SGLD(num_data=4.0, momentum=0.9, packing="hybrid")
        sh = kh.init(ph, jax.random.key(1))

    def grad(model, kernel, state, mstate):
        def f(p):
            pot, _ = model.potential_avg_fn(
                mstate, x, y, eff_num_data=4.0, train=False)(p)
            return pot
        return vclip(kernel.pack(jax.grad(f)(kernel.unpack(state.position))),
                     -1e6, 1e6)

    for i in range(3):
        sf, _ = kf.step(sf, grad(mf, kf, sf, msf), 1e-3, 0.0)
        sh, _ = kh.step(sh, grad(mh, kh, sh, msh), 1e-3, 0.0)
        if i == 1:
            sf = kf.update_preconditioner(sf)
            sh = kh.update_preconditioner(sh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12),
        kf.unpack(sf.position), kh.unpack(sh.position))
    np.testing.assert_allclose(np.asarray(kf.leaf_precond(sf)),
                               np.asarray(kh.leaf_precond(sh)), rtol=1e-6)


def test_hybrid_multichain_runs():
    "MultiChainRunner with packing='hybrid': chains advance, samples finite"
    from bnn_priors_tpu.parallel import MultiChainRunner
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (32, 3 * 8 * 8))
    y = (jax.random.normal(ky, (32,)) > 0).astype(jnp.int32)
    model = models.ClassificationConvNet(3, 8, 2, width=8, depth=3)
    runner = MultiChainRunner(
        model, (x, y), n_chains=2, temperatures=1.0, kernel="VerletSGLD",
        learning_rate=1e-3, momentum=0.9, batch_size=16, cycles=1,
        epochs_per_cycle=2, warmup_epochs=1, sample_epochs=1,
        key=jax.random.key(5), dtype=jnp.float64, packing="hybrid")
    runner.run()
    bank = runner.get_samples()
    for k, v in bank.items():
        assert np.isfinite(v).all(), k
