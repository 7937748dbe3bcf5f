"""Multi-chain exact-gradient M-H runner tests (the paper's main algorithm
vmapped over chains — parallel/multichain.py `MultiChainRunnerReject`)."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from bnn_priors_tpu import models
from bnn_priors_tpu.parallel import MultiChainRunnerReject, make_mesh


def _toy(n=64, d=4, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    x = jax.random.normal(k1, (n, d))
    y = (jax.random.normal(k2, (n,)) > 0).astype(jnp.int32)
    return x, y


def test_end_to_end_and_acceptance_bookkeeping():
    x, y = _toy(n=48)
    model = models.LogisticRegression(4, 2)
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=4, temperatures=1.0, learning_rate=1e-4,
        momentum=0.9, batch_size=16, cycles=2, epochs_per_cycle=2,
        warmup_epochs=1, sample_epochs=1, key=jax.random.key(1),
        dtype=jnp.float64)
    runner.run()
    bank = runner.get_samples()
    assert bank["net.weight_prior.p"].shape == (2, 4, 2, 4)
    # one (n_chains,) rejection + delta-energy record per boundary
    assert len(runner.rejections) == 2 and len(runner.delta_energies) == 2
    assert runner.rejections[0].shape == (4,)
    assert np.all(np.isfinite(np.stack(runner.delta_energies)))
    assert runner.acceptance_rates().shape == (4,)
    # chains differ (independent inits/noise)
    assert not np.allclose(bank["net.weight_prior.p"][0, 0],
                           bank["net.weight_prior.p"][0, 1])


def test_fixed_minibatch_order_per_cycle():
    "every epoch of a cycle visits data in the chain's SAME fixed order"
    x, y = _toy(n=48)
    model = models.LogisticRegression(4, 2)
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=3, learning_rate=1e-4, batch_size=16,
        cycles=2, epochs_per_cycle=2, warmup_epochs=1, sample_epochs=1,
        key=jax.random.key(2))
    i00 = np.asarray(runner._epoch_idxs(cycle=0, epoch=0))
    i01 = np.asarray(runner._epoch_idxs(cycle=0, epoch=1))
    i10 = np.asarray(runner._epoch_idxs(cycle=1, epoch=0))
    np.testing.assert_array_equal(i00, i01)          # same within a cycle
    assert not np.array_equal(i00, i10)              # fresh order per cycle
    assert not np.array_equal(i00[0], i00[1])        # per-chain orders


def test_distribution_preservation_with_rejection():
    """K vmapped chains of GGMC with exact M-H started at the exact
    Gaussian posterior stay there (KS), with a healthy acceptance rate
    (reference test_verlet_sgld.py floor: > 0.6)."""
    model = models.GaussianModel(N=8, D=40, mean=1.0, std=2.0)
    x = jnp.zeros((1, 1))
    y = jnp.zeros((1,), dtype=jnp.int32)
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=6, temperatures=1.0,
        learning_rate=0.5, momentum=0.9, data_mult=1.0,
        sampling_decay="flat", batch_size=1, cycles=30, epochs_per_cycle=2,
        warmup_epochs=1, sample_epochs=1, key=jax.random.key(3),
        dtype=jnp.float64)
    runner.run()
    acc = runner.acceptance_rates()
    assert acc.shape == (6,)
    assert acc.mean() > 0.6, acc
    # rejections DO happen (the rollback path is exercised) but not always
    rej = np.stack(runner.rejections)
    assert 0.0 < rej.mean() < 0.4
    # the LAST snapshot pooled over chains and leaves is iid across the
    # 6×8×40 independent dimensions — an exact KS test (pooling successive
    # snapshots would be invalidated by autocorrelation)
    bank = runner.get_samples()  # leaves "0.p".."7.p": (n_samples, chains, D)
    last = np.concatenate([v[-1].ravel() for v in bank.values()])
    cdf = lambda v: scipy.stats.norm.cdf(v, loc=1.0, scale=2.0)
    assert scipy.stats.ks_1samp(last, cdf).pvalue > 0.01


def test_reject_runner_on_mesh():
    "chains sharded over the 8-device CPU mesh; boundaries still vmapped"
    mesh = make_mesh(8, 1)
    x, y = _toy(n=32)
    model = models.LogisticRegression(4, 2)
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=8, learning_rate=1e-4, momentum=0.9,
        batch_size=16, cycles=1, epochs_per_cycle=2, warmup_epochs=1,
        sample_epochs=1, mesh=mesh, key=jax.random.key(4),
        dtype=jnp.float64)
    runner.run()
    assert runner.get_samples()["net.weight_prior.p"].shape[1] == 8
    assert runner.rejections[0].shape == (8,)


def test_hmc_variant():
    "HMC multichain: momentum refresh per boundary, exact delta-H accept"
    x, y = _toy(n=32)
    model = models.LogisticRegression(4, 2)
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=3, kernel="HMC", temperatures=1.0,
        learning_rate=1e-5, batch_size=16, cycles=3, epochs_per_cycle=1,
        warmup_epochs=0, sample_epochs=1, key=jax.random.key(5),
        dtype=jnp.float64)
    runner.run()
    # small steps => near-exact integration => (almost) everything accepted
    assert runner.acceptance_rates().mean() > 0.9


def test_precond_update_only_between_segments(monkeypatch):
    """Preconditioner updates must land between M-H segments (after
    maybe_reject, before initial_step), never mid-segment — otherwise ΔE
    mixes old-M and new-M terms and the exact acceptance test is wrong."""
    x, y = _toy(n=48)
    model = models.LogisticRegression(4, 2)
    # skip=2 → epoch 1 of each cycle samples, epoch 2 does not; with
    # precond_update=1 the non-boundary epoch's update must be deferred
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=2, temperatures=1.0, learning_rate=1e-4,
        momentum=0.9, batch_size=16, cycles=2, epochs_per_cycle=3,
        warmup_epochs=1, sample_epochs=2, skip=2, precond_update=1,
        key=jax.random.key(1), dtype=jnp.float64)

    calls = []
    real = runner.kernel.update_preconditioner

    def spy(state):
        calls.append(len(runner.rejections))  # boundaries completed so far
        return real(state)

    monkeypatch.setattr(runner.kernel, "update_preconditioner", spy)
    runner.run()
    n_boundaries = len(runner.rejections)
    assert n_boundaries == 2  # one per cycle (epoch index 1, skip=2)
    # every update fired exactly at a boundary: the count of completed
    # boundaries strictly increases between consecutive update calls,
    # i.e. no two updates inside one segment and none mid-segment
    assert len(calls) == 2
    assert calls == sorted(set(calls)), calls


class _ListSaver:
    "minimal ModelSaver stand-in: collects state dicts in memory"
    def __init__(self):
        self.records = []

    def add_state_dict(self, sd, step):
        self.records.append((step, sd))


def test_nan_chain_quarantine():
    """A diverged (NaN) chain is flagged, its samples are dropped from
    get_samples(), chain_samples() refuses it, and streaming savers skip
    it — NaNs cannot silently enter post-hoc ensembles."""
    import warnings as _warnings
    x, y = _toy(n=48)
    model = models.LogisticRegression(4, 2)
    savers = [_ListSaver() for _ in range(3)]
    runner = MultiChainRunnerReject(
        model, (x, y), n_chains=3, temperatures=1.0, learning_rate=1e-4,
        momentum=0.9, batch_size=16, cycles=1, epochs_per_cycle=2,
        warmup_epochs=1, sample_epochs=1, key=jax.random.key(5),
        dtype=jnp.float64, model_savers=savers)
    # poison chain 1's position -> NaN potential on its first step
    runner.states = runner.states._replace(
        position=jax.tree_util.tree_map(
            lambda l: jnp.asarray(l).at[1].set(jnp.nan),
            runner.states.position))
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        runner.run()
    assert runner.nan_chains == {1}
    # streamed bank: healthy chains got samples, the diverged one none
    assert len(savers[0].records) == 1 and len(savers[2].records) == 1
    assert len(savers[1].records) == 0

    # in-memory bank path: same poisoning without savers
    runner2 = MultiChainRunnerReject(
        model, (x, y), n_chains=3, temperatures=1.0, learning_rate=1e-4,
        momentum=0.9, batch_size=16, cycles=1, epochs_per_cycle=2,
        warmup_epochs=1, sample_epochs=1, key=jax.random.key(6),
        dtype=jnp.float64)
    runner2.states = runner2.states._replace(
        position=jax.tree_util.tree_map(
            lambda l: jnp.asarray(l).at[0].set(jnp.nan),
            runner2.states.position))
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        runner2.run()
    assert runner2.nan_chains == {0}
    bank = runner2.get_samples(drop_nan_chains=False)
    assert bank["net.weight_prior.p"].shape[1] == 3
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        clean = runner2.get_samples()  # default drops the diverged chain
    assert clean["net.weight_prior.p"].shape[1] == 2
    assert np.all(np.isfinite(clean["net.weight_prior.p"]))
    try:
        runner2.chain_samples(0)
        raise AssertionError("expected ValueError for diverged chain")
    except ValueError:
        pass
