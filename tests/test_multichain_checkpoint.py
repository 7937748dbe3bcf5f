"""Multi-chain checkpoint/resume: a resumed run continues the EXACT same
trajectory (bit-for-bit), including the reject variant's rollback slots,
per-cycle permutation keys, boundary potentials and acceptance history."""
import jax
import jax.numpy as jnp
import numpy as np

from bnn_priors_tpu import models
from bnn_priors_tpu.parallel import MultiChainRunner, MultiChainRunnerReject


def _tree_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def _toy(n=48, d=4, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    x = jax.random.normal(k1, (n, d))
    y = (jax.random.normal(k2, (n,)) > 0).astype(jnp.int32)
    return x, y


def _make(cls, x, y, **extra):
    return cls(models.LogisticRegression(4, 2), (x, y), n_chains=3,
               temperatures=1.0, learning_rate=1e-4, momentum=0.9,
               batch_size=16, cycles=2, epochs_per_cycle=2, warmup_epochs=1,
               sample_epochs=1, key=jax.random.key(7), dtype=jnp.float64,
               **extra)


def test_base_runner_resume_bitwise(tmp_path):
    x, y = _toy()
    full = _make(MultiChainRunner, x, y)
    full.run()
    # a half-length run saves its end-state checkpoint (after epoch 2 of 4)
    half = _make(MultiChainRunner, x, y)
    half.cycles = 1
    half.run(checkpoint_path=tmp_path / "mid.npz", checkpoint_every=2)
    resumed = _make(MultiChainRunner, x, y)
    resumed.run(resume_from=tmp_path / "mid.npz")
    _tree_equal(resumed.states.position, full.states.position)
    _tree_equal(resumed.states.momentum, full.states.momentum)


def test_reject_runner_resume_bitwise(tmp_path):
    x, y = _toy()
    full = _make(MultiChainRunnerReject, x, y)
    full.run()
    half = _make(MultiChainRunnerReject, x, y)
    half.cycles = 1
    half.run(checkpoint_path=tmp_path / "mid.npz", checkpoint_every=2)
    resumed = _make(MultiChainRunnerReject, x, y)
    resumed.run(resume_from=tmp_path / "mid.npz")
    _tree_equal(resumed.states.position, full.states.position)
    # acceptance history restored + continued
    assert len(resumed.rejections) == len(full.rejections) == 2
    np.testing.assert_array_equal(np.stack(resumed.rejections),
                                  np.stack(full.rejections))
    np.testing.assert_allclose(np.stack(resumed.delta_energies),
                               np.stack(full.delta_energies), rtol=1e-12)
