"""Buffer donation (jit_utils.donating_jit): the donated and undonated
programs must be BITWISE identical — donation only changes whether the
chain-state carry reuses its input buffers (the XLA analogue of the
reference's in-place `p.add_()`, mcmc/sgld.py:150-152)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_priors_tpu import models
from bnn_priors_tpu import jit_utils
from bnn_priors_tpu.inference import VerletSGLDRunnerReject
from bnn_priors_tpu.parallel import MultiChainRunnerReject


def _toy(n=48, d=4, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    x = jax.random.normal(k1, (n, d))
    y = (jax.random.normal(k2, (n,)) > 0).astype(jnp.int32)
    return x, y


def test_donation_supported_on_cpu():
    assert jit_utils.donation_supported() is True


def test_env_override(monkeypatch):
    monkeypatch.setenv("BNN_PRIORS_TPU_DONATE", "0")
    assert jit_utils.donation_supported() is False
    monkeypatch.setenv("BNN_PRIORS_TPU_DONATE", "1")
    assert jit_utils.donation_supported() is True


def test_unalias_copies_shared_buffers():
    "donating two leaves backed by ONE buffer must not raise"
    z = jnp.zeros((16,))
    f = jit_utils.donating_jit(lambda a, b: (a + 1, b + 2),
                               donate_argnums=(0, 1))
    a, b = f(z, z)  # same underlying buffer twice
    np.testing.assert_array_equal(np.asarray(a), 1.0)
    np.testing.assert_array_equal(np.asarray(b), 2.0)


def _run_single(donate, monkeypatch):
    monkeypatch.setenv("BNN_PRIORS_TPU_DONATE", "1" if donate else "0")
    x, y = _toy()
    model = models.LogisticRegression(4, 2)
    r = VerletSGLDRunnerReject(
        model, (x, y), (x, y), epochs_per_cycle=2, warmup_epochs=1,
        sample_epochs=1, learning_rate=1e-3, momentum=0.9, cycles=2,
        batch_size=16, reject_samples=True, key=jax.random.key(3))
    r.run()
    return r.get_samples()


def _run_multi(donate, monkeypatch):
    monkeypatch.setenv("BNN_PRIORS_TPU_DONATE", "1" if donate else "0")
    x, y = _toy()
    model = models.LogisticRegression(4, 2)
    r = MultiChainRunnerReject(
        model, (x, y), n_chains=3, learning_rate=1e-3, momentum=0.9,
        batch_size=16, cycles=2, epochs_per_cycle=2, warmup_epochs=1,
        sample_epochs=1, key=jax.random.key(4))
    hist = r.run()
    bank = r.get_samples()
    return bank, hist


@pytest.mark.parametrize("runner", ["single", "multi"])
def test_donated_bitwise_equals_undonated(runner, monkeypatch):
    run = _run_single if runner == "single" else _run_multi
    a = run(True, monkeypatch)
    b = run(False, monkeypatch)
    for va, vb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
