"""Dispatch-group batching (parallel/multichain.py _dispatch_groups):
big chain banks step as sequential sweet-spot-sized vmap groups — the
trajectories must be IDENTICAL to the single big vmap (chains are
independent; grouping only changes scheduling)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_priors_tpu import models
from bnn_priors_tpu.parallel import MultiChainRunner, MultiChainRunnerReject


def _toy(n=48, d=4, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    x = jax.random.normal(k1, (n, d))
    y = (jax.random.normal(k2, (n,)) > 0).astype(jnp.int32)
    return x, y


def _mk(runner_cls, n_chains, chain_group_size, key=11):
    x, y = _toy()
    model = models.LogisticRegression(4, 2)
    return runner_cls(
        model, (x, y), n_chains=n_chains, temperatures=1.0,
        learning_rate=1e-3, momentum=0.9, batch_size=16, cycles=2,
        epochs_per_cycle=2, warmup_epochs=1, sample_epochs=1,
        key=jax.random.key(key), chain_group_size=chain_group_size)


def test_group_split_math():
    r = _mk(MultiChainRunner, 8, None)
    assert r._dispatch_groups() == (2, 4)
    r = _mk(MultiChainRunner, 6, None)
    assert r._dispatch_groups() == (2, 3)
    r = _mk(MultiChainRunner, 3, None)
    assert r._dispatch_groups() == (1, 3)
    r = _mk(MultiChainRunner, 8, 0)      # grouping disabled
    assert r._dispatch_groups() == (1, 8)
    r = _mk(MultiChainRunner, 8, 2)      # explicit per-device group size
    assert r._dispatch_groups() == (4, 2)
    r = _mk(MultiChainRunner, 7, None)   # prime bank: largest divisor <= 4
    assert r._dispatch_groups() == (7, 1)
    r = _mk(MultiChainRunner, 12, None)  # rate-based auto: 3 (1362) over 4
    assert r._dispatch_groups() == (4, 3)
    r = _mk(MultiChainRunner, 10, None)  # 5 divides but exceeds target=4
    assert r._dispatch_groups() == (5, 2)


@pytest.mark.parametrize("runner_cls", [MultiChainRunner,
                                        MultiChainRunnerReject])
def test_grouped_equals_ungrouped(runner_cls):
    grouped = _mk(runner_cls, 8, None)
    assert grouped._dispatch_groups()[0] > 1
    plain = _mk(runner_cls, 8, 0)
    hist_g = grouped.run()
    hist_p = plain.run()
    # same PRNG streams and per-chain math; XLA reassociates reductions
    # differently at different vmap widths, so equality is to float32
    # ulp-accumulation, not bitwise
    for mg, mp in zip(hist_g, hist_p):
        for k in mg:
            np.testing.assert_allclose(np.asarray(mg[k]),
                                       np.asarray(mp[k]), rtol=2e-4,
                                       atol=1e-6, err_msg=k)
    bg, bp = grouped.get_samples(), plain.get_samples()
    for k in bg:
        np.testing.assert_allclose(bg[k], bp[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)
    if runner_cls is MultiChainRunnerReject:
        np.testing.assert_array_equal(np.stack(grouped.rejections),
                                      np.stack(plain.rejections))
