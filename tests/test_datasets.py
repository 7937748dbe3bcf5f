"""Dataset shape/normalization contract — port of the reference
`testing/test_datasets.py` (shape, norm==unnorm shape, bounded norm
moments) plus the `get_data` registry dispatch of
`testing/test_exp_utils.py:16-24`. Real MNIST/CIFAR files are not
downloadable in this environment, so those rows run on the bundled UCI
text data and the Fake* stand-ins (same shapes/dtypes)."""
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_priors_tpu import data as data_mod
from bnn_priors_tpu import exp_utils


def _check_dataset(data, shape, in_shape):
    assert tuple(data.norm.X.shape) == shape
    assert tuple(data.in_shape) == in_shape
    assert tuple(data.norm.X.shape[-len(in_shape):]) == in_shape
    assert data.norm.X.shape[0] == data.norm.y.shape[0]
    assert data.norm.X.shape == data.unnorm.X.shape
    assert data.norm.y.shape == data.unnorm.y.shape
    # normalization bounds (reference test_normalization)
    m = float(jnp.mean(data.norm.X))
    assert -2.0 < m < 2.0
    assert float(jnp.std(data.norm.X)) < 2.0


@pytest.mark.parametrize("name,shape,in_shape", [
    ("UCI_boston", (506, 13), (13,)),
    ("UCI_wine", (1599, 11), (11,)),
    ("UCI_yacht", (308, 6), (6,)),
])
def test_uci_shapes(name, shape, in_shape):
    data = exp_utils.get_data(name)
    _check_dataset(data, shape, in_shape)
    # train/test split views partition the rows
    n_tr = data.norm.train_X.shape[0]
    n_te = data.norm.test_X.shape[0]
    assert n_tr + n_te == shape[0]


def test_fake_mnist_shape():
    data = data_mod.FakeMNIST(n_train=600, n_test=100)
    _check_dataset(data, (700, 784), (784,))


def test_fake_cifar10_shape():
    data = data_mod.FakeCIFAR10(n_train=500, n_test=100)
    _check_dataset(data, (600, 3, 32, 32), (3, 32, 32))


def test_random_data_shape():
    data = data_mod.RandomData(dim=7, n_points=100, seed=0)
    _check_dataset(data, (100, 7), (7,))


def test_get_data_registry_dispatch():
    "reference test_exp_utils.test_data: names map to the right classes"
    assert isinstance(exp_utils.get_data("UCI_boston"), data_mod.UCI)
    assert isinstance(exp_utils.get_data("UCI_wine"), data_mod.UCI)
    assert isinstance(exp_utils.get_data("random"), data_mod.RandomData)
    assert isinstance(exp_utils.get_data("random_ood_test"),
                      data_mod.RandomOODTestData)
    assert isinstance(exp_utils.get_data("fake_mnist"), data_mod.FakeMNIST)
    assert isinstance(exp_utils.get_data("fake_cifar10"),
                      data_mod.FakeCIFAR10)
    with pytest.raises(ValueError):
        exp_utils.get_data("not_a_dataset")


def test_hdf5_metrics_int64_fill(tmp_path):
    """int metrics use the -2**63 fill for never-written steps (reference
    test_exp_utils.py:63-79 semantics)."""
    import h5py

    from bnn_priors_tpu.io import HDF5Metrics
    path = tmp_path / "m.h5"
    with HDF5Metrics(path, chunk_size=7) as m:
        for i in range(20):
            m.add_scalar("f", float(i), i)
            if i % 5 == 0:
                m.add_scalar("n", int(i // 5), i)
        m.flush()
    with h5py.File(path, "r") as f:
        n = np.asarray(f["n"])
        assert n.dtype == np.int64
        np.testing.assert_array_equal(n[::5], np.arange(4))
        for off in range(1, 5):
            assert np.all(n[off::5] == np.iinfo(np.int64).min)


def test_random_data_seeded_through_config():
    """data=random is pinned to the config seed (VERDICT r4 item 8): train
    and eval re-hydration must see the IDENTICAL dataset, different seeds
    must see different ones. (Deliberate fix over the reference, whose
    toy_data.py RandomData is unseeded.)"""
    cfg3 = {"data": "random", "seed": 3}
    d1, _ = exp_utils.get_data_from_config(cfg3)
    d2, _ = exp_utils.get_data_from_config(cfg3)
    np.testing.assert_array_equal(d1.norm.test_X, d2.norm.test_X)
    np.testing.assert_array_equal(d1.norm.train_y, d2.norm.train_y)
    d4, _ = exp_utils.get_data_from_config({"data": "random_ood_test",
                                            "seed": 3})
    d5, _ = exp_utils.get_data_from_config({"data": "random", "seed": 4})
    assert not np.array_equal(d1.norm.train_X, d5.norm.train_X)
    # seeding must not break deterministic (file-backed) datasets
    u, _ = exp_utils.get_data_from_config({"data": "UCI_yacht", "seed": 3})
    assert isinstance(u, data_mod.UCI)
