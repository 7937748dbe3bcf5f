"""Tests for the Lanczos effective-dimension toolkit.

Port of the reference's `testing/test_eff_dim.py` contract (which is
broken upstream — the module was removed before release): Hessian-vector
products against a dense Hessian, Lanczos Ritz values against
`jnp.linalg.eigh`, and the effective-dimension statistic.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bnn_priors_tpu import eff_dim


def _quadratic(dim=24, seed=0):
    "loss(θ) = ½ θᵀAθ with known PSD A"
    k = jax.random.key(seed)
    B = jax.random.normal(k, (dim, dim), jnp.float64)
    A = B @ B.T / dim + 0.1 * jnp.eye(dim, dtype=jnp.float64)
    params = {"w": jax.random.normal(jax.random.key(seed + 1), (dim,),
                                     jnp.float64)}
    loss = lambda p: 0.5 * p["w"] @ A @ p["w"]
    return A, params, loss


def test_hess_vec_prod_matches_dense():
    A, params, loss = _quadratic()
    v = {"w": jax.random.normal(jax.random.key(2), (24,), jnp.float64)}
    hv = eff_dim.hess_vec_prod(loss, params, v)
    np.testing.assert_allclose(np.asarray(hv["w"]), np.asarray(A @ v["w"]),
                               rtol=1e-10)


def test_dense_hessian():
    A, params, loss = _quadratic()
    H = eff_dim.hessian(loss, params)
    np.testing.assert_allclose(np.asarray(H), np.asarray(A), rtol=1e-10)


def test_unflatten_like_roundtrip():
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.arange(4.0)}
    from bnn_priors_tpu.mcmc.packing import Packer
    pk = Packer(tree)
    out = eff_dim.unflatten_like(pk.pack(tree), tree)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(tree[k]))


def test_symeig_positive_lanczos_dense():
    "full-rank Lanczos run reproduces all eigenvalues of a PSD matrix"
    A, _, _ = _quadratic(dim=16, seed=3)
    evals, vecs, pos = eff_dim.symeig_positive_lanczos(A, num_iters=16,
                                                       key=jax.random.key(4))
    ref = jnp.linalg.eigh(A)[0]
    np.testing.assert_allclose(np.sort(np.asarray(evals)),
                               np.sort(np.asarray(ref)), rtol=1e-6)
    # Ritz vectors diagonalize A
    for i in range(16):
        v = vecs[:, i]
        np.testing.assert_allclose(np.asarray(A @ v),
                                   float(evals[i]) * np.asarray(v),
                                   atol=1e-6)


def test_hessian_eigs_positive_lanczos_mlp():
    "matrix-free Hessian Ritz values match dense eigh on a small MLP loss"
    k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
    params = {"w1": jax.random.normal(k1, (6, 8), jnp.float64) * 0.5,
              "b1": jnp.zeros((8,), jnp.float64),
              "w2": jax.random.normal(k2, (8, 1), jnp.float64) * 0.5}
    X = jax.random.normal(k3, (32, 6), jnp.float64)
    y = jnp.sin(X.sum(1, keepdims=True))

    def loss(p):
        h = jnp.tanh(X @ p["w1"] + p["b1"])
        return jnp.mean((h @ p["w2"] - y) ** 2)

    H = eff_dim.hessian(loss, params)
    dense = np.sort(np.asarray(jnp.linalg.eigh(H)[0]))
    n = H.shape[0]
    evals, _, _ = eff_dim.hessian_eigs_positive_lanczos(
        loss, params, key=jax.random.key(6), num_iters=n + 64)
    lanczos_top = np.sort(np.asarray(evals))[-5:]
    np.testing.assert_allclose(lanczos_top, dense[-5:], rtol=1e-5,
                               atol=1e-8)


def test_effective_dimension():
    lam = jnp.asarray([10.0, 1.0, 0.1, 0.0, -0.5])
    # Σ λ/(λ+z) over positive λ at z=1
    expect = 10 / 11 + 1 / 2 + 0.1 / 1.1
    np.testing.assert_allclose(float(eff_dim.effective_dimension(lam, 1.0)),
                               expect, rtol=1e-6)
