"""Effective-dimension / Hessian-spectrum toolkit (Lanczos).

Rebuild of the reference's ghost module `bnn_priors.eff_dim`, which is
imported by `testing/test_eff_dim.py:6` but absent from the released
package; its API is recovered from that test file
(`test_eff_dim.py:21-126`): `hessian`, `hess_vec_prod`, `unflatten_like`,
`symeig_positive_lanczos`, `hessian_eigs_positive_lanczos`. Used for the
effective-dimensionality diagnostic N_eff(z) = Σ_i λ_i/(λ_i+z) (Maddox et
al., arXiv:2003.02139).

TPU-native design: Hessian-vector products are forward-over-reverse
(`jax.jvp` of `jax.grad`) over the flat-packed parameter vector — one
fused pass, no per-parameter Python loops — and the Lanczos recursion is a
`lax.scan` with full reorthogonalization against the stored basis (m×dim
matmuls on the MXU).
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from .mcmc.packing import Packer

__all__ = ["unflatten_like", "hess_vec_prod", "hessian",
           "lanczos_tridiag", "symeig_positive_lanczos",
           "hessian_eigs_positive_lanczos", "effective_dimension"]


def unflatten_like(vec: jnp.ndarray, tree):
    "flat (total,) vector -> pytree with the structure/shapes of `tree`"
    pk = Packer(tree)
    if vec.shape[0] < pk.total_padded:
        vec = jnp.concatenate(
            [vec, jnp.zeros((pk.total_padded - vec.shape[0],), vec.dtype)])
    return pk.unpack(vec)


def hess_vec_prod(loss_fn: Callable, params, vec):
    """Hessian-vector product ∇²L(θ)·v, forward-over-reverse.

    `loss_fn(params_tree) -> scalar`; `params`/`vec` are matching pytrees.
    Returns the pytree H·v.
    """
    return jax.jvp(jax.grad(loss_fn), (params,), (vec,))[1]


def _packed_loss(loss_fn, packer):
    return lambda v: loss_fn(packer.unpack(v))


def hessian(loss_fn: Callable, params) -> jnp.ndarray:
    """Dense (total, total) Hessian over the packed parameter vector.

    Small models only (test/verification tool; the reference builds it
    column-by-column in `test_eff_dim.py`)."""
    pk = Packer(params)
    f = _packed_loss(loss_fn, pk)
    H = jax.hessian(f)(pk.pack(params))
    n = pk.total
    return H[:n, :n]


def dataset_loss(model_loss: Callable, batches: Iterable) -> Callable:
    """Summed loss over an iterable of (x, y) batches, as one scalar fn of
    params (reference `hessian(..., dataloader)` semantics)."""
    batches = list(batches)

    def loss_fn(params):
        total = 0.0
        for x, y in batches:
            total = total + model_loss(params, x, y)
        return total
    return loss_fn


def lanczos_tridiag(matvec: Callable[[jnp.ndarray], jnp.ndarray],
                    dim: int, key, num_iters: int,
                    dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lanczos with full reorthogonalization.

    Returns (T, Q): T is the (m, m) tridiagonal projection, Q the (m, dim)
    orthonormal basis, m = min(num_iters, dim). The recursion is a
    `lax.scan`; reorthogonalization is two classical Gram–Schmidt passes
    against the full stored basis (masked to the rows produced so far),
    which XLA maps onto the MXU as (m, dim)·(dim,) matmuls.
    """
    m = min(num_iters, dim)
    v0 = jax.random.normal(key, (dim,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    Q0 = jnp.zeros((m, dim), dtype).at[0].set(v0)

    def body(carry, i):
        Q, v_prev, beta_prev = carry
        v = Q[i]
        w = matvec(v)
        alpha = jnp.dot(w, v)
        w = w - alpha * v - beta_prev * v_prev
        # full reorthogonalization (rows > i are zero, contribute nothing)
        for _ in range(2):
            w = w - Q.T @ (Q @ w)
        beta = jnp.linalg.norm(w)
        w = jnp.where(beta > 1e-10, w / beta, jnp.zeros_like(w))
        Q = jax.lax.cond(i + 1 < m,
                         lambda Q: Q.at[i + 1].set(w),
                         lambda Q: Q, Q)
        return (Q, v, beta), (alpha, beta)

    (Q, _, _), (alphas, betas) = jax.lax.scan(
        body, (Q0, jnp.zeros((dim,), dtype), jnp.zeros((), dtype)),
        jnp.arange(m))
    T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1))
    return T, Q


def symeig_positive_lanczos(matvec_or_mat, dim: Optional[int] = None,
                            key=None, num_iters: int = 100,
                            dtype=jnp.float32):
    """Positive eigenvalues (Ritz values) and Ritz vectors via Lanczos.

    Accepts a dense symmetric matrix or a matvec closure. Returns
    (eigenvalues ascending, eigenvectors columns) like `jnp.linalg.eigh`
    restricted to the Krylov space.
    """
    if isinstance(matvec_or_mat, jnp.ndarray) and matvec_or_mat.ndim == 2:
        A = matvec_or_mat
        dim = A.shape[0]
        matvec = lambda v: A @ v
        dtype = A.dtype
    else:
        matvec = matvec_or_mat
        assert dim is not None
    if key is None:
        key = jax.random.key(0)
    T, Q = lanczos_tridiag(matvec, dim, key, num_iters, dtype=dtype)
    evals, evecs = jnp.linalg.eigh(T)
    ritz_vectors = Q.T @ evecs  # (dim, m)
    pos = evals > 1e-8
    return evals, ritz_vectors, pos


def hessian_eigs_positive_lanczos(loss_fn: Callable, params, key=None,
                                  num_iters: int = 100):
    """Top Hessian Ritz values/vectors of `loss_fn` at `params` without
    materializing the Hessian (reference `test_eff_dim.py:100-126`)."""
    pk = Packer(params)
    f = _packed_loss(loss_fn, pk)
    grad_f = jax.grad(f)
    theta = pk.pack(params)

    def matvec(v):
        return pk.mask_pad(jax.jvp(grad_f, (theta,), (v,))[1])

    evals, vecs, pos = symeig_positive_lanczos(
        matvec, dim=pk.total_padded, key=key, num_iters=num_iters,
        dtype=theta.dtype)
    return evals, vecs, pos


def effective_dimension(eigenvalues: jnp.ndarray, z: float) -> jnp.ndarray:
    "N_eff(z) = Σ_i λ_i/(λ_i + z) over positive eigenvalues"
    lam = jnp.maximum(eigenvalues, 0.0)
    return jnp.sum(lam / (lam + z))
