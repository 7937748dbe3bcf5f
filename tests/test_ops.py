"""Tests for the Pallas fused Langevin update and the padded Packer.

The Pallas kernel's deterministic math (noise_std=0) is verified exactly
against the plain-XLA path in interpret mode on CPU; the in-kernel PRNG
(Box–Muller) lowers only on real TPU hardware (interpret mode returns zero
bits), so its distribution test is gated on a TPU backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_priors_tpu.mcmc import SGLD, VerletSGLD
from bnn_priors_tpu.mcmc.packing import PACK_ALIGN, Packer
from bnn_priors_tpu.ops import fused_langevin_update

ON_TPU = jax.default_backend() == "tpu"


def _params(total, key, dtype=jnp.float32):
    "a two-leaf tree with `total` elements in all"
    n1 = total // 3
    k1, k2 = jax.random.split(jax.random.key(key))
    return {"a": jax.random.normal(k1, (n1,), dtype),
            "b": jax.random.normal(k2, (total - n1,), dtype)}


# ---------------------------------------------------------------- packer --
def test_packer_padding_roundtrip():
    tree = _params(1000, 0)
    pk = Packer(tree)
    assert pk.total == 1000 and pk.total_padded == PACK_ALIGN
    vec = pk.pack(tree)
    assert vec.shape == (PACK_ALIGN,)
    np.testing.assert_array_equal(np.asarray(vec[1000:]), 0.0)
    out = pk.unpack(vec)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(tree[k]))


def test_packer_segment_ops_ignore_padding():
    tree = _params(1000, 1)
    pk = Packer(tree)
    vec = pk.pack(tree) + pk.valid_mask(jnp.float32) * 0.0
    # corrupt the padding tail; reductions must not see it
    vec = vec.at[1000:].set(1e6)
    sums = np.asarray(pk.segment_sum(vec))
    expect = [float(jnp.sum(tree["a"])), float(jnp.sum(tree["b"]))]
    np.testing.assert_allclose(sums, expect, rtol=1e-5)
    # expand covers the tail with 1.0
    exp = pk.expand(jnp.asarray([2.0, 3.0]))
    assert exp.shape == (pk.total_padded,)
    np.testing.assert_array_equal(np.asarray(exp[1000:]), 1.0)
    # mask_pad zeros the tail
    np.testing.assert_array_equal(np.asarray(pk.mask_pad(vec)[1000:]), 0.0)


# ---------------------------------------------------- fused kernel (det) --
@pytest.mark.parametrize("total", [1000, 70000])
@pytest.mark.parametrize("pos_c,alpha", [(0.01, 0.99), (0.0, 1.0)])
def test_fused_matches_xla_deterministic(total, pos_c, alpha):
    "noise_std=0: Pallas (interpret) must equal the XLA formula exactly"
    pk = Packer(_params(total, 2))
    T = pk.total_padded
    ks = jax.random.split(jax.random.key(3), 5)
    mk = lambda k: pk.mask_pad(jax.random.normal(k, (T,), jnp.float32))
    theta, m, g = mk(ks[0]), mk(ks[1]), mk(ks[2])
    v = jnp.abs(mk(ks[3])) + 0.1
    M = pk.expand(jnp.abs(jax.random.normal(ks[4], (pk.n_leaves,),
                                            jnp.float32)) + 0.5)
    mom_decay, grad_lr = 0.9, -0.05
    th2, m2, v2, parts = fused_langevin_update(
        theta, m, v, g, M, jnp.zeros((2,), jnp.uint32),
        (mom_decay, grad_lr, 0.0, pos_c, alpha), total=total,
        block_rows=64, interpret=True)
    Mg = M * g
    m_ref = grad_lr * Mg + mom_decay * m
    th_ref = theta + pos_c * (M * m_ref)
    v_ref = alpha * v + (1 - alpha) * g * g
    v_ref = pk.mask_pad(v_ref)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(th2), np.asarray(th_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref), atol=1e-6)
    np.testing.assert_allclose(float(parts[0]), float(jnp.sum(Mg * m)),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(float(parts[1]), float(jnp.sum(Mg * m_ref)),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(float(parts[2]), float(jnp.sum(Mg * Mg)),
                               rtol=2e-4, atol=1e-3)


def test_fused_vmap_smoke():
    "the fused update must be vmappable (parallel chains)"
    total = 1000
    pk = Packer(_params(total, 4))
    T = pk.total_padded
    theta = jnp.ones((3, T), jnp.float32) * pk.valid_mask(jnp.float32)
    zeros = jnp.zeros((3, T), jnp.float32)
    M = jnp.ones((3, T), jnp.float32)
    seeds = jnp.zeros((3, 2), jnp.uint32)
    fn = lambda th, m, v, g, Mx, s: fused_langevin_update(
        th, m, v, g, Mx, s, (0.5, -0.1, 0.0, 0.01, 0.99), total=total,
        interpret=True)
    th2, m2, v2, parts = jax.vmap(fn)(theta, zeros, theta, theta, M, seeds)
    assert th2.shape == (3, T) and parts.shape == (3, 3)
    assert np.all(np.isfinite(np.asarray(th2)))


# ----------------------------------------------- kernel-class fused path --
def test_sgld_fused_path_matches_xla_at_t0():
    "temperature=0 ⇒ no noise ⇒ fused and XLA SGLD steps agree exactly"
    tree = _params(5000, 5)
    k_x = SGLD(num_data=100.0, momentum=0.9, use_pallas=False)
    k_p = SGLD(num_data=100.0, momentum=0.9, use_pallas=True,
               pallas_interpret=True)
    s_x = k_x.init(tree, jax.random.key(7))
    s_p = k_p.init(tree, jax.random.key(7))
    g = k_x.pack(jax.tree_util.tree_map(lambda x: 0.1 * x, tree))
    for _ in range(3):
        s_x, _ = k_x.step(s_x, g, 1e-3, 0.0)
        s_p, _ = k_p.step(s_p, g, 1e-3, 0.0)
    np.testing.assert_allclose(np.asarray(s_p.position),
                               np.asarray(s_x.position), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_p.momentum),
                               np.asarray(s_x.momentum), atol=1e-6)
    n = k_x.packer.total
    np.testing.assert_allclose(np.asarray(s_p.square_avg)[:n],
                               np.asarray(s_x.square_avg)[:n], atol=1e-6)


def test_verlet_fused_path_matches_xla_at_t0():
    "T=0 GGMC: positions, momenta AND energy accumulators must agree"
    tree = _params(5000, 6)
    k_x = VerletSGLD(num_data=100.0, momentum=0.9, use_pallas=False)
    k_p = VerletSGLD(num_data=100.0, momentum=0.9, use_pallas=True,
                     pallas_interpret=True)
    s_x = k_x.init(tree, jax.random.key(8), save_state=True)
    s_p = k_p.init(tree, jax.random.key(8), save_state=True)
    g = k_x.pack(jax.tree_util.tree_map(lambda x: 0.1 * x, tree))
    s_x, _ = k_x.initial_step(s_x, g, 1e-3, 0.0, save_state=True)
    s_p, _ = k_p.initial_step(s_p, g, 1e-3, 0.0, save_state=True)
    for _ in range(2):
        s_x, _ = k_x.step(s_x, g, 1e-3, 0.0)
        s_p, _ = k_p.step(s_p, g, 1e-3, 0.0)
    s_x, _ = k_x.final_step(s_x, g, 1e-3, 0.0)
    s_p, _ = k_p.final_step(s_p, g, 1e-3, 0.0)
    np.testing.assert_allclose(np.asarray(s_p.position),
                               np.asarray(s_x.position), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_p.momentum),
                               np.asarray(s_x.momentum), atol=1e-6)
    np.testing.assert_allclose(float(s_p.delta_energy_acc),
                               float(s_x.delta_energy_acc),
                               rtol=1e-3, atol=1e-4)
    de_x = k_x.delta_energy(s_x, None, 1e-3, 0.0, 0.0)
    de_p = k_p.delta_energy(s_p, None, 1e-3, 0.0, 0.0)
    np.testing.assert_allclose(float(de_p), float(de_x), rtol=1e-3,
                               atol=1e-4)


# -------------------------------------------------------- TPU-only: PRNG --
@pytest.mark.skipif(not ON_TPU, reason="in-kernel PRNG needs real TPU")
def test_fused_noise_is_standard_normal_tpu():
    import scipy.stats
    total = 1 << 20
    T = total
    zeros = jnp.zeros((T,), jnp.float32)
    ones = jnp.ones((T,), jnp.float32)
    # mom_decay=0, grad_lr=0, noise_std=1 ⇒ m' = ξ
    _, m2, _, _ = fused_langevin_update(
        zeros, zeros, ones, zeros, ones,
        jnp.asarray([123, 456], jnp.uint32), (0.0, 0.0, 1.0, 0.0, 1.0),
        total=total)
    xi = np.asarray(m2)
    assert abs(xi.mean()) < 5e-3
    assert abs(xi.std() - 1.0) < 5e-3
    ks = scipy.stats.kstest(xi[::16], "norm").pvalue
    assert ks > 1e-3, ks
