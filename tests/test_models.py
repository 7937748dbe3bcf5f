"""Model-layer tests: shapes, naming parity, potential math, batchnorm
semantics (cross-checked against torch CPU), and prior-only models.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bnn_priors_tpu import models, priors

KEY = jax.random.key(0)


def test_dense_net_forward_and_names():
    model = models.ClassificationDenseNet(10, 3, width=8, depth=3)
    params, state = model.init(KEY)
    # reference naming: net.{0,2,4}.{weight,bias}_prior.p
    expected = {f"net.{i}.{w}_prior.p" for i in (0, 2, 4) for w in ("weight", "bias")}
    assert set(params) == expected
    assert state == {}
    x = jax.random.normal(jax.random.key(1), (5, 10))
    f, _ = model.net_apply(params, state, x)
    assert f.shape == (5, 3)

    y = jnp.asarray([0, 1, 2, 0, 1])
    loss, log_prior, pot_avg, acc, f, _ = model.split_potential_and_acc(
        params, state, x, y, eff_num_data=100)
    # potential identity: pot_avg == loss - log_prior/eff_num_data
    np.testing.assert_allclose(
        float(pot_avg), float(loss) - float(log_prior) / 100, rtol=1e-6)
    assert 0.0 <= float(acc) <= 1.0


def test_classification_loglik_matches_softmax():
    model = models.LogisticRegression(4, 3)
    params, state = model.init(KEY)
    x = jax.random.normal(jax.random.key(2), (6, 4))
    y = jnp.asarray([0, 1, 2, 0, 1, 2])
    f, _ = model.net_apply(params, state, x)
    lps = model.likelihood_log_prob(params, f, y)
    expected = jax.nn.log_softmax(f, axis=-1)[jnp.arange(6), y]
    np.testing.assert_allclose(np.asarray(lps), np.asarray(expected), rtol=1e-6)


def test_regression_model():
    model = models.DenseNet(5, 2, width=8, noise_std=0.5)
    params, state = model.init(KEY)
    x = jax.random.normal(jax.random.key(3), (7, 5))
    y = jax.random.normal(jax.random.key(4), (7, 2))
    ll, _, f = model.log_likelihood(params, state, x, y, eff_num_data=7)
    expected = st.norm(np.asarray(f), 0.5).logpdf(np.asarray(y)).sum()
    np.testing.assert_allclose(float(ll), expected, rtol=1e-6)


def test_regression_noise_prior():
    "noise_std as a Prior adds a `noise_std.p` leaf and a prior term."
    noise_prior = priors.LogNormal((), 0.0, 1.0)
    model = models.DenseNet(5, 2, width=8, noise_std=noise_prior)
    params, state = model.init(KEY)
    assert "noise_std.p" in params


def test_eff_num_data_scaling():
    model = models.LogisticRegression(4, 3)
    params, state = model.init(KEY)
    x = jax.random.normal(jax.random.key(2), (6, 4))
    y = jnp.asarray([0, 1, 2, 0, 1, 2])
    ll6, _, _ = model.log_likelihood(params, state, x, y, eff_num_data=6)
    ll60, _, _ = model.log_likelihood(params, state, x, y, eff_num_data=60)
    np.testing.assert_allclose(float(ll60), 10 * float(ll6), rtol=1e-6)


def test_masked_batch_equals_unpadded():
    "Padded batches with masks give identical potentials to unpadded ones."
    model = models.LogisticRegression(4, 3)
    params, state = model.init(KEY)
    x = jax.random.normal(jax.random.key(2), (6, 4))
    y = jnp.asarray([0, 1, 2, 0, 1, 2])
    pot_ref, _ = model.potential_avg(params, state, x[:4], y[:4], 100)
    mask = jnp.asarray([1.0, 1, 1, 1, 0, 0])
    pot_masked, _ = model.potential_avg(params, state, x, y, 100, mask=mask)
    np.testing.assert_allclose(float(pot_masked), float(pot_ref), rtol=1e-6)


def test_conv_net_forward():
    model = models.ClassificationConvNet(1, 28, 10, width=4, depth=3)
    params, state = model.init(KEY)
    x = jax.random.normal(jax.random.key(5), (2, 784))
    f, _ = model.net_apply(params, state, x)
    assert f.shape == (2, 10)
    # naming parity: conv layers at indices 1 and 4, linear at 8
    assert "net.1.weight_prior.p" in params
    assert params["net.1.weight_prior.p"].shape == (4, 1, 3, 3)
    assert "net.8.weight_prior.p" in params


def test_conv2d_matches_torch():
    import torch
    w = np.random.default_rng(0).normal(size=(5, 3, 3, 3))
    b = np.random.default_rng(1).normal(size=(5,))
    x = np.random.default_rng(2).normal(size=(2, 3, 8, 8))
    conv = models.Conv2d(priors.Normal(w.shape, 0.0, 1.0),
                         priors.Normal(b.shape, 0.0, 1.0),
                         stride=2, padding=1)
    params = {"c.weight_prior.p": jnp.asarray(w), "c.bias_prior.p": jnp.asarray(b)}
    from bnn_priors_tpu.models.layers import to_nhwc
    y, _ = conv.apply(params, {}, "c", to_nhwc(jnp.asarray(x)))
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))  # back to NCHW
    yt = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1).numpy()
    np.testing.assert_allclose(y, yt, atol=1e-10)


def test_batchnorm_matches_torch():
    import torch
    x = np.random.default_rng(3).normal(size=(4, 3, 5, 5)).astype(np.float32)
    bn = models.BatchNorm2d(3)
    params, state = bn.init(KEY, "bn")
    tbn = torch.nn.BatchNorm2d(3)
    from bnn_priors_tpu.models.layers import to_nhwc
    # two training steps, then eval
    xs = [x, x * 2 + 1]
    tbn.train()
    for xi in xs:
        y, state = bn.apply(params, state, "bn", to_nhwc(jnp.asarray(xi)), train=True)
        yt = tbn(torch.from_numpy(xi)).detach().numpy()
        np.testing.assert_allclose(
            np.transpose(np.asarray(y), (0, 3, 1, 2)), yt, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state["bn.running_mean"]), tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state["bn.running_var"]), tbn.running_var.numpy(), atol=1e-4)
    tbn.eval()
    y, _ = bn.apply(params, state, "bn", to_nhwc(jnp.asarray(x)), train=False)
    yt = tbn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), yt, atol=1e-4)


def test_preact_resnet18_smoke():
    model = models.ThinPreActResNet18()
    params, state = model.init(KEY, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(6), (2, 3, 32, 32), dtype=jnp.float32)
    f, new_state = model.net_apply(params, state, x, train=True)
    assert f.shape == (2, 10)
    assert "net.conv1.weight_prior.p" in params
    assert "net.layer1.0.bn1.running_mean" in state
    # batchnorm state updated in training mode
    assert not np.allclose(
        np.asarray(new_state["net.layer1.0.bn1.running_mean"]),
        np.asarray(state["net.layer1.0.bn1.running_mean"]))
    assert np.isfinite(float(model.log_prior(params)))


def test_google_resnet20_smoke():
    model = models.ResNet(depth=20)
    params, state = model.init(KEY, dtype=jnp.float32)
    # 6n+2 check
    with pytest.raises(ValueError):
        models.ResNet(depth=21)
    x = jax.random.normal(jax.random.key(7), (2, 3, 32, 32), dtype=jnp.float32)
    f, _ = model.net_apply(params, state, x, train=False)
    assert f.shape == (2, 10)
    # naming parity: first conv at net.0, linear at the end
    assert "net.0.weight_prior.p" in params
    assert params["net.0.weight_prior.p"].shape == (16, 3, 3, 3)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    assert 250_000 < n_params < 300_000  # ResNet-20 ~274k


def test_gaussian_model():
    model = models.GaussianModel(N=3, D=4, std=2.0)
    params, state = model.init(KEY)
    assert set(params) == {"0.p", "1.p", "2.p"}
    lp = float(model.log_prior(params))
    expected = sum(
        st.norm(0, 2.0).logpdf(np.asarray(params[f"{i}.p"])).sum() for i in range(3))
    np.testing.assert_allclose(lp, expected, rtol=1e-6)
    pot_fn = model.potential_avg_fn(eff_num_data=1.0)
    pot, _ = pot_fn(params)
    np.testing.assert_allclose(float(pot), -lp, rtol=1e-6)
    g = jax.grad(lambda p: pot_fn(p)[0])(params)
    np.testing.assert_allclose(
        np.asarray(g["0.p"]), np.asarray(params["0.p"]) / 4.0, rtol=1e-6)


def test_sample_all_priors():
    model = models.GaussianModel(N=2, D=3)
    params, _ = model.init(KEY)
    new = model.sample_all_priors(jax.random.key(9), params)
    assert not np.allclose(np.asarray(new["0.p"]), np.asarray(params["0.p"]))


# Every model name the reference's get_model dispatch accepts
# (reference exp_utils.py:108-234) must build, init, and produce a finite
# potential+gradient through our registry.
REGISTRY_MODELS = [
    "densenet", "raobdensenet", "classificationdensenet",
    "classificationconvnet", "correlatedclassificationconvnet",
    "datadrivengaussconv", "datadrivendoublegammaconv",
    "resnet18", "vwidth_resnet18", "datadriven_resnet18",
    "vwidth_datadriven_resnet18", "thin_resnet18", "resnet34",
    "googleresnet", "datadriven_mvt_googleresnet",
    "decreasing_mvt_googleresnet", "correlatedgoogleresnet",
    "linear", "logistic", "raob_linear", "test_gaussian",
]
_DENSE = {"densenet", "raobdensenet", "linear", "raob_linear",
          "test_gaussian"}
_DENSE_CLS = {"classificationdensenet", "logistic"}


@pytest.mark.parametrize("name", REGISTRY_MODELS)
def test_model_registry_complete(name):
    from bnn_priors_tpu import exp_utils
    rng = np.random.RandomState(0)
    if name in _DENSE:
        x = rng.randn(4, 10)
        y = rng.randn(4, 1)
    elif name in _DENSE_CLS:
        x = rng.randn(4, 10)
        y = rng.randint(0, 2, 4)
    else:
        x = rng.randn(4, 3, 32, 32)
        y = rng.randint(0, 10, 4)
    model = exp_utils.get_model(
        x, y, model=name, width=16, depth=3,
        weight_prior="gaussian", weight_loc=0.0, weight_scale=1.41,
        bias_prior="gaussian", bias_loc=0.0, bias_scale=1.0,
        batchnorm=True, weight_prior_params={}, bias_prior_params={})
    params, state = model.init(KEY)
    fn = model.potential_avg_fn(state, jnp.asarray(x), jnp.asarray(y),
                                eff_num_data=float(len(x)), train=True)
    (pot, _), grads = jax.value_and_grad(fn, has_aux=True)(params)
    assert np.isfinite(float(pot))
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k


# -- RaoB correctness (ported from reference testing/test_models.py:12-58) --

def test_raob_likelihood_matches_direct_mvn():
    """RaoBDenseNet marginal likelihood (Woodbury + f64 Cholesky) equals
    the directly-constructed MVN log-prob N(y | 0, ffᵀ + σ²I)
    (reference testing/test_models.py:12-29)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(10, 3)) * 2)
    y = jnp.asarray(rng.normal(size=(10, 1)) * 2)
    model = models.RaoBDenseNet(x, y, 40, noise_std=0.8)
    params, state = model.init(KEY)

    lik1, _, _ = model.log_likelihood(params, state, x, y, eff_num_data=10)

    f, _ = model.net_apply(params, state, x, train=False)
    f = np.asarray(f, dtype=np.float64) * model.last_layer_std
    cov = f @ f.T + 0.8 ** 2 * np.eye(10)
    lik2 = st.multivariate_normal(
        mean=np.zeros(10), cov=cov).logpdf(np.asarray(y)[:, 0])
    np.testing.assert_allclose(float(lik1), lik2, rtol=1e-9)


def test_raob_posterior_matches_exact_gp():
    """RaoBLinearRegression.posterior_w equals the closed-form GP/Bayesian
    linear regression posterior (reference testing/test_models.py:31-58;
    the gpytorch ExactGP is replaced by plain linear algebra:
    Σ = (XᵀX/σ² + I)⁻¹, μ = Σ Xᵀy/σ² for a N(0, I) weight prior)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(10, 3)) * 2
    w_true = rng.normal(size=(3,))
    y = x @ w_true
    sig2 = 0.5 ** 2
    model = models.RaoBLinearRegression(
        jnp.asarray(x), jnp.asarray(y)[:, None], noise_std=0.5,
        std_w=x.shape[1] ** 0.5)  # last_layer_std == 1 → w ~ N(0, I)
    params, state = model.init(KEY)

    mu, L = model.posterior_w(params, state)
    mu = np.asarray(mu)[:, 0]
    cov = np.asarray(L).T @ np.asarray(L)

    A = x.T @ x / sig2 + np.eye(3)
    cov_exact = np.linalg.inv(A)
    mu_exact = cov_exact @ x.T @ y / sig2
    np.testing.assert_allclose(mu, mu_exact, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(cov, cov_exact, rtol=1e-8, atol=1e-10)


def test_raob_predictive_matches_exact_gp():
    "predictive mean/std at new inputs equal the closed-form GP predictive"
    rng = np.random.default_rng(7)
    x = rng.normal(size=(12, 4))
    y = x @ rng.normal(size=(4,)) + 0.1 * rng.normal(size=(12,))
    sig2 = 0.3 ** 2
    model = models.RaoBLinearRegression(
        jnp.asarray(x), jnp.asarray(y)[:, None], noise_std=0.3,
        std_w=x.shape[1] ** 0.5)
    params, state = model.init(KEY)

    x_star = rng.normal(size=(5, 4))
    mean, std = model.predictive(params, state, jnp.asarray(x_star))

    A = x.T @ x / sig2 + np.eye(4)
    cov_w = np.linalg.inv(A)
    mu_w = cov_w @ x.T @ y / sig2
    mean_exact = x_star @ mu_w
    var_exact = np.einsum("ij,jk,ik->i", x_star, cov_w, x_star) + sig2
    np.testing.assert_allclose(np.asarray(mean)[:, 0], mean_exact,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(std)[:, 0] ** 2, var_exact,
                               rtol=1e-8, atol=1e-10)


def test_compute_dtype_mixed_precision():
    """compute_dtype=bf16 runs the net forward in reduced precision while
    keeping gradients/likelihood in the parameter dtype: grads stay f32,
    relative error is small, and batchnorm state dtypes are preserved."""
    model = models.ResNet(depth=20, softmax_temp=1.0)
    params, state = model.init(jax.random.key(3), dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(5), (16, 3, 32, 32),
                          dtype=jnp.float32)
    y = jax.random.randint(jax.random.key(6), (16,), 0, 10)

    fn32 = model.potential_avg_fn(state, x, y, 100.0, train=True)
    fn16 = model.potential_avg_fn(state, x, y, 100.0, train=True,
                                  compute_dtype=jnp.bfloat16)
    (p32, (st32, _)), g32 = jax.value_and_grad(fn32, has_aux=True)(params)
    (p16, (st16, _)), g16 = jax.value_and_grad(fn16, has_aux=True)(params)

    for k, g in g16.items():
        assert g.dtype == jnp.float32, k
    for k in st16:
        assert st16[k].dtype == state[k].dtype, k
    # potential agrees to bf16 forward accuracy
    np.testing.assert_allclose(float(p16), float(p32), rtol=0.05)
    # gradient cosine similarity: far tighter than the minibatch noise
    v32 = np.concatenate([np.ravel(g32[k]) for k in sorted(g32)])
    v16 = np.concatenate([np.ravel(g16[k]) for k in sorted(g16)])
    cos = float(v32 @ v16 / (np.linalg.norm(v32) * np.linalg.norm(v16)))
    assert cos > 0.99, cos
