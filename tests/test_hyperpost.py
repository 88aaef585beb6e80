"""hyperpost oracles.

The quadratic-in-raw-space loss makes the Laplace approximation EXACT
(unconstrain∘constrain = identity away from the floors), pinning the
Hessian, the covariance factor, the sampler, and the evidence formula
against closed forms; the GP tests then check the semantic contracts
(law of total variance, shrink-to-plug-in) end to end on an exact GP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggp_tpu import hyperpost, train
from vggp_tpu.models import exact


def _quad_problem():
    """A loss that is exactly quadratic in RAW space via unconstrain."""
    feats_params = {
        "axes": [{"lengthscale": jnp.asarray(0.5), "variance": jnp.asarray(1.2)}],
        "noise": jnp.asarray(0.1),
    }
    flat0, unravel = jax.flatten_util.ravel_pytree(train.unconstrain(feats_params))
    p = flat0.shape[0]
    rng = np.random.default_rng(0)
    Asqrt = rng.standard_normal((p, p)) * 0.4 + np.eye(p)
    A = jnp.asarray(Asqrt @ Asqrt.T)
    a = flat0 + 0.05  # optimum slightly off the starting raw values
    c = 1.7

    def loss_fn(params):
        v, _ = jax.flatten_util.ravel_pytree(train.unconstrain(params))
        d = v - a
        return 0.5 * d @ (A @ d) + c

    opt_params = train.constrain(unravel(a))
    return loss_fn, opt_params, A, a, c


def test_laplace_exact_on_quadratic_loss():
    loss_fn, opt_params, A, a, c = _quad_problem()
    st = hyperpost.laplace(loss_fn, opt_params)
    np.testing.assert_allclose(np.asarray(st.mean), np.asarray(a), atol=1e-9)
    cov = np.asarray(st.chol_cov @ st.chol_cov.T)
    np.testing.assert_allclose(cov, np.linalg.inv(np.asarray(A)), rtol=1e-8)
    s, logdet = np.linalg.slogdet(np.asarray(A))
    assert s > 0
    assert float(st.logdet_h) == pytest.approx(logdet, rel=1e-9)


def test_log_evidence_exact_on_quadratic_loss():
    loss_fn, opt_params, A, a, c = _quad_problem()
    st = hyperpost.laplace(loss_fn, opt_params)
    # ∫ exp(−quad) dθ = exp(−c) (2π)^{p/2} |A|^{−1/2}, so log evidence is
    # exactly the Laplace formula.
    got = float(hyperpost.log_evidence_laplace(loss_fn, opt_params, st))
    p = st.mean.shape[0]
    s, logdet = np.linalg.slogdet(np.asarray(A))
    want = -c + 0.5 * p * np.log(2 * np.pi) - 0.5 * logdet
    assert got == pytest.approx(want, rel=1e-9)


def test_sample_params_moments_match_state():
    loss_fn, opt_params, A, a, c = _quad_problem()
    st = hyperpost.laplace(loss_fn, opt_params)
    draws = hyperpost.sample_params(st, jax.random.PRNGKey(0), 40_000)
    flats = jax.vmap(
        lambda i: jax.flatten_util.ravel_pytree(
            train.unconstrain(jax.tree.map(lambda v: v[i], draws)))[0]
    )(jnp.arange(512))  # subset is enough for the mean; full set via numpy below
    # stack all raw draws host-side for moment checks
    all_flats = np.stack([
        np.asarray(jax.flatten_util.ravel_pytree(
            train.unconstrain(jax.tree.map(lambda v: v[i], draws)))[0])
        for i in range(0, 40_000, 13)
    ])
    cov = np.asarray(st.chol_cov @ st.chol_cov.T)
    np.testing.assert_allclose(all_flats.mean(0), np.asarray(st.mean),
                               atol=4 * np.sqrt(cov.max() / all_flats.shape[0]) + 1e-3)
    np.testing.assert_allclose(np.cov(all_flats.T), cov, atol=0.05 * cov.max() + 1e-4)
    del flats


def test_mixture_moments_total_variance_identity():
    rng = np.random.default_rng(1)
    mu = rng.standard_normal((8, 5))
    var = np.exp(rng.standard_normal((8, 5)))
    m, v = hyperpost.mixture_moments(jnp.asarray(mu), jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(m), mu.mean(0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v), var.mean(0) + mu.var(0), rtol=1e-12)


def _fit_exact_1d(n=50, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(np.sort(rng.uniform(0, 1, n)))
    y = jnp.asarray(np.sin(6 * np.asarray(X)) + 0.1 * rng.standard_normal(n))
    spec = exact.ExactGPSpec(kinds=("matern32",))
    p0 = train.non_informative_init(spec.init_params(), X, y)
    loss_fn = lambda q: exact.loss(spec, q, X, y)
    p_fit, _ = train.fit(loss_fn, p0, 400, 0.05)
    return spec, p_fit, loss_fn, X, y


def test_marginalized_prediction_widens_and_shrinks_to_plugin():
    spec, p_fit, loss_fn, X, y = _fit_exact_1d()
    st = hyperpost.laplace(loss_fn, p_fit)
    xs = jnp.linspace(0.0, 1.0, 31)
    predict = lambda p: exact.posterior(spec, p, X, y, xs, full_cov=False)
    plug = predict(p_fit)
    marg = hyperpost.predict_marginalized(predict, st, jax.random.PRNGKey(2),
                                          n_samples=256)
    assert np.all(np.isfinite(np.asarray(marg.mean)))
    # law of total variance: marginalizing can only add variance (up to MC
    # noise on the mean term, hence the tiny slack)
    assert np.all(np.asarray(marg.variance())
                  >= 0.95 * np.asarray(plug.variance()))
    assert float(np.mean(np.asarray(marg.variance())
                         - np.asarray(plug.variance()))) > 0.0
    # collapse the hyper posterior to a point → exactly the plug-in forecast
    st0 = st._replace(chol_cov=jnp.zeros_like(st.chol_cov))
    marg0 = hyperpost.predict_marginalized(predict, st0, jax.random.PRNGKey(3),
                                           n_samples=8)
    # (tolerance: one constrain∘unconstrain softplus round trip ≈ 1e-6 rel)
    np.testing.assert_allclose(np.asarray(marg0.mean), np.asarray(plug.mean),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(marg0.var), np.asarray(plug.variance()),
                               rtol=1e-5, atol=1e-9)


def test_hmc_exact_on_quadratic_loss():
    """On a quadratic raw-space loss the posterior is exactly N(a, A⁻¹);
    HMC draw moments must recover it (the Laplace factor preconditions, so
    chains mix in a handful of steps)."""
    loss_fn, opt_params, A, a, c = _quad_problem()
    st = hyperpost.laplace(loss_fn, opt_params)
    res = hyperpost.hmc_sample_params(
        loss_fn, st, jax.random.PRNGKey(0), n_samples=4096,
        n_chains=4, n_warmup=128)
    assert 0.5 < float(res.accept_rate) <= 1.0
    raws = np.asarray(res.raw_draws)
    cov_true = np.linalg.inv(np.asarray(A))
    np.testing.assert_allclose(raws.mean(0), np.asarray(a),
                               atol=6 * np.sqrt(cov_true.max() / raws.shape[0]))
    np.testing.assert_allclose(np.cov(raws.T), cov_true,
                               atol=0.15 * cov_true.max())


def test_hmc_marginalized_agrees_with_laplace_on_gp():
    """HMC vs Laplace on a real GP hyper posterior. The sin(6x) data leaves
    (ℓ, σ²_f) ridge-identified under the flat raw prior — that direction is
    genuinely non-Gaussian and HMC/Laplace legitimately disagree there — so
    the sharp checks live on the well-identified NOISE dimension (which must
    agree), plus predictive-mean agreement and positive inflation from both."""
    spec, p_fit, loss_fn, X, y = _fit_exact_1d()
    st = hyperpost.laplace(loss_fn, p_fit)
    xs = jnp.linspace(0.0, 1.0, 31)
    predict = lambda p: exact.posterior(spec, p, X, y, xs, full_cov=False)
    plug = predict(p_fit)
    res = hyperpost.hmc_sample_params(
        loss_fn, st, jax.random.PRNGKey(4), n_samples=1024,
        n_chains=4, n_warmup=128)
    assert 0.5 < float(res.accept_rate) <= 1.0
    # the noise hyperparameter is pinned by the data; HMC marginals there
    # must match the Laplace Gaussian (moments in raw = softplus⁻¹ space)
    noise_h = np.asarray(train.unconstrain({"noise": res.draws["noise"]})["noise"])
    noise_l = np.asarray(train.unconstrain(
        {"noise": hyperpost.sample_params(st, jax.random.PRNGKey(7),
                                          4096)["noise"]})["noise"])
    assert noise_h.mean() == pytest.approx(noise_l.mean(), abs=0.2)
    assert noise_h.std() == pytest.approx(noise_l.std(), rel=0.5)
    marg_h = hyperpost.predict_marginalized_draws(predict, res.draws)
    marg_l = hyperpost.predict_marginalized(predict, st, jax.random.PRNGKey(5),
                                            n_samples=512)
    sd_scale = float(np.sqrt(np.mean(np.asarray(plug.variance()))))
    np.testing.assert_allclose(np.asarray(marg_h.mean), np.asarray(marg_l.mean),
                               atol=0.5 * sd_scale)
    # both carry hyper-uncertainty inflation; magnitudes differ because the
    # ridge is non-Gaussian (that gap is the point of having HMC at all)
    infl_h = np.mean(np.asarray(marg_h.variance()) - np.asarray(plug.variance()))
    infl_l = np.mean(np.asarray(marg_l.variance()) - np.asarray(plug.variance()))
    assert infl_h > 0.0 and infl_l > 0.0


def test_laplace_hessian_matches_finite_differences():
    spec, p_fit, loss_fn, X, y = _fit_exact_1d(n=30, seed=1)
    st = hyperpost.laplace(loss_fn, p_fit, min_eig_rel=0.0)
    flat, unravel = jax.flatten_util.ravel_pytree(train.unconstrain(p_fit))

    def f(v):
        return float(loss_fn(train.constrain(unravel(jnp.asarray(v)))))

    p = flat.shape[0]
    h = 1e-4
    H_fd = np.zeros((p, p))
    v0 = np.asarray(flat, dtype=np.float64)
    for i in range(p):
        for j in range(p):
            e_i, e_j = np.eye(p)[i] * h, np.eye(p)[j] * h
            H_fd[i, j] = (f(v0 + e_i + e_j) - f(v0 + e_i - e_j)
                          - f(v0 - e_i + e_j) + f(v0 - e_i - e_j)) / (4 * h * h)
    cov = np.asarray(st.chol_cov @ st.chol_cov.T)
    np.testing.assert_allclose(np.linalg.inv(cov), H_fd, rtol=2e-3, atol=1e-4)


def test_laplace_indefinite_hessian_stays_bounded():
    """Saddle-free |H| regression: the TPU-f32 second-order AD graph can hand
    laplace() a badly INDEFINITE Hessian at a converged optimum (measured
    on-device, VERDICT r4). The absolute-eigenvalue treatment must keep the
    curvature scale — bounded draw scatter, finite marginalized moments —
    instead of flooring a negative direction into a ~1/min_eig_rel variance
    that scatters draws to NaN-producing hyperparameters."""
    feats_params = {
        "axes": [{"lengthscale": jnp.asarray(0.5), "variance": jnp.asarray(1.2)}],
        "noise": jnp.asarray(0.1),
    }
    flat0, unravel = jax.flatten_util.ravel_pytree(train.unconstrain(feats_params))
    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    H_ind = jnp.asarray(Q @ np.diag([-9.8, 1.6, 4.8]) @ Q.T)  # the measured shape

    def loss_fn(params):
        v, _ = jax.flatten_util.ravel_pytree(train.unconstrain(params))
        d = v - flat0
        return 0.5 * d @ (H_ind @ d)

    state = hyperpost.laplace(loss_fn, feats_params)
    # curvature scale preserved: no covariance direction wider than 1/min|eig|
    sd = np.sqrt(np.sum(np.asarray(state.chol_cov) ** 2, axis=1))
    assert np.all(np.isfinite(sd)) and sd.max() < 1.0 / np.sqrt(1.6) + 1e-6
    draws = hyperpost.sample_params(state, jax.random.PRNGKey(0), 64)
    ls = np.asarray(draws["axes"][0]["lengthscale"])
    assert np.all(np.isfinite(ls)) and ls.max() < 50.0 and ls.min() > 1e-6
    # and the marginalized-prediction pipeline stays finite through it
    g = hyperpost.predict_marginalized(
        lambda p: exact.posterior(
            exact.ExactGPSpec(kinds=("matern32",)), p,
            jnp.linspace(0, 1, 8), jnp.sin(jnp.linspace(0, 1, 8)),
            jnp.linspace(0.1, 0.9, 5), full_cov=False),
        state, jax.random.PRNGKey(1), n_samples=32)
    assert np.all(np.isfinite(np.asarray(g.mean)))
    assert np.all(np.asarray(g.variance()) > 0)
