"""Non-Gaussian observation models (vggp_tpu/likelihoods.py).

Oracle strategy: the Gauss–Hermite expected log-likelihood is checked
against brute-force numerical integration in float64; the closed forms
(Gaussian, Poisson log-link) are checked against the quadrature of their
own integrands; end-to-end SVGP fits recover a known latent function
through each observation model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggp_tpu import likelihoods, train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp


def _numint(logp, y, mean, var):
    """Brute-force E_{N(f|mean,var)}[logp(y, f)] on a wide trapezoid grid."""
    f = np.linspace(mean - 10 * np.sqrt(var), mean + 10 * np.sqrt(var), 20001)
    w = np.exp(-0.5 * (f - mean) ** 2 / var) / np.sqrt(2 * np.pi * var)
    return np.trapezoid(w * logp(y, f), f)


@pytest.mark.parametrize("mean,var", [(0.0, 1.0), (2.3, 0.2), (-1.7, 4.0)])
def test_bernoulli_gh_matches_numerical_integration(mean, var):
    from scipy.stats import norm

    for y in (0.0, 1.0):
        want = _numint(lambda yy, f: norm.logcdf((2 * yy - 1) * f), y, mean, var)
        got = float(likelihoods.expected_log_lik(
            "bernoulli", jnp.asarray([y]), jnp.asarray([mean]),
            jnp.asarray([var]), {})[0])
        assert abs(got - want) < 5e-6, (y, got, want)


@pytest.mark.parametrize("mean,var", [(0.1, 0.5), (1.2, 2.0)])
def test_student_t_gh_matches_numerical_integration(mean, var):
    from scipy.stats import t as student_t

    y, df, scale2 = 0.7, 5.0, 0.3
    want = _numint(lambda yy, f: student_t.logpdf(yy, df, loc=f,
                                                  scale=np.sqrt(scale2)),
                   y, mean, var)
    got = float(likelihoods.expected_log_lik(
        "student_t", jnp.asarray([y]), jnp.asarray([mean]), jnp.asarray([var]),
        {"noise": jnp.asarray(scale2)}, (("df", df),))[0])
    assert abs(got - want) < 5e-5, (got, want)


def test_poisson_closed_form_matches_quadrature():
    y = jnp.asarray([0.0, 3.0, 11.0])
    mean = jnp.asarray([0.5, 1.1, 2.0])
    var = jnp.asarray([0.3, 0.8, 0.1])
    closed = likelihoods.expected_log_lik("poisson", y, mean, var, {})
    from jax.scipy.special import gammaln

    quad = likelihoods.gauss_hermite(
        lambda yy, f: yy * f - jnp.exp(f) - gammaln(yy + 1.0), y, mean, var)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(quad),
                               rtol=1e-8, atol=1e-9)


def test_gaussian_closed_form_matches_quadrature():
    y = jnp.asarray([0.4, -1.0])
    mean = jnp.asarray([0.0, 1.0])
    var = jnp.asarray([0.5, 2.0])
    noise = jnp.asarray(0.2)
    closed = likelihoods.expected_log_lik("gaussian", y, mean, var,
                                          {"noise": noise})
    quad = likelihoods.gauss_hermite(
        lambda yy, f: -0.5 * jnp.log(2 * jnp.pi * noise)
        - (yy - f) ** 2 / (2 * noise), y, mean, var)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(quad),
                               rtol=1e-9, atol=1e-10)


def test_unknown_likelihood_rejected():
    g = CellIntegralFeature.from_lims(8, 0.0, 1.0)
    with pytest.raises(ValueError, match="unknown likelihood"):
        svgp.SVGPSpec(kinds=("matern12",), features=(g,), num_data=10,
                      likelihood="gamma")


def _fit(spec, params, X, y, n_iters=400, lr=0.05):
    return train.fit(lambda p: svgp.loss(spec, p, X, y), params, n_iters, lr)


def test_probit_classification_recovers_decision_boundary():
    rng = np.random.default_rng(0)
    n = 400
    X = jnp.asarray(np.sort(rng.random(n)))
    f = 6.0 * np.sin(2 * np.pi * np.asarray(X))           # strong latent
    y = jnp.asarray((rng.random(n) < 1 / (1 + np.exp(-2 * f))).astype(np.float64))

    g = CellIntegralFeature.from_lims(24, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n,
                         likelihood="bernoulli")
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, hist = _fit(spec, p0, X, y)
    losses = np.asarray(hist["loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] - 10.0

    prob = np.asarray(svgp.predict_y(spec, p_fit, X))
    acc = np.mean((prob > 0.5) == (np.asarray(y) > 0.5))
    assert acc > 0.9, acc


def test_poisson_counts_recover_intensity():
    rng = np.random.default_rng(1)
    n = 500
    X = jnp.asarray(np.sort(rng.random(n)))
    lam = np.exp(1.0 + np.sin(2 * np.pi * np.asarray(X)))
    y = jnp.asarray(rng.poisson(lam).astype(np.float64))

    g = CellIntegralFeature.from_lims(24, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n,
                         likelihood="poisson")
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, hist = _fit(spec, p0, X, y)
    assert np.all(np.isfinite(np.asarray(hist["loss"])))

    lam_hat, var_y = svgp.predict_y(spec, p_fit, X)
    rel = np.abs(np.asarray(lam_hat) - lam) / lam
    assert np.median(rel) < 0.25, np.median(rel)
    assert np.all(np.asarray(var_y) >= np.asarray(lam_hat) - 1e-9)


def test_student_t_robust_to_outliers():
    rng = np.random.default_rng(2)
    n = 300
    X = jnp.asarray(np.sort(rng.random(n)))
    f = np.sin(2 * np.pi * np.asarray(X))
    y_clean = f + 0.05 * rng.standard_normal(n)
    y = y_clean.copy()
    idx = rng.choice(n, 15, replace=False)
    y[idx] += rng.choice([-1, 1], 15) * 5.0                # gross outliers
    y = jnp.asarray(y)

    g = CellIntegralFeature.from_lims(24, 0.0, 1.0)
    common_kw = dict(kinds=("matern32",), features=(g,), num_data=n)
    fits = {}
    for lik in ("gaussian", "student_t"):
        spec = svgp.SVGPSpec(likelihood=lik, likelihood_opts=(("df", 3.0),),
                             **common_kw)
        p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
        p_fit, _ = _fit(spec, p0, X, y)
        post = svgp.posterior(spec, p_fit, X)
        fits[lik] = np.sqrt(np.mean((np.asarray(post.mean) - f) ** 2))
    assert fits["student_t"] < fits["gaussian"], fits
    assert fits["student_t"] < 0.15, fits


def test_elbo_muS_matches_elbo_non_gaussian():
    """elbo_muS(μ, S) must equal elbo() at the same q for every likelihood
    (elbo_muS is the natural-gradient objective; a mismatch would silently
    optimize a different bound)."""
    rng = np.random.default_rng(3)
    g = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    x = jnp.asarray(np.linspace(0.05, 0.95, 8))
    for lik, y in [("poisson", rng.poisson(2.0, 8).astype(np.float64)),
                   ("bernoulli", rng.integers(0, 2, 8).astype(np.float64)),
                   ("student_t", rng.standard_normal(8))]:
        spec = svgp.SVGPSpec(kinds=("matern12",), features=(g,), num_data=8,
                             likelihood=lik, variational="full")
        p = train.constrain(train.unconstrain(spec.init_params(jnp.float64)))
        mu = jnp.asarray(rng.standard_normal(6))
        A = rng.standard_normal((6, 6)) * 0.2
        S = jnp.asarray(A @ A.T + 0.5 * np.eye(6))
        Ls = np.linalg.cholesky(np.asarray(S))
        q = dict(p["q"])
        q["mu"] = mu
        q["raw_L"] = svgp.raw_from_chol(jnp.asarray(Ls))
        p2 = dict(p)
        p2["q"] = q
        np.testing.assert_allclose(
            float(svgp.elbo_muS(spec, p, mu, S, x, jnp.asarray(y))),
            float(svgp.elbo(spec, p2, x, jnp.asarray(y))), rtol=1e-10)


def test_natgrad_poisson_converges():
    """Natural-gradient variational steps work for non-conjugate likelihoods
    (γ < 1): the hybrid trainer must reach at least Adam's bound on the same
    Poisson count problem in far fewer iterations."""
    rng = np.random.default_rng(4)
    n = 400
    X = jnp.asarray(np.sort(rng.random(n)))
    lam = np.exp(1.0 + np.sin(2 * np.pi * np.asarray(X)))
    y = jnp.asarray(rng.poisson(lam).astype(np.float64))

    g = CellIntegralFeature.from_lims(16, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n,
                         likelihood="poisson", variational="full")
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)

    p_ng, hist_ng = train.fit_natgrad(spec, p0, X, y, n_iters=60, gamma=0.2,
                                      hyper_lr=0.02)
    losses = np.asarray(hist_ng["loss"])
    assert np.all(np.isfinite(losses))

    p_ad, hist_ad = train.fit(lambda q: svgp.loss(spec, q, X, y), p0,
                              n_iters=300, learning_rate=0.05)
    assert losses[-1] < np.asarray(hist_ad["loss"])[-1] + 1.0

    lam_hat, _ = svgp.predict_y(spec, p_ng, X)
    rel = np.abs(np.asarray(lam_hat) - lam) / lam
    assert np.median(rel) < 0.3, np.median(rel)


def test_sample_observations_moments():
    """y-draws match the known conditional moments for each observation model."""
    import jax
    from vggp_tpu import likelihoods

    key = jax.random.PRNGKey(0)
    f = jnp.asarray(np.linspace(-1.0, 1.5, 6))
    F = jnp.tile(f, (200000, 1))

    yg = np.asarray(likelihoods.sample_observations(
        "gaussian", key, F, {"noise": jnp.asarray(0.25)}))
    np.testing.assert_allclose(yg.mean(0), np.asarray(f), atol=0.01)
    np.testing.assert_allclose(yg.var(0), 0.25, atol=0.01)

    yb = np.asarray(likelihoods.sample_observations("bernoulli", key, F))
    from jax.scipy.special import ndtr
    np.testing.assert_allclose(yb.mean(0), np.asarray(ndtr(f)), atol=0.01)

    yp = np.asarray(likelihoods.sample_observations("poisson", key, F))
    lam = np.exp(np.asarray(f))
    np.testing.assert_allclose(yp.mean(0), lam, atol=0.04)
    np.testing.assert_allclose(yp.var(0), lam, rtol=0.05)

    yt = np.asarray(likelihoods.sample_observations(
        "student_t", key, F, {"noise": jnp.asarray(0.25)}, opts=(("df", 6.0),)))
    np.testing.assert_allclose(yt.mean(0), np.asarray(f), atol=0.02)
    np.testing.assert_allclose(yt.var(0), 0.25 * 6.0 / 4.0, atol=0.03)

    with pytest.raises(ValueError, match="unknown likelihood"):
        likelihoods.sample_observations("nope", key, F)
