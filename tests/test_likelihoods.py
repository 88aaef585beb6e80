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


def test_natgrad_objective_rejects_non_gaussian():
    """Review-found: elbo_muS silently optimized the Gaussian objective for
    any likelihood; it must reject non-conjugate specs."""
    g = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12",), features=(g,), num_data=10,
                         likelihood="poisson")
    params = spec.init_params(jnp.float64)
    mu = jnp.zeros(6)
    S = jnp.eye(6)
    x = jnp.asarray(np.linspace(0, 1, 8))
    y = jnp.asarray(np.ones(8))
    with pytest.raises(ValueError, match="Gaussian"):
        svgp.elbo_muS(spec, params, mu, S, x, y)
