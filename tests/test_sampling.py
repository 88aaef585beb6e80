"""Pathwise posterior sampling (vggp_tpu/sampling.py).

Oracle strategy: (1) the RFF prior's empirical covariance converges to the
kernel; (2) u_prior is an EXACT functional of the sampled path (deterministic
identity vs fine quadrature of that same path — not statistical); (3) the
Matheron posterior's empirical moments converge to the analytic svgp
posterior; (4) exact Gaussian sampling round-trips mean/cov.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggp_tpu import kernels, sampling, train
from vggp_tpu.features import CellIntegralFeature, PointFeature
from vggp_tpu.models import svgp


def test_sample_gaussian_moments():
    from vggp_tpu.models.common import Gaussian

    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, 4))
    cov = A @ A.T + 0.5 * np.eye(4)
    mean = jnp.asarray(rng.standard_normal(4))
    g = Gaussian(mean=mean, cov=jnp.asarray(cov))
    s = np.asarray(sampling.sample_gaussian(jax.random.PRNGKey(0), g, 60000))
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.03)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.12)


@pytest.mark.parametrize("kind", ["matern12", "matern32", "matern52", "rbf"])
def test_rff_prior_covariance_matches_kernel(kind):
    l, var = 0.3, 1.4
    xs = jnp.asarray(np.linspace(0.0, 1.0, 9))
    n_paths, F = 3000, 256
    feats = (CellIntegralFeature.from_lims(4, 0.0, 1.0),)
    spec = svgp.SVGPSpec(kinds=(kind,), features=feats, num_data=10)
    params = spec.init_params(jnp.float64)
    params["axes"][0]["lengthscale"] = jnp.asarray(l, jnp.float64)
    params["axes"][0]["variance"] = jnp.asarray(var, jnp.float64)

    def path(key):
        om, ph, amp = sampling.prior_paths(key, spec, params, F)
        return sampling.eval_path(om, ph, amp, xs)

    paths = np.asarray(jax.vmap(path)(jax.random.split(jax.random.PRNGKey(1),
                                                       n_paths)))
    emp = paths.T @ paths / n_paths
    want = np.asarray(kernels.gram_1d(kind, xs, xs, var, l))
    assert np.abs(emp - want).max() < 0.12, np.abs(emp - want).max()


def test_u_prior_exact_vs_quadrature_of_same_path():
    """Deterministic identity: the closed-form cell integral of the sampled
    cosine path equals fine trapezoid quadrature of that very path."""
    feats = (CellIntegralFeature.from_lims(6, 0.0, 1.0),
             CellIntegralFeature.from_lims(5, 0.0, 1.0))
    spec = svgp.SVGPSpec(kinds=("matern32", "matern12"), features=feats,
                         num_data=10, variational="kron")
    params = spec.init_params(jnp.float64)
    om, ph, amp = sampling.prior_paths(jax.random.PRNGKey(3), spec, params, 64)
    u = np.asarray(sampling.prior_inducing_sample(om, ph, amp, spec, params))

    fine = 600
    for i in range(6):
        for j in range(5):
            xs = np.linspace(i / 6, (i + 1) / 6, fine)
            ys = np.linspace(j / 5, (j + 1) / 5, fine)
            XY = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
            vals = np.asarray(sampling.eval_path(om, ph, amp,
                                                 jnp.asarray(XY))).reshape(fine, fine)
            quad = np.trapezoid(np.trapezoid(vals, ys), xs)
            assert abs(quad - u[i, j]) < 1e-7, (i, j, quad, u[i, j])


def _fit_small_svgp(kind="matern12", variational="kron"):
    rng = np.random.default_rng(0)
    n = 200
    X = jnp.asarray(rng.random((n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) * np.cos(3 * np.asarray(X[:, 1]))
                    + 0.05 * rng.standard_normal(n))
    feats = (CellIntegralFeature.from_lims(8, 0.0, 1.0),
             CellIntegralFeature.from_lims(8, 0.0, 1.0))
    spec = svgp.SVGPSpec(kinds=(kind, kind), features=feats, num_data=n,
                         variational=variational)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, _ = train.fit(lambda p: svgp.loss(spec, p, X, y), p0, 300, 0.05)
    return spec, p_fit


@pytest.mark.parametrize("variational", ["kron", "full"])
def test_matheron_moments_match_analytic_posterior(variational):
    spec, params = _fit_small_svgp(variational=variational)
    xs = jnp.asarray(np.random.default_rng(1).random((40, 2)))
    post = svgp.posterior(spec, params, xs, full_cov=False)
    S, F = 4000, 512
    samp = np.asarray(sampling.pathwise_posterior(
        spec, params, jax.random.PRNGKey(7), xs, n_samples=S, n_features=F))
    mean_err = np.abs(samp.mean(0) - np.asarray(post.mean)).max()
    std = np.sqrt(np.asarray(post.var))
    # MC error ~ std/sqrt(S) plus RFF kernel-approximation bias ~ 1/sqrt(F)
    assert mean_err < 0.08, mean_err
    var_rel = np.abs(samp.var(0) - np.asarray(post.var)) / np.maximum(
        np.asarray(post.var), 1e-4)
    assert np.median(var_rel) < 0.35, np.median(var_rel)


def test_pathwise_point_features():
    """PointFeature path: u_prior = path values at Z (smoke + moments)."""
    rng = np.random.default_rng(0)
    n = 150
    X = jnp.asarray(np.sort(rng.random(n)))
    y = jnp.asarray(np.sin(5 * np.asarray(X)) + 0.05 * rng.standard_normal(n))
    feats = (PointFeature(m=12),)
    spec = svgp.SVGPSpec(kinds=("matern32",), features=feats, num_data=n)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, _ = train.fit(lambda p: svgp.loss(spec, p, X, y), p0, 300, 0.05)
    xs = jnp.asarray(np.linspace(0, 1, 25))
    post = svgp.posterior(spec, p_fit, xs, full_cov=False)
    samp = np.asarray(sampling.pathwise_posterior(
        spec, p_fit, jax.random.PRNGKey(2), xs, n_samples=3000, n_features=512))
    assert np.all(np.isfinite(samp))
    assert np.abs(samp.mean(0) - np.asarray(post.mean)).max() < 0.1


def test_sample_gaussian_rank_deficient_f32():
    """Review-found: a 1e-10 relative nugget is a no-op at f32 resolution
    and the Cholesky NaN'd on rank-deficient covariances."""
    from vggp_tpu.models.common import Gaussian

    v = jnp.asarray(np.ones((5, 1)), jnp.float32)
    cov = (v @ v.T).astype(jnp.float32)           # rank 1
    g = Gaussian(mean=jnp.zeros(5, jnp.float32), cov=cov)
    s = np.asarray(sampling.sample_gaussian(jax.random.PRNGKey(0), g, 100))
    assert np.all(np.isfinite(s))
