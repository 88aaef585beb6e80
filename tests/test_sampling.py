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


# --------------------------------------------------------------------------- #
# Spectral RKHS functionals (projection features: VFF / B1 / spline RKHS)
# --------------------------------------------------------------------------- #

from vggp_tpu.features import B1SplineFeature, FourierFeature, SplineRKHSFeature  # noqa: E402


def _basis_deriv_fn(feat, j):
    """Analytic numpy φ_j^{(r)}(x) evaluator + piecewise-smoothness knots."""
    if isinstance(feat, FourierFeature):
        M = feat.n_frequencies
        T = feat.b - feat.a
        om_j = 2.0 * np.pi * (j if j <= M else j - M) / T

        def deriv(x, r):
            if j <= M:  # cosine block (j = 0..M)
                return om_j**r * np.cos(om_j * (x - feat.a) + r * np.pi / 2.0)
            return om_j**r * np.sin(om_j * (x - feat.a) + r * np.pi / 2.0)

        return deriv, np.array([feat.a, feat.b])
    if isinstance(feat, SplineRKHSFeature):
        spline = feat._splines[j]
        ders = {0: spline}

        def deriv(x, r):
            if r not in ders:
                ders[r] = spline.derivative(r)
            xc = np.clip(x, feat.a + 1e-11, feat.b - 1e-11)
            return np.nan_to_num(ders[r](xc))

        return deriv, np.linspace(feat.a, feat.b, feat.n_intervals + 1)
    assert isinstance(feat, B1SplineFeature)
    mesh = np.asarray(feat.mesh)
    d = feat.delta
    lo = mesh[max(j - 1, 0)]
    mid = mesh[j]
    hi = mesh[min(j + 1, len(mesh) - 1)]

    def deriv(x, r):
        if r == 0:
            up = np.where((x >= lo) & (x <= mid) & (mid > lo), (x - lo) / d, 0.0)
            down = np.where((x > mid) & (x <= hi) & (hi > mid), (hi - x) / d, 0.0)
            at = np.where((x == mid) & (mid <= lo), 1.0, 0.0)  # left half-hat apex
            return up + down + at
        if r == 1:
            up = np.where((x > lo) & (x < mid) & (mid > lo), 1.0 / d, 0.0)
            down = np.where((x > mid) & (x < hi) & (hi > mid), -1.0 / d, 0.0)
            return up + down
        return np.zeros_like(x)

    return deriv, mesh


def _markov_L(kind, p_ax, deriv):
    """(L·) and left-edge state of a function given its derivative evaluator."""
    import math

    lam = float(kernels.lam(kind, p_ax["lengthscale"]))
    p = kernels.MARKOV_ORDER[kind]

    def L(xs):
        return sum(math.comb(p, r) * lam ** (p - r) * deriv(xs, r)
                   for r in range(p + 1))

    def state(a):
        return np.array([float(deriv(np.array([a + 1e-9]), r)[0])
                         for r in range(p)])

    return L, state


_PROJ_CASES = [
    ("matern12", FourierFeature(n_frequencies=3, a=0.0, b=1.0)),
    ("matern32", FourierFeature(n_frequencies=3, a=0.0, b=1.0)),
    ("matern52", FourierFeature(n_frequencies=2, a=0.0, b=1.0)),
    ("matern12", B1SplineFeature(mesh=np.linspace(0.0, 1.0, 7))),
    ("matern32", SplineRKHSFeature(degree=2, n_intervals=5, a=0.0, b=1.0)),
    ("matern52", SplineRKHSFeature(degree=3, n_intervals=4, a=0.0, b=1.0)),
]


@pytest.mark.parametrize("kind,feat", _PROJ_CASES,
                         ids=[f"{k}-{type(f).__name__}" for k, f in _PROJ_CASES])
def test_u_prior_rkhs_functional_vs_quadrature(kind, feat):
    """Deterministic identity: the closed-form u_prior of a projection
    feature equals fine quadrature of the Markov-form RKHS inner product
    ⟨path, φ_j⟩_H = (1/c)∫(L·path)(L·φ_j) + stateᵀP₀⁻¹state applied to the
    very path that was sampled (not statistical)."""
    import math

    spec = svgp.SVGPSpec(kinds=(kind,), features=(feat,), num_data=10)
    params = spec.init_params(jnp.float64)
    params["axes"][0]["lengthscale"] = jnp.asarray(0.45, jnp.float64)
    params["axes"][0]["variance"] = jnp.asarray(1.7, jnp.float64)
    p_ax = params["axes"][0]

    om, ph, amp = sampling.prior_paths(jax.random.PRNGKey(5), spec, params, 48)
    om_np, ph_np, amp_np = np.asarray(om)[0], np.asarray(ph), float(amp)
    assert np.abs(om_np).max() < 2e3, "pick a tamer seed for quadrature accuracy"
    u = np.asarray(sampling.prior_inducing_sample(om, ph, amp, spec, params))

    def path_deriv(x, r):
        return amp_np * np.sum(
            om_np[None, :] ** r
            * np.cos(x[:, None] * om_np[None, :] + ph_np[None, :]
                     + r * np.pi / 2.0), axis=1)

    Lp, state_p = _markov_L(kind, p_ax, path_deriv)
    var, ls = float(p_ax["variance"]), float(p_ax["lengthscale"])
    c = float(kernels.white_noise_intensity(kind, var, ls))
    pinv = np.array(kernels.p0_inv_rows(kind, var, ls), dtype=float)

    _, knots = _basis_deriv_fn(feat, 0)
    a = float(knots[0])
    sp = state_p(a)
    scale = float(np.abs(u).max())
    for j in range(feat.m):
        hd, knots_j = _basis_deriv_fn(feat, j)
        Lh, state_h = _markov_L(kind, p_ax, hd)
        total = 0.0
        for lo, hi in zip(knots_j[:-1], knots_j[1:]):
            xs = np.linspace(lo + 1e-12, hi - 1e-12, 20001)
            total += np.trapezoid(Lp(xs) * Lh(xs), xs)
        want = total / c + sp @ pinv @ state_h(a)
        assert abs(u[j] - want) < 2e-4 * max(scale, abs(want)), (j, u[j], want)


@pytest.mark.parametrize("kind,feat", [_PROJ_CASES[1], _PROJ_CASES[3],
                                       _PROJ_CASES[4]],
                         ids=["m32-vff", "m12-b1", "m32-spline"])
def test_u_prior_functional_moments_match_kuu_kuf(kind, feat):
    """Statistical closed loop: E[u uᵀ] over prior paths ≈ the feature's own
    Kuu and Cov[u, f(x)] ≈ Kuf — exactly the two covariances the Matheron
    update relies on for bias-free posterior sampling."""
    spec = svgp.SVGPSpec(kinds=(kind,), features=(feat,), num_data=10)
    params = spec.init_params(jnp.float64)
    params["axes"][0]["lengthscale"] = jnp.asarray(0.5, jnp.float64)
    p_ax = params["axes"][0]
    xs = jnp.asarray(np.linspace(0.1, 0.9, 5))

    def draw(key):
        om, ph, amp = sampling.prior_paths(key, spec, params, 128)
        u = sampling.prior_inducing_sample(om, ph, amp, spec, params)
        f = sampling.eval_path(om, ph, amp, xs)
        return u, f

    P = 6000
    us, fs = jax.vmap(draw)(jax.random.split(jax.random.PRNGKey(11), P))
    us, fs = np.asarray(us), np.asarray(fs)
    kuu = np.asarray(feat.Kuu(kind, p_ax))
    scale = np.sqrt(np.outer(np.diag(kuu), np.diag(kuu)))
    assert np.abs((us.T @ us / P - kuu) / scale).max() < 0.2

    kuf = np.asarray(feat.Kuf(kind, p_ax, xs))
    kscale = np.sqrt(np.diag(kuu) * float(p_ax["variance"]))[:, None]
    assert np.abs((us.T @ fs / P - kuf) / kscale).max() < 0.2


def test_pathwise_vff_posterior_moments():
    """End-to-end Matheron sampling through the projection-functional path
    (VFF features) matches the analytic posterior."""
    rng = np.random.default_rng(3)
    n = 150
    X = jnp.asarray(np.sort(rng.random(n)))
    y = jnp.asarray(np.sin(5 * np.asarray(X)) + 0.05 * rng.standard_normal(n))
    feats = (FourierFeature(n_frequencies=5, a=-0.3, b=1.3),)
    spec = svgp.SVGPSpec(kinds=("matern32",), features=feats, num_data=n)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, _ = train.fit(lambda p: svgp.loss(spec, p, X, y), p0, 300, 0.05)
    xs = jnp.asarray(np.linspace(0, 1, 25))
    post = svgp.posterior(spec, p_fit, xs, full_cov=False)
    samp = np.asarray(sampling.pathwise_posterior(
        spec, p_fit, jax.random.PRNGKey(2), xs, n_samples=3000, n_features=512))
    assert np.all(np.isfinite(samp))
    assert np.abs(samp.mean(0) - np.asarray(post.mean)).max() < 0.1


# --------------------------------------------------------------------------- #
# Pathwise sampling across the remaining model families
# --------------------------------------------------------------------------- #


def _data_2d(n=200, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.random((n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) * np.cos(3 * np.asarray(X[:, 1]))
                    + 0.05 * rng.standard_normal(n))
    return X, y


def test_pathwise_collapsed_sgpr_moments():
    """Collapsed-optimal q(w) = N(L_B⁻ᵀc, B⁻¹) sampling matches the analytic
    SGPR posterior (mean + variance) at held-out points."""
    from vggp_tpu.models import sgpr

    X, y = _data_2d()
    feats = (CellIntegralFeature.from_lims(8, 0.0, 1.0),
             CellIntegralFeature.from_lims(8, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, _ = train.fit(lambda p: sgpr.loss(spec, p, X, y), p0, 200, 0.05)
    xs = jnp.asarray(np.random.default_rng(1).random((40, 2)))
    post = sgpr.posterior(spec, p_fit, X, y, xs, full_cov=False)
    samp = np.asarray(sampling.pathwise(
        spec, p_fit, jax.random.PRNGKey(5), xs, data=(X, y),
        n_samples=4000, n_features=512))
    assert np.all(np.isfinite(samp))
    assert np.abs(samp.mean(0) - np.asarray(post.mean)).max() < 0.08
    var_rel = np.abs(samp.var(0) - np.asarray(post.var)) / np.maximum(
        np.asarray(post.var), 1e-4)
    assert np.median(var_rel) < 0.35, np.median(var_rel)


def test_pathwise_free_svgp_moments():
    """Free-Z collapsed sampling (point-evaluation inducing functionals)
    matches the analytic FreeSVGP posterior."""
    from vggp_tpu.models import freesvgp

    X, y = _data_2d(seed=2)
    spec = freesvgp.FreeSVGPSpec(kinds=("matern32", "matern32"), m=20)
    p0 = train.non_informative_init(
        spec.init_params(jnp.float64, seed=3), X, y)
    p_fit, _ = train.fit(lambda p: freesvgp.loss(spec, p, X, y), p0, 200, 0.05)
    xs = jnp.asarray(np.random.default_rng(4).random((30, 2)))
    post = freesvgp.posterior(spec, p_fit, X, y, xs, full_cov=False)
    samp = np.asarray(sampling.pathwise(
        spec, p_fit, jax.random.PRNGKey(6), xs, data=(X, y),
        n_samples=4000, n_features=512))
    assert np.all(np.isfinite(samp))
    assert np.abs(samp.mean(0) - np.asarray(post.mean)).max() < 0.08
    var_rel = np.abs(samp.var(0) - np.asarray(post.var)) / np.maximum(
        np.asarray(post.var), 1e-4)
    assert np.median(var_rel) < 0.35, np.median(var_rel)


def test_pathwise_exact_gp_moments():
    """Matheron-against-the-data sampling matches the exact GP posterior.
    The only bias is the RFF kernel approximation (~1/√F)."""
    from vggp_tpu.models import exact

    rng = np.random.default_rng(7)
    n = 80
    X = jnp.asarray(np.sort(rng.random(n)))
    y = jnp.asarray(np.sin(5 * np.asarray(X)) + 0.05 * rng.standard_normal(n))
    spec = exact.ExactGPSpec(kinds=("matern32",))
    p0 = exact.ExactGPSpec(kinds=("matern32",)).init_params(jnp.float64)
    p_fit, _ = train.fit(lambda p: exact.loss(spec, p, X, y), p0, 300, 0.05)
    xs = jnp.asarray(np.linspace(0.0, 1.0, 25))
    post = exact.posterior(spec, p_fit, X, y, xs, full_cov=False)
    samp = np.asarray(sampling.pathwise(
        spec, p_fit, jax.random.PRNGKey(8), xs, data=(X, y),
        n_samples=4000, n_features=1024))
    assert np.all(np.isfinite(samp))
    assert np.abs(samp.mean(0) - np.asarray(post.mean)).max() < 0.08
    var_rel = np.abs(samp.var(0) - np.asarray(post.var)) / np.maximum(
        np.asarray(post.var), 1e-4)
    assert np.median(var_rel) < 0.35, np.median(var_rel)


def test_pathwise_dispatch_requires_data():
    from vggp_tpu.models import sgpr

    feats = (CellIntegralFeature.from_lims(4, 0.0, 1.0),)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=feats)
    with pytest.raises(ValueError, match="needs data"):
        sampling.pathwise(spec, spec.init_params(jnp.float64),
                          jax.random.PRNGKey(0), jnp.linspace(0, 1, 5))


def test_pathwise_q_v_moments_svgp():
    """Joint draws of the gridded product match analytic q(v): mean,
    per-cell variance, AND cross-cell covariance (coherence)."""
    spec, params = _fit_small_svgp(variational="kron")
    grid = (CellIntegralFeature.from_lims(5, 0.1, 0.9),
            CellIntegralFeature.from_lims(5, 0.1, 0.9))
    qv = svgp.q_v(spec, params, grid, full_cov=True)
    S = 6000
    samp = np.asarray(sampling.pathwise_q_v(
        spec, params, jax.random.PRNGKey(11), grid, n_samples=S,
        n_features=512))
    assert samp.shape == (S, 25)
    mean_err = np.abs(samp.mean(0) - np.asarray(qv.mean)).max()
    assert mean_err < 0.05, mean_err
    cov_emp = np.cov(samp.T)
    cov_an = np.asarray(qv.cov)
    scale = np.sqrt(np.outer(np.diag(cov_an), np.diag(cov_an))) + 1e-6
    # off-diagonal coherence: correlations match to MC accuracy
    assert np.abs((cov_emp - cov_an) / scale).max() < 0.25


def test_pathwise_q_v_moments_collapsed():
    from vggp_tpu.models import sgpr

    X, y = _data_2d(seed=5)
    feats = (CellIntegralFeature.from_lims(8, 0.0, 1.0),
             CellIntegralFeature.from_lims(8, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, _ = train.fit(lambda p: sgpr.loss(spec, p, X, y), p0, 200, 0.05)
    grid = (CellIntegralFeature.from_lims(5, 0.1, 0.9),
            CellIntegralFeature.from_lims(5, 0.1, 0.9))
    qv = sgpr.q_v(spec, p_fit, X, y, grid, full_cov=True)
    samp = np.asarray(sampling.pathwise_q_v(
        spec, p_fit, jax.random.PRNGKey(12), grid, n_samples=6000,
        n_features=512, data=(X, y)))
    mean_err = np.abs(samp.mean(0) - np.asarray(qv.mean)).max()
    assert mean_err < 0.05, mean_err
    cov_emp = np.cov(samp.T)
    cov_an = np.asarray(qv.cov)
    scale = np.sqrt(np.outer(np.diag(cov_an), np.diag(cov_an))) + 1e-6
    assert np.abs((cov_emp - cov_an) / scale).max() < 0.25


def test_pathwise_additive_moments():
    """Sum-of-1D-paths prior + concatenated functionals matches the analytic
    additive posterior."""
    from vggp_tpu.models import additive

    X, y0 = _data_2d(seed=9)
    # genuinely additive truth so the fit is well-specified
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) + 0.5 * np.asarray(X[:, 1])
                    + 0.05 * np.random.default_rng(9).standard_normal(X.shape[0]))
    feats = (CellIntegralFeature.from_lims(10, 0.0, 1.0),
             CellIntegralFeature.from_lims(10, 0.0, 1.0))
    spec = additive.AdditiveSGPRSpec(kinds=("matern32", "matern32"),
                                     features=feats)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, _ = train.fit(lambda p: additive.loss(spec, p, X, y), p0, 200, 0.05)
    xs = jnp.asarray(np.random.default_rng(10).random((30, 2)))
    post = additive.posterior(spec, p_fit, X, y, xs, full_cov=False)
    samp = np.asarray(sampling.pathwise(
        spec, p_fit, jax.random.PRNGKey(13), xs, data=(X, y),
        n_samples=4000, n_features=512))
    assert np.all(np.isfinite(samp))
    assert np.abs(samp.mean(0) - np.asarray(post.mean)).max() < 0.08
    var_rel = np.abs(samp.var(0) - np.asarray(post.var)) / np.maximum(
        np.asarray(post.var), 1e-4)
    assert np.median(var_rel) < 0.35, np.median(var_rel)


def test_pathwise_q_v_rejects_unsupported_family():
    from vggp_tpu.models import additive

    feats = (CellIntegralFeature.from_lims(4, 0.0, 1.0),
             CellIntegralFeature.from_lims(4, 0.0, 1.0))
    spec = additive.AdditiveSGPRSpec(kinds=("matern12", "matern12"),
                                     features=feats)
    with pytest.raises(NotImplementedError, match="AdditiveSGPRSpec"):
        sampling.pathwise_q_v(spec, spec.init_params(jnp.float64),
                              jax.random.PRNGKey(0), feats)
