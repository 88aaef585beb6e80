"""Gradient observables: ∂f/∂x posteriors and gridded-gradient products.

Oracles (all float64):
- closed-form dKuf/dx blocks vs central finite differences of Kuf;
- posterior_grad mean vs jax.grad of the posterior-mean function;
- posterior_grad variance vs ∂²/∂s∂t of the posterior covariance function;
- 1D q_dv vs the face-difference image D q(f_mesh) Dᵀ of the joint posterior
  at the mesh points (the fundamental-theorem-of-calculus identity);
- 2D q_dv vs Simpson quadrature of the face-difference functional.

Beyond-reference capability (the reference has no gradient observables).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggp_tpu import kernels
from vggp_tpu.features import (
    AxisFeature,
    B1SplineFeature,
    CellIntegralFeature,
    FourierFeature,
    PointFeature,
)
from vggp_tpu.models import common, sgpr, svgp


def _p(ls=0.3, var=1.2, feat=None):
    p = {"variance": jnp.asarray(var), "lengthscale": jnp.asarray(ls)}
    if feat is not None:
        p.update(feat.init_params(jnp.float64))
    return p


def _params(feats, ls=0.3, var=1.2, noise=0.01):
    return {"axes": tuple(_p(ls, var, f) for f in feats),
            "noise": jnp.asarray(noise)}


_FEATS = [
    ("point", PointFeature(m=7, z_init=np.linspace(0.05, 0.95, 7))),
    ("cell", CellIntegralFeature.from_lims(9, 0.0, 1.0)),
    ("fourier", FourierFeature(n_frequencies=3, a=0.0, b=1.0)),
]


@pytest.mark.parametrize("kind", ["matern32", "matern52", "rbf"])
@pytest.mark.parametrize("name,feat", _FEATS, ids=[n for n, _ in _FEATS])
def test_dkuf_dx_matches_finite_difference(kind, name, feat):
    if name == "fourier" and kind == "rbf":
        pytest.skip("Fourier continuation is Matérn-only")
    p = _p(feat=feat)
    x = jnp.asarray(np.linspace(0.08, 0.93, 11))
    h = 1e-6
    fd = (feat.Kuf(kind, p, x + h) - feat.Kuf(kind, p, x - h)) / (2 * h)
    d = feat.dKuf_dx(kind, p, x)
    np.testing.assert_allclose(np.asarray(d), np.asarray(fd), atol=1e-6, rtol=1e-5)


def test_cell_dkuf_closed_form_matches_base_jvp():
    """The explicit k(x−α)−k(x−β) form equals forward-mode AD through Kuf
    (away from cell edges — ON an edge the AD fallback differentiates one
    branch of the closed form's `where`, the documented a.e. caveat, while
    the explicit form stays exact)."""
    feat = CellIntegralFeature.from_lims(8, 0.0, 1.0)
    p = _p()
    x = jnp.asarray(np.linspace(0.031, 0.967, 13))
    for kind in ("matern32", "matern52", "rbf"):
        closed = feat.dKuf_dx(kind, p, x)
        base = AxisFeature.dKuf_dx(feat, kind, p, x)
        np.testing.assert_allclose(np.asarray(closed), np.asarray(base),
                                   rtol=1e-10, atol=1e-12)


def test_face_diff_gram_matches_naive_double_difference():
    grid = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    p = _p(ls=0.4)
    for kind in ("matern12", "matern32", "matern52", "rbf"):
        got = common._face_diff_gram(kind, p, grid)
        mesh = grid.mesh_j(p)
        K = kernels.gram_1d(kind, mesh, mesh, p["variance"], p["lengthscale"])
        K = np.asarray(K)
        naive = K[1:, 1:] - K[1:, :-1] - K[:-1, 1:] + K[:-1, :-1]
        np.testing.assert_allclose(np.asarray(got), naive, rtol=1e-9, atol=1e-12)


def test_grad_kdiag_matches_grad_gram_diagonal():
    feats = (CellIntegralFeature.from_lims(5, 0.0, 1.0), PointFeature(m=4))
    spec = sgpr.SGPRSpec(kinds=("matern32", "matern52"), features=feats)
    params = _params(feats)
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (6, 2)))
    for axis in (0, 1):
        d = common.grad_kdiag(spec, params, x, axis)
        G = common.grad_gram_full(spec, params, x, x, axis)
        np.testing.assert_allclose(np.asarray(d), np.diagonal(np.asarray(G)),
                                   rtol=1e-12)


def _rand_q_full(m, seed=0, scale=0.25):
    rng = np.random.default_rng(seed)
    L = np.tril(rng.standard_normal((m, m))) * scale + np.eye(m)
    mu = rng.standard_normal(m) * 0.4
    return {"mu": jnp.asarray(mu), "raw_L": svgp.raw_from_chol(jnp.asarray(L))}


def _rand_q_kron(ms, seed=0, scale=0.25):
    rng = np.random.default_rng(seed)
    q = {"mu": jnp.asarray(rng.standard_normal(ms) * 0.4)}
    for i, m in enumerate(ms):
        L = np.tril(rng.standard_normal((m, m))) * scale + np.eye(m)
        q[f"raw_L{i + 1}"] = svgp.raw_from_chol(jnp.asarray(L))
    return q


def _svgp_2d(variational, kinds=("matern32", "matern52")):
    feats = (CellIntegralFeature.from_lims(6, 0.0, 1.0),
             PointFeature(m=5, z_init=np.linspace(0.1, 0.9, 5)))
    spec = svgp.SVGPSpec(kinds=kinds, features=feats, num_data=50,
                         variational=variational)
    params = spec.init_params(jnp.float64)
    params["axes"] = _params(feats)["axes"]
    params["noise"] = jnp.asarray(0.01)
    if variational == "full":
        params["q"] = _rand_q_full(spec.num_inducing, seed=3)
    else:
        params["q"] = _rand_q_kron(spec.axis_m, seed=3)
    return spec, params


@pytest.mark.parametrize("variational", ["full", "kron"])
@pytest.mark.parametrize("axis", [0, 1])
def test_svgp_posterior_grad_oracle_2d(variational, axis):
    """mean = ∂/∂s of the posterior mean; var = ∂²/∂s∂t of the posterior
    covariance function at s = t (both by AD of the non-gradient posterior)."""
    spec, params = _svgp_2d(variational)
    pts = np.asarray([[0.22, 0.41], [0.63, 0.58], [0.35, 0.77]])

    got = svgp.posterior_grad(spec, params, jnp.asarray(pts), axis)

    def mean_at(s, base):
        x = base.at[axis].set(s)[None, :]
        return svgp.posterior(spec, params, x).mean[0]

    def cov_st(s, t, base):
        xs = jnp.stack([base.at[axis].set(s), base.at[axis].set(t)])
        return svgp.posterior(spec, params, xs, full_cov=True).cov[0, 1]

    for i, row in enumerate(pts):
        base = jnp.asarray(row)
        s = base[axis]
        m_or = jax.grad(mean_at)(s, base)
        v_or = jax.grad(jax.grad(cov_st, argnums=0), argnums=1)(s, s, base)
        assert float(got.mean[i]) == pytest.approx(float(m_or), rel=1e-8, abs=1e-10)
        assert float(got.variance()[i]) == pytest.approx(float(v_or), rel=1e-7, abs=1e-10)

    # full_cov path agrees with the marginal path and the AD oracle off-diagonal
    full = svgp.posterior_grad(spec, params, jnp.asarray(pts), axis, full_cov=True)
    np.testing.assert_allclose(np.asarray(full.mean), np.asarray(got.mean), rtol=1e-12)
    np.testing.assert_allclose(np.diagonal(np.asarray(full.cov)),
                               np.asarray(got.variance()), rtol=1e-6, atol=1e-12)


def _sgpr_2d(kinds=("matern32", "matern52")):
    feats = (CellIntegralFeature.from_lims(6, 0.0, 1.0),
             PointFeature(m=5, z_init=np.linspace(0.1, 0.9, 5)))
    spec = sgpr.SGPRSpec(kinds=kinds, features=feats)
    params = _params(feats)
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(0.0, 1.0, (40, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0])) * np.cos(2 * np.asarray(X[:, 1]))
                    + 0.05 * rng.standard_normal(40))
    return spec, params, X, y


@pytest.mark.parametrize("axis", [0, 1])
def test_sgpr_posterior_grad_oracle_2d(axis):
    spec, params, X, y = _sgpr_2d()
    pts = np.asarray([[0.31, 0.52], [0.71, 0.24]])
    got = sgpr.posterior_grad(spec, params, X, y, jnp.asarray(pts), axis)

    def mean_at(s, base):
        x = base.at[axis].set(s)[None, :]
        return sgpr.posterior(spec, params, X, y, x, full_cov=False).mean[0]

    def cov_st(s, t, base):
        xs = jnp.stack([base.at[axis].set(s), base.at[axis].set(t)])
        return sgpr.posterior(spec, params, X, y, xs, full_cov=True).cov[0, 1]

    for i, row in enumerate(pts):
        base = jnp.asarray(row)
        s = base[axis]
        m_or = jax.grad(mean_at)(s, base)
        v_or = jax.grad(jax.grad(cov_st, argnums=0), argnums=1)(s, s, base)
        assert float(got.mean[i]) == pytest.approx(float(m_or), rel=1e-8, abs=1e-10)
        assert float(got.variance()[i]) == pytest.approx(float(v_or), rel=1e-7, abs=1e-10)


def test_posterior_grad_rejects_matern12():
    spec, params = _svgp_2d("full", kinds=("matern12", "matern32"))
    pts = jnp.asarray([[0.5, 0.5]])
    with pytest.raises(ValueError, match="once-differentiable"):
        svgp.posterior_grad(spec, params, pts, axis=0)
    svgp.posterior_grad(spec, params, pts, axis=1)  # differentiable axis is fine


@pytest.mark.parametrize("kind", ["matern12", "matern32"])
def test_sgpr_qdv_1d_face_difference_oracle(kind):
    """1D: ∫_cell f' = f(β) − f(α), so q_dv must equal D q(f_mesh) Dᵀ with D
    the difference matrix — valid for EVERY kind (no pointwise derivative)."""
    feat = CellIntegralFeature.from_lims(7, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=(kind,), features=(feat,))
    params = _params((feat,))
    rng = np.random.default_rng(1)
    X = jnp.asarray(np.sort(rng.uniform(0, 1, 30)))
    y = jnp.asarray(np.sin(4 * np.asarray(X)) + 0.05 * rng.standard_normal(30))
    grid = CellIntegralFeature.from_lims(5, 0.05, 0.95)

    got = sgpr.q_dv(spec, params, X, y, (grid,), axis=0, full_cov=True)

    mesh = jnp.asarray(grid.mesh)
    qf = sgpr.posterior(spec, params, X, y, mesh, full_cov=True)
    D = np.zeros((5, 6))
    for i in range(5):
        D[i, i], D[i, i + 1] = -1.0, 1.0
    m_or = D @ np.asarray(qf.mean)
    c_or = D @ np.asarray(qf.cov) @ D.T
    np.testing.assert_allclose(np.asarray(got.mean), m_or, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.cov), c_or, rtol=1e-6, atol=1e-12)


def _simpson_nodes_weights(a, b, n=33):
    """Composite Simpson nodes/weights on [a, b] (n odd)."""
    xs = np.linspace(a, b, n)
    h = (b - a) / (n - 1)
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return xs, w * h / 3.0


def _freesvgp_2d(kinds=("matern32", "matern52")):
    from vggp_tpu.models import freesvgp

    spec = freesvgp.FreeSVGPSpec(kinds=kinds, m=9)
    params = spec.init_params(jnp.float64, seed=4)
    for ax in params["axes"]:
        ax["lengthscale"] = jnp.asarray(0.35)
        ax["variance"] = jnp.asarray(1.1)
    params["noise"] = jnp.asarray(0.01)
    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.uniform(0, 1, (35, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0])) * np.cos(2 * np.asarray(X[:, 1]))
                    + 0.05 * rng.standard_normal(35))
    return spec, params, X, y


def _additive_2d(kinds=("matern32", "matern52")):
    from vggp_tpu.models import additive

    feats = (CellIntegralFeature.from_lims(6, 0.0, 1.0),
             CellIntegralFeature.from_lims(5, 0.0, 1.0))
    spec = additive.AdditiveSGPRSpec(kinds=kinds, features=feats)
    params = _params(feats)
    rng = np.random.default_rng(13)
    X = jnp.asarray(rng.uniform(0, 1, (40, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0])) + np.cos(2 * np.asarray(X[:, 1]))
                    + 0.05 * rng.standard_normal(40))
    return spec, params, X, y


@pytest.mark.parametrize("model", ["freesvgp", "additive"])
@pytest.mark.parametrize("axis", [0, 1])
def test_other_models_posterior_grad_oracle(model, axis):
    if model == "freesvgp":
        from vggp_tpu.models import freesvgp as mod

        spec, params, X, y = _freesvgp_2d()
    else:
        from vggp_tpu.models import additive as mod

        spec, params, X, y = _additive_2d()
    pts = np.asarray([[0.28, 0.55], [0.66, 0.33]])
    got = mod.posterior_grad(spec, params, X, y, jnp.asarray(pts), axis)

    def mean_at(s, base):
        x = base.at[axis].set(s)[None, :]
        return mod.posterior(spec, params, X, y, x, full_cov=False).mean[0]

    def cov_st(s, t, base):
        xs = jnp.stack([base.at[axis].set(s), base.at[axis].set(t)])
        return mod.posterior(spec, params, X, y, xs, full_cov=True).cov[0, 1]

    for i, row in enumerate(pts):
        base = jnp.asarray(row)
        s = base[axis]
        m_or = jax.grad(mean_at)(s, base)
        v_or = jax.grad(jax.grad(cov_st, argnums=0), argnums=1)(s, s, base)
        assert float(got.mean[i]) == pytest.approx(float(m_or), rel=1e-8, abs=1e-10)
        assert float(got.variance()[i]) == pytest.approx(float(v_or), rel=1e-6, abs=1e-10)


@pytest.mark.parametrize("model", ["sgpr", "svgp_full", "svgp_kron", "freesvgp", "additive"])
def test_qdv_2d_quadrature_oracle(model):
    """2D, axis 0: v'_c = ∫_cell2 [f(β1, t) − f(α1, t)] dt — Simpson-quadrature
    the axis-2 integral of the joint posterior at the face points."""
    g1 = CellIntegralFeature.from_lims(3, 0.1, 0.9)
    g2 = CellIntegralFeature.from_lims(2, 0.2, 0.8)
    if model == "sgpr":
        spec, params, X, y = _sgpr_2d()
        got = sgpr.q_dv(spec, params, X, y, (g1, g2), axis=0, full_cov=True)
        post = lambda pts: sgpr.posterior(spec, params, X, y, pts, full_cov=True)
    elif model == "freesvgp":
        from vggp_tpu.models import freesvgp

        spec, params, X, y = _freesvgp_2d()
        got = freesvgp.q_dv(spec, params, X, y, (g1, g2), axis=0, full_cov=True)
        post = lambda pts: freesvgp.posterior(spec, params, X, y, pts, full_cov=True)
    elif model == "additive":
        from vggp_tpu.models import additive

        spec, params, X, y = _additive_2d()
        got = additive.q_dv(spec, params, X, y, (g1, g2), axis=0, full_cov=True)
        post = lambda pts: additive.posterior(spec, params, X, y, pts, full_cov=True)
    else:
        spec, params = _svgp_2d("full" if model == "svgp_full" else "kron")
        got = svgp.q_dv(spec, params, (g1, g2), axis=0, full_cov=True)
        post = lambda pts: svgp.posterior(spec, params, pts, full_cov=True)

    # quadrature points: for each axis-2 cell, Simpson nodes at both faces
    nq = 33
    pts, rows = [], []
    n_cells = g1.m * g2.m
    W = np.zeros((n_cells, 2 * g1.m * g2.m * nq))
    col = 0
    for i in range(g1.m):            # axis-0 cell (row-major kron order: i*g2.m + j)
        a1, b1 = g1.mesh[i], g1.mesh[i + 1]
        for j in range(g2.m):
            xs, w = _simpson_nodes_weights(g2.mesh[j], g2.mesh[j + 1], nq)
            cell = i * g2.m + j
            for t, wt in zip(xs, w):
                pts.append([b1, t]); W[cell, col] = wt; col += 1
                pts.append([a1, t]); W[cell, col] = -wt; col += 1
    qf = post(jnp.asarray(np.asarray(pts)))
    m_or = W @ np.asarray(qf.mean)
    c_or = W @ np.asarray(qf.cov) @ W.T
    np.testing.assert_allclose(np.asarray(got.mean), m_or, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.cov), c_or, rtol=1e-4, atol=1e-9)


def test_svgp_qdv_marginal_matches_full_cov():
    spec, params = _svgp_2d("kron")
    g1 = CellIntegralFeature.from_lims(4, 0.1, 0.9)
    g2 = CellIntegralFeature.from_lims(3, 0.2, 0.8)
    full = svgp.q_dv(spec, params, (g1, g2), axis=1, full_cov=True)
    marg = svgp.q_dv(spec, params, (g1, g2), axis=1, full_cov=False)
    np.testing.assert_allclose(np.asarray(marg.mean), np.asarray(full.mean), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(marg.var), np.diagonal(np.asarray(full.cov)),
                               rtol=1e-8, atol=1e-14)


@pytest.mark.parametrize("axis", [0, 1])
def test_exact_posterior_grad_oracle_2d(axis):
    from vggp_tpu.models import exact

    spec = exact.ExactGPSpec(kinds=("matern32", "matern52"))
    params = {"axes": ({"variance": jnp.asarray(1.2), "lengthscale": jnp.asarray(0.3)},
                       {"variance": jnp.asarray(0.8), "lengthscale": jnp.asarray(0.4)}),
              "noise": jnp.asarray(0.01)}
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.uniform(0, 1, (25, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0])) + np.cos(2 * np.asarray(X[:, 1])))
    pts = np.asarray([[0.3, 0.6], [0.7, 0.2]])
    got = exact.posterior_grad(spec, params, X, y, jnp.asarray(pts), axis)

    def mean_at(s, base):
        x = base.at[axis].set(s)[None, :]
        return exact.posterior(spec, params, X, y, x, full_cov=False).mean[0]

    def cov_st(s, t, base):
        xs = jnp.stack([base.at[axis].set(s), base.at[axis].set(t)])
        return exact.posterior(spec, params, X, y, xs, full_cov=True).cov[0, 1]

    for i, row in enumerate(pts):
        base = jnp.asarray(row)
        s = base[axis]
        m_or = jax.grad(mean_at)(s, base)
        v_or = jax.grad(jax.grad(cov_st, argnums=0), argnums=1)(s, s, base)
        assert float(got.mean[i]) == pytest.approx(float(m_or), rel=1e-8, abs=1e-10)
        assert float(got.variance()[i]) == pytest.approx(float(v_or), rel=1e-7, abs=1e-10)


def test_exact_qdv_1d_face_difference_oracle():
    from vggp_tpu.models import exact

    spec = exact.ExactGPSpec(kinds=("matern32",))
    params = {"axes": ({"variance": jnp.asarray(1.2), "lengthscale": jnp.asarray(0.3)},),
              "noise": jnp.asarray(0.01)}
    rng = np.random.default_rng(2)
    X = jnp.asarray(np.sort(rng.uniform(0, 1, 20)))
    y = jnp.asarray(np.sin(4 * np.asarray(X)))
    grid = CellIntegralFeature.from_lims(4, 0.1, 0.9)
    got = exact.q_dv(spec, params, X, y, (grid,), axis=0, full_cov=True)
    mesh = jnp.asarray(grid.mesh)
    qf = exact.posterior(spec, params, X, y, mesh, full_cov=True)
    D = np.diff(np.eye(5), axis=0)  # (4, 5) difference matrix
    np.testing.assert_allclose(np.asarray(got.mean), D @ np.asarray(qf.mean),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.cov), D @ np.asarray(qf.cov) @ D.T,
                               rtol=1e-6, atol=1e-12)


def test_grad_trapz_grid_2d_separable_analytic():
    """For field g(x)h(y): ∫_cell ∂₀f = (g(β)−g(α))·∫_cell h(y) dy exactly."""
    from vggp_tpu.utils import grad_trapz_grid_2d

    xs = np.linspace(0.0, 1.0, 401)
    ys = np.linspace(0.0, 1.0, 401)
    g = np.sin(3.0 * xs)
    h = np.exp(-ys)
    field = g[:, None] * h[None, :]
    n = 4
    got = grad_trapz_grid_2d(field, xs, ys, n, axis=0)
    edges = np.linspace(0.0, 1.0, n + 1)
    g_faces = np.sin(3.0 * edges)
    h_int = -np.diff(np.exp(-edges))  # ∫ e^{-y} over each cell
    want = np.diff(g_faces)[:, None] * h_int[None, :]
    np.testing.assert_allclose(got, want, rtol=2e-4)
    got1 = grad_trapz_grid_2d(field, xs, ys, n, axis=1)
    g_int = -np.diff(np.cos(3.0 * edges)) / 3.0
    want1 = g_int[:, None] * np.diff(np.exp(-edges))[None, :]
    np.testing.assert_allclose(got1, want1, rtol=2e-4)


@pytest.mark.parametrize("variational", ["full", "kron"])
def test_pathwise_grads_match_fd_of_sampled_function(variational):
    """Each joint draw is one deterministic function: its gradient row must
    equal the central finite difference of its value row — per sample, no
    Monte-Carlo tolerance."""
    from vggp_tpu import sampling

    spec, params = _svgp_2d(variational, kinds=("matern52", "rbf"))
    h = 1e-5
    base = np.array([0.43, 0.57])
    for axis in (0, 1):
        pts = np.tile(base, (3, 1))
        pts[0, axis] -= h
        pts[2, axis] += h
        draws = sampling.pathwise_posterior_with_grads(
            spec, params, jax.random.PRNGKey(0), jnp.asarray(pts),
            grad_axes=(axis,), n_samples=6, n_features=128)
        f = np.asarray(draws[:, 0, :])       # (S, 3)
        g = np.asarray(draws[:, 1, :])       # (S, 3)
        fd = (f[:, 2] - f[:, 0]) / (2 * h)
        np.testing.assert_allclose(g[:, 1], fd, rtol=1e-4, atol=1e-6)


def test_pathwise_collapsed_grads_match_fd():
    from vggp_tpu import sampling

    spec, params, X, y = _sgpr_2d(kinds=("matern32", "matern52"))
    h = 1e-5
    base = np.array([0.39, 0.61])
    pts = np.tile(base, (3, 1))
    pts[0, 0] -= h
    pts[2, 0] += h
    draws = sampling.pathwise_posterior_collapsed_with_grads(
        spec, params, jax.random.PRNGKey(1), X, y, jnp.asarray(pts),
        grad_axes=(0,), n_samples=6, n_features=128)
    f = np.asarray(draws[:, 0, :])
    g = np.asarray(draws[:, 1, :])
    fd = (f[:, 2] - f[:, 0]) / (2 * h)
    np.testing.assert_allclose(g[:, 1], fd, rtol=1e-4, atol=1e-6)


def test_pathwise_grads_moments_match_posterior_grad():
    """Sample moments of the gradient rows converge to posterior_grad."""
    from vggp_tpu import sampling

    spec, params = _svgp_2d("kron", kinds=("matern52", "matern52"))
    pts = jnp.asarray([[0.35, 0.45], [0.6, 0.7]])
    draws = sampling.pathwise_posterior_with_grads(
        spec, params, jax.random.PRNGKey(2), pts, grad_axes=(0,),
        n_samples=3000, n_features=2048)
    g = np.asarray(draws[:, 1, :])
    want = svgp.posterior_grad(spec, params, pts, axis=0)
    sd = np.sqrt(np.asarray(want.variance()))
    np.testing.assert_allclose(g.mean(0), np.asarray(want.mean),
                               atol=4 * sd.max() / np.sqrt(3000) + 3e-2)
    np.testing.assert_allclose(g.std(0), sd, rtol=0.15)


@pytest.mark.parametrize("kind", ["matern52", "rbf"])
@pytest.mark.parametrize("name,feat", _FEATS[:2], ids=["point", "cell"])
def test_dkuf_dx2_matches_fd_of_dkuf(kind, name, feat):
    p = _p(feat=feat)
    x = jnp.asarray(np.linspace(0.07, 0.94, 9))
    h = 1e-6
    fd = (feat.dKuf_dx(kind, p, x + h) - feat.dKuf_dx(kind, p, x - h)) / (2 * h)
    d2 = feat.dKuf_dx2(kind, p, x)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(fd), atol=1e-4, rtol=1e-4)
    base = AxisFeature.dKuf_dx2(feat, kind, p, x)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(base), rtol=1e-9, atol=1e-12)


def test_eval_path_deriv_matches_ad():
    from vggp_tpu import sampling

    spec, params = _svgp_2d("full", kinds=("matern52", "rbf"))
    omegas, phases, amp = sampling.prior_paths(jax.random.PRNGKey(3), spec,
                                               params, 64)
    x0 = jnp.asarray([0.33, 0.71])

    def path_at(x):
        return sampling.eval_path(omegas, phases, amp, x[None, :])[0]

    H = jax.hessian(path_at)(x0)
    g = jax.grad(path_at)(x0)
    for orders, want in [((1, 0), g[0]), ((0, 1), g[1]),
                         ((2, 0), H[0, 0]), ((1, 1), H[0, 1]),
                         ((0, 2), H[1, 1])]:
        got = sampling.eval_path_deriv(omegas, phases, amp, x0[None, :], orders)[0]
        assert float(got) == pytest.approx(float(want), rel=1e-9, abs=1e-12)


def test_pathwise_second_derivs_match_fd_of_grad_rows():
    """Rows of one joint draw are derivatives of one function: the (2,0) row
    must equal the x-FD of the (1,0) row; the (1,1) row the y-FD of (1,0)."""
    from vggp_tpu import sampling

    spec, params = _svgp_2d("kron", kinds=("matern52", "rbf"))
    h = 1e-5
    base = np.array([0.45, 0.52])
    pts = np.stack([base - [h, 0], base, base + [h, 0],
                    base - [0, h], base + [0, h]])
    draws = sampling.pathwise_posterior_with_grads(
        spec, params, jax.random.PRNGKey(4), jnp.asarray(pts),
        grad_axes=((1, 0), (2, 0), (1, 1)), n_samples=5, n_features=96)
    g10 = np.asarray(draws[:, 1, :])
    g20 = np.asarray(draws[:, 2, :])
    g11 = np.asarray(draws[:, 3, :])
    fd_xx = (g10[:, 2] - g10[:, 0]) / (2 * h)
    fd_xy = (g10[:, 4] - g10[:, 3]) / (2 * h)
    np.testing.assert_allclose(g20[:, 1], fd_xx, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(g11[:, 1], fd_xy, rtol=1e-3, atol=1e-4)


def test_second_deriv_rejects_once_differentiable():
    from vggp_tpu import sampling

    spec, params = _svgp_2d("full", kinds=("matern32", "matern52"))
    with pytest.raises(ValueError, match="twice-differentiable"):
        sampling.pathwise_posterior_with_grads(
            spec, params, jax.random.PRNGKey(0), jnp.asarray([[0.5, 0.5]]),
            grad_axes=((2, 0),), n_samples=2, n_features=32)
    # second derivative on the matern52 axis is fine
    out = sampling.pathwise_posterior_with_grads(
        spec, params, jax.random.PRNGKey(0), jnp.asarray([[0.5, 0.5]]),
        grad_axes=((0, 2),), n_samples=2, n_features=32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sgpr_qdv_from_state_matches_direct():
    spec, params, X, y = _sgpr_2d()
    state = sgpr.precompute(spec, params, X, y)
    g = (CellIntegralFeature.from_lims(3, 0.1, 0.9),
         CellIntegralFeature.from_lims(3, 0.2, 0.8))
    a = sgpr.q_dv(spec, params, X, y, g, axis=0, full_cov=False)
    b = sgpr.q_dv_from_state(spec, params, state, g, axis=0, full_cov=False)
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.var), np.asarray(b.var), rtol=1e-12)


def test_negative_axis_is_canonicalized_everywhere():
    """axis=-1 must mean the LAST axis, never silently select the plain-f
    head (regression: `i == axis` loops over per-axis blocks never matched
    a negative index, returning q_v/posterior relabeled as a gradient)."""
    spec, params = _svgp_2d("full")
    pts = jnp.asarray([[0.22, 0.41], [0.63, 0.58]])
    g_neg = svgp.posterior_grad(spec, params, pts, -1)
    g_pos = svgp.posterior_grad(spec, params, pts, 1)
    np.testing.assert_allclose(np.asarray(g_neg.mean), np.asarray(g_pos.mean), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_neg.variance()),
                               np.asarray(g_pos.variance()), rtol=1e-12)
    # and it must differ from the plain posterior (the old silent failure)
    f = svgp.posterior(spec, params, pts)
    assert not np.allclose(np.asarray(g_neg.mean), np.asarray(f.mean))

    grids = (CellIntegralFeature.from_lims(3, 0.1, 0.9),
             CellIntegralFeature.from_lims(3, 0.2, 0.8))
    v_neg = svgp.q_dv(spec, params, grids, axis=-1)
    v_pos = svgp.q_dv(spec, params, grids, axis=1)
    np.testing.assert_allclose(np.asarray(v_neg.mean), np.asarray(v_pos.mean), rtol=1e-12)

    sspec, sparams, X, y = _sgpr_2d()
    s_neg = sgpr.posterior_grad(sspec, sparams, X, y, pts, -1)
    s_pos = sgpr.posterior_grad(sspec, sparams, X, y, pts, 1)
    np.testing.assert_allclose(np.asarray(s_neg.mean), np.asarray(s_pos.mean), rtol=1e-12)

    from vggp_tpu.models import exact
    espec = exact.ExactGPSpec(kinds=("matern32", "matern52"))
    eparams = {"axes": sparams["axes"], "noise": sparams["noise"]}
    e_neg = exact.posterior_grad(espec, eparams, X, y, pts, -1)
    e_pos = exact.posterior_grad(espec, eparams, X, y, pts, 1)
    np.testing.assert_allclose(np.asarray(e_neg.mean), np.asarray(e_pos.mean), rtol=1e-12)


def test_out_of_range_axis_raises():
    spec, params = _svgp_2d("full")
    pts = jnp.asarray([[0.5, 0.5]])
    with pytest.raises(ValueError, match="out of range"):
        svgp.posterior_grad(spec, params, pts, 2)
    with pytest.raises(ValueError, match="out of range"):
        svgp.posterior_grad(spec, params, pts, -3)
    grids = (CellIntegralFeature.from_lims(3, 0.1, 0.9),
             CellIntegralFeature.from_lims(3, 0.2, 0.8))
    with pytest.raises(ValueError, match="out of range"):
        svgp.q_dv(spec, params, grids, axis=5)
    from vggp_tpu import sampling
    with pytest.raises(ValueError, match="out of range"):
        sampling.pathwise_posterior_with_grads(
            spec, params, jax.random.PRNGKey(0), pts,
            grad_axes=(3,), n_samples=2, n_features=16)
