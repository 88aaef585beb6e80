"""Free-inducing-point sparse GP (the reference's nb61 Z-sweep model)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vggp_tpu import kernels, train
from vggp_tpu.features import CellIntegralFeature, _cell_point_cov
from vggp_tpu.models import exact, freesvgp
from vggp_tpu.utils import gen_2d


def _data(n_side=14, noise=0.02, seed=0):
    f = lambda a, b: np.sin(4 * a) * np.cos(3 * b)
    X, y = gen_2d(f, (0, 1), (0, 1), n_side)
    y = np.asarray(y) + noise * np.random.default_rng(seed).standard_normal(np.asarray(y).shape)
    return jnp.asarray(X), jnp.asarray(y)


def _spec_params(m=12, noise=0.01, seed=3):
    spec = freesvgp.FreeSVGPSpec(kinds=("matern12", "matern12"), m=m, jitter=1e-12)
    p = spec.init_params(jnp.float64, seed=seed)
    axes = tuple({**a, "variance": jnp.asarray(0.9), "lengthscale": jnp.asarray(0.35)}
                 for a in p["axes"])
    return spec, {"axes": axes, "z": p["z"], "noise": jnp.asarray(noise)}


def _dense_mats(spec, p, X):
    z = np.asarray(p["z"])
    Xn = np.asarray(X)
    def had(z1, z2):
        out = np.ones((z1.shape[0], z2.shape[0]))
        for d in range(2):
            out = out * np.asarray(kernels.gram_1d(
                "matern12", jnp.asarray(z1[:, d]), jnp.asarray(z2[:, d]), 0.9, 0.35))
        return out
    return had(z, z), had(z, Xn)


def test_elbo_matches_dense_oracle():
    X, y = _data()
    spec, p = _spec_params()
    got = float(freesvgp.elbo(spec, p, X, y))
    kuu, kuf = _dense_mats(spec, p, X)
    n = X.shape[0]
    noise = float(p["noise"])
    qff = kuf.T @ np.linalg.solve(kuu + 1e-12 * np.eye(spec.m), kuf)
    S = qff + noise * np.eye(n)
    sign, logdet = np.linalg.slogdet(S)
    logp = -0.5 * (n * np.log(2 * np.pi) + logdet
                   + np.asarray(y) @ np.linalg.solve(S, np.asarray(y)))
    kffsum = n * 0.9 * 0.9
    want = logp - (kffsum - np.trace(qff)) / (2 * noise)
    assert got == pytest.approx(want, rel=1e-6)


def test_elbo_below_exact_mll():
    X, y = _data()
    spec, p = _spec_params()
    spec_e = exact.ExactGPSpec(kinds=("matern12", "matern12"))
    pe = {"axes": p["axes"], "noise": p["noise"]}
    assert float(freesvgp.elbo(spec, p, X, y)) <= float(exact.mll(spec_e, pe, X, y)) + 1e-8


def test_qv_matches_dense_oracle():
    X, y = _data()
    spec, p = _spec_params(m=10)
    grids = (CellIntegralFeature.from_lims(4, 0.0, 1.0),
             CellIntegralFeature.from_lims(4, 0.0, 1.0))
    qv = freesvgp.q_v(spec, p, X, y, grids, full_cov=True)

    kuu, kuf = _dense_mats(spec, p, X)
    z = np.asarray(p["z"])
    c1 = np.asarray(_cell_point_cov("matern12", jnp.asarray(grids[0].mesh),
                                    jnp.asarray(z[:, 0]), 0.9, 0.35))
    c2 = np.asarray(_cell_point_cov("matern12", jnp.asarray(grids[1].mesh),
                                    jnp.asarray(z[:, 1]), 0.9, 0.35))
    kvu = np.concatenate([c1[i][None, :] * c2 for i in range(4)], axis=0)  # (16, m)
    from vggp_tpu.features import _cell_cell_cov
    mesh = jnp.asarray(grids[0].mesh)
    K1 = np.asarray(_cell_cell_cov("matern12", mesh, mesh, 0.9, 0.35))
    kvv = np.kron(K1, K1)
    noise = float(p["noise"])
    sigma_mat = kuu + kuf @ kuf.T / noise
    mean = kvu @ np.linalg.solve(sigma_mat, kuf @ np.asarray(y)) / noise
    cov = (kvv - kvu @ np.linalg.solve(kuu + 1e-12 * np.eye(spec.m), kvu.T)
           + kvu @ np.linalg.solve(sigma_mat, kvu.T))
    np.testing.assert_allclose(np.asarray(qv.mean), mean, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qv.cov), cov, rtol=2e-4, atol=1e-9)
    qd = freesvgp.q_v(spec, p, X, y, grids, full_cov=False)
    np.testing.assert_allclose(np.diagonal(np.asarray(qv.cov)), np.asarray(qd.var),
                               rtol=1e-6, atol=1e-12)


def test_fit_trains_z_and_converges():
    X, y = _data(n_side=18)
    spec = freesvgp.FreeSVGPSpec(kinds=("matern12", "matern12"), m=20)
    p0 = train.non_informative_init(spec.init_params(jnp.float64, seed=1), X, y)
    z0 = np.asarray(p0["z"]).copy()
    p, hist = train.fit(lambda q: freesvgp.loss(spec, q, X, y), p0, 300, 0.05)
    lo = np.asarray(hist["loss"])
    assert np.isfinite(lo).all() and lo[-1] < lo[0]
    assert np.abs(np.asarray(p["z"]) - z0).max() > 1e-3  # Z is learnable
    post = freesvgp.posterior(spec, p, X, y, X, full_cov=False)
    assert np.asarray(post.var).min() > 0


def test_prior_q_u_p_v_u_match_dense_oracle():
    """The round-3 heads (q_u / p_v_u / prior — reference
    gridded_kronecker_structure.py:396-419) against dense f64 algebra."""
    X, y = _data()
    spec, p = _spec_params(m=10)
    kuu, kuf = _dense_mats(spec, p, X)
    noise = float(p["noise"])

    # prior at arbitrary points = the separable product Gram
    xs = jnp.asarray(np.random.default_rng(5).random((7, 2)))
    pr = freesvgp.prior(spec, p, xs)
    z = np.asarray(p["z"])

    def had(z1, z2):
        out = np.ones((z1.shape[0], z2.shape[0]))
        for d in range(2):
            out = out * np.asarray(kernels.gram_1d(
                "matern12", jnp.asarray(z1[:, d]), jnp.asarray(z2[:, d]), 0.9, 0.35))
        return out

    np.testing.assert_allclose(np.asarray(pr.cov), had(np.asarray(xs), np.asarray(xs)),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pr.mean), 0.0)

    # q(u): mean = Kuu Σ⁻¹ Kuf y / σ², cov = Kuu Σ⁻¹ Kuu
    sigma_mat = kuu + kuf @ kuf.T / noise
    qu = freesvgp.q_u(spec, p, X, y)
    mean = kuu @ np.linalg.solve(sigma_mat, kuf @ np.asarray(y)) / noise
    cov = kuu @ np.linalg.solve(sigma_mat, kuu)
    np.testing.assert_allclose(np.asarray(qu.mean), mean, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qu.cov), cov, rtol=1e-5, atol=1e-10)

    # p(v|u): mean = Kvu Kuu⁻¹ m_u, cov = Kvv − Kvu Kuu⁻¹ Kvuᵀ
    grids = (CellIntegralFeature.from_lims(4, 0.0, 1.0),
             CellIntegralFeature.from_lims(4, 0.0, 1.0))
    c1 = np.asarray(_cell_point_cov("matern12", jnp.asarray(grids[0].mesh),
                                    jnp.asarray(z[:, 0]), 0.9, 0.35))
    c2 = np.asarray(_cell_point_cov("matern12", jnp.asarray(grids[1].mesh),
                                    jnp.asarray(z[:, 1]), 0.9, 0.35))
    kvu = np.concatenate([c1[i][None, :] * c2 for i in range(4)], axis=0)
    from vggp_tpu.features import _cell_cell_cov
    mesh = jnp.asarray(grids[0].mesh)
    K1 = np.asarray(_cell_cell_cov("matern12", mesh, mesh, 0.9, 0.35))
    kvv = np.kron(K1, K1)
    pv = freesvgp.p_v_u(spec, p, X, y, grids)
    kuu_j = kuu + 1e-12 * np.eye(spec.m)
    np.testing.assert_allclose(np.asarray(pv.mean),
                               kvu @ np.linalg.solve(kuu_j, mean),
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pv.cov),
                               kvv - kvu @ np.linalg.solve(kuu_j, kvu.T),
                               rtol=2e-4, atol=1e-9)

    # consistency: q_v mean == p_v_u mean; q_v cov − p_v_u cov is PSD
    qv = freesvgp.q_v(spec, p, X, y, grids, full_cov=True)
    np.testing.assert_allclose(np.asarray(qv.mean), np.asarray(pv.mean),
                               rtol=1e-8, atol=1e-12)
    gap = np.asarray(qv.cov) - np.asarray(pv.cov)
    assert np.linalg.eigvalsh(0.5 * (gap + gap.T)).min() > -1e-9
