"""Additive-structure sparse GP tests (the reference's unwritten family)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import integrate

from vggp_tpu import train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import additive, exact
from vggp_tpu.utils import gen_2d


F1 = lambda a: np.sin(4 * a)
F2 = lambda b: 0.7 * np.cos(3 * b)


def _data(n_side=14, noise=0.02, seed=0):
    f = lambda a, b: F1(a) + F2(b)
    X, y = gen_2d(f, (0, 1), (0, 1), n_side)
    y = y + noise * np.random.default_rng(seed).standard_normal(y.shape)
    return jnp.asarray(X), jnp.asarray(y)


def _spec(m=8, jitter=1e-12):
    return additive.AdditiveSGPRSpec(
        kinds=("matern12", "matern12"),
        features=(CellIntegralFeature.from_lims(m, 0.0, 1.0),
                  CellIntegralFeature.from_lims(m, 0.0, 1.0)),
        jitter=jitter,
    )


def _params(spec, noise=0.01):
    p = spec.init_params(jnp.float64)
    axes = tuple({**a, "variance": jnp.asarray(0.8), "lengthscale": jnp.asarray(0.3)}
                 for a in p["axes"])
    return {"axes": axes, "noise": jnp.asarray(noise)}


def test_additive_elbo_matches_dense():
    X, y = _data()
    spec = _spec()
    p = _params(spec)
    got = float(additive.elbo(spec, p, X, y))
    # dense oracle: blockdiag Kuu, stacked Kuf, additive kff
    g1, g2 = spec.features
    kuu1 = np.asarray(g1.Kuu("matern12", p["axes"][0]))
    kuu2 = np.asarray(g2.Kuu("matern12", p["axes"][1]))
    kuu = np.block([[kuu1, np.zeros((8, 8))], [np.zeros((8, 8)), kuu2]])
    kuf = np.vstack([np.asarray(g1.Kuf("matern12", p["axes"][0], X[:, 0])),
                     np.asarray(g2.Kuf("matern12", p["axes"][1], X[:, 1]))])
    n = X.shape[0]
    noise = float(p["noise"])
    qff = kuf.T @ np.linalg.solve(kuu + 1e-12 * np.eye(16), kuf)
    S = qff + noise * np.eye(n)
    sign, logdet = np.linalg.slogdet(S)
    quad = np.asarray(y) @ np.linalg.solve(S, np.asarray(y))
    logp = -0.5 * (n * np.log(2 * np.pi) + logdet + quad)
    kffsum = n * float(p["axes"][0]["variance"] + p["axes"][1]["variance"])
    want = logp - (kffsum - np.trace(qff)) / (2 * noise)
    assert got == pytest.approx(want, rel=1e-6)


def test_additive_elbo_below_exact_additive_mll():
    """Bound ≤ the exact MLL of the additive-kernel GP."""
    X, y = _data()
    spec = _spec()
    p = _params(spec)
    from vggp_tpu import kernels
    k = (np.asarray(kernels.gram_1d("matern12", X[:, 0], X[:, 0], 0.8, 0.3))
         + np.asarray(kernels.gram_1d("matern12", X[:, 1], X[:, 1], 0.8, 0.3)))
    n = X.shape[0]
    S = k + float(p["noise"]) * np.eye(n)
    sign, logdet = np.linalg.slogdet(S)
    mll = -0.5 * (n * np.log(2 * np.pi) + logdet
                  + np.asarray(y) @ np.linalg.solve(S, np.asarray(y)))
    assert float(additive.elbo(spec, p, X, y)) <= mll + 1e-8


def test_additive_fit_and_gridded_product():
    X, y = _data(n_side=20, noise=0.01)
    spec = _spec(m=10)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p, hist = train.fit(lambda q: additive.loss(spec, q, X, y), p0, 400, 0.05)
    lo = np.asarray(hist["loss"])
    assert np.isfinite(lo).all() and lo[-1] < lo[0]
    grids = (CellIntegralFeature.from_lims(6, 0.0, 1.0),
             CellIntegralFeature.from_lims(6, 0.0, 1.0))
    qv = additive.q_v(spec, p, X, y, grids, full_cov=False)
    assert np.asarray(qv.var).min() > 0
    # truth: ∫∫_cell (f1 + f2) via 1D quads
    mesh = grids[0].mesh
    d = 1.0 / 6
    I1 = np.array([integrate.quad(F1, mesh[i], mesh[i + 1])[0] for i in range(6)])
    I2 = np.array([integrate.quad(F2, mesh[j], mesh[j + 1])[0] for j in range(6)])
    truth = (d * I1)[:, None] + (d * I2)[None, :]
    err = np.abs(np.asarray(qv.mean).reshape(6, 6) - truth).max()
    assert err < 0.01, err


def test_additive_qv_full_cov_matches_oracle():
    """full_cov q(v): prior-limit covariance equals the Kronecker-sum oracle
    built cell-by-cell (the cross-axis blocks are all-ones, not identity)."""
    X, y = _data()
    spec = _spec(m=6)
    p = _params(spec, noise=1e6)  # huge noise → q(v) ≈ prior over v
    grids = (CellIntegralFeature.from_lims(3, 0.0, 1.0),
             CellIntegralFeature.from_lims(3, 0.0, 1.0))
    qv = additive.q_v(spec, p, X, y, grids, full_cov=True)
    from vggp_tpu.features import _cell_cell_cov
    mesh = jnp.asarray(grids[0].mesh)
    K1 = np.asarray(_cell_cell_cov("matern12", mesh, mesh, 0.8, 0.3))
    d = 1.0 / 3
    want = np.zeros((9, 9))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                for l in range(3):
                    want[i * 3 + j, k * 3 + l] = d * d * (K1[i, k] + K1[j, l])
    np.testing.assert_allclose(np.asarray(qv.cov), want, rtol=5e-4, atol=1e-7)
    # diagonal consistent with the var path
    qd = additive.q_v(spec, p, X, y, grids, full_cov=False)
    np.testing.assert_allclose(np.diagonal(np.asarray(qv.cov)), np.asarray(qd.var),
                               rtol=1e-6)


def test_additive_posterior_full_cov_matches_diag():
    X, y = _data()
    spec = _spec(m=6)
    p = _params(spec)
    xs = jnp.asarray(np.stack([np.linspace(0.1, 0.9, 9),
                               np.linspace(0.8, 0.2, 9)], axis=1))
    full = additive.posterior(spec, p, X, y, xs, full_cov=True)
    diag = additive.posterior(spec, p, X, y, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(full.mean), np.asarray(diag.mean), rtol=1e-10)
    np.testing.assert_allclose(np.diagonal(np.asarray(full.cov)),
                               np.asarray(diag.var), rtol=1e-6, atol=1e-12)


def test_additive_prior():
    X, y = _data()
    spec = _spec(m=6)
    p = _params(spec)
    xs = jnp.asarray(np.stack([np.linspace(0.1, 0.9, 7),
                               np.linspace(0.8, 0.2, 7)], axis=1))
    pr = additive.prior(spec, p, xs)
    from vggp_tpu import kernels
    want = (np.asarray(kernels.gram_1d("matern12", xs[:, 0], xs[:, 0], 0.8, 0.3))
            + np.asarray(kernels.gram_1d("matern12", xs[:, 1], xs[:, 1], 0.8, 0.3)))
    np.testing.assert_allclose(np.asarray(pr.cov), want, rtol=1e-10)
    assert np.all(np.asarray(pr.mean) == 0)


def test_additive_qu_matches_dense_oracle():
    """q(u) = N(Kuu Σ⁻¹ Kuf y/σ², Kuu Σ⁻¹ Kuu), Σ = Kuu + Kuf Kufᵀ/σ²."""
    X, y = _data()
    spec = _spec(m=6)
    p = _params(spec)
    qu = additive.q_u(spec, p, X, y)
    g1, g2 = spec.features
    kuu1 = np.asarray(g1.Kuu("matern12", p["axes"][0]))
    kuu2 = np.asarray(g2.Kuu("matern12", p["axes"][1]))
    kuu = np.block([[kuu1, np.zeros((6, 6))], [np.zeros((6, 6)), kuu2]])
    kuf = np.vstack([np.asarray(g1.Kuf("matern12", p["axes"][0], X[:, 0])),
                     np.asarray(g2.Kuf("matern12", p["axes"][1], X[:, 1]))])
    noise = float(p["noise"])
    sigma_mat = kuu + kuf @ kuf.T / noise
    mean = kuu @ np.linalg.solve(sigma_mat, kuf @ np.asarray(y)) / noise
    cov = kuu @ np.linalg.solve(sigma_mat, kuu)
    np.testing.assert_allclose(np.asarray(qu.mean), mean, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qu.cov), cov, rtol=1e-5, atol=1e-10)


def test_additive_p_v_u_matches_dense_oracle():
    """p(v|u): mean equals q_v's, cov = Kvv − Kvu Kuu⁻¹ Kvuᵀ (dense oracle)."""
    X, y = _data()
    spec = _spec(m=6)
    p = _params(spec)
    grids = (CellIntegralFeature.from_lims(3, 0.0, 1.0),
             CellIntegralFeature.from_lims(3, 0.0, 1.0))
    pv = additive.p_v_u(spec, p, X, y, grids)
    qv = additive.q_v(spec, p, X, y, grids, full_cov=True)
    np.testing.assert_allclose(np.asarray(pv.mean), np.asarray(qv.mean), rtol=1e-8)
    g1, g2 = spec.features
    kuu1 = np.asarray(g1.Kuu("matern12", p["axes"][0]))
    kuu2 = np.asarray(g2.Kuu("matern12", p["axes"][1]))
    kuu = np.block([[kuu1, np.zeros((6, 6))], [np.zeros((6, 6)), kuu2]])
    # v_ij = δ₂ V¹_i + δ₁ V²_j over the stacked feature space
    d = 1.0 / 3
    kvu = np.hstack([
        np.repeat(d * _kvu_feat(spec, p, grids, 0), 3, axis=0),
        np.tile(d * _kvu_feat(spec, p, grids, 1), (3, 1)),
    ])
    from vggp_tpu.features import _cell_cell_cov
    mesh = jnp.asarray(grids[0].mesh)
    K1 = np.asarray(_cell_cell_cov("matern12", mesh, mesh, 0.8, 0.3))
    want_kvv = np.zeros((9, 9))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                for l in range(3):
                    want_kvv[i * 3 + j, k * 3 + l] = d * d * (K1[i, k] + K1[j, l])
    want_cov = want_kvv - kvu @ np.linalg.solve(kuu, kvu.T)
    np.testing.assert_allclose(np.asarray(pv.cov), want_cov, rtol=1e-4, atol=1e-8)


def _kvu_feat(spec, p, grids, i):
    """(g_i, m_i) grid-cell × model-feature cross-covariance for axis i."""
    return np.asarray(
        spec.features[i].Kvu(spec.kinds[i], p["axes"][i], grids[i])
    )


def test_additive_posterior_mean_tracks_truth():
    X, y = _data(n_side=20, noise=0.01)
    spec = _spec(m=12)
    p = _params(spec, noise=0.001)
    xs = jnp.asarray(np.stack([np.linspace(0.05, 0.95, 30),
                               np.linspace(0.9, 0.1, 30)], axis=1))
    post = additive.posterior(spec, p, X, y, xs, full_cov=False)
    truth = F1(np.asarray(xs[:, 0])) + F2(np.asarray(xs[:, 1]))
    err = np.abs(np.asarray(post.mean) - truth).max()
    assert err < 0.06, err
    assert np.asarray(post.var).min() > 0
