"""Sum-of-separable-kernels model (models/sum.py): dense oracles, the
single-component == sgpr identity, multi-scale attribution, LMC.

Beyond-reference (the reference has neither sums of kernels nor LMC).
"""

import numpy as np
import pytest
import scipy.linalg as sla
import jax
import jax.numpy as jnp

from vggp_tpu import kernels, train
from vggp_tpu.features import CellIntegralFeature, OutputFeature
from vggp_tpu.models import sgpr
from vggp_tpu.models import sum as msum


def _multiscale_data(n=200, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1, n))
    y = (np.sin(2 * x) + 0.3 * np.sin(25 * x)
         + 0.03 * rng.standard_normal(n))
    return jnp.asarray(x), jnp.asarray(y)


def _two_scale_spec():
    c1 = sgpr.SGPRSpec(kinds=("matern32",),
                       features=(CellIntegralFeature(mesh=np.linspace(0, 1, 7)),))
    c2 = sgpr.SGPRSpec(kinds=("matern32",),
                       features=(CellIntegralFeature(mesh=np.linspace(0, 1, 41)),))
    spec = msum.SumSGPRSpec(components=(c1, c2))
    p = spec.init_params(jnp.float64)
    p["components"][0]["axes"][0]["lengthscale"] = jnp.asarray(0.6)
    p["components"][1]["axes"][0]["lengthscale"] = jnp.asarray(0.04)
    p["components"][1]["axes"][0]["variance"] = jnp.asarray(0.1)
    p["noise"] = jnp.asarray(0.01)
    return spec, p


def test_sum_elbo_matches_blockdiag_dense_oracle():
    X, y = _multiscale_data()
    n = X.shape[0]
    spec, p = _two_scale_spec()
    got = float(msum.elbo(spec, p, X, y))

    mats = []
    kff = np.zeros(n)
    for q, c in enumerate(spec.components):
        ax = p["components"][q]["axes"][0]
        feat = c.features[0]
        mats.append((np.asarray(feat.Kuu("matern32", ax)),
                     np.asarray(feat.Kuf("matern32", ax, X))))
        kff += float(ax["variance"])
    Kuu = sla.block_diag(*[m[0] for m in mats])
    Kuf = np.vstack([m[1] for m in mats])
    noise = float(p["noise"])
    m = Kuu.shape[0]
    L = np.linalg.cholesky(Kuu + 1e-10 * np.eye(m))
    A = np.linalg.solve(L, Kuf) / np.sqrt(noise)
    LB = np.linalg.cholesky(np.eye(m) + A @ A.T)
    cvec = np.linalg.solve(LB, A @ np.asarray(y)) / np.sqrt(noise)
    want = (-0.5 * n * np.log(2 * np.pi * noise) - np.log(np.diag(LB)).sum()
            - 0.5 * np.asarray(y) @ np.asarray(y) / noise + 0.5 * cvec @ cvec
            - (kff.sum() - noise * (A * A).sum()) / (2 * noise))
    assert got == pytest.approx(want, rel=1e-3)


def test_single_component_sum_equals_sgpr():
    X, y = _multiscale_data(n=80)
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 11))
    c = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,))
    spec = msum.SumSGPRSpec(components=(c,))
    ps = spec.init_params(jnp.float64)
    pc = c.init_params(jnp.float64)
    np.testing.assert_allclose(float(msum.elbo(spec, ps, X, y)),
                               float(sgpr.elbo(c, pc, X, y)), rtol=1e-12)
    xs = jnp.linspace(0.0, 1.0, 17)
    gs = msum.posterior(spec, ps, X, y, xs, full_cov=False)
    gc = sgpr.posterior(c, pc, X, y, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(gs.mean), np.asarray(gc.mean),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gs.variance()),
                               np.asarray(gc.variance()), rtol=1e-8)
    qs = msum.q_v(spec, ps, X, y, (feat,))
    qc = sgpr.q_v(c, pc, X, y, (feat,), full_cov=False)
    np.testing.assert_allclose(np.asarray(qs.mean), np.asarray(qc.mean),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(qs.variance()),
                               np.asarray(qc.variance()), rtol=1e-8)


def test_multiscale_fit_attributes_scales_with_frozen_lengthscales():
    X, y = _multiscale_data()
    spec, p = _two_scale_spec()
    mask = dict(jax.tree.map(lambda _: True, p))
    mask["components"] = tuple(
        {"axes": tuple(dict(ax, lengthscale=False) for ax in comp["axes"])}
        for comp in mask["components"])
    pf, hist = train.fit(lambda q: msum.loss(spec, q, X, y), p, 600, 0.03,
                         trainable=lambda _: mask)
    assert float(hist["loss"][-1]) < float(hist["loss"][0])
    # frozen leaves unchanged (up to one constrain∘unconstrain round trip)
    assert float(pf["components"][0]["axes"][0]["lengthscale"]) == pytest.approx(0.6, rel=1e-9)
    assert float(pf["components"][1]["axes"][0]["lengthscale"]) == pytest.approx(0.04, rel=1e-9)
    assert float(pf["noise"]) != 0.01

    st = msum.precompute(spec, pf, X, y)
    xs = np.linspace(0.05, 0.95, 60)
    g = msum.posterior_from_state(spec, pf, st, jnp.asarray(xs))
    g1 = msum.component_posterior(spec, pf, st, jnp.asarray(xs), 0)
    g2 = msum.component_posterior(spec, pf, st, jnp.asarray(xs), 1)
    truth = np.sin(2 * xs) + 0.3 * np.sin(25 * xs)
    assert np.sqrt(np.mean((np.asarray(g.mean) - truth) ** 2)) < 0.05
    assert np.sqrt(np.mean((np.asarray(g1.mean) - np.sin(2 * xs)) ** 2)) < 0.15
    assert np.sqrt(np.mean(
        (np.asarray(g2.mean) - 0.3 * np.sin(25 * xs)) ** 2)) < 0.15
    # component posteriors sum exactly to the total (shared linear algebra)
    np.testing.assert_allclose(
        np.asarray(g1.mean) + np.asarray(g2.mean), np.asarray(g.mean),
        atol=1e-10)
    # gridded product of the SUM field vs analytic integrals
    mesh = np.linspace(0, 1, 11)
    qv = msum.q_v_from_state(spec, pf, st,
                             (CellIntegralFeature(mesh=mesh),))
    a, b = mesh[:-1], mesh[1:]
    tv = ((np.cos(2 * a) - np.cos(2 * b)) / 2
          + 0.3 * (np.cos(25 * a) - np.cos(25 * b)) / 25)
    assert np.abs(np.asarray(qv.mean) - tv).max() < 0.01
    assert (np.asarray(qv.variance()) > 0).all()


def test_lmc_elbo_matches_dense_oracle():
    """Two ICM components (different B_q, different lengthscales):
    cov = Σ_q B_q ⊗ K_q — the full LMC. Dense blockdiag oracle."""
    rng = np.random.default_rng(2)
    n = 90
    x = np.sort(rng.uniform(0, 1, n))
    task = rng.integers(0, 2, n)
    X = jnp.asarray(np.stack([x, task.astype(float)], 1))
    y = jnp.asarray(np.sin(5 * x) * (1 - 0.5 * task)
                    + 0.05 * rng.standard_normal(n))
    feat1 = CellIntegralFeature(mesh=np.linspace(0, 1, 7))
    feat2 = CellIntegralFeature(mesh=np.linspace(0, 1, 13))
    out = OutputFeature(2)
    c1 = sgpr.SGPRSpec(kinds=("matern12", "coregion"), features=(feat1, out))
    c2 = sgpr.SGPRSpec(kinds=("matern32", "coregion"), features=(feat2, out))
    spec = msum.SumSGPRSpec(components=(c1, c2))
    p = spec.init_params(jnp.float64)
    p["components"][1]["axes"][0]["lengthscale"] = jnp.asarray(0.15)
    got = float(msum.elbo(spec, p, X, y))

    blocks_uu, blocks_uf = [], []
    kff = np.zeros(n)
    for q, (c, feat, kind) in enumerate(
            ((c1, feat1, "matern12"), (c2, feat2, "matern32"))):
        ax = p["components"][q]["axes"]
        Ku1 = np.asarray(feat.Kuu(kind, ax[0]))
        Kf1 = np.asarray(feat.Kuf(kind, ax[0], X[:, 0]))
        B = np.asarray(kernels.coregion_b(ax[1]))
        blocks_uu.append(np.kron(Ku1, B))
        blocks_uf.append(
            np.einsum("an,bn->abn", Kf1, B[:, task]).reshape(-1, n))
        kff += float(ax[0]["variance"]) * B[task, task]
    Kuu = sla.block_diag(*blocks_uu)
    Kuf = np.vstack(blocks_uf)
    noise = float(p["noise"])
    m = Kuu.shape[0]
    L = np.linalg.cholesky(Kuu + 1e-10 * np.eye(m))
    A = np.linalg.solve(L, Kuf) / np.sqrt(noise)
    LB = np.linalg.cholesky(np.eye(m) + A @ A.T)
    cvec = np.linalg.solve(LB, A @ np.asarray(y)) / np.sqrt(noise)
    want = (-0.5 * n * np.log(2 * np.pi * noise) - np.log(np.diag(LB)).sum()
            - 0.5 * np.asarray(y) @ np.asarray(y) / noise + 0.5 * cvec @ cvec
            - (kff.sum() - noise * (A * A).sum()) / (2 * noise))
    assert got == pytest.approx(want, rel=1e-3)

    # LMC fit runs and produces a finite per-output gridded product
    pf, hist = train.fit(lambda q: msum.loss(spec, q, X, y), p, 150, 0.05)
    assert float(hist["loss"][-1]) < float(hist["loss"][0])
    qv = msum.q_v(spec, pf, X, y,
                  (CellIntegralFeature(mesh=np.linspace(0, 1, 7)), out))
    assert np.isfinite(np.asarray(qv.mean)).all()
    assert (np.asarray(qv.variance()) > 0).all()


def test_sum_spec_validation():
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 5))
    out = OutputFeature(2)
    c1d = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,))
    c2d = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=(feat, feat))
    with pytest.raises(ValueError):
        msum.SumSGPRSpec(components=(c1d, c2d))
    cco = sgpr.SGPRSpec(kinds=("coregion", "matern12"), features=(out, feat))
    coc = sgpr.SGPRSpec(kinds=("matern12", "coregion"), features=(feat, out))
    with pytest.raises(ValueError):
        msum.SumSGPRSpec(components=(cco, coc))
    with pytest.raises(ValueError):
        msum.SumSGPRSpec(components=())


def test_sum_per_output_noise_and_mean():
    rng = np.random.default_rng(3)
    n = 100
    x = np.sort(rng.uniform(0, 1, n))
    task = rng.integers(0, 2, n)
    X = jnp.asarray(np.stack([x, task.astype(float)], 1))
    f = np.sin(5 * x)
    y = jnp.asarray(np.where(task == 0, f + 1.0, 0.7 * f - 1.0)
                    + np.where(task == 0, 0.02, 0.2)
                    * rng.standard_normal(n))
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 11))
    out = OutputFeature(2)
    c = sgpr.SGPRSpec(kinds=("matern32", "coregion"), features=(feat, out))
    spec = msum.SumSGPRSpec(components=(c,), per_output_noise=True,
                            learn_mean=True)
    p = spec.init_params(jnp.float64)
    assert p["noise"].shape == (2,) and p["mean"].shape == (2,)
    pf, hist = train.fit(lambda q: msum.loss(spec, q, X, y), p, 400, 0.05)
    assert float(hist["loss"][-1]) < float(hist["loss"][0])
    sd = np.sqrt(np.asarray(pf["noise"]))
    assert sd[0] < sd[1]  # per-mission noise ordering recovered
    mdiff = float(pf["mean"][0] - pf["mean"][1])
    assert mdiff == pytest.approx(2.0 + 0.3 * 0.137, abs=0.4)


def test_sum_pathwise_sampler_matches_posterior_moments():
    from vggp_tpu import sampling

    X, y = _multiscale_data(n=120)
    spec, p = _two_scale_spec()
    pf, _ = train.fit(lambda q: msum.loss(spec, q, X, y), p, 300, 0.05)
    xs = jnp.linspace(0.05, 0.95, 20)
    draws = sampling.pathwise(spec, pf, jax.random.PRNGKey(0), xs,
                              data=(X, y), n_samples=512, n_features=1024)
    st = msum.precompute(spec, pf, X, y)
    g = msum.posterior_from_state(spec, pf, st, xs)
    sd = float(np.sqrt(np.asarray(g.variance()).max()))
    assert np.abs(np.asarray(draws).mean(0) - np.asarray(g.mean)).max() < 0.3 * sd
    rel = (np.abs(np.asarray(draws).var(0) - np.asarray(g.variance())).max()
           / np.asarray(g.variance()).max())
    assert rel < 0.3  # MC tolerance at S=512


def test_single_component_sum_heads_equal_sgpr():
    """Round-3 heads (p_v_u / q_dv / posterior_grad) on a one-component sum
    must reduce exactly to the plain SGPR heads."""
    X, y = _multiscale_data(n=80)
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 11))
    grids = (CellIntegralFeature(mesh=np.linspace(0.0, 1.0, 7)),)
    c = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,))
    spec = msum.SumSGPRSpec(components=(c,))
    ps = spec.init_params(jnp.float64)
    pc = c.init_params(jnp.float64)

    pv_s = msum.p_v_u(spec, ps, X, y, grids)
    pv_c = sgpr.p_v_u(c, pc, X, y, grids)
    np.testing.assert_allclose(np.asarray(pv_s.mean), np.asarray(pv_c.mean),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(pv_s.cov), np.asarray(pv_c.cov),
                               rtol=1e-8, atol=1e-12)

    qd_s = msum.q_dv(spec, ps, X, y, grids, axis=0)
    qd_c = sgpr.q_dv(c, pc, X, y, grids, axis=0, full_cov=False)
    np.testing.assert_allclose(np.asarray(qd_s.mean), np.asarray(qd_c.mean),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(qd_s.variance()),
                               np.asarray(qd_c.variance()), rtol=1e-8)

    xs = jnp.linspace(0.05, 0.95, 13)
    pg_s = msum.posterior_grad(spec, ps, X, y, xs, axis=0)
    pg_c = sgpr.posterior_grad(c, pc, X, y, xs, axis=0, full_cov=False)
    np.testing.assert_allclose(np.asarray(pg_s.mean), np.asarray(pg_c.mean),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(pg_s.variance()),
                               np.asarray(pg_c.variance()), rtol=1e-8)


def test_two_component_grad_heads_consistent():
    """q_dv of a two-scale sum: mean equals the face difference of the
    component-summed posterior CDF-like integral — checked against the
    q_v face-difference identity Σ_cell q_dv == f-integral differences, and
    posterior_grad against a central finite difference of posterior mean."""
    X, y = _multiscale_data(n=150)
    spec, p = _two_scale_spec()
    grids = (CellIntegralFeature(mesh=np.linspace(0.0, 1.0, 9)),)

    qd = msum.q_dv(spec, p, X, y, grids, axis=0)
    assert np.asarray(qd.variance()).min() > 0
    # FTC identity: ∫_cell f' = f(β) − f(α) at the posterior mean
    mesh = np.linspace(0.0, 1.0, 9)
    mpost = msum.posterior(spec, p, X, y, jnp.asarray(mesh), full_cov=False)
    want = np.diff(np.asarray(mpost.mean))
    np.testing.assert_allclose(np.asarray(qd.mean), want, rtol=1e-6, atol=1e-10)

    xs = jnp.linspace(0.1, 0.9, 9)
    pg = msum.posterior_grad(spec, p, X, y, xs, axis=0)
    eps = 1e-4
    mp = np.asarray(msum.posterior(spec, p, X, y, xs + eps, full_cov=False).mean)
    mm = np.asarray(msum.posterior(spec, p, X, y, xs - eps, full_cov=False).mean)
    np.testing.assert_allclose(np.asarray(pg.mean), (mp - mm) / (2 * eps),
                               rtol=1e-3, atol=1e-6)
    assert np.asarray(pg.variance()).min() > 0
