"""Closed-form Matérn 1/2, 3/2, 5/2 cell integrals vs numerical quadrature.

The 3/2 and 5/2 gridded features are an extension over the reference (which
implements Matérn-1/2 only); validated here against scipy quad/dblquad of
the pointwise kernel.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import integrate

from vggp_tpu import kernels
from vggp_tpu.features import (
    CellIntegralFeature,
    PointFeature,
    _cell_cell_cov,
    _cell_point_cov,
    _m12_cell_cell_cov,
    _m12_cell_point_cov,
)

VAR, LS = 1.3, 0.27
KINDS = ("matern12", "matern32", "matern52", "rbf")


def _k(kind, r):
    return float(kernels.k_r(kind, jnp.asarray(r), VAR, LS))


@pytest.mark.parametrize("kind", KINDS)
def test_cell_point_cov_matches_quad(kind):
    mesh = np.linspace(0.0, 1.0, 6)  # 5 cells, width 0.2 ~ 0.74 ℓ
    xs = np.array([-0.3, 0.0, 0.11, 0.5, 0.999, 1.0, 1.7])
    got = np.asarray(_cell_point_cov(kind, jnp.asarray(mesh), jnp.asarray(xs), VAR, LS))
    for i in range(5):
        for j, x in enumerate(xs):
            want, _ = integrate.quad(lambda t: _k(kind, abs(x - t)), mesh[i], mesh[i + 1])
            assert got[i, j] == pytest.approx(want, rel=1e-8, abs=1e-12), (i, j)


@pytest.mark.parametrize("kind", KINDS)
def test_cell_cell_cov_matches_dblquad(kind):
    mesh_a = np.array([0.0, 0.25, 0.5])
    mesh_b = np.array([-0.1, 0.3, 0.31, 2.0])  # overlapping, tiny, disjoint
    got = np.asarray(_cell_cell_cov(kind, jnp.asarray(mesh_a), jnp.asarray(mesh_b), VAR, LS))
    for i in range(2):
        for j in range(3):
            want, _ = integrate.dblquad(
                lambda s, t: _k(kind, abs(s - t)),
                mesh_a[i], mesh_a[i + 1],
                mesh_b[j], mesh_b[j + 1],
            )
            assert got[i, j] == pytest.approx(want, rel=1e-6, abs=1e-12), (i, j)


def test_generic_matches_m12_specializations():
    mesh = jnp.asarray(np.linspace(0.0, 1.0, 9))
    xs = jnp.asarray(np.linspace(-0.5, 1.5, 31))
    a = _cell_point_cov("matern12", mesh, xs, VAR, LS)
    b = _m12_cell_point_cov(mesh, xs, VAR, LS)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-15)
    mesh2 = jnp.asarray(np.linspace(-0.2, 0.7, 5))
    c = _cell_cell_cov("matern12", mesh, mesh2, VAR, LS)
    d = _m12_cell_cell_cov(mesh, mesh2, VAR, LS)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=1e-10, atol=1e-15)


@pytest.mark.parametrize("kind", KINDS)
def test_gridded_kuu_psd_and_toeplitz(kind):
    feat = CellIntegralFeature.from_lims(16, 0.0, 1.0)
    p = {"variance": jnp.asarray(VAR), "lengthscale": jnp.asarray(LS)}
    kuu = np.asarray(feat.Kuu(kind, p))
    np.testing.assert_allclose(kuu, kuu.T, atol=1e-14)
    assert np.linalg.eigvalsh(kuu).min() > -1e-10
    # equals the dense generic cell/cell Gram
    dense = np.asarray(_cell_cell_cov(kind, feat.mesh_j(p), feat.mesh_j(p), VAR, LS))
    np.testing.assert_allclose(kuu, dense, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("kind", ("matern32", "matern52", "rbf"))
def test_gridded_sgpr_trains_matern_higher_orders(kind):
    """End-to-end: gridded SGPR with Matérn-3/2 / 5/2 features fits data and
    its q(v) tracks quadrature integrals of the truth."""
    import jax
    from vggp_tpu import train
    from vggp_tpu.models import sgpr
    from vggp_tpu.utils import gen_1d, integrate_1d

    f = lambda x: np.sin(3 * x) + 0.5 * np.cos(7 * x)
    X, y = gen_1d(f, 0.0, 1.0, 80)
    y = y + 0.02 * np.random.default_rng(0).standard_normal(80)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    grid = CellIntegralFeature.from_lims(12, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=(kind,), features=(grid,))
    p0 = train.non_informative_init(spec.init_params(jnp.float64), Xj, yj)
    p, hist = train.fit(lambda q: sgpr.loss(spec, q, Xj, yj), p0, 400, 0.05)
    loss = np.asarray(hist["loss"])
    assert np.isfinite(loss).all() and loss[-1] < loss[0]
    qv = sgpr.q_v(spec, p, Xj, yj, (grid,), full_cov=False)
    truth, _ = integrate_1d(f, grid.mesh)
    assert np.abs(np.asarray(qv.mean) - truth).max() < 0.01
    assert np.asarray(qv.var).min() > 0


def test_point_feature_kvu_higher_orders():
    grid = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    feat = PointFeature(4, np.linspace(0.1, 0.9, 4))
    p = {"variance": jnp.asarray(VAR), "lengthscale": jnp.asarray(LS),
         "z": jnp.asarray(np.linspace(0.1, 0.9, 4))}
    for kind in KINDS:
        kvu = np.asarray(feat.Kvu(kind, p, grid))
        assert kvu.shape == (6, 4)
        for i in (0, 3, 5):
            for j in (0, 2):
                want, _ = integrate.quad(
                    lambda t: _k(kind, abs(float(p["z"][j]) - t)),
                    grid.mesh[i], grid.mesh[i + 1])
                assert kvu[i, j] == pytest.approx(want, rel=1e-8)
