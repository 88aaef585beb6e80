"""Standalone basis API tests (reference src/basis/ semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vggp_tpu.basis import (
    B0SplineBasis,
    B1SplineBasis,
    FourierBasis,
    FourierBasisMatern12,
    FourierBasisMatern32,
    FourierBasisMatern52,
)


def test_b0_partition_of_unity():
    basis = B0SplineBasis(0.0, 1.0, 7)
    x = jnp.linspace(0.0, 1.0, 101)
    phi = basis(x)
    assert phi.shape == (7, 101)
    np.testing.assert_allclose(np.asarray(phi).sum(axis=0), 1.0)
    # indicators: values in {0, 1}, one active cell per point
    assert set(np.unique(np.asarray(phi))) <= {0.0, 1.0}


def test_b1_partition_of_unity_and_peaks():
    m = 9
    basis = B1SplineBasis(0.0, 1.0, m)
    x = jnp.linspace(0.0, 1.0, 101)
    phi = np.asarray(basis(x))
    assert phi.shape == (m, 101)
    np.testing.assert_allclose(phi.sum(axis=0), 1.0, atol=1e-12)
    # each hat peaks at its knot
    knots = basis.mesh
    phik = np.asarray(basis(jnp.asarray(knots)))
    np.testing.assert_allclose(phik, np.eye(m), atol=1e-12)


def test_fourier_basis_inside_domain():
    M, a, b = 3, 0.0, 2.0
    basis = FourierBasis(M, a, b)
    x = jnp.linspace(0.1, 1.9, 50)
    phi = np.asarray(basis(x))
    assert phi.shape == (2 * M + 1, 50)
    om = 2 * np.pi * np.arange(M + 1) / (b - a)
    np.testing.assert_allclose(phi[0], 1.0, atol=1e-12)
    np.testing.assert_allclose(phi[1], np.cos(om[1] * np.asarray(x)), atol=1e-12)
    np.testing.assert_allclose(phi[M + 1], np.sin(om[1] * np.asarray(x)), atol=1e-12)


@pytest.mark.parametrize("maker", [FourierBasisMatern12, FourierBasisMatern32,
                                   FourierBasisMatern52])
def test_fourier_basis_continuous_at_boundary(maker):
    """The Matérn continuation must match the interior value at the domain
    edges (the reference's Matérn-5/2 formula is discontinuous — a typo not
    replicated; see features.py docstring)."""
    basis = maker(3, 0.0, 1.0, lengthscale=0.4)
    eps = 1e-6
    inside = np.asarray(basis(jnp.asarray([0.0 + eps, 1.0 - eps])))
    outside = np.asarray(basis(jnp.asarray([0.0 - eps, 1.0 + eps])))
    np.testing.assert_allclose(inside, outside, atol=1e-4)
    if maker is not FourierBasisMatern12:
        # C¹ (mean-square differentiable orders): the one-sided slopes of the
        # sin features must agree through each edge (regression: the sign of
        # the outside continuation was flipped, leaving a derivative kink)
        for edge in (0.0, 1.0):
            lo = np.asarray(basis(jnp.asarray([edge - 2 * eps, edge - eps])))
            hi = np.asarray(basis(jnp.asarray([edge + eps, edge + 2 * eps])))
            slope_out = (lo[:, 1] - lo[:, 0]) / eps if edge == 0.0 else (hi[:, 1] - hi[:, 0]) / eps
            slope_in = (hi[:, 1] - hi[:, 0]) / eps if edge == 0.0 else (lo[:, 1] - lo[:, 0]) / eps
            # atol covers the O(ω²ε) curvature term picked up by the finite
            # difference (features are C¹, not C²); the regression this
            # guards against was a slope flip of size 2ω ≈ 12.6
            np.testing.assert_allclose(slope_out, slope_in, rtol=1e-3, atol=5e-3)
