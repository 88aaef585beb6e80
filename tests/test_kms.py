"""Closed-form inverse-Cholesky of the Matérn-1/2 cell Kuu (ops/kms.py).

Oracle strategy (SURVEY.md §4): the structured factorization is checked
against dense float64 chol + triangular solve of the identical jittered
Gram, across the full lengthscale regime (δ/ℓ from 1e-4 to 10), plus an
f32-accuracy test showing it BEATS dense f32 chol against the f64 truth
(the property that makes it safe to enable by default).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggp_tpu import config
from vggp_tpu.features import CellIntegralFeature, _m12_toeplitz_first_row
from vggp_tpu.ops import toeplitz
from vggp_tpu.ops.kms import m12_cell_inv_chol
from vggp_tpu.ops.stablemath import sinhmx

REL = 1e-4


def _dense_finv(m, delta, l, var, dtype):
    row = _m12_toeplitz_first_row(m, jnp.asarray(delta, dtype),
                                  jnp.asarray(var, dtype),
                                  jnp.asarray(l, dtype), dtype)
    K = toeplitz.sym_toeplitz_dense(row)
    Kj = K + jnp.mean(jnp.diagonal(K)) * REL * jnp.eye(m, dtype=dtype)
    F = jnp.linalg.cholesky(Kj)
    finv = jax.scipy.linalg.solve_triangular(
        F, jnp.eye(m, dtype=dtype), lower=True)
    return finv, Kj


def test_sinhmx_matches_mpmath_style_reference():
    xs = np.array([1e-8, 1e-4, 0.01, 0.3, 0.9999, 1.0001, 2.0, 10.0])
    got = np.asarray(sinhmx(jnp.asarray(xs, jnp.float64)))
    # f64 sinh(x) − x is itself cancellation-limited below x ≈ 0.1;
    # use the (rapidly converging) series as the oracle there.
    want = np.sinh(xs) - xs
    tiny = xs < 0.1
    t = xs[tiny]
    want[tiny] = t ** 3 / 6 * (1 + t * t / 20 * (1 + t * t / 42))
    assert np.max(np.abs(got - want) / want) < 1e-13


@pytest.mark.parametrize("m,l", [
    (1, 0.5), (2, 0.5), (3, 1.0), (8, 0.3), (64, 0.3),
    (512, 0.3), (512, 3.0), (512, 0.01), (512, 0.001),
    (512, 30.0), (512, 0.0002), (512, 100.0),
])
def test_closed_form_finv_matches_dense_f64(m, l):
    delta = 1.0 / m
    ref, Kj = _dense_finv(m, delta, l, 1.3, jnp.float64)
    got = m12_cell_inv_chol(m, jnp.asarray(delta, jnp.float64),
                            jnp.asarray(1.3, jnp.float64),
                            jnp.asarray(l, jnp.float64), REL)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-10
    recon = got @ Kj @ got.T - jnp.eye(m, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(recon))) < 1e-10


@pytest.mark.parametrize("l", [0.3, 3.0, 30.0, 100.0])
def test_f32_closed_form_beats_dense_chol(l):
    """Against the f64 truth, the f32 closed form stays ~1e-6 while f32
    dense chol+trisolve degrades to 1e-4..1e-2 at long lengthscales — the
    property that justifies STRUCTURED_FINV defaulting on."""
    m, delta = 512, 1.0 / 512
    truth, _ = _dense_finv(m, delta, l, 1.3, jnp.float64)
    dense32, _ = _dense_finv(m, delta, l, 1.3, jnp.float32)
    cf32 = m12_cell_inv_chol(m, jnp.asarray(delta, jnp.float32),
                             jnp.asarray(1.3, jnp.float32),
                             jnp.asarray(l, jnp.float32), REL)
    scale = float(jnp.max(jnp.abs(truth)))
    e_cf = float(jnp.max(jnp.abs(cf32.astype(jnp.float64) - truth))) / scale
    e_dense = float(jnp.max(jnp.abs(dense32.astype(jnp.float64) - truth))) / scale
    assert e_cf < 5e-6, e_cf
    assert e_cf <= e_dense + 1e-7, (e_cf, e_dense)


def test_feature_hook_dispatch():
    feat = CellIntegralFeature.from_lims(32, 0.0, 1.0)
    p = {"lengthscale": jnp.asarray(0.3), "variance": jnp.asarray(1.2)}
    assert feat.inv_chol_kuu("matern32", p, REL) is None
    fi = feat.inv_chol_kuu("matern12", p, REL)
    assert fi.shape == (32, 32)
    assert np.allclose(np.triu(np.asarray(fi), 1), 0.0)


def test_structured_finv_elbo_equivalence():
    """svgp.loss with STRUCTURED_FINV on vs off agrees to f64 rounding."""
    from vggp_tpu.models import svgp

    g1 = CellIntegralFeature.from_lims(24, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(16, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                         num_data=500, variational="kron")
    params = spec.init_params(jnp.float64)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((64, 2)))
    yb = jnp.asarray(rng.standard_normal(64))

    prev = config.STRUCTURED_FINV
    try:
        config.STRUCTURED_FINV = True
        lo = float(svgp.loss(spec, params, xb, yb))
        go = jax.grad(lambda q: svgp.loss(spec, q, xb, yb))(params)
        config.STRUCTURED_FINV = False
        lf = float(svgp.loss(spec, params, xb, yb))
        gf = jax.grad(lambda q: svgp.loss(spec, q, xb, yb))(params)
    finally:
        config.STRUCTURED_FINV = prev
    assert abs(lo - lf) / abs(lf) < 1e-9
    for a, b in zip(jax.tree_util.tree_leaves(go), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("l", [0.01, 0.3, 2.0, 30.0])
def test_banded_apply_matches_dense(l):
    """The block-banded whiten apply equals the dense matmul to rounding:
    the discarded entries decay like q^65 ≤ 1e-34."""
    from vggp_tpu.ops.kms import (banded_whiten_apply, m12_geometric_ratio,
                                  m12_cell_inv_chol)

    m, n = 256, 96
    delta = 1.0 / m
    finv = m12_cell_inv_chol(m, jnp.asarray(delta, jnp.float64),
                             jnp.asarray(1.3, jnp.float64),
                             jnp.asarray(l, jnp.float64), 1e-6)
    q = m12_geometric_ratio(jnp.asarray(delta, jnp.float64),
                            jnp.asarray(l, jnp.float64), 1e-6)
    assert float(q) < 0.5, float(q)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((m, n)))
    dense = finv @ B
    banded = banded_whiten_apply(finv, B, q, "highest")
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=1e-10, atol=1e-12 * float(jnp.abs(dense).max()))


def test_banded_apply_dense_fallback_for_large_ratio():
    from vggp_tpu.ops.kms import banded_whiten_apply

    rng = np.random.default_rng(1)
    F = jnp.asarray(np.tril(rng.standard_normal((256, 256))))  # NOT banded
    B = jnp.asarray(rng.standard_normal((256, 16)))
    out = banded_whiten_apply(F, B, jnp.asarray(0.95), "highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(F @ B), rtol=1e-12)


def test_banded_apply_elbo_equivalence():
    """svgp.loss with BANDED_WHITEN_APPLY on vs off agrees to rounding."""
    from vggp_tpu.models import svgp

    g1 = CellIntegralFeature.from_lims(128, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(128, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                         num_data=500, variational="kron")
    params = spec.init_params(jnp.float64)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((64, 2)))
    yb = jnp.asarray(rng.standard_normal(64))

    prev = config.BANDED_WHITEN_APPLY
    try:
        config.BANDED_WHITEN_APPLY = True
        lo = float(svgp.loss(spec, params, xb, yb))
        go = jax.grad(lambda q: svgp.loss(spec, q, xb, yb))(params)
        config.BANDED_WHITEN_APPLY = False
        lf = float(svgp.loss(spec, params, xb, yb))
        gf = jax.grad(lambda q: svgp.loss(spec, q, xb, yb))(params)
    finally:
        config.BANDED_WHITEN_APPLY = prev
    assert abs(lo - lf) / abs(lf) < 1e-10
    for a, b in zip(jax.tree_util.tree_leaves(go), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7,
                                   atol=1e-10)


@pytest.mark.parametrize("u", [15.0, 20.0, 100.0, 800.0])
def test_extreme_delta_over_ell_no_nan_and_accurate(u):
    """Review-found failure modes: (a) η/ρ overflow/underflow NaN'd the
    factor past δ/ℓ ≈ 88; (b) the series form of ρ lost all relative
    precision past δ/ℓ ≈ 15, costing 5 orders of magnitude on the
    whitening identity at δ/ℓ = 20 in f32."""
    m = 64
    delta = 1.0
    l = delta / u
    for dtype, tol in [(jnp.float32, 5e-5), (jnp.float64, 1e-10)]:
        finv = m12_cell_inv_chol(m, jnp.asarray(delta, dtype),
                                 jnp.asarray(1.3, dtype),
                                 jnp.asarray(l, dtype), 1e-6)
        assert bool(jnp.all(jnp.isfinite(finv))), (u, dtype)
        row = _m12_toeplitz_first_row(m, jnp.asarray(delta, jnp.float64),
                                      jnp.asarray(1.3, jnp.float64),
                                      jnp.asarray(l, jnp.float64), jnp.float64)
        K = toeplitz.sym_toeplitz_dense(row)
        K = K + row[0] * 1e-6 * jnp.eye(m, dtype=jnp.float64)
        f64 = jnp.asarray(finv, jnp.float64)
        ident = f64 @ K @ f64.T - jnp.eye(m, dtype=jnp.float64)
        assert float(jnp.max(jnp.abs(ident))) < tol, (u, dtype, float(jnp.max(jnp.abs(ident))))


def test_m12_row_no_overflow_at_extreme_delta_over_ell():
    """The expm1(δ/ℓ)² row form NaN'd (inf·0) past δ/ℓ ≈ 88; the
    (1−e^{−δ/ℓ})² e^{−(k−1)δ/ℓ} form is bounded everywhere."""
    for dtype in (jnp.float32, jnp.float64):
        row = _m12_toeplitz_first_row(64, jnp.asarray(1.0, dtype),
                                      jnp.asarray(1.0, dtype),
                                      jnp.asarray(0.005, dtype), dtype)
        assert bool(jnp.all(jnp.isfinite(row)))


def test_m32_m52_rows_no_overflow_at_extreme_delta_over_ell():
    from vggp_tpu.features import _cell_toeplitz_first_row

    for kind in ("matern32", "matern52"):
        for dtype in (jnp.float32, jnp.float64):
            row = _cell_toeplitz_first_row(kind, 64, jnp.asarray(1.0, dtype),
                                           jnp.asarray(1.0, dtype),
                                           jnp.asarray(0.005, dtype), dtype)
            assert bool(jnp.all(jnp.isfinite(row))), (kind, dtype)
