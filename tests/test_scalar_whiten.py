"""Scalar-tangent whitening VJP vs reverse-mode through the factor chain.

``common.whitened_kuf_scalar`` replaces the Cholesky/triangular-inverse
backward with two precomputed tangents (∂a/∂ℓ via the Cholesky differential,
∂a/∂v = a/(2v) from the exact √v scaling law). These tests pin, in float64,
that the primal is bit-identical to the legacy path and the gradients agree
to roundoff for EVERY fixed-basis feature family and Matérn order — the
√v law in particular is load-bearing and feature-specific (cell/point Kuu
scale as v, VFF/spline-RKHS Kuu as 1/v).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggp_tpu import config
from vggp_tpu.features import (
    B1SplineFeature,
    CellIntegralFeature,
    FourierFeature,
    PointFeature,
    SplineRKHSFeature,
)
from vggp_tpu.models import common, svgp


def _axis_cases():
    cell = CellIntegralFeature.from_lims(12, 0.0, 1.0)
    return [
        ("cell-m12", cell, "matern12"),
        ("cell-m32", cell, "matern32"),
        ("cell-m52", cell, "matern52"),
        ("vff-m12", FourierFeature(n_frequencies=5, a=-0.2, b=1.2), "matern12"),
        ("vff-m32", FourierFeature(n_frequencies=5, a=-0.2, b=1.2), "matern32"),
        ("vff-m52", FourierFeature(n_frequencies=5, a=-0.2, b=1.2), "matern52"),
        ("b1-m12", B1SplineFeature(np.linspace(0.0, 1.0, 9)), "matern12"),
        ("b2-m32", SplineRKHSFeature(degree=2, n_intervals=7, a=0.0, b=1.0), "matern32"),
        ("b3-m52", SplineRKHSFeature(degree=3, n_intervals=7, a=0.0, b=1.0), "matern52"),
    ]


def _loss_grads(spec, params, x, y, enabled):
    old = config.SCALAR_WHITEN_VJP
    config.SCALAR_WHITEN_VJP = enabled
    try:
        # fresh trace each toggle (the flag is read at trace time)
        val, grads = jax.value_and_grad(lambda p: svgp.loss(spec, p, x, y))(params)
    finally:
        config.SCALAR_WHITEN_VJP = old
    return val, grads


@pytest.mark.parametrize("name,feat,kind", _axis_cases(), ids=[c[0] for c in _axis_cases()])
def test_scalar_whiten_matches_reverse_mode(name, feat, kind, rng):
    spec = svgp.SVGPSpec(kinds=(kind, kind), features=(feat, feat),
                         num_data=64, variational="kron")
    params = spec.init_params(jnp.float64)
    for ax in params["axes"]:
        ax["lengthscale"] = jnp.asarray(0.37, jnp.float64)
        ax["variance"] = jnp.asarray(1.7, jnp.float64)
    x = jnp.asarray(rng.random((24, 2)), jnp.float64)
    y = jnp.asarray(rng.standard_normal(24), jnp.float64)

    v_ref, g_ref = _loss_grads(spec, params, x, y, enabled=False)
    v_new, g_new = _loss_grads(spec, params, x, y, enabled=True)

    assert np.allclose(v_ref, v_new, rtol=0, atol=1e-12), (v_ref, v_new)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_new = jax.tree_util.tree_leaves(g_new)
    for a, b in zip(flat_ref, flat_new):
        scale = max(1e-8, float(np.abs(a).max()))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                                   atol=1e-8 * scale)


@pytest.mark.parametrize("name,feat,kind", _axis_cases(), ids=[c[0] for c in _axis_cases()])
def test_kuf_with_dl_matches_kuf_and_fd(name, feat, kind, rng):
    """Fused (Kuf, ∂Kuf/∂ℓ) hook: value equals Kuf, tangent matches central
    finite differences (the cell-matern12 case exercises the fused Pallas
    kernel's jnp fallback path off-TPU)."""
    p = {"variance": jnp.asarray(1.7, jnp.float64),
         "lengthscale": jnp.asarray(0.37, jnp.float64)}
    x = jnp.asarray(rng.random(33), jnp.float64)
    kuf, dkuf = feat.Kuf_with_dl(kind, p, x)
    np.testing.assert_allclose(np.asarray(kuf), np.asarray(feat.Kuf(kind, p, x)),
                               rtol=1e-12, atol=1e-14)
    h = 1e-6
    up = feat.Kuf(kind, {**p, "lengthscale": p["lengthscale"] + h}, x)
    dn = feat.Kuf(kind, {**p, "lengthscale": p["lengthscale"] - h}, x)
    fd = (np.asarray(up) - np.asarray(dn)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dkuf), fd, rtol=0,
                               atol=1e-6 * max(1e-3, np.abs(fd).max()))


def test_point_features_not_eligible(rng):
    """Learnable-Z specs must fall back to reverse mode (z grads needed)."""
    feat = PointFeature(m=6)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(feat, feat),
                         num_data=32, variational="kron")
    params = spec.init_params(jnp.float64)
    assert not common.scalar_whiten_eligible(spec, params)
    # at the symmetric init (μ=0, S=I) the z-gradient is exactly zero
    # (var_add cancels var_red), so perturb μ first
    params["q"]["mu"] = jnp.asarray(rng.standard_normal(params["q"]["mu"].shape))
    x = jnp.asarray(rng.random((16, 2)), jnp.float64)
    y = jnp.asarray(rng.standard_normal(16), jnp.float64)
    _, grads = jax.value_and_grad(lambda p: svgp.loss(spec, p, x, y))(params)
    assert float(np.abs(np.asarray(grads["axes"][0]["z"])).max()) > 0


def test_full_variational_family_also_covered(rng):
    cell = CellIntegralFeature.from_lims(8, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12",), features=(cell,),
                         num_data=32, variational="full")
    params = spec.init_params(jnp.float64)
    x = jnp.asarray(rng.random((16,)), jnp.float64)
    y = jnp.asarray(rng.standard_normal(16), jnp.float64)
    v_ref, g_ref = _loss_grads(spec, params, x, y, enabled=False)
    v_new, g_new = _loss_grads(spec, params, x, y, enabled=True)
    assert np.allclose(v_ref, v_new, atol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_new)):
        scale = max(1e-8, float(np.abs(a).max()))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-8 * scale)


@pytest.mark.parametrize("ndim", [2, 3])
def test_fast_moments_bwd_matches_autodiff(ndim):
    """The hand-written _kron_moments VJP must equal reverse-mode through
    the plain implementation exactly in f64 (precision differences only
    exist on TPU bf16 passes)."""
    from vggp_tpu import config
    from vggp_tpu.models import svgp

    ms = (6, 5, 4)[:ndim]
    feats = tuple(CellIntegralFeature.from_lims(m, 0.0, 1.0) for m in ms)
    spec = svgp.SVGPSpec(kinds=("matern12",) * ndim, features=feats,
                         num_data=100, variational="kron")
    rng = np.random.default_rng(0)
    params = spec.init_params(jnp.float64)
    for k in list(params["q"].keys()):
        params["q"][k] = params["q"][k] + 0.1 * jnp.asarray(
            rng.standard_normal(params["q"][k].shape))
    xb = jnp.asarray(rng.random((32, ndim)))
    yb = jnp.asarray(rng.standard_normal(32))

    prev = config.FAST_MOMENTS_BWD
    try:
        config.FAST_MOMENTS_BWD = True
        lf = float(svgp.loss(spec, params, xb, yb))
        gf = jax.grad(lambda p: svgp.loss(spec, p, xb, yb))(params)
        config.FAST_MOMENTS_BWD = False
        ls = float(svgp.loss(spec, params, xb, yb))
        gs = jax.grad(lambda p: svgp.loss(spec, p, xb, yb))(params)
    finally:
        config.FAST_MOMENTS_BWD = prev
    assert abs(lf - ls) < 1e-12 * max(abs(ls), 1.0)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(gs)
    for (kf, vf), (ks, vs) in zip(flat_f, flat_s):
        assert kf == ks
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vs),
                                   rtol=1e-9, atol=1e-11,
                                   err_msg=jax.tree_util.keystr(kf))
