"""Matrix-free (CG) posterior means for very large inducing grids, any ndim.

The dense collapsed-SGPR pipeline (models.sgpr) forms B = I + AAᵀ — an
(m, m) matrix with m = ∏ m_i — fine to m ≈ 10⁴, impossible beyond. But the
*posterior means* need only the action of σ²Kuu + Kuf Kufᵀ:

    m_u = Kuu w,   (σ² Kuu + Kuf Kufᵀ) w = Kuf y            (optimal q(u))
    E[f*] = Kuf(x*)ᵀ w,      E[v] = Kvu w                    (no Kuu⁻¹!)

and every factor there is structured:

- Kuu @ v: per-axis ``AxisFeature.kuu_matvec`` (FFT circulant for Toeplitz
  B0 cell Grams — complex-free on TPU via ops.realfft — banded for B1
  splines) applied along each Kronecker axis: O(Σ_i m log m) per product.
- Kuf / Kufᵀ products: the Khatri–Rao structure contracts per-axis (m_i, n)
  blocks against the w-tensor with one einsum — O(n·m) MXU work, the
  (m, n) joint block never materializes.

A Jacobi-preconditioned conjugate-gradient solve then yields the gridded
data product's mean field in O(iters·(m log m + n·m)) time and O(m + n·Σm_i)
memory — e.g. a 512×512 cell grid (m = 262 144) whose dense B alone would
be 275 GB. The reference materializes every Kuu
(``src/models/sparse/univariate_structure.py:789-825``,
``kronecker_structure.py:496,513``) and cannot represent these sizes at
all. Uncertainty still requires a factorization — use the dense path (or
subsampled grids) for variances; means are what the nb7-style monthly
products plot.

``solve_w`` is public so a caller wanting BOTH the pointwise means and the
gridded product pays the CG solve once:

    w = iterative.solve_w(spec, params, X, y)
    fmean = iterative.posterior_mean_from_w(spec, params, xstar, w)
    vmean = iterative.q_v_mean_from_w(spec, params, grid_axes, w)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.ops.cg import cg_solve

Params = dict

_L = "abcdefgh"


def _check_spec(spec) -> None:
    if "coregion" in spec.kinds:
        raise ValueError(
            "the iterative path supports continuous axes only (the discrete "
            "coregion Gram has no structured matvec); use the dense heads")


def _axis_shape(spec) -> Tuple[int, ...]:
    return tuple(f.m for f in spec.features)


def _kuf_blocks(spec, params: Params, X: jnp.ndarray):
    """Per-axis (m_i, n) cross-covariance blocks (Khatri–Rao factors)."""
    X2 = X if X.ndim == 2 else jnp.reshape(X, (-1, 1))
    return tuple(
        spec.features[i].Kuf(spec.kinds[i], common.axis_params(params, i),
                             X2[:, i])
        for i in range(spec.ndim)
    )


def _kufT_w(blocks, W: jnp.ndarray) -> jnp.ndarray:
    """Kufᵀ w for the w-TENSOR (m_1, …, m_d) → (n,), joint block never built."""
    d = len(blocks)
    sub = ",".join(f"{_L[i]}n" for i in range(d))
    return jnp.einsum(f"{_L[:d]},{sub}->n", W, *blocks)


def _kuf_v(blocks, v: jnp.ndarray) -> jnp.ndarray:
    """Kuf v for v (n,) → the (m_1, …, m_d) tensor."""
    d = len(blocks)
    sub = ",".join(f"{_L[i]}n" for i in range(d))
    return jnp.einsum(f"n,{sub}->{_L[:d]}", v, *blocks)


def _kuu_matvec_tensor(spec, params: Params, W: jnp.ndarray) -> jnp.ndarray:
    """(⊗_i Kuu_i) @ w via per-axis structured matvecs along each tensor axis."""
    for i in range(spec.ndim):
        Wm = jnp.moveaxis(W, i, 0)
        sh = Wm.shape
        out = spec.features[i].kuu_matvec(
            spec.kinds[i], common.axis_params(params, i),
            Wm.reshape(sh[0], -1))
        W = jnp.moveaxis(out.reshape(sh), 0, i)
    return W


@common.highest_precision
def solve_w(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
            tol: float | None = None, maxiter: int = 1000) -> jnp.ndarray:
    """w = (σ² Kuu + Kuf Kufᵀ)⁻¹ Kuf y via Jacobi-preconditioned CG.

    Any number of Kronecker axes; w returns FLAT (m,) in the numpy.kron
    row-major index convention. ``tol=None`` → the dtype-aware ``cg_solve``
    default (a fixed 1e-8 is unreachable in f32 and would silently burn all
    ``maxiter`` iterations).
    """
    _check_spec(spec)
    p_noise = params["noise"]
    y = jnp.reshape(y, (-1,))
    blocks = _kuf_blocks(spec, params, X)
    shape = _axis_shape(spec)
    b = _kuf_v(blocks, y).reshape(-1)

    def matvec(v):
        W = v.reshape(shape)
        kv = _kuu_matvec_tensor(spec, params, W)
        fv = _kuf_v(blocks, _kufT_w(blocks, W))
        return (p_noise * kv + fv).reshape(-1)

    # Jacobi scaling on the EXACT diagonal D = σ²·diag(Kuu) + rowsum(Kuf²).
    # (A Kuu@1 row-sum proxy is wrong for the B1-spline Gram: its negative
    # off-diagonals cancel interior row sums to ~δ/ℓ while the diagonal is
    # ~ℓ/δ — the "preconditioner" then WORSENS conditioning by (ℓ/δ)².)
    # diag(Kuu) = ⊗ diag(Kuu_i); rowsum(Kuf²) = ⊗-contraction of per-axis
    # squared blocks (the Khatri–Rao rows square elementwise).
    kdiag = None
    for i in range(spec.ndim):
        di = spec.features[i].kuu_diag(spec.kinds[i], common.axis_params(params, i))
        kdiag = di if kdiag is None else (kdiag[:, None] * di[None, :]).reshape(-1)
    d_sub = ",".join(f"{_L[i]}n" for i in range(spec.ndim))
    rowsum = jnp.einsum(
        f"{d_sub}->{_L[:spec.ndim]}", *[bk * bk for bk in blocks]).reshape(-1)
    d = p_noise * kdiag + rowsum
    d = jnp.maximum(d, jnp.finfo(b.dtype).tiny)
    s = 1.0 / jnp.sqrt(d)

    def matvec_pc(v):
        return s * matvec(s * v)

    w_pc = cg_solve(matvec_pc, s * b, tol=tol, maxiter=maxiter)
    return s * w_pc


@common.highest_precision
def posterior_mean_from_w(spec, params: Params, xstar: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """E_q[f(x*)] = Kuf(x*)ᵀ w for a precomputed ``solve_w`` result."""
    blocks = _kuf_blocks(spec, params, xstar)
    return _kufT_w(blocks, w.reshape(_axis_shape(spec)))


@common.highest_precision
def q_v_mean_from_w(spec, params: Params,
                    grid_axes: Sequence[CellIntegralFeature],
                    w: jnp.ndarray) -> jnp.ndarray:
    """E_q[v] = Kvu w for a precomputed ``solve_w`` result (flat, kron
    row-major over the grid cells)."""
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)  # per-axis (g_i, m_i)
    d = spec.ndim
    W = w.reshape(_axis_shape(spec))
    G = _L[d:2 * d].upper()
    sub = ",".join(f"{G[i]}{_L[i]}" for i in range(d))
    return jnp.einsum(f"{_L[:d]},{sub}->{G}", W, *kvu_blocks).reshape(-1)


def posterior_mean_cg(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
                      xstar: jnp.ndarray, tol: float | None = None,
                      maxiter: int = 1000) -> jnp.ndarray:
    """E_q[f(x*)] = Kuf(x*)ᵀ w — matches ``sgpr.posterior(...).mean``."""
    w = solve_w(spec, params, X, y, tol, maxiter)
    return posterior_mean_from_w(spec, params, xstar, w)


def q_v_mean_cg(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
                grid_axes: Sequence[CellIntegralFeature],
                tol: float | None = None, maxiter: int = 1000) -> jnp.ndarray:
    """E_q[v] = Kvu w — matches ``sgpr.q_v(...).mean`` without any (m, m)
    factorization (Kuu enters through structured matvecs only)."""
    w = solve_w(spec, params, X, y, tol, maxiter)
    return q_v_mean_from_w(spec, params, grid_axes, w)
