"""Matrix-free (CG) posterior means for very large 1D inducing grids.

The dense collapsed-SGPR pipeline (models.sgpr) factorizes an (m, m)
matrix — fine to m ≈ 10⁴ per axis, impossible beyond. For 1D models whose
Kuu has structure (Toeplitz for B0 cell integrals, banded for B1-spline
RKHS features — :meth:`AxisFeature.kuu_matvec`), the *posterior means* need
only matvecs:

    m_u = Kuu w,   (σ² Kuu + Kuf Kufᵀ) w = Kuf y            (optimal q(u))
    E[f*] = Kuf(x*)ᵀ w,      E[v] = Kvu w                    (no Kuu⁻¹!)

so a Jacobi-preconditioned conjugate-gradient solve gives the gridded data
product's mean field in O(iters · (m log m + n m)) time and O(m + n m)
memory. The reference materializes every Kuu
(``src/models/sparse/univariate_structure.py:789-825``) and cannot represent
these sizes at all. Uncertainty still requires a factorization — use the
dense path (or subsampled grids) for variances; means are what the
nb7-style monthly products plot.

``solve_w`` is public so a caller wanting BOTH the pointwise means and the
gridded product pays the CG solve once:

    w = iterative.solve_w(spec, params, X, y)
    fmean = iterative.posterior_mean_from_w(spec, params, xstar, w)
    vmean = iterative.q_v_mean_from_w(spec, params, grid_axes, w)
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.ops.cg import cg_solve

Params = dict


@common.highest_precision
def solve_w(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
            tol: float | None = None, maxiter: int = 1000) -> jnp.ndarray:
    """w = (σ² Kuu + Kuf Kufᵀ)⁻¹ Kuf y via Jacobi-preconditioned CG.

    ``tol=None`` → the dtype-aware ``cg_solve`` default (a fixed 1e-8 is
    unreachable in f32 and would silently burn all ``maxiter`` iterations).
    """
    if spec.ndim != 1:
        raise ValueError("iterative path supports 1D specs (per-axis structure)")
    kind = spec.kinds[0]
    feat = spec.features[0]
    p = common.axis_params(params, 0)
    y = jnp.reshape(y, (-1,))
    x = X[:, 0] if X.ndim == 2 else jnp.reshape(X, (-1,))
    noise = params["noise"]

    kuf = feat.Kuf(kind, p, x)                    # (m, n)
    b = kuf @ y

    def matvec(v):
        return noise * feat.kuu_matvec(kind, p, v) + kuf @ (kuf.T @ v)

    # Jacobi scaling on the EXACT diagonal D = σ²·diag(Kuu) + rowsum(Kuf²).
    # (A Kuu@1 row-sum proxy is wrong for the B1-spline Gram: its negative
    # off-diagonals cancel interior row sums to ~δ/ℓ while the diagonal is
    # ~ℓ/δ — the "preconditioner" then WORSENS conditioning by (ℓ/δ)².)
    d = noise * feat.kuu_diag(kind, p) + jnp.sum(kuf * kuf, axis=1)
    d = jnp.maximum(d, jnp.finfo(kuf.dtype).tiny)
    s = 1.0 / jnp.sqrt(d)

    def matvec_pc(v):
        return s * matvec(s * v)

    w_pc = cg_solve(matvec_pc, s * b, tol=tol, maxiter=maxiter)
    return s * w_pc


@common.highest_precision
def posterior_mean_from_w(spec, params: Params, xstar: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """E_q[f(x*)] = Kuf(x*)ᵀ w for a precomputed ``solve_w`` result."""
    kind, feat = spec.kinds[0], spec.features[0]
    p = common.axis_params(params, 0)
    xs = xstar[:, 0] if xstar.ndim == 2 else jnp.reshape(xstar, (-1,))
    return feat.Kuf(kind, p, xs).T @ w


@common.highest_precision
def q_v_mean_from_w(spec, params: Params,
                    grid_axes: Sequence[CellIntegralFeature],
                    w: jnp.ndarray) -> jnp.ndarray:
    """E_q[v] = Kvu w for a precomputed ``solve_w`` result."""
    kvu = common.grid_kvu(spec, params, grid_axes)[0]  # (g, m)
    return kvu @ w


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
    factorization (Kuu enters through matvecs only)."""
    w = solve_w(spec, params, X, y, tol, maxiter)
    return q_v_mean_from_w(spec, params, grid_axes, w)
