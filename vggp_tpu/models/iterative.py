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
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.ops.cg import cg_solve

Params = dict


def _solve_w(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
             tol: float, maxiter: int) -> jnp.ndarray:
    """w = (σ² Kuu + Kuf Kufᵀ)⁻¹ Kuf y via Jacobi-preconditioned CG."""
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

    # Jacobi scaling: D = diag(σ²·Kuu) + row-sums of Kuf² — cheap, exact for
    # the dominant local structure of cell/spline features.
    kuu_diag = feat.kuu_matvec(kind, p, jnp.ones((feat.m,), dtype=kuf.dtype))
    # For strongly diagonal matrices matvec(1) ≈ rowsum ≥ diag; use the safe
    # positive proxy: rowsum of |Kuf|² plus σ²·(Kuu @ 1) clipped positive.
    d = jnp.maximum(noise * kuu_diag, 0.0) + jnp.sum(kuf * kuf, axis=1)
    d = jnp.maximum(d, jnp.finfo(kuf.dtype).tiny)
    s = 1.0 / jnp.sqrt(d)

    def matvec_pc(v):
        return s * matvec(s * v)

    w_pc = cg_solve(matvec_pc, s * b, tol=tol, maxiter=maxiter)
    return s * w_pc


@common.highest_precision
def posterior_mean_cg(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
                      xstar: jnp.ndarray, tol: float = 1e-8,
                      maxiter: int = 1000) -> jnp.ndarray:
    """E_q[f(x*)] = Kuf(x*)ᵀ w — matches ``sgpr.posterior(...).mean``."""
    w = _solve_w(spec, params, X, y, tol, maxiter)
    kind, feat = spec.kinds[0], spec.features[0]
    p = common.axis_params(params, 0)
    xs = xstar[:, 0] if xstar.ndim == 2 else jnp.reshape(xstar, (-1,))
    return feat.Kuf(kind, p, xs).T @ w


@common.highest_precision
def q_v_mean_cg(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
                grid_axes: Sequence[CellIntegralFeature], tol: float = 1e-8,
                maxiter: int = 1000) -> jnp.ndarray:
    """E_q[v] = Kvu w — matches ``sgpr.q_v(...).mean`` without any (m, m)
    factorization (Kuu enters through matvecs only)."""
    w = _solve_w(spec, params, X, y, tol, maxiter)
    kvu = common.grid_kvu(spec, params, grid_axes)[0]  # (g, m)
    return kvu @ w
