"""Exact GP regression (1D and separable-product 2D) with a gridded q(v) head.

Covers the reference's ``src/models/exact/univariate_structure.py`` and
``bivariate_structure.py`` (``gpytorch.models.ExactGP`` subclasses with
ScaleKernel∘MaternKernel and product kernels) plus the gridded-prediction
wrapper ``GriddedMatern12ExactGP``
(``gridded_univariate_structure.py:22-161``,
``gridded_kronecker_structure.py:21-211``).

All ops are Cholesky-factored; the marginal likelihood is the standard
O(n³/3) factorization (a single ``jnp.linalg.cholesky`` that XLA maps onto
the MXU), not gpytorch's iterative BBMM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.models.common import Gaussian
from vggp_tpu.ops import safe_cholesky, tri_solve, khatri_rao_rows, kron_dense

Params = Dict


@dataclass(frozen=True)
class ExactGPSpec:
    kinds: Tuple[str, ...]  # one per input axis; product kernel across axes
    jitter: float = 1e-6
    # for a multi-output model: a "coregion" kind axis whose column of X
    # carries integer output indices (ICM, K = B ⊗ ⊗K_i; beyond-reference)
    n_outputs: int = 0
    coregion_rank: int = 1
    per_output_noise: bool = False  # noise becomes an (n_outputs,) vector
    learn_mean: bool = False        # constant mean; per-output with coregion

    @property
    def ndim(self) -> int:
        return len(self.kinds)

    def init_params(self, dtype=jnp.float32) -> Params:
        from vggp_tpu.features import OutputFeature

        axes = []
        for kind in self.kinds:
            if kind == "coregion":
                axes.append(OutputFeature(self.n_outputs,
                                          self.coregion_rank).init_params(dtype))
            else:
                axes.append({"variance": jnp.asarray(1.0, dtype),
                             "lengthscale": jnp.asarray(1.0, dtype)})
        noise = (jnp.full((self.n_outputs,), 0.1, dtype)
                 if self.per_output_noise else jnp.asarray(0.1, dtype))
        out = {"axes": tuple(axes), "noise": noise}
        if self.learn_mean:
            out["mean"] = (jnp.zeros((self.n_outputs,), dtype)
                           if "coregion" in self.kinds
                           else jnp.asarray(0.0, dtype))
        return out


def _chol_ky(spec: ExactGPSpec, params: Params, X: jnp.ndarray) -> jnp.ndarray:
    kxx = common.gram_full(spec, params, X, X)
    n = kxx.shape[0]
    noise = jnp.broadcast_to(common.obs_noise(spec, params, X), (n,))
    return safe_cholesky(kxx + noise * jnp.eye(n, dtype=kxx.dtype), spec.jitter)


@common.highest_precision
def mll(spec: ExactGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """log p(y | X, θ) = log N(y | 0, Kxx + σ²I)."""
    y = jnp.reshape(y, (-1,)) - common.mean_fn(spec, params, X)
    L = _chol_ky(spec, params, X)
    alpha = tri_solve(L, y)
    n = y.shape[0]
    return (
        -0.5 * jnp.sum(alpha * alpha)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )


def loss(spec: ExactGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return -mll(spec, params, X, y)


def prior(spec: ExactGPSpec, params: Params, xstar: jnp.ndarray) -> Gaussian:
    cov = common.gram_full(spec, params, xstar, xstar)
    mean = jnp.zeros(cov.shape[0], dtype=cov.dtype) + common.mean_fn(
        spec, params, xstar)
    return Gaussian(mean=mean, cov=cov)


@common.highest_precision
def posterior(
    spec: ExactGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray, xstar: jnp.ndarray,
    full_cov: bool = True, predictive: bool = False,
) -> Gaussian:
    y = jnp.reshape(y, (-1,)) - common.mean_fn(spec, params, X)
    L = _chol_ky(spec, params, X)
    kxs = common.gram_full(spec, params, X, xstar)  # (n, n*)
    w = tri_solve(L, kxs)                            # (n, n*)
    mean = w.T @ tri_solve(L, y) + common.mean_fn(spec, params, xstar)
    noise = common.obs_noise(spec, params, xstar) if predictive else 0.0
    if full_cov:
        kss = common.gram_full(spec, params, xstar, xstar)
        cov = kss - w.T @ w
        if predictive:
            cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
        return Gaussian(mean=mean, cov=cov)
    kss = common.kdiag(spec, params, xstar)
    return Gaussian(mean=mean, var=common.floor_var(kss - jnp.sum(w * w, axis=0), kss) + noise)


def posterior_predictive(spec, params, X, y, xstar, full_cov: bool = True) -> Gaussian:
    return posterior(spec, params, X, y, xstar, full_cov=full_cov, predictive=True)


def _kvx(spec: ExactGPSpec, params: Params, grid_axes, X: jnp.ndarray) -> jnp.ndarray:
    """Cov[v_i, f(x_j)] — per-axis closed-form cell/point covs, Khatri–Rao."""
    if X.ndim == 1:
        X = X[:, None]
    blocks = []
    for i, kind in enumerate(spec.kinds):
        p = common.axis_params(params, i)
        blocks.append(grid_axes[i].Kuf(kind, p, X[:, i]))
    out = blocks[0]
    for b in blocks[1:]:
        out = khatri_rao_rows(out, b)
    return out


@common.highest_precision
def posterior_grad(
    spec: ExactGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
    xstar: jnp.ndarray, axis: int, full_cov: bool = False,
) -> Gaussian:
    """Posterior over ∂f/∂x_axis under the exact GP (beyond-reference).

    Cov(∂f(x*), f(X)) factorizes per axis (k' on ``axis``, k elsewhere);
    mean = that block times (Kxx+σ²I)⁻¹y, variance from −k''(0)·Πσ².
    Requires a once-differentiable kernel on ``axis``.
    """
    from vggp_tpu import kernels

    axis = common.canonical_axis(spec, axis)
    kernels.require_differentiable(spec.kinds[axis])
    y = jnp.reshape(y, (-1,)) - common.mean_fn(spec, params, X)
    Xs = xstar[:, None] if xstar.ndim == 1 else xstar
    Xd = X[:, None] if X.ndim == 1 else X
    L = _chol_ky(spec, params, X)
    kdx = None  # (n*, n) Cov(∂f(x*), f(X))
    for i, kind in enumerate(spec.kinds):
        p = common.axis_params(params, i)
        if i == axis:
            g = kernels.dgram_1d(kind, Xs[:, i], Xd[:, i], p["variance"], p["lengthscale"])
        else:
            g = kernels.axis_gram(kind, p, Xs[:, i], Xd[:, i])
        kdx = g if kdx is None else kdx * g
    w = tri_solve(L, kdx.T)                  # (n, n*)
    mean = w.T @ tri_solve(L, y)
    if full_cov:
        kss = common.grad_gram_full(spec, params, xstar, xstar, axis)
        return Gaussian(mean=mean, cov=kss - w.T @ w)
    kss = common.grad_kdiag(spec, params, xstar, axis)
    return Gaussian(mean=mean, var=common.floor_var(kss - jnp.sum(w * w, axis=0), kss))


@common.highest_precision
def q_dv(
    spec: ExactGPSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    axis: int,
    full_cov: bool = True,
) -> Gaussian:
    """Posterior over grid-cell integrals of ∂f/∂x_axis under the exact GP.

    The axis factor collapses to face differences of point evaluations
    (fundamental theorem of calculus), so Cov(v', f(X)) is a double-difference
    of plain Grams Khatri–Rao'd with the other axes' cell/point covs — valid
    for every kernel kind. Beyond-reference capability.
    """
    axis = common.canonical_axis(spec, axis)
    y = jnp.reshape(y, (-1,)) - common.mean_fn(spec, params, X)
    Xd = X[:, None] if X.ndim == 1 else X
    L = _chol_ky(spec, params, X)
    from vggp_tpu import kernels

    blocks = []
    for i, kind in enumerate(spec.kinds):
        p = common.axis_params(params, i)
        if i == axis:
            mesh = grid_axes[i].mesh_j(p)
            g = kernels.gram_1d(kind, mesh, Xd[:, i], p["variance"], p["lengthscale"])
            blocks.append(g[1:, :] - g[:-1, :])
        else:
            blocks.append(grid_axes[i].Kuf(kind, p, Xd[:, i]))
    kvx = blocks[0]
    for b in blocks[1:]:
        kvx = khatri_rao_rows(kvx, b)
    w = tri_solve(L, kvx.T)                  # (n, g)
    mean = w.T @ tri_solve(L, y)
    kvv_blocks = common.grad_grid_kvv(spec, params, grid_axes, axis, dense=False)
    if full_cov:
        kvv = kron_dense(kvv_blocks)
        return Gaussian(mean=mean, cov=kvv - w.T @ w)
    from vggp_tpu.ops import kron_diag

    kvv_diag = kron_diag([jnp.diagonal(b) for b in kvv_blocks])
    return Gaussian(mean=mean, var=common.floor_var(kvv_diag - jnp.sum(w * w, axis=0), kvv_diag))


@common.highest_precision
def q_v(
    spec: ExactGPSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    full_cov: bool = True,
) -> Gaussian:
    """Posterior over grid-cell integrals under the exact GP.

    mean = Kvx (Kxx+σ²I)⁻¹ y, cov = Kvv - Kvx (Kxx+σ²I)⁻¹ Kvxᵀ — the exact
    marginal of the joint Gaussian (v, y). The reference's extra
    ``+ Kvx p(f|y)cov⁻¹ Kvxᵀ`` term (``gridded_univariate_structure.py:160``)
    is not part of that marginal and is documented in SURVEY.md §7 as a bug —
    not replicated.
    """
    y = jnp.reshape(y, (-1,)) - common.mean_fn(spec, params, X)
    L = _chol_ky(spec, params, X)
    kvx = _kvx(spec, params, grid_axes, X)  # (g, n)
    w = tri_solve(L, kvx.T)                  # (n, g)
    mean = w.T @ tri_solve(L, y) + common.grid_mean(spec, params, grid_axes)
    blocks = tuple(
        grid_axes[i].Kuu(spec.kinds[i], common.axis_params(params, i))
        for i in range(spec.ndim)
    )
    if full_cov:
        kvv = kron_dense(blocks)
        return Gaussian(mean=mean, cov=kvv - w.T @ w)
    from vggp_tpu.ops import kron_diag

    kvv_diag = kron_diag([jnp.diagonal(b) for b in blocks])
    return Gaussian(mean=mean, var=common.floor_var(kvv_diag - jnp.sum(w * w, axis=0), kvv_diag))
