"""Collapsed-ELBO sparse GP regression (Titsias bound) over any feature family.

This single model covers the reference's SVGP / VFF / ASVGP / GriddedGP class
zoo (``src/models/sparse/univariate_structure.py`` and
``kronecker_structure.py``) by feature choice, in 1D or Kronecker-structured
d-D, with one O(n·m²) implementation instead of the reference's O(n³)
``MultivariateNormal(Qff + σ²I).log_prob`` (``univariate_structure.py:234-263``
— SURVEY.md §3a hot spot).

Math (identical bound, stable factored form):
    A  = L⁻¹ Kuf / σ          (L = chol(Kuu), σ² = noise variance)
    B  = I + A Aᵀ,  L_B = chol(B)
    c  = L_B⁻¹ A y / σ
    ELBO = -n/2·log(2πσ²) - Σ log diag L_B - (yᵀy/σ² - cᵀc)/2
           - (Σ k_ff - σ²‖A‖²_F) / (2σ²)
For Kronecker axes, A = KhatriRao(L₁⁻¹Kuf₁, L₂⁻¹Kuf₂)/σ is assembled with one
einsum — ``kron(Kuu₁, Kuu₂)`` is never materialized
(vs reference ``kronecker_structure.py:496,513``).

Predictions, optimal q(u), and the gridded q(v) head all propagate Cholesky
factors; no explicit inverses anywhere (fixes the reference's non-PSD q(v)
fallbacks, ``gridded_kronecker_structure.py:187-191,436-438``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from vggp_tpu.features import AxisFeature, CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.models.common import Gaussian
from vggp_tpu.ops import safe_cholesky, tri_solve, khatri_rao_rows, kron_dense

Params = Dict


@dataclass(frozen=True)
class SGPRSpec:
    """Static config: per-axis kernel kinds and inducing features."""

    kinds: Tuple[str, ...]
    features: Tuple[AxisFeature, ...]
    jitter: float = 1e-6
    factor_method: str = "chol"  # Kuu factorization: "chol" | "eigh"
    per_output_noise: bool = False  # per-mission noise vector (needs coregion)
    learn_mean: bool = False        # constant mean; per-output with coregion

    @property
    def ndim(self) -> int:
        return len(self.kinds)

    @property
    def num_inducing(self) -> int:
        m = 1
        for f in self.features:
            m *= f.m
        return m

    def init_params(self, dtype=jnp.float32) -> Params:
        axes = []
        for kind, f in zip(self.kinds, self.features):
            if kind == "coregion":
                p = {}  # the discrete axis owns its (w, kappa) B-params
            else:
                p = {"variance": jnp.asarray(1.0, dtype), "lengthscale": jnp.asarray(1.0, dtype)}
            p.update(f.init_params(dtype))
            axes.append(p)
        noise = jnp.asarray(0.1, dtype)
        if self.per_output_noise:
            i = self.kinds.index("coregion")
            noise = jnp.full((self.features[i].n_outputs,), 0.1, dtype)
        out = {"axes": tuple(axes), "noise": noise}
        if self.learn_mean:
            out["mean"] = (jnp.zeros((self.features[self.kinds.index("coregion")].n_outputs,), dtype)
                           if "coregion" in self.kinds else jnp.asarray(0.0, dtype))
        return out


def precompute(spec: SGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray):
    """Cache the training-set factored state for repeated predictions.

    The serving-path equivalent of gpytorch's ``fast_pred_var`` caches: one
    O(n·m²) pass over the training data; every subsequent
    :func:`posterior_from_state` / :func:`q_v_from_state` call is O(n*·m²)
    in the query size only. The returned tuple is a pytree — jit it, ship it
    across devices, or checkpoint it.
    """
    return _factored_state(spec, params, X, y)[:4]


@common.highest_precision
def posterior_from_state(
    spec: SGPRSpec, params: Params, state, xstar: jnp.ndarray,
    full_cov: bool = False, predictive: bool = False,
) -> Gaussian:
    """q(f*) from a :func:`precompute` state — no training-data pass."""
    return common.collapsed_posterior(
        spec, params, state, xstar, common.khatri_rao_all,
        common.kdiag, common.gram_full, full_cov=full_cov, predictive=predictive,
    )


def _grid_gaussian_from_state(spec: SGPRSpec, state, kvu_blocks, kvv_blocks,
                              full_cov: bool) -> Gaussian:
    """Grid-product posterior from a factored state and per-axis cross/prior
    blocks: R = ⊗(Kvu_i F_i⁻ᵀ), T = R L_B⁻ᵀ, mean = Tc,
    cov = Kvv − RRᵀ + TTᵀ. Shared by the q(v) and q(∂v) heads."""
    chols, A, LB, c = state[:4]
    r_blocks = tuple(chols[i].whiten(kvu_blocks[i].T).T for i in range(spec.ndim))
    R = kron_dense(r_blocks)
    T = tri_solve(LB, R.T).T
    mean = T @ c
    if full_cov:
        kvv = kron_dense(kvv_blocks)
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    from vggp_tpu.ops import kron_diag

    kvv_diag = kron_diag([jnp.diagonal(b) for b in kvv_blocks])
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))


@common.highest_precision
def q_v_from_state(
    spec: SGPRSpec, params: Params, state,
    grid_axes: Sequence[CellIntegralFeature], full_cov: bool = False,
) -> Gaussian:
    """q(v) from a :func:`precompute` state."""
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)
    kvv_blocks = common.grid_kvv(spec, params, grid_axes, dense=False)
    g = _grid_gaussian_from_state(spec, state, kvu_blocks, kvv_blocks, full_cov)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))


@common.highest_precision
def q_dv_from_state(
    spec: SGPRSpec, params: Params, state,
    grid_axes: Sequence[CellIntegralFeature], axis: int, full_cov: bool = False,
) -> Gaussian:
    """Gridded-gradient posterior q(∫_cell ∂f/∂x_axis) from a cached state.

    The axis factor is a face difference of point evaluations (fundamental
    theorem of calculus — ``common.grad_grid_kvu``); all blocks are closed
    form. Divide by the cell measure for mean-gradient (velocity) fields.
    Beyond-reference capability.
    """
    kvu_blocks = common.grad_grid_kvu(spec, params, grid_axes, axis)
    kvv_blocks = common.grad_grid_kvv(spec, params, grid_axes, axis, dense=False)
    return _grid_gaussian_from_state(spec, state, kvu_blocks, kvv_blocks, full_cov)


@common.highest_precision
def posterior_grad_from_state(
    spec: SGPRSpec, params: Params, state, xstar: jnp.ndarray, axis: int,
    full_cov: bool = False,
) -> Gaussian:
    """Posterior over the pointwise gradient ∂f/∂x_axis (collapsed model).

    Same conditional algebra as :func:`posterior_from_state` with the axis
    block replaced by F⁻¹ ∂Kuf/∂x and the prior marginal by −k''(0)·Πσ²
    (shared via ``common.collapsed_posterior``'s ``blocks_fn``).
    Requires a once-differentiable kernel on ``axis``.
    """
    return common.collapsed_posterior(
        spec, params, state, xstar,
        common.khatri_rao_all,
        lambda s, p, x: common.grad_kdiag(s, p, x, axis),
        lambda s, p, x1, x2: common.grad_gram_full(s, p, x1, x2, axis),
        full_cov=full_cov,
        blocks_fn=lambda s, p, ch, x: common.axis_whitened_dkuf(s, p, ch, x, axis),
    )


def _factored_state(spec: SGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray):
    """Compute (Ls, A, L_B, c, y) — everything downstream needs."""
    return common.factored_state(spec, params, X, y, common.khatri_rao_all)


@common.highest_precision
def elbo(spec: SGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Collapsed (Titsias) evidence lower bound — scalar.

    Equals the reference ``SparseGP._elbo`` (``univariate_structure.py:234-263``)
    exactly, computed in O(n m²).
    """
    return common.collapsed_elbo(
        spec, params, X, y, common.khatri_rao_all, common.kdiag
    )


def loss(spec: SGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return -elbo(spec, params, X, y)


@common.highest_precision
def posterior(
    spec: SGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray, xstar: jnp.ndarray,
    full_cov: bool = True, predictive: bool = False,
) -> Gaussian:
    """q(f*) at test inputs (reference ``univariate_structure.py:184-232``)."""
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    blocks_star = common.axis_whitened_kuf(spec, params, chols, xstar)
    w = common.khatri_rao_all(blocks_star)      # (m, n*) = L⁻¹ Kuf*
    tmp = tri_solve(LB, w)                       # (m, n*)
    mean = tmp.T @ c + common.mean_fn(spec, params, xstar)
    noise = common.obs_noise(spec, params, xstar) if predictive else 0.0
    if full_cov:
        kss = common.gram_full(spec, params, xstar, xstar)
        cov = kss - w.T @ w + tmp.T @ tmp
        if predictive:
            cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
        return Gaussian(mean=mean, cov=cov)
    kss = common.kdiag(spec, params, xstar)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss) + noise)


def posterior_predictive(spec, params, X, y, xstar, full_cov: bool = True) -> Gaussian:
    return posterior(spec, params, X, y, xstar, full_cov=full_cov, predictive=True)


def prior(spec: SGPRSpec, params: Params, xstar: jnp.ndarray) -> Gaussian:
    """Prior N(m, K**) at test inputs (reference ``univariate_structure.py:169-182``)."""
    cov = common.gram_full(spec, params, xstar, xstar)
    mean = jnp.zeros(cov.shape[0], dtype=cov.dtype) + common.mean_fn(
        spec, params, xstar)
    return Gaussian(mean=mean, cov=cov)


@common.highest_precision
def q_u(spec: SGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> Gaussian:
    """Optimal q(u) = N(L L_B⁻ᵀ c, L B⁻¹ Lᵀ).

    Equal to the reference's ``mean = Kuu Σ⁻¹ Kuf y / σ²``,
    ``cov = Kuu Σ⁻¹ Kuu`` (``univariate_structure.py:693-717``), PSD by
    construction.
    """
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    L = kron_dense([f.F for f in chols])
    half = tri_solve(LB, L.T).T    # F F_B⁻ᵀ  (m, m)
    return Gaussian(mean=half @ c, cov=half @ half.T)


@common.highest_precision
def q_v(
    spec: SGPRSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    full_cov: bool = True,
) -> Gaussian:
    """Gridded posterior q(v) over cell integrals v_i = ∫_cell_i f.

    mean = R L_B⁻ᵀ c, cov = Kvv - R Rᵀ + T Tᵀ with R = Kvu L⁻ᵀ, T = R L_B⁻ᵀ —
    the Cholesky-propagated form of the reference's
    ``Kvv - Kvu Kuu⁻¹ Kvuᵀ + Kvu Σ⁻¹ Kvuᵀ``
    (``gridded_univariate_structure.py:475-488``). For the direct GriddedGP
    (features == cell integrals on the same mesh) this reduces to q(u).
    """
    state = _factored_state(spec, params, X, y)[:4]
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)
    kvv_blocks = common.grid_kvv(spec, params, grid_axes, dense=False)
    g = _grid_gaussian_from_state(spec, state, kvu_blocks, kvv_blocks, full_cov)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))


@common.highest_precision
def q_dv(
    spec: SGPRSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    axis: int,
    full_cov: bool = True,
) -> Gaussian:
    """Gridded-gradient posterior (see :func:`q_dv_from_state`)."""
    state = _factored_state(spec, params, X, y)[:4]
    return q_dv_from_state(spec, params, state, grid_axes, axis, full_cov=full_cov)


@common.highest_precision
def posterior_grad(
    spec: SGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
    xstar: jnp.ndarray, axis: int, full_cov: bool = False,
) -> Gaussian:
    """Pointwise-gradient posterior (see :func:`posterior_grad_from_state`)."""
    state = _factored_state(spec, params, X, y)[:4]
    return posterior_grad_from_state(spec, params, state, xstar, axis,
                                     full_cov=full_cov)


@common.highest_precision
def p_v_u(
    spec: SGPRSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
) -> Gaussian:
    """p(v | u = E_q[u]) (reference ``gridded_univariate_structure.py:462-473``).

    Like :func:`q_v`, v = ∫_cell f includes the learned mean function, so the
    head adds ``grid_mean`` back (training conditions on the residual).
    """
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)
    r_blocks = tuple(chols[i].whiten(kvu_blocks[i].T).T for i in range(spec.ndim))
    R = kron_dense(r_blocks)
    # mean = Kvu Kuu⁻¹ m_u with m_u = L L_B⁻ᵀ c  →  R L_B⁻ᵀ c
    mean = tri_solve(LB, R.T).T @ c
    kvv = common.grid_kvv(spec, params, grid_axes, dense=True)
    cov = kvv - R @ R.T
    g = Gaussian(mean=mean, cov=cov)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))
