"""Additive-structure sparse GP: f(x) = Σ_d f_d(x_d), collapsed ELBO.

The reference planned this family but never wrote it
(``src/models/sparse/additive_structure.py`` is an empty placeholder —
SURVEY.md §2). Here it is, built from the same per-axis feature blocks as
the Kronecker models: each independent 1D component f_d gets its own
inducing features u^(d); jointly

    Kuu  = blockdiag(Kuu_1, …, Kuu_D)        (components independent)
    Kuf  = vstack(Kuf_1(x_1), …, Kuf_D(x_D))
    kff  = Σ_d σ_d²

so the collapsed (Titsias) bound, posterior, and gridded q(v) reuse the
factored O(n·m²) SGPR pipeline with a concatenation where the Kronecker
models use a Khatri–Rao product.

The 2D gridded head integrates the *sum* field over 2D cells:
``v_ij = ∫∫_cell f = δ₂ V¹_i + δ₁ V²_j`` with ``Vᵈ`` the per-axis cell
integrals of f_d, giving a Kronecker-*sum* structured Kvv.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from vggp_tpu.features import AxisFeature, CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.models.common import Gaussian
from vggp_tpu.ops import tri_solve

Params = Dict


def _concat(blocks):
    """Additive combiner: block-diagonal Kuu → stacked whitened blocks."""
    return jnp.concatenate(blocks, axis=0)


@dataclass(frozen=True)
class AdditiveSGPRSpec:
    """Static config: one kernel kind + feature family per additive component."""

    kinds: Tuple[str, ...]
    features: Tuple[AxisFeature, ...]
    jitter: float = 1e-6
    factor_method: str = "chol"

    @property
    def ndim(self) -> int:
        return len(self.kinds)

    @property
    def num_inducing(self) -> int:
        return sum(f.m for f in self.features)

    def init_params(self, dtype=jnp.float32) -> Params:
        axes = []
        for f in self.features:
            p = {"variance": jnp.asarray(1.0, dtype), "lengthscale": jnp.asarray(1.0, dtype)}
            p.update(f.init_params(dtype))
            axes.append(p)
        return {"axes": tuple(axes), "noise": jnp.asarray(0.1, dtype)}


def _kdiag(spec, params, X):
    """diag K_ff = Σ_d σ_d² — sum of component variances (additive field)."""
    n = X.shape[0]
    v = jnp.zeros((n,), dtype=jnp.result_type(params["noise"]))
    for i in range(spec.ndim):
        v = v + common.axis_params(params, i)["variance"]
    return v


def _factored_state(spec: AdditiveSGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray):
    return common.factored_state(spec, params, X, y, _concat)


@common.highest_precision
def elbo(spec: AdditiveSGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Collapsed bound — identical form to sgpr.elbo with additive blocks."""
    return common.collapsed_elbo(spec, params, X, y, _concat, _kdiag)


def loss(spec, params, X, y):
    return -elbo(spec, params, X, y)


def _gram_add(spec, params, x1, x2):
    from vggp_tpu import kernels

    if x1.ndim == 1:
        x1 = x1[:, None]
    if x2.ndim == 1:
        x2 = x2[:, None]
    out = None
    for i, kind in enumerate(spec.kinds):
        p = common.axis_params(params, i)
        g = kernels.gram_1d(kind, x1[:, i], x2[:, i], p["variance"], p["lengthscale"])
        out = g if out is None else out + g
    return out


@common.highest_precision
def posterior(
    spec: AdditiveSGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
    xstar: jnp.ndarray, full_cov: bool = False, predictive: bool = False,
) -> Gaussian:
    state = _factored_state(spec, params, X, y)
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    return common.collapsed_posterior(
        spec, params, state, xstar, _concat, _kdiag, _gram_add,
        full_cov=full_cov, predictive=predictive,
    )


def posterior_predictive(spec, params, X, y, xstar, full_cov: bool = False) -> Gaussian:
    return posterior(spec, params, X, y, xstar, full_cov=full_cov, predictive=True)


def prior(spec: AdditiveSGPRSpec, params: Params, xstar: jnp.ndarray) -> Gaussian:
    """Prior N(0, Σ_d k_d) at test inputs (additive analogue of
    reference ``univariate_structure.py:169-182``)."""
    cov = _gram_add(spec, params, xstar, xstar)
    return Gaussian(mean=jnp.zeros(cov.shape[0], dtype=cov.dtype), cov=cov)


@common.highest_precision
def q_u(spec: AdditiveSGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> Gaussian:
    """Optimal q(u) over the stacked u = (u¹, …, u^D), N(L L_B⁻ᵀ c, L B⁻¹ Lᵀ)
    with L = blockdiag(F_d) (additive analogue of
    reference ``univariate_structure.py:693-717``)."""
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    L = jax.scipy.linalg.block_diag(*[f.F for f in chols])
    half = tri_solve(LB, L.T).T  # L L_B⁻ᵀ  (m, m)
    return Gaussian(mean=half @ c, cov=half @ half.T)


@common.highest_precision
def q_v(
    spec: AdditiveSGPRSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    full_cov: bool = False,
) -> Gaussian:
    """Gridded posterior over 2D-cell integrals of the additive field.

    With per-axis cell widths (δ₁, δ₂): ``v_ij = δ₂ V¹_i + δ₁ V²_j``, so
    ``Kvu = [δ₂·Kvu₁ ⊗ 1 , 1 ⊗ δ₁·Kvu₂]`` (row-blocks broadcast over the
    other axis) and ``Kvv = δ₂²·Kvv₁ ⊕ δ₁²·Kvv₂`` (Kronecker sum).
    Requires ``ndim == 2`` (1D reduces to the plain sgpr q_v).
    """
    if spec.ndim != 2:
        raise ValueError("additive q_v implemented for 2 components")
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    R, kvv1, kvv2, G1, G2 = _grid_R_kvv(spec, params, chols, grid_axes)
    T = tri_solve(LB, R.T).T
    mean = T @ c
    if full_cov:
        kvv = _kvv_dense(kvv1, kvv2, G1, G2)
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    kvv_diag = (
        jnp.repeat(jnp.diagonal(kvv1), G2) + jnp.tile(jnp.diagonal(kvv2), G1)
    )
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))


def _grid_R_kvv(spec, params, chols, grid_axes):
    """Whitened Kvu rows R and per-axis scaled grid covariances.

    ``v_ij = δ₂ V¹_i + δ₁ V²_j`` ⇒ R rows indexed (i, j) row-major are
    ``[δ₂·r1_i , δ₁·r2_j]`` over the block-diagonal feature space.
    """
    g1, g2 = grid_axes
    if not (g1.uniform and g2.uniform):
        raise ValueError("additive gridded heads assume uniform grid axes "
                         "(constant δ per axis); use per-axis uniform meshes")
    d1, d2 = g1.delta, g2.delta
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)   # (g_i, m_i) per axis
    r1 = chols[0].whiten(kvu_blocks[0].T).T * d2            # (G1, m1)
    r2 = chols[1].whiten(kvu_blocks[1].T).T * d1            # (G2, m2)
    G1, G2 = r1.shape[0], r2.shape[0]
    R = jnp.concatenate(
        [jnp.repeat(r1, G2, axis=0), jnp.tile(r2, (G1, 1))], axis=1
    )                                                        # (G1·G2, m1+m2)
    kvv1 = g1.Kuu(spec.kinds[0], common.axis_params(params, 0)) * d2 * d2
    kvv2 = g2.Kuu(spec.kinds[1], common.axis_params(params, 1)) * d1 * d1
    return R, kvv1, kvv2, G1, G2


def _kvv_dense(kvv1, kvv2, G1, G2):
    # Cov[v_ij, v_kl] = d2² Kvv1[i,k] + d1² Kvv2[j,l] for ALL (j,l)/(i,k):
    # the cross-axis blocks are all-ones, not identity (each component is
    # constant across the other axis's cell index).
    ones1 = jnp.ones((G1, G1), dtype=kvv1.dtype)
    ones2 = jnp.ones((G2, G2), dtype=kvv2.dtype)
    return jnp.kron(kvv1, ones2) + jnp.kron(ones1, kvv2)


@common.highest_precision
def posterior_grad(
    spec: AdditiveSGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
    xstar: jnp.ndarray, axis: int, full_cov: bool = False,
) -> Gaussian:
    """Posterior over ∂f/∂x_axis of the ADDITIVE field f = Σ_d f_d(x_d).

    Only component ``axis`` varies along x_axis, so the gradient is f'_axis
    alone: the cross-covariance block is [0, …, F_axis⁻¹∂Kuf_axis, …, 0] over
    the stacked features and the prior marginal is −k_axis''(0) (no product
    over other axes). Requires a once-differentiable kernel on ``axis``.
    Beyond-reference.
    """
    from vggp_tpu import kernels

    axis = common.canonical_axis(spec, axis)
    kernels.require_differentiable(spec.kinds[axis])
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    n = xstar.shape[0]
    blocks = []
    for i, (kind, feat) in enumerate(zip(spec.kinds, spec.features)):
        p = common.axis_params(params, i)
        if i == axis:
            blocks.append(chols[i].whiten(feat.dKuf_dx(kind, p, xstar[:, i])))
        else:
            blocks.append(jnp.zeros((feat.m, n), dtype=A.dtype))
    w = _concat(blocks)
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c
    p_ax = common.axis_params(params, axis)
    if full_cov:
        kss = kernels.grad_gram_1d(spec.kinds[axis], xstar[:, axis], xstar[:, axis],
                                   p_ax["variance"], p_ax["lengthscale"])
        return Gaussian(mean=mean, cov=kss - w.T @ w + tmp.T @ tmp)
    kss = kernels.grad_variance(spec.kinds[axis], p_ax["variance"],
                                p_ax["lengthscale"]) * jnp.ones((n,), dtype=A.dtype)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss))


@common.highest_precision
def q_dv(
    spec: AdditiveSGPRSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    axis: int,
    full_cov: bool = False,
) -> Gaussian:
    """Gridded-gradient posterior of the additive 2D field along ``axis``.

    v'_{ij} = ∫∫_cell ∂_axis f = δ_other · (f_axis(β) − f_axis(α)) — the
    other component drops entirely (constant along ``axis``) and the face
    difference is exact for every kind (fundamental theorem of calculus).
    The product value is constant in the other axis's cell index.
    Beyond-reference.
    """
    if spec.ndim != 2:
        raise ValueError("additive q_dv implemented for 2 components")
    axis = common.canonical_axis(spec, axis)
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    other = 1 - axis
    g_ax = grid_axes[axis]
    if not (g_ax.uniform and grid_axes[other].uniform):
        raise ValueError("additive gridded heads assume uniform grid axes "
                         "(constant δ per axis); use per-axis uniform meshes")
    d_other = grid_axes[other].delta
    kind = spec.kinds[axis]
    p = common.axis_params(params, axis)
    feat = spec.features[axis]
    kue = feat.Kuf(kind, p, g_ax.mesh_j(p))               # (m_ax, G_ax+1)
    kv = (kue[:, 1:] - kue[:, :-1]).T * d_other           # (G_ax, m_ax)
    r_ax = chols[axis].whiten(kv.T).T
    G_ax, G_oth = g_ax.m, grid_axes[other].m
    m_oth = spec.features[other].m
    zeros = jnp.zeros((G_ax * G_oth, m_oth), dtype=A.dtype)
    if axis == 0:
        R = jnp.concatenate([jnp.repeat(r_ax, G_oth, axis=0), zeros], axis=1)
    else:
        R = jnp.concatenate([zeros, jnp.tile(r_ax, (G_oth, 1))], axis=1)
    T = tri_solve(LB, R.T).T
    mean = T @ c
    kvv_ax = common._face_diff_gram(kind, p, g_ax) * (d_other * d_other)
    if full_cov:
        ones = jnp.ones((G_oth, G_oth), dtype=A.dtype)
        kvv = jnp.kron(kvv_ax, ones) if axis == 0 else jnp.kron(ones, kvv_ax)
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    dax = jnp.diagonal(kvv_ax)
    kvv_diag = (jnp.repeat(dax, G_oth) if axis == 0 else jnp.tile(dax, G_oth))
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))


@common.highest_precision
def p_v_u(
    spec: AdditiveSGPRSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
) -> Gaussian:
    """p(v | u = E_q[u]) for the additive 2D gridded head (additive analogue
    of reference ``gridded_univariate_structure.py:462-473``)."""
    if spec.ndim != 2:
        raise ValueError("additive p_v_u implemented for 2 components")
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    R, kvv1, kvv2, G1, G2 = _grid_R_kvv(spec, params, chols, grid_axes)
    # mean = Kvu Kuu⁻¹ m_u with m_u = L L_B⁻ᵀ c  →  R L_B⁻ᵀ c
    mean = tri_solve(LB, R.T).T @ c
    kvv = _kvv_dense(kvv1, kvv2, G1, G2)
    g = Gaussian(mean=mean, cov=kvv - R @ R.T)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))
