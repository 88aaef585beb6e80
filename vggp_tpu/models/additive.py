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

import jax.numpy as jnp

from vggp_tpu.features import AxisFeature, CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.models.common import Gaussian
from vggp_tpu.ops import safe_cholesky, tri_solve

Params = Dict


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


def _kdiag(spec, params, n, dtype):
    v = jnp.zeros((n,), dtype)
    for i in range(spec.ndim):
        v = v + common.axis_params(params, i)["variance"]
    return v


def _factored_state(spec: AdditiveSGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray):
    y = jnp.reshape(y, (-1,))
    if X.ndim == 1:
        X = X[:, None]
    noise = params["noise"]
    sigma = jnp.sqrt(noise)
    chols = common.axis_chol_kuu(spec, params)
    blocks = common.axis_whitened_kuf(spec, params, chols, X)
    A = jnp.concatenate(blocks, axis=0) / sigma          # (Σ m_d, n)
    m = A.shape[0]
    B = jnp.eye(m, dtype=A.dtype) + A @ A.T
    LB = safe_cholesky(B, 1e-12)
    c = tri_solve(LB, A @ y) / sigma
    return chols, A, LB, c, y


@common.highest_precision
def elbo(spec: AdditiveSGPRSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Collapsed bound — identical form to sgpr.elbo with additive blocks."""
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    n = y.shape[0]
    noise = params["noise"]
    kff_sum = jnp.sum(_kdiag(spec, params, n, A.dtype))
    qff_tr = noise * jnp.sum(A * A)
    bound = -0.5 * n * jnp.log(2.0 * jnp.pi * noise)
    bound -= jnp.sum(jnp.log(jnp.diagonal(LB)))
    bound -= 0.5 * jnp.sum(y * y) / noise
    bound += 0.5 * jnp.sum(c * c)
    bound -= jnp.maximum(kff_sum - qff_tr, 0.0) / (2.0 * noise)
    return bound


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
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    blocks_star = common.axis_whitened_kuf(spec, params, chols, xstar)
    w = jnp.concatenate(blocks_star, axis=0)
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c
    noise = params["noise"] if predictive else 0.0
    if full_cov:
        kss = _gram_add(spec, params, xstar, xstar)
        cov = kss - w.T @ w + tmp.T @ tmp
        if predictive:
            cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
        return Gaussian(mean=mean, cov=cov)
    n_star = w.shape[1]
    kss = _kdiag(spec, params, n_star, w.dtype)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss) + noise)


def posterior_predictive(spec, params, X, y, xstar, full_cov: bool = False) -> Gaussian:
    return posterior(spec, params, X, y, xstar, full_cov=full_cov, predictive=True)


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
    g1, g2 = grid_axes
    d1, d2 = g1.delta, g2.delta
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)   # (g_i, m_i) per axis
    r1 = chols[0].whiten(kvu_blocks[0].T).T * d2            # (G1, m1)
    r2 = chols[1].whiten(kvu_blocks[1].T).T * d1            # (G2, m2)
    G1, G2 = r1.shape[0], r2.shape[0]
    # R rows indexed (i, j) row-major: [r1_i , r2_j]
    R = jnp.concatenate(
        [jnp.repeat(r1, G2, axis=0), jnp.tile(r2, (G1, 1))], axis=1
    )                                                        # (G1·G2, m1+m2)
    T = tri_solve(LB, R.T).T
    mean = T @ c
    kvv1 = g1.Kuu(spec.kinds[0], common.axis_params(params, 0)) * d2 * d2
    kvv2 = g2.Kuu(spec.kinds[1], common.axis_params(params, 1)) * d1 * d1
    if full_cov:
        # Cov[v_ij, v_kl] = d2² Kvv1[i,k] + d1² Kvv2[j,l] for ALL (j,l)/(i,k):
        # the cross-axis blocks are all-ones, not identity (each component is
        # constant across the other axis's cell index).
        ones1 = jnp.ones((G1, G1), dtype=kvv1.dtype)
        ones2 = jnp.ones((G2, G2), dtype=kvv2.dtype)
        kvv = jnp.kron(kvv1, ones2) + jnp.kron(ones1, kvv2)
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    kvv_diag = (
        jnp.repeat(jnp.diagonal(kvv1), G2) + jnp.tile(jnp.diagonal(kvv2), G1)
    )
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))
