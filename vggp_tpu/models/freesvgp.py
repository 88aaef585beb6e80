"""Collapsed sparse GP with FREE d-dimensional inducing points.

The reference's gridded 2D SVGP (``gridded_kronecker_structure.py:222-264``,
swept in nb61 cell 32 with Z ∈ {10..500}) places m free points z_i ∈ ℝᵈ and
uses the separable product kernel directly: Kuu is the m×m HADAMARD product
of per-dimension Grams (not a Kronecker product — free points don't
factorize), Kuf likewise. The per-axis feature machinery (models.sgpr)
cannot express this, so it gets its own small model built on the same
stable factored pipeline:

    A = L⁻¹Kuf/σ, B = I + AAᵀ, L_B = chol B, c = L_B⁻¹Ay/σ

(O(n·m²) — the reference's version is O(n³) through
``MultivariateNormal(Qff + σ²I).log_prob``, ``kronecker_structure.py:249-278``).
Z is learnable, like the reference's ``nn.Parameter`` Z.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from vggp_tpu import kernels
from vggp_tpu.features import CellIntegralFeature, _cell_point_cov
from vggp_tpu.models import common
from vggp_tpu.models.common import Gaussian
from vggp_tpu.ops import safe_cholesky, tri_solve, khatri_rao_rows
from vggp_tpu.ops.chol import psd_factor

Params = Dict


@dataclass(frozen=True)
class FreeSVGPSpec:
    """Static config: per-dimension kernel kinds + number of free points."""

    kinds: Tuple[str, ...]
    m: int
    jitter: float = 1e-6

    @property
    def ndim(self) -> int:
        return len(self.kinds)

    @property
    def num_inducing(self) -> int:
        return self.m

    def init_params(self, dtype=jnp.float32, z_init: np.ndarray | None = None,
                    seed: int = 0) -> Params:
        axes = tuple(
            {"variance": jnp.asarray(1.0, dtype), "lengthscale": jnp.asarray(1.0, dtype)}
            for _ in self.kinds
        )
        if z_init is None:
            z_init = np.random.default_rng(seed).random((self.m, self.ndim))
        return {
            "axes": axes,
            "z": jnp.asarray(z_init, dtype),
            "noise": jnp.asarray(0.1, dtype),
        }


def _hadamard_gram(spec, params: Params, z1: jnp.ndarray, z2: jnp.ndarray) -> jnp.ndarray:
    """∏_d k_d(z1[:, d], z2[:, d]) — the separable kernel on free points."""
    out = None
    for d, kind in enumerate(spec.kinds):
        p = common.axis_params(params, d)
        g = kernels.gram_1d(kind, z1[:, d], z2[:, d], p["variance"], p["lengthscale"])
        out = g if out is None else out * g
    return out


def _factored_state(spec: FreeSVGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray):
    y = jnp.reshape(y, (-1,))
    noise = params["noise"]
    sigma = jnp.sqrt(noise)
    z = params["z"]
    kuu = _hadamard_gram(spec, params, z, z)
    jitter = max(spec.jitter, min(common.KIND_JITTER_F32.get(k, 1e-4)
                                  for k in spec.kinds)
                 ) if kuu.dtype != jnp.float64 else spec.jitter
    chol = psd_factor(kuu, method="chol", jitter=jitter)
    kuf = _hadamard_gram(spec, params, z, X)
    A = chol.whiten(kuf) / sigma
    m = A.shape[0]
    B = jnp.eye(m, dtype=A.dtype) + A @ A.T
    LB = safe_cholesky(B, 1e-12)
    c = tri_solve(LB, A @ y) / sigma
    return chol, A, LB, c, y


@common.highest_precision
def elbo(spec: FreeSVGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Collapsed (Titsias) bound — equals the reference's
    ``KroneckerStructure._elbo`` (``kronecker_structure.py:249-278``) in
    O(n·m²)."""
    chol, A, LB, c, y = _factored_state(spec, params, X, y)
    n = y.shape[0]
    noise = params["noise"]
    kff_sum = jnp.sum(common.kdiag(spec, params, X))
    qff_tr = noise * jnp.sum(A * A)
    bound = -0.5 * n * jnp.log(2.0 * jnp.pi * noise)
    bound -= jnp.sum(jnp.log(jnp.diagonal(LB)))
    bound -= 0.5 * jnp.sum(y * y) / noise
    bound += 0.5 * jnp.sum(c * c)
    bound -= jnp.maximum(kff_sum - qff_tr, 0.0) / (2.0 * noise)
    return bound


def loss(spec, params, X, y):
    return -elbo(spec, params, X, y)


@common.highest_precision
def posterior(
    spec: FreeSVGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
    xstar: jnp.ndarray, full_cov: bool = False, predictive: bool = False,
) -> Gaussian:
    """q(f*) at test inputs (reference ``kronecker_structure.py:132-200``)."""
    chol, A, LB, c, y = _factored_state(spec, params, X, y)
    w = chol.whiten(_hadamard_gram(spec, params, params["z"], xstar))
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c
    noise = params["noise"] if predictive else 0.0
    if full_cov:
        kss = _hadamard_gram(spec, params, xstar, xstar)
        cov = kss - w.T @ w + tmp.T @ tmp
        if predictive:
            cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
        return Gaussian(mean=mean, cov=cov)
    kss = common.kdiag(spec, params, xstar)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss) + noise)


def posterior_predictive(spec, params, X, y, xstar, full_cov: bool = False) -> Gaussian:
    return posterior(spec, params, X, y, xstar, full_cov=full_cov, predictive=True)


def prior(spec: FreeSVGPSpec, params: Params, xstar: jnp.ndarray) -> Gaussian:
    """Prior N(0, K**) of the separable product kernel at test inputs
    (reference ``kronecker_structure.py:102-130``)."""
    cov = _hadamard_gram(spec, params, xstar, xstar)
    return Gaussian(mean=jnp.zeros(cov.shape[0], dtype=cov.dtype), cov=cov)


@common.highest_precision
def q_u(spec: FreeSVGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray) -> Gaussian:
    """Optimal q(u) = N(F F_B⁻ᵀ c, F B⁻¹ Fᵀ) over the free inducing points.

    Equals the reference's ``mean = Kuu Σ⁻¹ Kuf y / σ²``, ``cov = Kuu Σ⁻¹ Kuu``
    (``gridded_kronecker_structure.py:396-407``), PSD by construction.
    """
    chol, A, LB, c, y = _factored_state(spec, params, X, y)
    half = tri_solve(LB, chol.F.T).T          # F F_B⁻ᵀ  (m, m)
    return Gaussian(mean=half @ c, cov=half @ half.T)


@common.highest_precision
def p_v_u(
    spec: FreeSVGPSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
) -> Gaussian:
    """p(v | u = E_q[u]): mean = Kvu Kuu⁻¹ m_u, cov = Kvv − Kvu Kuu⁻¹ Kvuᵀ
    (reference ``gridded_kronecker_structure.py:409-419``), with the
    cell/point Kvu assembled as Khatri–Rao rows like :func:`q_v`."""
    chol, A, LB, c, y = _factored_state(spec, params, X, y)
    z = params["z"]
    blocks = []
    for d, kind in enumerate(spec.kinds):
        p = common.axis_params(params, d)
        blocks.append(_cell_point_cov(kind, grid_axes[d].mesh_j(p), z[:, d],
                                      p["variance"], p["lengthscale"]))
    kvu = blocks[0]
    for b in blocks[1:]:
        kvu = khatri_rao_rows(kvu, b)
    R = chol.whiten(kvu.T).T                  # Kvu F⁻ᵀ  (g, m)
    mean = tri_solve(LB, R.T).T @ c           # Kvu Kuu⁻¹ m_u = R F_B⁻ᵀ c
    kvv = common.grid_kvv(spec, params, grid_axes, dense=True)
    g = Gaussian(mean=mean, cov=kvv - R @ R.T)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))


@common.highest_precision
def posterior_grad(
    spec: FreeSVGPSpec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
    xstar: jnp.ndarray, axis: int, full_cov: bool = False,
) -> Gaussian:
    """Posterior over ∂f/∂x_axis (free-inducing-point model).

    Cov(f(z_j), ∂f(x*)) = k'_axis(x*_axis − z_{j,axis}) · ∏_{d≠axis} k_d —
    the axis factor of the Hadamard Gram swaps to the kernel derivative.
    Requires a once-differentiable kernel on ``axis``. Beyond-reference.
    """
    axis = common.canonical_axis(spec, axis)
    kernels.require_differentiable(spec.kinds[axis])
    chol, A, LB, c, y = _factored_state(spec, params, X, y)
    z = params["z"]
    kdu = None
    for d, kind in enumerate(spec.kinds):
        p = common.axis_params(params, d)
        if d == axis:
            g = kernels.dgram_1d(kind, xstar[:, d], z[:, d],
                                 p["variance"], p["lengthscale"])
        else:
            g = kernels.gram_1d(kind, xstar[:, d], z[:, d],
                                p["variance"], p["lengthscale"])
        kdu = g if kdu is None else kdu * g
    w = chol.whiten(kdu.T)                    # (m, n*)
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c
    if full_cov:
        kss = common.grad_gram_full(spec, params, xstar, xstar, axis)
        return Gaussian(mean=mean, cov=kss - w.T @ w + tmp.T @ tmp)
    kss = common.grad_kdiag(spec, params, xstar, axis)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss))


@common.highest_precision
def q_dv(
    spec: FreeSVGPSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    axis: int,
    full_cov: bool = False,
) -> Gaussian:
    """Gridded-gradient posterior ∫_cell ∂f/∂x_axis (free-point model).

    The axis factor is a face difference of plain kernel evaluations at the
    cell edges (fundamental theorem of calculus — valid for every kind);
    other axes keep their cell/point integrals. Beyond-reference.
    """
    axis = common.canonical_axis(spec, axis)
    chol, A, LB, c, y = _factored_state(spec, params, X, y)
    z = params["z"]
    blocks = []
    for d, kind in enumerate(spec.kinds):
        p = common.axis_params(params, d)
        if d == axis:
            mesh = grid_axes[d].mesh_j(p)
            g = kernels.gram_1d(kind, mesh, z[:, d], p["variance"], p["lengthscale"])
            blocks.append(g[1:, :] - g[:-1, :])
        else:
            blocks.append(_cell_point_cov(kind, grid_axes[d].mesh_j(p), z[:, d],
                                          p["variance"], p["lengthscale"]))
    kvu = blocks[0]
    for b in blocks[1:]:
        kvu = khatri_rao_rows(kvu, b)
    R = chol.whiten(kvu.T).T
    T = tri_solve(LB, R.T).T
    mean = T @ c
    kvv_blocks = common.grad_grid_kvv(spec, params, grid_axes, axis, dense=False)
    if full_cov:
        from vggp_tpu.ops import kron_dense

        kvv = kron_dense(kvv_blocks)
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    from vggp_tpu.ops import kron_diag

    kvv_diag = kron_diag([jnp.diagonal(b) for b in kvv_blocks])
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))


@common.highest_precision
def q_v(
    spec: FreeSVGPSpec,
    params: Params,
    X: jnp.ndarray,
    y: jnp.ndarray,
    grid_axes: Sequence[CellIntegralFeature],
    full_cov: bool = False,
) -> Gaussian:
    """Gridded posterior over B0 cell integrals of the product-kernel field.

    Kvu[(i₁,i₂), j] = ∏_d ∫_{cell i_d} k_d(t, z_{j,d}) dt — a row-wise
    (Khatri–Rao) product of per-dimension cell/point covariances, matching
    the reference's ``GriddedMatern12SVGP._Kvu``
    (``gridded_kronecker_structure.py:266-320``) without materializing the
    cartesian grid of z products.
    """
    chol, A, LB, c, y = _factored_state(spec, params, X, y)
    z = params["z"]
    blocks = []
    for d, kind in enumerate(spec.kinds):
        p = common.axis_params(params, d)
        blocks.append(_cell_point_cov(kind, grid_axes[d].mesh_j(p), z[:, d],
                                      p["variance"], p["lengthscale"]))
    kvu = blocks[0]
    for b in blocks[1:]:
        kvu = khatri_rao_rows(kvu, b)          # (∏ g_d, m)
    R = chol.whiten(kvu.T).T                   # Kvu F⁻ᵀ  (g, m)
    T = tri_solve(LB, R.T).T
    mean = T @ c
    if full_cov:
        kvv = common.grid_kvv(spec, params, grid_axes, dense=True)
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    from vggp_tpu.ops import kron_diag

    kvv_blocks = common.grid_kvv(spec, params, grid_axes, dense=False)
    kvv_diag = kron_diag([jnp.diagonal(b) for b in kvv_blocks])
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))
