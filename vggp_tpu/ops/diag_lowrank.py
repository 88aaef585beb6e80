"""Diagonal-plus-low-rank operator: A = diag(α) + W Wᵀ.

This is the structure of the VFF Kuu: rank 1 for Matérn-1/2 (reference
``src/models/sparse/univariate_structure.py:487-504`` via
``DiagLinearOperator(alpha).add_low_rank(beta)``), rank 2 for Matérn-3/2 and
rank 3 for Matérn-5/2 (boundary-state terms of the interval RKHS inner
product — the reference ships only the Matérn-1/2 Kuu). Solve and logdet use
Woodbury / the matrix determinant lemma — O(m r²) instead of O(m³).
"""

from __future__ import annotations

import jax.numpy as jnp


def diag_rank1_dense(alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    return jnp.diag(alpha) + jnp.outer(beta, beta)


def diag_rank1_matvec(alpha: jnp.ndarray, beta: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    if v.ndim == 1:
        return alpha * v + beta * jnp.dot(beta, v)
    return alpha[:, None] * v + jnp.outer(beta, beta @ v)


def diag_rank1_solve(alpha: jnp.ndarray, beta: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (diag(α) + β βᵀ) x = b via Sherman–Morrison."""
    ia = 1.0 / alpha
    denom = 1.0 + jnp.sum(beta * beta * ia)
    if b.ndim == 1:
        iab = ia * b
        return iab - ia * beta * (jnp.sum(beta * iab) / denom)
    iab = ia[:, None] * b
    corr = jnp.outer(ia * beta, (beta @ iab)) / denom
    return iab - corr


def diag_rank1_logdet(alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """log|diag(α) + β βᵀ| via the matrix determinant lemma."""
    return jnp.sum(jnp.log(alpha)) + jnp.log1p(jnp.sum(beta * beta / alpha))


# --------------------------------------------------------------------------- #
# rank-r generalization: A = diag(α) + W Wᵀ, W (m, r)
# --------------------------------------------------------------------------- #

def diag_lowrank_dense(alpha: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    return jnp.diag(alpha) + W @ W.T


def diag_lowrank_matvec(alpha: jnp.ndarray, W: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    if v.ndim == 1:
        return alpha * v + W @ (W.T @ v)
    return alpha[:, None] * v + W @ (W.T @ v)


def _cap_chol(alpha: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """chol of the (r, r) capacitance I + Wᵀ diag(α)⁻¹ W."""
    r = W.shape[1]
    cap = jnp.eye(r, dtype=W.dtype) + W.T @ (W / alpha[:, None])
    return jnp.linalg.cholesky(0.5 * (cap + cap.T))


def diag_lowrank_solve(alpha: jnp.ndarray, W: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (diag(α) + W Wᵀ) x = b via Woodbury (O(m r²))."""
    import jax

    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    ia_b = b / alpha[:, None]
    Lc = _cap_chol(alpha, W)
    t = jax.scipy.linalg.cho_solve((Lc, True), W.T @ ia_b)  # (r, k)
    x = ia_b - (W / alpha[:, None]) @ t
    return x[:, 0] if vec else x


def diag_lowrank_logdet(alpha: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """log|diag(α) + W Wᵀ| via the matrix determinant lemma."""
    Lc = _cap_chol(alpha, W)
    return jnp.sum(jnp.log(alpha)) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lc)))
