"""Diagonal-plus-rank-1 operator: A = diag(α) + β βᵀ.

This is the structure of the VFF Kuu for Matérn-1/2 (reference
``src/models/sparse/univariate_structure.py:487-504`` via
``DiagLinearOperator(alpha).add_low_rank(beta)``). Solve and logdet use
Sherman–Morrison and the matrix determinant lemma — O(m) instead of O(m³).
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
