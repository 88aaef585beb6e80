"""Kronecker-product operators, never materialized on the hot path.

The reference materializes ``torch.kron(Kuu_1, Kuu_2)`` and builds the m×n
Khatri–Rao Kuf with a Python list-comprehension
(``src/models/sparse/kronecker_structure.py:496,513,661,822`` — SURVEY.md §7
hot spots). Here:

- kron matvecs are reshape–matmul–reshape chains (MXU matmuls),
- the row-wise Khatri–Rao is a single einsum,
- ``kron_dense`` exists only for tests and small gridded covariances.

Index convention matches ``torch.kron``/``numpy.kron``: the Kronecker product
``kron(A, B)`` has row index ``i_A * rows(B) + i_B`` (row-major flattening of
the (i_A, i_B) pair).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def kron_dense(mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Materialized Kronecker product of a list of matrices (tests / small m)."""
    out = mats[0]
    for m in mats[1:]:
        out = jnp.kron(out, m)
    return out


def kron_matvec(mats: Sequence[jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """(A₁ ⊗ … ⊗ A_d) @ x without materializing the product.

    ``x`` has shape (∏ m_i,). Cost is Σ_i m_i · ∏ m_j flops — a chain of
    dense matmuls that XLA tiles onto the MXU.
    """
    dims = [m.shape[1] for m in mats]
    t = x.reshape(dims)
    for i, a in enumerate(mats):
        t = jnp.moveaxis(jnp.tensordot(a, t, axes=[[1], [i]]), 0, i)
    return t.reshape(-1)


def khatri_rao_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Column-wise Kronecker (row-wise Khatri–Rao): (m1,n),(m2,n) → (m1·m2,n).

    Column j of the result is ``kron(a[:, j], b[:, j])``. Replaces the
    reference's ``torch.stack([k1 * k2 for k2 in Kuf_1 for k1 in Kuf_2])``
    Python loop (``kronecker_structure.py:513``) with one einsum.
    """
    m1, n = a.shape
    m2, _ = b.shape
    return jnp.einsum("in,jn->ijn", a, b).reshape(m1 * m2, n)


def kron_diag(diags: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """diag(A₁ ⊗ … ⊗ A_d) from per-factor diagonals (outer product, flattened)."""
    out = diags[0]
    for d in diags[1:]:
        out = (out[:, None] * d[None, :]).reshape(-1)
    return out
