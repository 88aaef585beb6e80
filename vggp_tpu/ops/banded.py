"""Symmetric banded operators.

The ASVGP B1-spline RKHS Gram is banded (bandwidth 1: mass/stiffness
tridiagonal — reference ``univariate_structure.py:616-635``). These helpers
keep banded structure for matvecs and provide dense materialization for the
(small, per-axis) factorizations. Bands are stored LAPACK-style:
``bands[k]`` is the k-th superdiagonal, padded with trailing zeros —
``bands`` has shape (bandwidth + 1, m) with ``bands[0]`` the diagonal.
"""

from __future__ import annotations

import jax.numpy as jnp


def banded_to_dense(bands: jnp.ndarray) -> jnp.ndarray:
    """Dense symmetric matrix from its upper bands."""
    bw1, m = bands.shape
    out = jnp.diag(bands[0])
    for k in range(1, bw1):
        d = bands[k][: m - k]
        out = out + jnp.diag(d, k) + jnp.diag(d, -k)
    return out


def dense_to_banded(a: jnp.ndarray, bandwidth: int) -> jnp.ndarray:
    """Extract the diagonal + ``bandwidth`` superdiagonals of a symmetric matrix."""
    m = a.shape[0]
    rows = [jnp.diagonal(a)]
    for k in range(1, bandwidth + 1):
        rows.append(jnp.pad(jnp.diagonal(a, k), (0, k)))
    return jnp.stack(rows)


def banded_matvec(bands: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(diag + Σ_k super/sub-band_k) @ v in O(bandwidth · m).

    ``v`` may be (m,) or (m, k).
    """
    bw1, m = bands.shape
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    out = bands[0][:, None] * v
    for k in range(1, bw1):
        d = bands[k][: m - k][:, None]
        out = out.at[: m - k].add(d * v[k:])   # superdiagonal
        out = out.at[k:].add(d * v[: m - k])   # subdiagonal
    return out[:, 0] if squeeze else out
