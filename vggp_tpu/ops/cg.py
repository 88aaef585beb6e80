"""Conjugate gradients with a user-supplied matvec — jit-safe (lax.while_loop).

The matrix-free companion to the structured matvecs in this package
(:func:`vggp_tpu.ops.sym_toeplitz_matvec` for B0 cell-integral Kuu,
:func:`vggp_tpu.ops.banded_matvec` for B1-spline RKHS Kuu): together they
give posterior-mean solves for inducing grids far past the dense-Cholesky
range (the reference materializes every Kuu and cannot represent these —
``src/models/sparse/univariate_structure.py:789-825`` builds the full
Toeplitz matrix even though only its action is needed).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    tol: float = 1e-8,
    maxiter: int = 1000,
    x0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Solve A x = b for PSD A given only ``matvec``; returns x.

    Plain CG with absolute+relative residual stopping (‖r‖ ≤ tol·‖b‖),
    fixed-shape state inside ``lax.while_loop`` so it jits and runs entirely
    on-device. ``b`` is a single (m,) right-hand side.
    """
    b = jnp.reshape(b, (-1,))
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    p = r
    rs = jnp.dot(r, r)
    bnorm2 = jnp.maximum(jnp.dot(b, b), jnp.finfo(b.dtype).tiny)
    tol2 = (tol * tol) * bnorm2

    def cond(state):
        _, _, _, rs, k = state
        return (rs > tol2) & (k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        ap = matvec(p)
        denom = jnp.dot(p, ap)
        alpha = rs / jnp.where(denom > 0, denom, jnp.finfo(b.dtype).tiny)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.dot(r, r)
        beta = rs_new / rs
        p = r + beta * p
        return x, r, p, rs_new, k + 1

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r, p, rs, jnp.asarray(0)))
    return x
