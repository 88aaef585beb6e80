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
    tol: float | None = None,
    maxiter: int = 1000,
    x0: jnp.ndarray | None = None,
    return_info: bool = False,
):
    """Solve A x = b for PSD A given only ``matvec``.

    Stops on the RELATIVE residual ‖r‖ ≤ tol·‖b‖; fixed-shape state inside
    ``lax.while_loop`` so it jits and runs entirely on-device. ``b`` is a
    single (m,) right-hand side.

    ``tol=None`` picks a dtype-aware default, ``max(1e-8, 50·eps)``: the f32
    residual stagnates around ~1e-6 relative, so a fixed 1e-8 target is
    unreachable there and silently burns all ``maxiter`` iterations.

    A breakdown (pᵀAp ≤ 0 — A numerically indefinite from roundoff) exits
    the loop returning the best iterate so far; substituting a tiny
    denominator instead would blow ``alpha`` up to ~1/tiny and poison x.

    With ``return_info=True`` returns ``(x, iters, rel_resid)`` so callers
    can detect stagnation; default returns x alone.
    """
    b = jnp.reshape(b, (-1,))
    if tol is None:
        tol = max(1e-8, 50.0 * float(jnp.finfo(b.dtype).eps))
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
        ok = denom > 0
        alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        # breakdown: keep the current iterate and force the loop to exit
        rs_new = jnp.where(ok, jnp.dot(r, r), jnp.zeros_like(rs))
        beta = rs_new / rs
        p = r + beta * p
        return x, r, p, rs_new, k + 1

    x, r, _, rs_out, k = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0)))
    if return_info:
        return x, k, jnp.sqrt(jnp.dot(r, r) / bnorm2)
    return x


def pcg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    precond: Callable[[jnp.ndarray], jnp.ndarray],
    tol: float | None = None,
    maxiter: int = 1000,
    return_info: bool = False,
):
    """Preconditioned CG: solve A x = b given ``matvec`` and an SPD
    approximate-inverse ``precond`` (z = M⁻¹ r).

    Same contracts as :func:`cg_solve` — relative-residual stop on the TRUE
    residual ‖r‖ ≤ tol·‖b‖ (not the preconditioned one, so the answer
    quality is independent of how good M is), dtype-aware default tol,
    breakdown-safe exit. With ``precond = identity`` this IS cg_solve.
    """
    b = jnp.reshape(b, (-1,))
    if tol is None:
        tol = max(1e-8, 50.0 * float(jnp.finfo(b.dtype).eps))
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.dot(r, z)
    bnorm2 = jnp.maximum(jnp.dot(b, b), jnp.finfo(b.dtype).tiny)
    tol2 = (tol * tol) * bnorm2

    def cond(state):
        _, r, _, rz, k = state
        return (jnp.dot(r, r) > tol2) & (rz > 0) & (k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        ap = matvec(p)
        denom = jnp.dot(p, ap)
        ok = denom > 0
        alpha = jnp.where(ok, rz / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.where(ok, jnp.dot(r, z), jnp.zeros_like(rz))
        beta = rz_new / jnp.where(rz > 0, rz, 1.0)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, r, _, _, k = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.asarray(0)))
    if return_info:
        return x, k, jnp.sqrt(jnp.dot(r, r) / bnorm2)
    return x
