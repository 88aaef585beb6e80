"""Pallas TPU kernels for the hot structured-covariance ops.

The library's hottest construction is the Matérn-1/2 B0 cell-integral
cross-covariance Kuf (reference ``univariate_structure.py:740-787`` — the
3-case closed form evaluated for every (cell, point) pair, each ELBO step,
per axis). Here it is a tiled Pallas kernel: cell edges ride along the
sublane axis, points along the lane axis, and each (TM, TN) tile is one
fused VPU pass (two exp, a select — no gather, no branch). The jnp
reference implementation lives in :mod:`vggp_tpu.features`
(``_m12_cell_point_cov``); this kernel computes the same compensated math
(see ops.stablemath for why the naive forms are not TPU-safe).

All kernels fall back to ``interpret=True`` off-TPU so the CPU test suite
exercises identical code paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# series coefficients for expm1(x) ≈ x + x²/2 + ... (|x| < 1): reuse the
# stablemath Horner core inside kernels (plain jnp — Pallas lowers it fine)
from vggp_tpu.ops.stablemath import expm1s

_TM = 128  # cells per tile (sublanes)
_TN = 128  # points per tile (lanes)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _cell_kuf_kernel(a_ref, b_ref, x_ref, scal_ref, out_ref):
    """One (TM, TN) tile of σℓ·Cov[∫_cell f, f(x)].

    a_ref/b_ref: (TM, 1) cell edges; x_ref: (1, TN) points;
    scal_ref: (1, 2) [variance, lengthscale] in SMEM.
    """
    variance = scal_ref[0, 0]
    lengthscale = scal_ref[0, 1]
    a = a_ref[:]          # (TM, 1)
    b = b_ref[:]
    x = x_ref[:]          # (1, TN)
    u = jnp.abs(x - a) / lengthscale          # (TM, TN)
    w = jnp.abs(x - b) / lengthscale
    inside = (x >= a) & (x <= b)
    near = jnp.minimum(u, w)
    dd = (b - a) / lengthscale
    outside_val = jnp.exp(-near) * (-expm1s(-dd))
    inside_val = -(expm1s(-u) + expm1s(-w))
    out_ref[:] = variance * lengthscale * jnp.where(inside, inside_val, outside_val)


@functools.partial(jax.jit, static_argnames=())
def cell_kuf(mesh: jnp.ndarray, x: jnp.ndarray, variance, lengthscale) -> jnp.ndarray:
    """(m, n) Matérn-1/2 cell-integral Kuf via a tiled Pallas kernel.

    ``mesh``: (m+1,) cell edges; ``x``: (n,) points. Equals
    ``features._m12_cell_point_cov`` to roundoff.
    """
    x = jnp.reshape(x, (-1,))
    m = mesh.shape[0] - 1
    n = x.shape[0]
    dtype = jnp.result_type(x, mesh)

    mp = _round_up(max(m, 1), _TM)
    np_ = _round_up(max(n, 1), _TN)
    # pad edges with a harmless dummy cell far away; pad x by edge-repeat
    a = jnp.full((mp, 1), mesh[0] - 1e6, dtype).at[:m, 0].set(mesh[:-1])
    b = jnp.full((mp, 1), mesh[0] - 1e6 + 1.0, dtype).at[:m, 0].set(mesh[1:])
    xp = jnp.zeros((1, np_), dtype).at[0, :n].set(x)
    scal = jnp.stack([jnp.asarray(variance, dtype), jnp.asarray(lengthscale, dtype)]
                     ).reshape(1, 2)

    out = pl.pallas_call(
        _cell_kuf_kernel,
        grid=(mp // _TM, np_ // _TN),
        in_specs=[
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), dtype),
        interpret=_interpret(),
    )(a, b, xp, scal)
    return out[:m, :n]


def _cell_kuf_dl_kernel(a_ref, b_ref, x_ref, scal_ref, out_ref, dl_ref):
    """One (TM, TN) tile of (Kuf, ∂Kuf/∂ℓ) — shared subexpressions, one pass.

    Kuf = σ²ℓ·F, ∂Kuf/∂ℓ = σ²(F + G) (see ``_cell_kuf_FG``); emitting both
    here avoids re-running the elementwise exp chain as a second unfused XLA
    pass in the scalar-whitening tangent (measured ~0.2 ms/step at the
    512²/4096 bench shapes).
    """
    variance = scal_ref[0, 0]
    lengthscale = scal_ref[0, 1]
    a = a_ref[:]
    b = b_ref[:]
    x = x_ref[:]
    u = jnp.abs(x - a) / lengthscale
    w = jnp.abs(x - b) / lengthscale
    inside = (x >= a) & (x <= b)
    near = jnp.minimum(u, w)
    dd = (b - a) / lengthscale
    enear = jnp.exp(-near)
    em_dd = expm1s(-dd)
    F = jnp.where(inside, -(expm1s(-u) + expm1s(-w)), enear * (-em_dd))
    G = jnp.where(
        inside,
        -(jnp.exp(-u) * u + jnp.exp(-w) * w),
        enear * (near * (-em_dd) - jnp.exp(-dd) * dd),
    )
    out_ref[:] = variance * lengthscale * F
    dl_ref[:] = variance * (F + G)


def cell_kuf_with_dl(mesh, x, variance, lengthscale):
    """(Kuf, ∂Kuf/∂ℓ) in one fused Pallas pass (falls back off-TPU sizes).

    Non-differentiable by construction — callers are custom-VJP forwards
    that consume both outputs as precomputed values.
    """
    x = jnp.reshape(x, (-1,))
    m = mesh.shape[0] - 1
    n = x.shape[0]
    from vggp_tpu import config

    if not config.pallas_kuf_enabled(m, n):
        F, G = _cell_kuf_FG(mesh, x, lengthscale)
        return variance * lengthscale * F, variance * (F + G)
    dtype = jnp.result_type(x, mesh)
    mp = _round_up(max(m, 1), _TM)
    np_ = _round_up(max(n, 1), _TN)
    a = jnp.full((mp, 1), mesh[0] - 1e6, dtype).at[:m, 0].set(mesh[:-1])
    b = jnp.full((mp, 1), mesh[0] - 1e6 + 1.0, dtype).at[:m, 0].set(mesh[1:])
    xp = jnp.zeros((1, np_), dtype).at[0, :n].set(x)
    scal = jnp.stack([jnp.asarray(variance, dtype), jnp.asarray(lengthscale, dtype)]
                     ).reshape(1, 2)
    out, dl = pl.pallas_call(
        _cell_kuf_dl_kernel,
        grid=(mp // _TM, np_ // _TN),
        in_specs=[
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TM, _TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, _TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, np_), dtype),
            jax.ShapeDtypeStruct((mp, np_), dtype),
        ],
        interpret=_interpret(),
    )(a, b, xp, scal)
    return out[:m, :n], dl[:m, :n]


@jax.custom_vjp
def cell_kuf_op(mesh, x, variance, lengthscale):
    """Differentiable wrapper: Pallas forward, analytic jnp backward.

    ``pallas_call`` has no automatic transpose rule; the cotangents w.r.t.
    (variance, lengthscale) — the only trained inputs — are taken through
    the jnp reference implementation, which XLA fuses into one VPU pass of
    its own. mesh/x receive zero cotangents (static geometry / data).
    """
    return cell_kuf(mesh, x, variance, lengthscale)


def _cell_kuf_fwd(mesh, x, variance, lengthscale):
    return cell_kuf(mesh, x, variance, lengthscale), (mesh, x, variance, lengthscale)


def _cell_kuf_FG(mesh, x, lengthscale):
    """(F, G) of the 3-case closed form: Kuf = σ²ℓ·F(ℓ), ℓF′(ℓ) = G.

    One fused elementwise VPU pass; shared by the analytic cotangents below
    and the analytic ℓ-tangent (:func:`cell_kuf_dl`)."""
    x = jnp.reshape(x, (-1,))
    a = mesh[:-1][:, None]
    b = mesh[1:][:, None]
    u = jnp.abs(x[None, :] - a) / lengthscale
    w = jnp.abs(x[None, :] - b) / lengthscale
    inside = (x[None, :] >= a) & (x[None, :] <= b)
    near = jnp.minimum(u, w)
    dd = (b - a) / lengthscale
    enear = jnp.exp(-near)
    em_dd = expm1s(-dd)
    F = jnp.where(inside, -(expm1s(-u) + expm1s(-w)), enear * (-em_dd))
    G = jnp.where(
        inside,
        -(jnp.exp(-u) * u + jnp.exp(-w) * w),
        enear * (near * (-em_dd) - jnp.exp(-dd) * dd),
    )
    return F, G


def cell_kuf_dl(mesh, x, variance, lengthscale) -> jnp.ndarray:
    """Analytic ∂Kuf/∂ℓ as a full (m, n) matrix.

    Kuf = σ²ℓ·F(ℓ) ⇒ ∂Kuf/∂ℓ = σ²(F + G). Used as the precomputed
    ℓ-tangent by the scalar-parameter whitening VJP
    (``models.common.whitened_kuf_scalar``) — ``cell_kuf_op`` is a
    custom_vjp and therefore has no JVP rule to forward-differentiate.
    """
    F, G = _cell_kuf_FG(mesh, x, lengthscale)
    return variance * (F + G)


def _cell_kuf_bwd(res, g):
    """Analytic cotangents in one fused elementwise pass.

    Kuf = σ²ℓ·F(ℓ) with F the 3-case closed form, so ∂/∂σ² = ℓF and
    ∂/∂ℓ = σ²(F + ℓF′) with ℓF′ = G (see :func:`_cell_kuf_FG`).
    Hand-written (instead of jax.vjp through the reference implementation)
    so XLA reads ḡ once and emits a single VPU pass — the reductions
    produce just two scalars.
    """
    mesh, x, variance, lengthscale = res
    F, G = _cell_kuf_FG(mesh, x, lengthscale)
    dv = jnp.sum(g * (lengthscale * F))
    dl = jnp.sum(g * (variance * (F + G)))
    return jnp.zeros_like(mesh), jnp.zeros_like(x), dv, dl


cell_kuf_op.defvjp(_cell_kuf_fwd, _cell_kuf_bwd)
