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


def _tile_kuf_F(a, b, x, lengthscale):
    """F of one (rows, TN) tile: Kuf = σ²ℓ·F. THE single copy of the
    compensated cell-Kuf tile numerics — every kernel builds on it.

    a/b: (rows, 1) cell edges; x: (1, TN) points.

    Inside a cell the naive value −(expm1(−u) + expm1(−w)) needs TWO
    per-element Horner series (TPU expm1 is inexact; ops.stablemath). The
    identity expm1(−u) + expm1(−w) = expm1(−u−w) − expm1(−u)·expm1(−w)
    with u + w = δ/ℓ (constant per cell row) moves the series onto the
    (rows, 1) column: the per-element cost drops to two plain exps. Error
    of the product term is ≤ (u+w)·ε_exp absolute against a value of size
    ~δ/ℓ, i.e. ~1e-6 relative in f32 — same order as the series path
    (validated against the f64 goldens in bench.smoke on-device).

    Returns (F, intermediates) so the ∂/∂ℓ tile can reuse the exp chain.
    """
    u = jnp.abs(x - a) / lengthscale          # (rows, TN)
    w = jnp.abs(x - b) / lengthscale
    inside = (x >= a) & (x <= b)
    dd = (b - a) / lengthscale                # (rows, 1)
    em_dd = expm1s(-dd)                       # series on the cheap axis only
    e_u = jnp.exp(-u)
    e_w = jnp.exp(-w)
    enear = jnp.maximum(e_u, e_w)             # = e^{-near}
    F = jnp.where(inside, -em_dd + (e_u - 1.0) * (e_w - 1.0), enear * (-em_dd))
    return F, (u, w, inside, dd, em_dd, e_u, e_w, enear)


def _cell_kuf_kernel(a_ref, b_ref, x_ref, scal_ref, out_ref):
    """One (TM, TN) tile of σℓ·Cov[∫_cell f, f(x)] (see ``_tile_kuf_F``).

    a_ref/b_ref: (TM, 1) cell edges; x_ref: (1, TN) points;
    scal_ref: (1, 2) [variance, lengthscale] in SMEM.
    """
    variance = scal_ref[0, 0]
    lengthscale = scal_ref[0, 1]
    F, _ = _tile_kuf_F(a_ref[:], b_ref[:], x_ref[:], lengthscale)
    out_ref[:] = variance * lengthscale * F


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
    out_ref[:], dl_ref[:] = _tile_kuf_dkuf(a_ref[:], b_ref[:], x_ref[:],
                                           variance, lengthscale)


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


# --------------------------------------------------------------------------- #
# Fused Kuf → banded-whiten kernel
#
# The hot training step consumes Kuf ONLY through the block-bidiagonal
# whitening apply a = F⁻¹·Kuf (ops.kms banded structure) and its gradient
# tangent t = F⁻¹·∂Kuf/∂ℓ. Materializing (Kuf, ∂Kuf) in HBM costs a
# write + two reads of two (m, n) arrays per axis per step — pure bandwidth.
# This kernel computes the Kuf/∂Kuf tiles in VMEM (two exps per element, see
# _cell_kuf_kernel) and immediately contracts them against the F⁻¹ diagonal
# and subdiagonal blocks on the MXU: the (m, n) intermediates never exist.
# a rides 6-pass f32 (the Titsias-critical precision, config
# WHITEN_MATMUL_PRECISION); t is gradient-only and rides the configured
# gradient precision.
# --------------------------------------------------------------------------- #

_BB = 128    # band block (must equal ops.kms.BAND_BLOCK)
_FTN = 256   # points per tile in the fused kernel (k-dim stays _BB)


def _tile_kuf_dkuf(a, b, x, variance, lengthscale):
    """(Kuf, ∂Kuf/∂ℓ) math for one (rows, TN) tile — shared tile body
    (Kuf = σ²ℓ·F, ∂Kuf/∂ℓ = σ²(F + G); F from ``_tile_kuf_F``)."""
    F, (u, w, inside, dd, em_dd, e_u, e_w, enear) = _tile_kuf_F(
        a, b, x, lengthscale)
    near = jnp.minimum(u, w)
    e_dd = 1.0 + em_dd                        # e^{-δ/ℓ}, per cell row
    G = jnp.where(inside, -(e_u * u + e_w * w),
                  enear * (near * (-em_dd) - e_dd * dd))
    return variance * lengthscale * F, variance * (F + G)


def _fused_whiten_kuf_kernel(diag_ref, sub_ref, ac_ref, bc_ref, ap_ref, bp_ref,
                             x_ref, scal_ref, a_ref, t_ref, *, a_precision,
                             t_precision):
    variance = scal_ref[0, 0]
    lengthscale = scal_ref[0, 1]
    x = x_ref[:]
    kuf_c, dk_c = _tile_kuf_dkuf(ac_ref[:], bc_ref[:], x, variance, lengthscale)
    kuf_p, dk_p = _tile_kuf_dkuf(ap_ref[:], bp_ref[:], x, variance, lengthscale)
    D = diag_ref[0]   # (BB, BB) F⁻¹[i, i]
    S = sub_ref[0]    # (BB, BB) F⁻¹[i, i−1] (zeros at i = 0)
    dn = (((1,), (0,)), ((), ()))
    a_ref[:] = (jax.lax.dot_general(D, kuf_c, dn, precision=a_precision)
                + jax.lax.dot_general(S, kuf_p, dn, precision=a_precision))
    t_ref[:] = (jax.lax.dot_general(D, dk_c, dn, precision=t_precision)
                + jax.lax.dot_general(S, dk_p, dn, precision=t_precision))


_LAX_PRECISION = {"default": jax.lax.Precision.DEFAULT,
                  "high": jax.lax.Precision.HIGH,
                  "highest": jax.lax.Precision.HIGHEST}


def fused_banded_whiten_kuf(finv, mesh, x, variance, lengthscale,
                            a_precision: str, t_precision: str):
    """(a, t) = (F⁻¹·Kuf, F⁻¹·∂Kuf/∂ℓ) without materializing Kuf/∂Kuf.

    Requires the banded structure of ``finv`` (block-bidiagonal at _BB —
    caller gates on ops.kms's geometric ratio exactly like
    ``banded_whiten_apply``) and m divisible by _BB with ≥ 2 blocks.
    Matches banded_whiten_apply(finv, cell_kuf(...)) to roundoff.
    """
    x = jnp.reshape(x, (-1,))
    m = mesh.shape[0] - 1
    n = x.shape[0]
    dtype = jnp.result_type(x, mesh)
    nb = m // _BB
    np_ = _round_up(max(n, 1), _FTN)
    xp = jnp.zeros((1, np_), dtype).at[0, :n].set(x)

    f4 = finv.reshape(nb, _BB, nb, _BB)
    rr = jnp.arange(nb)
    diag_blocks = f4[rr, :, rr, :]                                # (nb, BB, BB)
    sub_blocks = jnp.concatenate(
        [jnp.zeros((1, _BB, _BB), finv.dtype), f4[rr[1:], :, rr[:-1], :]], axis=0)

    a_cur = mesh[:-1].reshape(m, 1)
    b_cur = mesh[1:].reshape(m, 1)
    # previous block's rows, rolled down one block; the i = 0 slot holds a
    # harmless far-away dummy cell (its Kuf underflows to exactly 0, and the
    # i = 0 sub-block is zero anyway — keeps every lane finite)
    far = jnp.full((_BB, 1), mesh[0] - 1e6, dtype)
    a_prev = jnp.concatenate([far, a_cur[:-_BB]], axis=0)
    b_prev = jnp.concatenate([far + 1.0, b_cur[:-_BB]], axis=0)
    scal = jnp.stack([jnp.asarray(variance, dtype),
                      jnp.asarray(lengthscale, dtype)]).reshape(1, 2)

    kernel = functools.partial(_fused_whiten_kuf_kernel,
                               a_precision=_LAX_PRECISION[a_precision],
                               t_precision=_LAX_PRECISION[t_precision])
    row_spec = pl.BlockSpec((_BB, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    a_out, t_out = pl.pallas_call(
        kernel,
        grid=(nb, np_ // _FTN),
        in_specs=[
            pl.BlockSpec((1, _BB, _BB), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BB, _BB), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((1, _FTN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BB, _FTN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, _FTN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, np_), dtype),
            jax.ShapeDtypeStruct((m, np_), dtype),
        ],
        interpret=_interpret(),
    )(diag_blocks, sub_blocks, a_cur, b_cur, a_prev, b_prev, xp, scal)
    return a_out[:, :n], t_out[:, :n]


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
