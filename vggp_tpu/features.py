"""Inducing-feature families (per input axis).

Each feature family supplies, for one input axis, the three covariance blocks
a sparse GP model needs:

- ``Kuu(kind, p)``       : (m, m) inducing-feature covariance,
- ``Kuf(kind, p, x)``    : (m, n) cross-covariance with latent evaluations f(x),
- ``Kvu(kind, p, grid)`` : (g, m) cross-covariance with B0 cell integrals
  ``v_i = ∫_cell_i f(t) dt`` (the "gridded prediction" head).

``kind`` is the kernel kind (:mod:`vggp_tpu.kernels`), ``p`` a dict of traced
parameters (``variance``, ``lengthscale``, and ``z`` for free inducing
points). Meshes/limits are static numpy data: models close over features, so
jit sees only the traced parameter pytrees and static constants.

Reference parity (math re-derived, vectorized branch-free for XLA):

- ``PointFeature``        ≙ SVGP inducing points (``univariate_structure.py:273-321``)
- ``FourierFeature``      ≙ VFF (``fourier.py``, ``univariate_structure.py:364-520``)
- ``B1SplineFeature``     ≙ ASVGP B1-spline RKHS (``univariate_structure.py:531-658``)
- ``CellIntegralFeature`` ≙ GriddedGP B0 integral features
  (``univariate_structure.py:668-825`` — the library's crown jewel)

Known reference bugs intentionally NOT replicated (SURVEY.md §7):

- ASVGP Kuu: the reference multiplies the L2 mass matrix by ℓ and the
  stiffness matrix by 1/ℓ (``univariate_structure.py:654-658``). The Matérn-1/2
  RKHS inner product on [a,b] is ``⟨f,g⟩ = (ℓ∫f'g' + ∫fg/ℓ)/(2σ²) +
  (f(a)g(a)+f(b)g(b))/(2σ²)`` — stiffness carries ℓ. We implement the correct
  form (it is also what makes ASVGP's NLPD sane; cf. the +76 NLPD outlier in
  the reference's Envisat table).
- 2D gridded-VFF ``_Kvv_along_dim`` scales by ``lengthscale * 2`` instead of
  ``lengthscale ** 2`` (``gridded_kronecker_structure.py:594``) — not copied.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from vggp_tpu import kernels
from vggp_tpu.ops import diag_lowrank, toeplitz
from vggp_tpu.ops.stablemath import expm1mx, expm1s, gamma2_lower, gamma3_lower

Params = Dict[str, jnp.ndarray]


# --------------------------------------------------------------------------- #
# Matérn closed-form building blocks
#
# For k(r) = σ² p(λr) e^{-λr} (p polynomial), the once- and twice-integrated
# kernels are again poly·exp + linear terms:
#
#   G(R) = ∫₀ᴿ k(r) dr  = σ² [ (g0/λ)(1 − e^{-λR}) − e^{-λR}(g1 R + g2 λR²) ]
#   P(r) = ∫₀ʳ G(u) du  = σ² [ c_lin r/λ + (c0/λ²) expm1(−λr)
#                              + e^{-λr}(c1 r/λ + c2 r²) ]
#
# with per-order coefficients below (λ = 1/ℓ, √3/ℓ, √5/ℓ). Cell/point and
# cell/cell covariances follow by telescoping; every difference of nearby
# exponentials is evaluated through ops.stablemath (TPU transcendentals are
# too inexact for the naive forms — see that module). The Matérn-1/2 case
# reproduces the reference closed forms (``univariate_structure.py:740-825``);
# 3/2 and 5/2 gridded features are an extension the reference lacks.
# --------------------------------------------------------------------------- #

#                 c_lin   c0    c1     c2     g0     g1     g2
_CELL_COEFFS = {
    "matern12": (1.0,    1.0,  0.0,   0.0,   1.0,   0.0,   0.0),
    "matern32": (2.0,    3.0,  1.0,   0.0,   2.0,   1.0,   0.0),
    "matern52": (8/3,    5.0,  7/3,   1/3,   8/3,   5/3,   1/3),
}


def _lam_of(kind: str, lengthscale):
    return kernels.lam(kind, lengthscale)


# --- RBF (squared-exponential): erf-based integrated kernels ---------------- #
#
#   k(r) = σ² e^{-r²/(2ℓ²)}
#   G(R) = ∫₀ᴿ k  = σ² ℓ √(π/2) · erf(R/(ℓ√2))
#   P(r) = ∫₀ʳ G  = σ² [ ℓ √(π/2) · r · erf(r/(ℓ√2)) + ℓ² (e^{-r²/(2ℓ²)} − 1) ]
#
# Differences of nearby values use erfc (tail-accurate) and expm1.

_SQRT_HALF_PI = math.sqrt(math.pi / 2.0)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _rbf_cell_point_cov(mesh, x, variance, lengthscale):
    from jax.scipy.special import erf, erfc

    x = jnp.reshape(x, (-1,))
    a = mesh[:-1][:, None]
    b = mesh[1:][:, None]
    u = jnp.abs(x[None, :] - a)
    w = jnp.abs(x[None, :] - b)
    inside = (x[None, :] >= a) & (x[None, :] <= b)
    c = lengthscale * _SQRT_HALF_PI

    def G(R):
        return c * erf(R * _INV_SQRT2 / lengthscale)

    inside_val = G(u) + G(w)
    near = jnp.minimum(u, w)
    far = jnp.maximum(u, w)
    # G(far) − G(near) = c·(erfc(near') − erfc(far')) — tail-accurate
    outside_val = c * (erfc(near * _INV_SQRT2 / lengthscale)
                       - erfc(far * _INV_SQRT2 / lengthscale))
    return variance * jnp.where(inside, inside_val, outside_val)


def _rbf_cell_cell_cov(mesh_a, mesh_b, variance, lengthscale):
    from jax.scipy.special import erf, erfc

    a1, b1 = mesh_a[:-1][:, None], mesh_a[1:][:, None]
    a2, b2 = mesh_b[:-1][None, :], mesh_b[1:][None, :]
    ell2 = lengthscale * lengthscale
    A = lengthscale * _SQRT_HALF_PI

    def pdiff(u_pos, u_neg):
        """P(|u_pos|) − P(|u_neg|), compensated."""
        ap, an = jnp.abs(u_pos), jnp.abs(u_neg)
        mx, mn = jnp.maximum(ap, an), jnp.minimum(ap, an)
        s = jnp.where(ap >= an, 1.0, -1.0)
        d = mx - mn
        zmx = mx * _INV_SQRT2 / lengthscale
        zmn = mn * _INV_SQRT2 / lengthscale
        # M·erf(M') − m·erf(m') = d·erf(M') + m·(erfc(m') − erfc(M'))
        t1 = d * erf(zmx) + mn * (erfc(zmn) - erfc(zmx))
        # e^{-M²/2ℓ²} − e^{-m²/2ℓ²} = e^{-m²/2ℓ²}·expm1(−d(M+m)/(2ℓ²))
        t2 = jnp.exp(-0.5 * mn * mn / ell2) * expm1s(-0.5 * d * (mx + mn) / ell2)
        return s * (A * t1 + ell2 * t2)

    val = pdiff(b1 - a2, a1 - a2) + pdiff(a1 - b2, b1 - b2)
    return variance * val


def _cell_point_cov(kind: str, mesh: jnp.ndarray, x: jnp.ndarray, variance, lengthscale) -> jnp.ndarray:
    """Cov[v_i, f(x_j)] = ∫_cell_i k(|x_j − t|) dt. (m, n).

    Matérn 1/2, 3/2, 5/2 via the poly-exponential antiderivatives; RBF via
    the erf forms above.
    """
    if kind == "rbf":
        return _rbf_cell_point_cov(mesh, x, variance, lengthscale)
    c_lin, c0, c1, c2, g0, g1, g2 = _CELL_COEFFS[kind]
    lam = _lam_of(kind, lengthscale)
    x = jnp.reshape(x, (-1,))
    a = mesh[:-1][:, None]
    b = mesh[1:][:, None]
    u = jnp.abs(x[None, :] - a)
    w = jnp.abs(x[None, :] - b)
    inside = (x[None, :] >= a) & (x[None, :] <= b)

    def G(R):
        z = lam * R
        return (g0 / lam) * (-expm1s(-z)) - jnp.exp(-z) * (g1 * R + g2 * lam * R * R)

    inside_val = G(u) + G(w)
    # outside: G(far) − G(near), far − near = cell width, compensated
    near = jnp.minimum(u, w)
    far = jnp.maximum(u, w)
    d = b - a
    zd = lam * d
    outside_val = jnp.exp(-lam * near) * (
        -(g0 / lam + g1 * near + g2 * lam * near * near) * expm1s(-zd)
        - jnp.exp(-zd) * d * (g1 + g2 * lam * (far + near))
    )
    return variance * jnp.where(inside, inside_val, outside_val)


def _cell_cell_cov(kind: str, mesh_a: jnp.ndarray, mesh_b: jnp.ndarray, variance, lengthscale) -> jnp.ndarray:
    """Cov[∫_{A_i} f, ∫_{B_j} f] for any Matérn order, compensated. (ga, gb).

    ``∬ k = Σ± P(|u|)`` over the four corner differences; the linear part of
    P telescopes exactly to ``(c_lin/λ)·2·overlap`` and the decaying part is
    grouped into two compensated nearby-exponential differences.
    """
    if kind == "rbf":
        return _rbf_cell_cell_cov(mesh_a, mesh_b, variance, lengthscale)
    c_lin, c0, c1, c2, g0, g1, g2 = _CELL_COEFFS[kind]
    lam = _lam_of(kind, lengthscale)
    a1, b1 = mesh_a[:-1][:, None], mesh_a[1:][:, None]
    a2, b2 = mesh_b[:-1][None, :], mesh_b[1:][None, :]

    def fdiff(u_pos, u_neg):
        """f(|u_pos|) − f(|u_neg|) where f is P's decaying part, compensated."""
        ap, an = jnp.abs(u_pos), jnp.abs(u_neg)
        mx, mn = jnp.maximum(ap, an), jnp.minimum(ap, an)
        s = jnp.where(ap >= an, 1.0, -1.0)
        d = mx - mn
        zd = lam * d
        val = jnp.exp(-lam * mn) * (
            (c0 / (lam * lam) + c1 * mn / lam + c2 * mn * mn) * expm1s(-zd)
            + jnp.exp(-zd) * d * (c1 / lam + c2 * (mx + mn))
        )
        return s * val

    epart = fdiff(b1 - a2, a1 - a2) + fdiff(a1 - b2, b1 - b2)
    overlap = jnp.maximum(jnp.minimum(b1, b2) - jnp.maximum(a1, a2), 0.0)
    return variance * (epart + (c_lin / lam) * 2.0 * overlap)


# --------------------------------------------------------------------------- #
# Matérn-1/2 specializations (reference parity; also used by Pallas kernels)
# --------------------------------------------------------------------------- #

def _m12_cell_point_cov(mesh: jnp.ndarray, x: jnp.ndarray, variance, lengthscale) -> jnp.ndarray:
    """Cov[v_i, f(x_j)] for v_i = ∫_{cell i} f, Matérn-1/2 kernel. (m, n).

    Branch-free 3-case closed form (reference ``univariate_structure.py:740-787``):
    with a_i, b_i the cell edges and u = |x-a_i|/ℓ, w = |x-b_i|/ℓ,

    - x inside  [a_i,b_i] : σ²ℓ (2 - e^{-u} - e^{-w})
    - x outside           : σ²ℓ · e^{-min(u,w)} (1 - e^{-δ/ℓ})

    Both cases are compensated (ops.stablemath series expm1): the naive
    outside form ``±(e^{-u} - e^{-w})`` cancels catastrophically when the
    cell is narrow relative to ℓ; the case select is a ``jnp.where`` (no
    boolean fancy-indexing, jits clean).
    """
    x = jnp.reshape(x, (-1,))
    a = mesh[:-1][:, None]  # (m, 1)
    b = mesh[1:][:, None]
    u = jnp.abs(x[None, :] - a) / lengthscale
    w = jnp.abs(x[None, :] - b) / lengthscale
    inside = (x[None, :] >= a) & (x[None, :] <= b)
    near = jnp.minimum(u, w)
    dd = (b - a) / lengthscale  # = |u - w| outside the cell
    outside_val = jnp.exp(-near) * (-expm1s(-dd))
    inside_val = -(expm1s(-u) + expm1s(-w))
    return variance * lengthscale * jnp.where(inside, inside_val, outside_val)


def _m12_cell_cell_cov(mesh_a: jnp.ndarray, mesh_b: jnp.ndarray, variance, lengthscale) -> jnp.ndarray:
    """Cov[∫_{A_i} f, ∫_{B_j} f] for arbitrary cell sets, Matérn-1/2. (ga, gb).

    The raw antiderivative identity
    ``∬ e^{-|s-t|/ℓ} = ℓ² Σ± (e^{-|u|/ℓ} + |u|/ℓ)`` over the four corner
    differences cancels catastrophically in float32 when δ ≪ ℓ (the four
    terms are each ≈ 1; their combination is O((δ/ℓ)²) — observed 1e-4
    absolute error that q_v amplifies into negative variances through
    near-singular Kuu directions). Compensated form used here:

    - the |u| part telescopes *exactly* to ``2·overlap(A_i, B_j)``,
    - the exponential part is grouped into two differences of exponentials
      with nearby arguments, each evaluated as ``e^{-|v|/ℓ}·expm1(Δ/ℓ)``.

    For identical cells this reduces to ``2ℓ²σ²(expm1(-δ/ℓ) + δ/ℓ)`` — the
    same compensated expression as the Toeplitz diagonal, so Kvu == Kuu holds
    to roundoff when grid == features.
    """
    a1, b1 = mesh_a[:-1][:, None], mesh_a[1:][:, None]
    a2, b2 = mesh_b[:-1][None, :], mesh_b[1:][None, :]

    def ediff(u_far, u_near):
        # e^{-|u_far|/ℓ} - e^{-|u_near|/ℓ}, computed without cancellation
        an, af = jnp.abs(u_near) / lengthscale, jnp.abs(u_far) / lengthscale
        return jnp.exp(-an) * expm1s(an - af)

    epart = ediff(b1 - a2, a1 - a2) + ediff(a1 - b2, b1 - b2)
    overlap = jnp.maximum(jnp.minimum(b1, b2) - jnp.maximum(a1, a2), 0.0)
    return variance * lengthscale**2 * (epart + 2.0 * overlap / lengthscale)


def _m12_toeplitz_first_row(m: int, delta, variance, lengthscale, dtype) -> jnp.ndarray:
    """First row of the uniform-mesh B0 cell-integral Kuu (Toeplitz).

    Reference form (``univariate_structure.py:789-825``):
    ``row[k] = σ²ℓ² (e^{-(k-1)δ/ℓ} + e^{-(k+1)δ/ℓ} - 2 e^{-kδ/ℓ})`` for k ≥ 1
    and ``row[0] = 2σ²ℓ² (e^{-δ/ℓ} + δ/ℓ - 1)``.

    Compensated equivalents used here (f32-safe, TPU-transcendental-safe —
    see ops.stablemath for why plain expm1/sinh are not enough on TPU):
    ``row[k] = σ²ℓ² · (1 − e^{-δ/ℓ})² · e^{-(k-1)δ/ℓ}`` for k ≥ 1 (no
    cancellation, and — unlike the expm1(δ/ℓ)² form — no e^{+δ/ℓ} overflow
    when the optimizer drives ℓ toward its floor: every factor is ≤ 1) and
    ``row[0] = 2σ²ℓ² (e^{-δ/ℓ} − 1 + δ/ℓ)`` via the expm1mx series.
    """
    k = jnp.arange(m, dtype=dtype)
    d = delta / lengthscale
    omr = -expm1s(-d)                       # 1 - e^{-δ/ℓ}
    tail = omr * omr * jnp.exp(-jnp.maximum(k - 1.0, 0.0) * d)
    head = 2.0 * expm1mx(-d)
    row = jnp.where(k == 0, head, tail)
    return variance * lengthscale**2 * row


def _cell_p_series(kind: str, t):
    """h(t) = P(r)·λ²/σ² = c_lin t + c0 expm1(−t) + e^{−t}(c1 t + c2 t²).

    The diagonal cell variance is 2P(δ). The naive form cancels to O(t²)
    (the k ≤ 1 Taylor terms vanish identically for every Matérn order), so
    for t < 1 it is evaluated by its explicit Taylor series
    a_k = (−1)ᵏ (c0 − c1·k + c2·k(k−1)) / k!, k ≥ 2 — same strategy as
    ops.stablemath.expm1mx (of which it is the c = (·,1,0,0) special case).
    """
    _, c0, c1, c2 = _CELL_COEFFS[kind][:4]
    coeffs = [
        (c0 - c1 * k + c2 * k * (k - 1)) * (1.0 if k % 2 == 0 else -1.0) / math.factorial(k)
        for k in range(2, 16)
    ]
    small = jnp.abs(t) < 1.0
    ts = jnp.where(small, t, 0.0)
    acc = jnp.zeros_like(t) + coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = acc * ts + c
    series = acc * ts * ts
    tl = jnp.where(small, 1.0, t)
    c_lin = _CELL_COEFFS[kind][0]
    direct = c_lin * tl + c0 * expm1s(-tl) + jnp.exp(-tl) * (c1 * tl + c2 * tl * tl)
    return jnp.where(small, series, direct)


def _cell_toeplitz_first_row(kind: str, m: int, delta, variance, lengthscale,
                             dtype) -> jnp.ndarray:
    """Uniform-mesh cell-integral Kuu first row, Matérn-3/2 / 5/2 orders.

    The generic cell/cell closed form second-differences P(r) NUMERICALLY
    (row[k] = P((k+1)δ) − 2P(kδ) + P((k−1)δ)), which cancels with relative
    amplification ~(ℓ/δ)² — measured 1.5e-4 relative on TPU at ℓ/δ = 48,
    enough to push λ_min below the f32 jitter floor and NaN the on-device
    Cholesky. Here the second central difference is taken ANALYTICALLY:
    the linear term drops exactly, and with s = λδ, t = λkδ,

      Δ²[e^{−t}−1]  = e^{−t}·4sinh²(s/2)
      Δ²[t e^{−t}]  = e^{−t}·(4t sinh²(s/2) − 2s sinh s)
      Δ²[t² e^{−t}] = e^{−t}·(4t² sinh²(s/2) − 4ts sinh s + 2s² cosh s)

    whose coefficient combination cancels only down to a bounded constant
    (c0 − 2c1 + 2c2 = 1 for both orders). sinh/cosh route through the
    ops.stablemath series (TPU sinh is ~1e-6-absolute), and the whole tail
    is normalized by e^{−(k−1)s} so every exponential factor is BOUNDED —
    4sinh²(s/2)·e^{−t} = (1−e^{−s})²·e^{−(k−1)s} etc.; the raw sinh/cosh
    factors overflow f32 past s ≈ 176 (ℓ at its optimizer floor) and turn
    the k ≥ 2 entries into inf·0 = NaN. The Matérn-1/2 case of this formula
    reduces exactly to :func:`_m12_toeplitz_first_row`.
    Diagonal: 2P(δ) via :func:`_cell_p_series`.
    """
    _, c0, c1, c2 = _CELL_COEFFS[kind][:4]
    lam = _lam_of(kind, lengthscale)
    s = lam * delta
    k = jnp.arange(m, dtype=dtype)
    t = k * s
    omr = -expm1s(-s)                            # 1 - e^{-s}
    omr2 = -expm1s(-2.0 * s)                     # 1 - e^{-2s}
    opr2 = 2.0 + expm1s(-2.0 * s)                # 1 + e^{-2s}
    # e^{−(k−1)s}-normalized second differences:
    #   4sinh²(s/2)·e^{−t} = (1−e^{−s})²  · e^{−(k−1)s}
    #   2s·sinh(s)·e^{−t}  = s(1−e^{−2s}) · e^{−(k−1)s}
    #   2s²·cosh(s)·e^{−t} = s²(1+e^{−2s})· e^{−(k−1)s}
    decay = jnp.exp(-jnp.maximum(k - 1.0, 0.0) * s)
    tail = decay * (
        omr * omr * (c0 + c1 * t + c2 * t * t)
        - s * omr2 * (c1 + 2.0 * c2 * t)
        + c2 * s * s * opr2
    )
    head = 2.0 * _cell_p_series(kind, s)
    row = jnp.where(k == 0, head, tail)
    return variance / (lam * lam) * row


# 24-point Gauss–Legendre rule on [0, 1] (static constants; see
# _rbf_toeplitz_first_row — positive-weight quadrature has no cancellation).
_GL24_NODES, _GL24_WEIGHTS = np.polynomial.legendre.leggauss(24)
_GL24_S = 0.5 * (_GL24_NODES + 1.0)
_GL24_W = 0.5 * _GL24_WEIGHTS


def _rbf_toeplitz_first_row(m: int, delta, variance, lengthscale,
                            dtype) -> jnp.ndarray:
    """Uniform-mesh RBF cell-integral Kuu first row (VERDICT r2 weak #5).

    The generic cell/cell erf closed form second-differences P(r)
    numerically, cancelling with ~(ℓ/δ)² relative amplification — the same
    failure mode that NaN'd the on-device Matérn-3/2 Cholesky before its
    analytic row (:func:`_cell_toeplitz_first_row`). For the RBF there is no
    poly·exp telescoping, so the two regimes get two different cures:

    - **δ ≤ 2ℓ** (where the cancellation is worst): evaluate
      ``row[k] = ∫₀^δ (δ−s)·[k(kδ+s) + k(kδ−s)] ds`` — the box⋆box tent
      autocorrelation form — by a fixed 24-point Gauss–Legendre rule. All
      weights and integrand values are positive: NO cancellation, error at
      the f32 hardware floor (the e^{−r²/2ℓ²} integrand is entire and the
      interval is ≤ 2ℓ, so GL-24 converges far past f32 eps).
    - **δ ≥ 2ℓ**: the closed form's amplification (ℓ/δ)² ≤ 1/4 is harmless;
      use Δ²P with erf differences taken tail-accurately through erfc
      (``erf(x_{k+1}) − erf(x_k) = erfc(x_k) − erfc(x_{k+1})``) so the
      k-weighted terms inherit the Gaussian decay instead of accumulating
      k·ε_erf absolute error across a 512-cell row.

    Both branches are bounded everywhere (jnp.where evaluates both), and the
    k = 0 diagonal falls out of the same formulas (erf oddness / tent at
    lag 0). f64-quadrature-oracle tested in tests/test_features.py.
    """
    from jax.scipy.special import erfc

    k = jnp.arange(m, dtype=dtype)
    ell = lengthscale
    # --- Gauss–Legendre branch (exact-to-eps for δ ≤ 2ℓ) ---
    s = jnp.asarray(_GL24_S, dtype=dtype) * delta            # (q,)
    w = jnp.asarray(_GL24_W, dtype=dtype) * delta
    ctr = k[:, None] * delta
    inv2 = 0.5 / (ell * ell)
    gsum = (jnp.exp(-(ctr + s[None, :]) ** 2 * inv2)
            + jnp.exp(-(ctr - s[None, :]) ** 2 * inv2))
    row_gl = jnp.sum(w[None, :] * (delta - s[None, :]) * gsum, axis=1)
    # --- closed-form branch (no harmful cancellation for δ ≥ 2ℓ) ---
    h = delta * _INV_SQRT2 / ell
    x = jnp.arange(m + 1, dtype=dtype) * h                   # (m+1,)
    d_up = erfc(x[:-1]) - erfc(x[1:])        # erf(x_{j+1}) − erf(x_j), (m,)
    dp = d_up                                # Δ⁺ for k = 0..m−1
    dm = d_up[np.maximum(np.arange(m) - 1, 0)]  # Δ⁻; k = 0 → erf(h) − erf(−h) half
    g = jnp.exp(-x * x)
    idx_km1 = np.abs(np.arange(m) - 1)
    e2 = g[np.arange(m) + 1] - 2.0 * g[np.arange(m)] + g[idx_km1]
    t_part = _SQRT_HALF_PI * ell * delta * ((k + 1.0) * dp - (k - 1.0) * dm)
    row_cf = t_part + ell * ell * e2
    return variance * jnp.where(delta <= 2.0 * ell, row_gl, row_cf)


# --------------------------------------------------------------------------- #
# Features
# --------------------------------------------------------------------------- #

class AxisFeature:
    """Base class; concrete features implement Kuu / Kuf / Kvu."""

    m: int  # number of features

    def init_params(self, dtype=jnp.float32) -> Dict:
        """Feature-owned learnable parameters (empty for fixed bases)."""
        return {}

    def kuu_matvec(self, kind: str, p: Params, v: jnp.ndarray) -> jnp.ndarray:
        """Kuu @ v without assuming structure (dense fallback, O(m²)).

        Structured features override with O(m log m) / O(m) forms — the
        matrix-free hook behind :mod:`vggp_tpu.models.iterative`.
        """
        return self.Kuu(kind, p) @ v

    def kuu_diag(self, kind: str, p: Params) -> jnp.ndarray:
        """diag(Kuu) — the exact Jacobi preconditioner ingredient for the
        matrix-free CG path. Dense fallback; structured features override
        (row-sum proxies are NOT safe: the B1-spline Gram's negative
        off-diagonals cancel its row sums to ~0 while the true diagonal is
        O(ℓ/δ) — a row-sum preconditioner actively hurts there)."""
        return jnp.diagonal(self.Kuu(kind, p))

    def Kuf_dl(self, kind: str, p: Params, x: jnp.ndarray):
        """Analytic ∂Kuf/∂ℓ, or None → the caller forward-differentiates
        :meth:`Kuf` (valid whenever Kuf is a plain jnp computation)."""
        return None

    def Kuf_with_dl(self, kind: str, p: Params, x: jnp.ndarray):
        """(Kuf, ∂Kuf/∂ℓ) as precomputed values for scalar-tangent VJPs.

        Default composes :meth:`Kuf` with :meth:`Kuf_dl` (or a jvp when no
        analytic form exists); structured features may fuse both into one
        kernel pass.
        """
        kuf = self.Kuf(kind, p, x)
        dkuf = self.Kuf_dl(kind, p, x)
        if dkuf is None:
            _, dkuf = jax.jvp(
                lambda t: self.Kuf(kind, {**p, "lengthscale": t}, x),
                (p["lengthscale"],), (jnp.ones_like(p["lengthscale"]),),
            )
        return kuf, dkuf

    def dKuf_dx(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """∂Kuf/∂x column-wise: Cov(u_i, ∂f(x_n)) — the gradient-observable
        cross-covariance block (m, n).

        Default is one forward-mode pass through the closed-form :meth:`Kuf`
        with a unit tangent on every input — exact because column n depends
        only on x_n. Features with cheaper/stabler explicit forms override
        (cell integrals: a plain kernel-eval difference; points: k').
        Beyond-reference capability (the reference has no gradient
        observables); kind-differentiability is enforced by the model-level
        gradient functions, not here.
        """
        x = jnp.reshape(x, (-1,))
        _, d = jax.jvp(lambda t: self.Kuf(kind, p, t), (x,), (jnp.ones_like(x),))
        return d

    def dKuf_dx2(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """∂²Kuf/∂x² column-wise: Cov(u_i, ∂²f(x_n)) — the second-derivative
        observable block (vorticity/Laplacian heads). Default: forward-mode
        AD through :meth:`dKuf_dx` (exact a.e.); closed-form overrides below.
        """
        x = jnp.reshape(x, (-1,))
        _, d = jax.jvp(lambda t: self.dKuf_dx(kind, p, t), (x,), (jnp.ones_like(x),))
        return d

    # quadrature fallback used by tests to validate closed-form Kvu
    def kvu_quadrature(self, kind: str, p: Params, grid: "CellIntegralFeature", n_quad: int = 512):
        edges = np.asarray(grid.mesh)
        out = []
        for i in range(len(edges) - 1):
            ts = np.linspace(edges[i], edges[i + 1], n_quad)
            vals = self.Kuf(kind, p, jnp.asarray(ts))  # (m, n_quad)
            out.append(np.trapezoid(np.asarray(vals), ts, axis=1))
        return jnp.asarray(np.stack(out, axis=0))


@dataclass(frozen=True)
class PointFeature(AxisFeature):
    """Free inducing points u_i = f(z_i) along one axis (SVGP).

    ``z`` is learnable and lives in the per-axis param dict (reference
    registers Z as ``nn.Parameter``, ``univariate_structure.py:289-290``).
    """

    m: int
    z_init: np.ndarray = None  # (m,) initial locations

    def init_params(self, dtype=jnp.float32) -> Dict:
        z = self.z_init if self.z_init is not None else np.linspace(0.0, 1.0, self.m)
        return {"z": jnp.asarray(z, dtype=dtype)}

    def Kuu(self, kind: str, p: Params) -> jnp.ndarray:
        z = p["z"]
        return kernels.gram_1d(kind, z, z, p["variance"], p["lengthscale"])

    def Kuf(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        return kernels.gram_1d(kind, p["z"], x, p["variance"], p["lengthscale"])

    def Kvu(self, kind: str, p: Params, grid: "CellIntegralFeature") -> jnp.ndarray:
        return _cell_point_cov(kind, grid.mesh_j(p), p["z"], p["variance"], p["lengthscale"])

    def dKuf_dx(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Cov(f(z_i), ∂f(x_n)) = k'(x_n − z_i) — closed form, no AD kinks."""
        z = jnp.reshape(p["z"], (-1,))[:, None]
        xs = jnp.reshape(x, (-1,))[None, :]
        return kernels.dk_dr(kind, xs - z, p["variance"], p["lengthscale"])

    def dKuf_dx2(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Cov(f(z_i), ∂²f(x_n)) = k''(x_n − z_i) — closed form."""
        z = jnp.reshape(p["z"], (-1,))[:, None]
        xs = jnp.reshape(x, (-1,))[None, :]
        return -kernels.neg_d2k_dr2(kind, xs - z, p["variance"], p["lengthscale"])


@dataclass(frozen=True)
class FourierFeature(AxisFeature):
    """Variational Fourier features on [a, b] (VFF).

    ω_j = 2πj/(b-a); feature order is [cos_0 .. cos_M, sin_1 .. sin_M]
    (m = 2M+1), matching the reference basis layout (``fourier.py:42-56``).
    Kuu for Matérn-1/2 is the diag+rank-1 VFF representation
    (``univariate_structure.py:443-504``).
    """

    n_frequencies: int
    a: float
    b: float

    @property
    def m(self) -> int:
        return 2 * self.n_frequencies + 1

    def omegas(self, dtype=jnp.float32) -> jnp.ndarray:
        M = self.n_frequencies
        return (2.0 * jnp.pi) * jnp.arange(M + 1, dtype=dtype) / (self.b - self.a)

    def kuu_diag_rank1(self, kind: str, p: Params):
        """(α, β) of Kuu = diag(α) + ββᵀ — Matérn-1/2 only (VFF paper eq. 62).

        Kept for rank-1 Sherman–Morrison consumers; :meth:`kuu_diag_lowrank`
        is the general form.
        """
        if kind != "matern12":
            raise NotImplementedError("rank-1 VFF Kuu only for matern12; use kuu_diag_lowrank")
        alpha, W = self.kuu_diag_lowrank(kind, p)
        return alpha, W[:, 0]

    def kuu_diag_lowrank(self, kind: str, p: Params):
        """(α, W) of Kuu = diag(α) + W Wᵀ for Matérn-1/2, 3/2, 5/2.

        Derived from the Markov-state form of the interval RKHS inner product
        ⟨f,g⟩_H = state_f(a)ᵀ P₀⁻¹ state_g(a) + (1/c)∫_a^b (Lf)(Lg) dt with
        L = (d/dt + λ)^p, c the white-noise intensity of S(ω) = c/(λ²+ω²)^p,
        and P₀ the stationary state covariance — equivalent (by integration
        by parts) to the symmetric VFF forms, and verified numerically
        against quadrature in tests/test_features.py. For harmonics the
        integral term is exactly diagonal, (T/2)/S(ω_j) with the j=0 cosine
        doubled (VFF paper eq. 62 generalized); the boundary term is the
        low-rank part, with x_j = (ω_j/λ)²:

        - 1/2: rank 1 — β = 1/σ on cos, 0 on sin              (P₀ = σ²)
        - 3/2: rank 2 — β₁ = 1/σ on cos; β₂ = ω/(σλ) on sin   (P₀ = diag(σ², σ²λ²))
        - 5/2: rank 3 — β₁ = (3−x)/(√8σ) and β₂ = x/σ on cos;
               β₃ = √3·ω/(σλ) on sin
               (P₀⁻¹ of the (f, f'') block is [[9, 3/λ²],[3/λ², 9/λ⁴]]/(8σ²),
                f' decouples with Var f' = σ²λ²/3)

        The reference ships VFF Kuu only for Matérn-1/2
        (``univariate_structure.py:443-504``); 3/2 and 5/2 extend it.
        """
        dtype = jnp.result_type(p["lengthscale"])
        om = self.omegas(dtype=dtype)
        s = kernels.spectral_density(kind, om, p["variance"], p["lengthscale"])
        s_inv = 1.0 / s
        half = (self.b - self.a) / 2.0
        alpha = half * jnp.concatenate([2.0 * s_inv[:1], s_inv[1:], s_inv[1:]])
        sigma = jnp.sqrt(p["variance"])
        zc = jnp.zeros_like(om)        # cos-block zeros (M+1,)
        zs = jnp.zeros_like(om[1:])    # sin-block zeros (M,)
        if kind == "matern12":
            cols = [jnp.concatenate([jnp.ones_like(om) / sigma, zs])]
        elif kind in ("matern32", "matern52"):
            lmbda = kernels.lam(kind, p["lengthscale"])
            b_sin = om[1:] / (sigma * lmbda)
            if kind == "matern32":
                cols = [
                    jnp.concatenate([jnp.ones_like(om) / sigma, zs]),
                    jnp.concatenate([zc, b_sin]),
                ]
            else:
                x = (om / lmbda) ** 2
                cols = [
                    jnp.concatenate([(3.0 - x) / (sigma * math.sqrt(8.0)), zs]),
                    jnp.concatenate([x / sigma, zs]),
                    jnp.concatenate([zc, math.sqrt(3.0) * b_sin]),
                ]
        else:
            raise NotImplementedError(f"VFF Kuu closed form for {kind}")
        return alpha, jnp.stack(cols, axis=1)

    def Kuu(self, kind: str, p: Params) -> jnp.ndarray:
        alpha, W = self.kuu_diag_lowrank(kind, p)
        return diag_lowrank.diag_lowrank_dense(alpha, W)

    def Kuf(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Basis evaluation Φ(x), branch-free over the domain mask.

        Inside [a,b): cos(ω(x-a)) / sin(ω(x-a)). Outside, the Matérn-order
        continuation decays with r = min(|x-a|, |x-b|)
        (``fourier.py:78-135``); the inside/outside Python loop of the
        reference becomes a ``jnp.where`` select.
        """
        x = jnp.reshape(x, (-1,))
        om = self.omegas(dtype=jnp.result_type(x))
        inside = (x >= self.a) & (x < self.b)
        xr = x - self.a
        cos_in = jnp.cos(om[:, None] * xr[None, :])          # (M+1, n)
        sin_in = jnp.sin(om[1:, None] * xr[None, :])          # (M, n)

        r = jnp.minimum(jnp.abs(x - self.a), jnp.abs(x - self.b))
        # Markov continuation sign for the sin features: at the right edge
        # φ'(b) = +ω (cos(ω(b−a)) = 1) so φ(b+r) carries +ωr e^{-λr}; at the
        # left edge the extrapolation runs backwards in t, flipping the
        # derivative term: φ(a−r) carries −ωr e^{-λr}. (The reference's
        # fourier.py uses the opposite sign — a C¹-discontinuity bug at the
        # domain boundary, not replicated.)
        s = jnp.where(x < self.a, -1.0, 1.0)
        lmbda = kernels.lam(kind, p["lengthscale"])
        e = jnp.exp(-lmbda * r)
        if kind == "matern12":
            cos_out = jnp.broadcast_to(e[None, :], cos_in.shape)
            sin_out = jnp.zeros_like(sin_in)
        elif kind == "matern32":
            cos_out = jnp.broadcast_to(((1.0 + lmbda * r) * e)[None, :], cos_in.shape)
            sin_out = (s * r * e)[None, :] * om[1:, None]
        elif kind == "matern52":
            # Markov extrapolation e^{Fr} for (d/dt+λ)³: f ← e^{-λr}(1+λr+½λ²r²)f
            # + e^{-λr}r(1+λr)f' + ½r²e^{-λr}f'', with φ(b)=1, φ'(b)=0/±ω,
            # φ''(b)=-ω²/0 →  cos: e^{-λr}(1+λr+½(λ²-ω²)r²), sin: ±ωr(1+λr)e^{-λr}.
            # (The reference's ``(1 + λr + ½(λ² + ω²r²))e^{-λr}``,
            # fourier.py:126, is discontinuous at the domain boundary — typo,
            # not replicated.)
            cos_out = (1.0 + lmbda * r[None, :] + 0.5 * (lmbda**2 - om[:, None] ** 2) * r[None, :] ** 2) * e[None, :]
            sin_out = (s * r * (1.0 + lmbda * r) * e)[None, :] * om[1:, None]
        else:
            raise NotImplementedError(f"Fourier basis continuation for {kind}")
        cos_b = jnp.where(inside[None, :], cos_in, cos_out)
        sin_b = jnp.where(inside[None, :], sin_in, sin_out)
        return jnp.concatenate([cos_b, sin_b], axis=0)

    def _tail_integrals(self, kind: str, lam, om, r0, h):
        """∫ of the Markov-continuation basis over r ∈ [r0, r0 + h].

        ``r0``/``h`` are (g, 1) distances from the nearest domain boundary
        (h ≥ 0; h = 0 ⇒ zero integral), ``om`` the (M+1,) frequencies.
        Returns the cos-block integrals (g, M+1) — the ω = 0 constant basis
        rides as column 0, its continuation being the ω = 0 cosine — and the
        *unsigned* sin-block integrals (g, M); the caller applies the
        boundary-side sign s (see :meth:`Kuf`). The exponential-tail moments
        ∫ rⁿ e^{-λr} go through :mod:`ops.stablemath`'s γ(n+1, ·) series —
        the direct antiderivative differences cancel like (λh)ⁿ⁺¹ for short
        cells and TPU f32 exp error alone is ~1e-6 (CLAUDE.md).
        """
        dtype = r0.dtype
        g = r0.shape[0]
        x = lam * h
        e0 = jnp.exp(-lam * r0)
        i0 = e0 * (-expm1s(-x)) / lam            # ∫ e^{-λr}
        j1 = e0 * gamma2_lower(x) / (lam * lam)  # ∫ (r−r0) e^{-λr}
        i1 = r0 * i0 + j1                                   # ∫ r e^{-λr}
        if kind == "matern12":
            cos_t = jnp.broadcast_to(i0, (g, om.shape[0]))
            sin_t = jnp.zeros((g, om.shape[0] - 1), dtype)
        elif kind == "matern32":
            cos_t = jnp.broadcast_to(i0 + lam * i1, (g, om.shape[0]))
            sin_t = om[1:][None, :] * i1
        elif kind == "matern52":
            k2 = e0 * gamma3_lower(x) / (lam ** 3)
            i2 = r0 * r0 * i0 + 2.0 * r0 * j1 + k2          # ∫ r² e^{-λr}
            cos_t = (i0 + lam * i1
                     + 0.5 * (lam * lam - om[None, :] ** 2) * i2)
            sin_t = om[1:][None, :] * (i1 + lam * i2)
        else:  # pragma: no cover — guarded statically in Kvu
            raise NotImplementedError(f"Fourier tail integrals for {kind}")
        return cos_t, sin_t

    def Kvu(self, kind: str, p: Params, grid: "CellIntegralFeature") -> jnp.ndarray:
        """Closed-form cell integrals of the basis, inside AND outside [a, b].

        Inside the Fourier domain (reference
        ``gridded_univariate_structure.py:354-397``): ∫cell 1 = δ_i;
        ∫cell cos = (sin(ω(β-a)) - sin(ω(α-a)))/ω;
        ∫cell sin = -(cos(ω(β-a)) - cos(ω(α-a)))/ω.

        Cells extending past [a, b] — which the reference's closed forms do
        not cover — integrate the same decaying Markov continuation that
        :meth:`Kuf` evaluates pointwise (exponential-polynomial moments,
        :meth:`_tail_integrals`). Each cell splits into left-tail / inside /
        right-tail segments via static-free clamps, so straddling cells are
        exact and a grid fully inside costs nothing extra (the tail branch
        is skipped on a static numpy check of the grid mesh).
        """
        mesh = grid.mesh_j(p)
        om = self.omegas(dtype=mesh.dtype)
        al = mesh[:-1][:, None]
        be = mesh[1:][:, None]
        # inside segment [max(α, a), min(β, b)] (empty ⇒ zero-length ⇒ 0)
        ai = jnp.clip(al, self.a, self.b) - self.a
        bi = jnp.clip(be, self.a, self.b) - self.a
        col0 = bi - ai
        w = om[1:][None, :]
        cos_int = (jnp.sin(w * bi) - jnp.sin(w * ai)) / w
        sin_int = -(jnp.cos(w * bi) - jnp.cos(w * ai)) / w

        g = np.asarray(grid.mesh)
        if g[0] < self.a - 1e-12 or g[-1] > self.b + 1e-12:
            if kind not in ("matern12", "matern32", "matern52"):
                raise NotImplementedError(
                    f"FourierFeature.Kvu outside [a, b] needs the Markov "
                    f"continuation, defined for Matérn kinds only (got {kind!r})"
                )
            lam = kernels.lam(kind, p["lengthscale"])
            # right tail: x = b + r, r ∈ [max(α−b, 0), max(α−b, 0) + h]
            r0_r = jnp.maximum(al - self.b, 0.0)
            h_r = jnp.maximum(be - jnp.maximum(al, self.b), 0.0)
            cos_r, sin_r = self._tail_integrals(kind, lam, om, r0_r, h_r)
            # left tail: x = a − r, r ∈ [max(a−β, 0), …]; dx = −dr reverses
            # the limits and the boundary-side sign s = −1 flips sin
            r0_l = jnp.maximum(self.a - be, 0.0)
            h_l = jnp.maximum(jnp.minimum(be, self.a) - al, 0.0)
            cos_l, sin_l = self._tail_integrals(kind, lam, om, r0_l, h_l)
            col0 = col0 + cos_r[:, :1] + cos_l[:, :1]
            cos_int = cos_int + cos_r[:, 1:] + cos_l[:, 1:]
            sin_int = sin_int + sin_r - sin_l
        return jnp.concatenate([col0, cos_int, sin_int], axis=1)


def _require_uniform_mesh(mesh: np.ndarray, who: str) -> None:
    """Reject non-uniform meshes whose Kuu assumes uniform spacing.

    Both B1SplineFeature (delta-based mass/stiffness rows) and
    CellIntegralFeature (Toeplitz first-row Kuu) build their Gram from the
    first spacing only; a non-uniform mesh would silently produce a wrong
    Kuu while Kuf/Kvu stayed correct.
    """
    if len(mesh) < 2:
        raise ValueError(f"{who}: mesh needs at least 2 points, got {len(mesh)}")
    d = np.diff(mesh)
    if not np.all(d > 0):
        raise ValueError(f"{who}: mesh must be strictly increasing")
    if not np.allclose(d, d[0], rtol=1e-8, atol=1e-12 * abs(mesh[-1] - mesh[0])):
        raise ValueError(
            f"{who}: mesh must be uniformly spaced (Kuu is built from the "
            "first spacing only); got spacings in "
            f"[{d.min():.3e}, {d.max():.3e}]"
        )


def _b1_segments(mesh: np.ndarray):
    """Static (tl, tc, tr) triples for the B1 hat basis over ``mesh``.

    m = len(mesh) basis functions: a left half-hat, len(mesh)-2 interior hats,
    a right half-hat (reference ``bspline.py:106-112``). Degenerate segments
    (tl == tc or tc == tr) encode the halves.
    """
    mesh = np.asarray(mesh, dtype=np.float64)
    tl = np.concatenate([[mesh[0]], mesh[:-2], [mesh[-2]]])
    tc = np.concatenate([[mesh[0]], mesh[1:-1], [mesh[-1]]])
    tr = np.concatenate([[mesh[1]], mesh[2:], [mesh[-1]]])
    return tl, tc, tr


@dataclass(frozen=True)
class B1SplineFeature(AxisFeature):
    """B1 (hat) spline RKHS features on a uniform mesh (ASVGP).

    Kuu is the banded Matérn-1/2 RKHS Gram: with mass matrix A (∫φφ'),
    stiffness B (∫φ'φ'') and boundary diag BC,
    ``Kuu = (ℓ·B + A/ℓ + BC) / (2σ²)``  [correct orientation — see module
    docstring re: the reference's swapped ℓ placement].
    """

    mesh: np.ndarray  # (n_knots,) uniform

    def __post_init__(self):
        mesh = np.asarray(self.mesh, dtype=np.float64)
        _require_uniform_mesh(mesh, "B1SplineFeature")
        object.__setattr__(self, "mesh", mesh)

    @property
    def m(self) -> int:
        return len(self.mesh)

    @property
    def delta(self) -> float:
        return float(self.mesh[1] - self.mesh[0])

    def _mass_stiff_bc(self, dtype):
        """Static mass/stiffness/boundary matrices (hyperparameter-free)."""
        m, d = self.m, self.delta
        # Toeplitz first rows + boundary diagonal corrections
        # (reference univariate_structure.py:616-635)
        mass_row = np.zeros(m); mass_row[0] = 2.0 * d / 3.0; mass_row[1] = d / 6.0
        mass_bc = np.zeros(m); mass_bc[[0, -1]] = -d / 3.0
        stiff_row = np.zeros(m); stiff_row[0] = 2.0 / d; stiff_row[1] = -1.0 / d
        stiff_bc = np.zeros(m); stiff_bc[[0, -1]] = -1.0 / d
        bc = np.zeros(m); bc[[0, -1]] = 1.0
        A = toeplitz.sym_toeplitz_dense(jnp.asarray(mass_row, dtype)) + jnp.diag(jnp.asarray(mass_bc, dtype))
        B = toeplitz.sym_toeplitz_dense(jnp.asarray(stiff_row, dtype)) + jnp.diag(jnp.asarray(stiff_bc, dtype))
        return A, B, jnp.diag(jnp.asarray(bc, dtype))

    def Kuu(self, kind: str, p: Params) -> jnp.ndarray:
        if kind != "matern12":
            raise NotImplementedError("B1-spline RKHS Kuu implemented for matern12")
        ls, var = p["lengthscale"], p["variance"]
        dtype = jnp.result_type(ls)
        A, B, BC = self._mass_stiff_bc(dtype)
        return (ls * B + A / ls + BC) / (2.0 * var)

    def kuu_bands(self, kind: str, p: Params) -> jnp.ndarray:
        """(2, m) LAPACK-style bands of the tridiagonal RKHS Kuu.

        Same matrix as :meth:`Kuu` (ℓ·stiffness + mass/ℓ + boundary, over
        2σ²) kept banded for O(m) matvecs on huge knot meshes.
        """
        if kind != "matern12":
            raise NotImplementedError("B1-spline RKHS Kuu implemented for matern12")
        ls, var = p["lengthscale"], p["variance"]
        dtype = jnp.result_type(ls)
        m, d = self.m, self.delta
        diag = jnp.full((m,), ls * (2.0 / d) + (2.0 * d / 3.0) / ls, dtype)
        corr = ls * (-1.0 / d) + (-d / 3.0) / ls + 1.0
        diag = diag.at[jnp.array([0, m - 1])].add(corr)
        off = jnp.full((m,), ls * (-1.0 / d) + (d / 6.0) / ls, dtype).at[m - 1].set(0.0)
        return jnp.stack([diag, off]) / (2.0 * var)

    def kuu_matvec(self, kind: str, p: Params, v: jnp.ndarray) -> jnp.ndarray:
        """Kuu @ v via the banded matvec, O(m)."""
        from vggp_tpu.ops import banded

        return banded.banded_matvec(self.kuu_bands(kind, p), v)

    def kuu_diag(self, kind: str, p: Params) -> jnp.ndarray:
        """diag(Kuu) = the bands' main diagonal, O(m)."""
        return self.kuu_bands(kind, p)[0]

    def Kuf(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Hat-function evaluations Φ(x) — (m, n), vectorized Cox–de Boor."""
        x = jnp.reshape(x, (-1,))
        dtype = jnp.result_type(x)
        tl_np, tc_np, tr_np = _b1_segments(self.mesh)
        tl, tc, tr = (jnp.asarray(t, dtype) for t in (tl_np, tc_np, tr_np))
        has_up = jnp.asarray(tc_np > tl_np)
        has_down = jnp.asarray(tr_np > tc_np)
        xt = x[None, :]
        up_den = jnp.where(has_up, tc - tl, 1.0)[:, None]
        down_den = jnp.where(has_down, tr - tc, 1.0)[:, None]
        up = (xt - tl[:, None]) / up_den
        down = (tr[:, None] - xt) / down_den
        in_up = has_up[:, None] & (xt >= tl[:, None]) & (xt <= tc[:, None])
        in_down = has_down[:, None] & (xt > tc[:, None]) & (xt <= tr[:, None])
        # left half-hat: down-ramp includes its left endpoint
        in_down_l = has_down[:, None] & (~has_up[:, None]) & (xt == tc[:, None])
        val = jnp.where(in_up, up, 0.0) + jnp.where(in_down | in_down_l, down, 0.0)
        return val.astype(dtype)

    def Kvu(self, kind: str, p: Params, grid: "CellIntegralFeature") -> jnp.ndarray:
        """Exact integrals of each hat over each grid cell — (g, m).

        Generalizes the reference's rolled-row constructions
        (``gridded_univariate_structure.py:595-608``,
        ``gridded_kronecker_structure.py:831-839``) to any alignment of the
        B1 mesh and the B0 cell grid, via closed-form ramp integrals.
        """
        mesh = grid.mesh_j(p)
        dtype = mesh.dtype
        tl, tc, tr = (jnp.asarray(t, dtype) for t in _b1_segments(self.mesh))
        a = mesh[:-1][:, None]  # (g, 1)
        b = mesh[1:][:, None]

        def ramp_up_int(lo, hi, t0, t1):
            # ∫ over [lo,hi]∩[t0,t1] of (x - t0)/(t1 - t0)
            den = jnp.where(t1 > t0, t1 - t0, 1.0)
            lo_c = jnp.clip(lo, t0, t1)
            hi_c = jnp.clip(hi, t0, t1)
            val = ((hi_c - t0) ** 2 - (lo_c - t0) ** 2) / (2.0 * den)
            return jnp.where(t1 > t0, val, 0.0)

        def ramp_down_int(lo, hi, t0, t1):
            # ∫ over [lo,hi]∩[t0,t1] of (t1 - x)/(t1 - t0)
            den = jnp.where(t1 > t0, t1 - t0, 1.0)
            lo_c = jnp.clip(lo, t0, t1)
            hi_c = jnp.clip(hi, t0, t1)
            val = ((t1 - lo_c) ** 2 - (t1 - hi_c) ** 2) / (2.0 * den)
            return jnp.where(t1 > t0, val, 0.0)

        up = ramp_up_int(a, b, tl[None, :], tc[None, :])
        down = ramp_down_int(a, b, tc[None, :], tr[None, :])
        return up + down


# Matérn order matched to spline smoothness: degree-p splines are C^{p-1}
# (∈ H_ν for ν = p − 1/2), the ASVGP order prescription.
_SPLINE_KIND_BY_DEGREE = {2: "matern32", 3: "matern52"}


@dataclass(frozen=True)
class SplineRKHSFeature(AxisFeature):
    """Higher-order B-spline RKHS features — ASVGP for Matérn-3/2 and 5/2.

    The reference's ASVGP is Matérn-1/2-only (B1 hats are not in smoother
    Matérn RKHSs: H_{3/2} needs square-integrable second derivatives and
    hats have distributional ones). Degree-p B-splines are C^{p−1} with
    bounded p-th derivatives, so degree 2 lives in H_{3/2} and degree 3 in
    H_{5/2}, and the ASVGP construction extends (the ASVGP paper's
    order-(ν+1/2) spline prescription; reference
    ``univariate_structure.py:531-658`` is the B1 baseline generalized).

    Kuu uses the Markov-state form of the interval RKHS inner product (same
    derivation as ``FourierFeature.kuu_diag_lowrank``, quadrature-verified
    in tests): with L = (d/dt + λ)^p and c the white-noise intensity of
    S(ω) = c/(λ²+ω²)^p,

        ⟨φᵢ,φⱼ⟩ = (1/c)·Σ_{r,s≤p} C(p,r)C(p,s) λ^{2p−r−s} ∫φᵢ^(r)φⱼ^(s)
                  + state_i(a)ᵀ P₀⁻¹ state_j(a)

    where the ∫φ^(r)φ^(s) are STATIC banded spline-product integrals
    (exact Gauss–Legendre at construction — hyperparameter-free, like the
    B1 mass/stiffness matrices), so the traced Kuu is a polynomial-in-λ
    combination: XLA-friendly, no quadrature in the graph. P₀ is the
    stationary state covariance — diag(σ², σ²λ²) for p = 2;
    for p = 3 the (f, f'') block couples:
    P₀ = σ²·[[1, 0, −λ²/3], [0, λ²/3, 0], [−λ²/3, 0, λ⁴]].

    Basis: open-clamped uniform knots on [a, b] with K intervals →
    m = K + p functions; Kuf evaluates the piecewise polynomials branch-free
    (static per-interval coefficient tables + a where-mask placement); Kvu
    (cell integrals of the basis) is fully static and exact (spline
    antiderivatives).
    """

    degree: int
    n_intervals: int
    a: float
    b: float

    def __post_init__(self):
        if self.degree not in _SPLINE_KIND_BY_DEGREE:
            raise ValueError("SplineRKHSFeature supports degree 2 or 3")
        if self.n_intervals < self.degree:
            raise ValueError("need n_intervals >= degree")
        from scipy.interpolate import BSpline

        deg, K, a, b = self.degree, self.n_intervals, self.a, self.b
        delta = (b - a) / K
        interior = np.linspace(a, b, K + 1)
        T = np.concatenate([[a] * deg, interior, [b] * deg])  # open-clamped
        m = K + deg
        splines = [BSpline(T, np.eye(m)[j], deg, extrapolate=False) for j in range(m)]
        derivs = [[s.derivative(r) if r else s for r in range(deg + 1)] for s in splines]

        # exact Gauss–Legendre per interval (deg+1 points: exact to degree
        # 2·deg+1 ≥ products of two degree-deg polynomials)
        gl_x, gl_w = np.polynomial.legendre.leggauss(deg + 1)
        M = np.zeros((deg + 1, deg + 1, m, m))
        for i in range(K):
            lo, hi = interior[i], interior[i + 1]
            xs = 0.5 * (hi - lo) * gl_x + 0.5 * (hi + lo)
            ws = 0.5 * (hi - lo) * gl_w
            act = range(i, min(m, i + deg + 1))  # active bases on interval i
            V = {(j, r): np.nan_to_num(derivs[j][r](xs)) for j in act
                 for r in range(deg + 1)}
            for j in act:
                for k in act:
                    for r in range(deg + 1):
                        for s in range(deg + 1):
                            M[r, s, j, k] += np.sum(ws * V[(j, r)] * V[(k, s)])
        eps = 1e-12 * (b - a)
        state = np.stack([
            np.array([float(np.nan_to_num(derivs[j][r](a + eps))) for j in range(m)])
            for r in range(deg)
        ])  # (deg, m): φ^(r)(a) rows

        # per-interval polynomial coefficient table C[i, s, :] in the local
        # coordinate u = (x − a)/δ − i ∈ [0, 1] (degree+1 coefficients,
        # recovered exactly by interpolation at degree+1 nodes)
        C = np.zeros((K, deg + 1, deg + 1))
        nodes = np.linspace(1e-9, 1 - 1e-9, deg + 1)
        vander = np.vander(nodes, deg + 1, increasing=True)
        for i in range(K):
            lo = a + i * delta
            pts = lo + delta * nodes
            for s in range(deg + 1):
                j = i + s
                if j >= m:
                    continue
                vals = np.array([float(np.nan_to_num(splines[j](t))) for t in pts])
                C[i, s] = np.linalg.solve(vander, vals)

        object.__setattr__(self, "_M", M)
        object.__setattr__(self, "_state", state)
        object.__setattr__(self, "_coeffs", C)
        object.__setattr__(self, "_splines", tuple(splines))
        object.__setattr__(self, "delta", delta)

    @property
    def m(self) -> int:
        return self.n_intervals + self.degree

    @property
    def kind(self) -> str:
        return _SPLINE_KIND_BY_DEGREE[self.degree]

    def Kuu(self, kind: str, p: Params) -> jnp.ndarray:
        want = self.kind
        if kind != want:
            raise NotImplementedError(
                f"degree-{self.degree} spline RKHS Kuu pairs with {want} "
                f"(C^{self.degree - 1} splines live in H_{{{want[-2]}/{want[-1]}}})"
            )
        ls, var = p["lengthscale"], p["variance"]
        dtype = jnp.result_type(ls)
        lam = kernels.lam(kind, ls)
        deg = self.degree
        c = kernels.white_noise_intensity(kind, var, ls)
        integral = jnp.zeros((self.m, self.m), dtype)
        for r in range(deg + 1):
            for s in range(deg + 1):
                w = math.comb(deg, r) * math.comb(deg, s)
                integral = integral + (w * lam ** (2 * deg - r - s)) * jnp.asarray(
                    self._M[r, s], dtype)
        out = integral / c
        pinv = kernels.p0_inv_rows(kind, var, ls)
        for r in range(deg):
            for s in range(deg):
                if isinstance(pinv[r][s], float) and pinv[r][s] == 0.0:
                    continue
                sr = jnp.asarray(self._state[r], dtype)
                ss = jnp.asarray(self._state[s], dtype)
                out = out + pinv[r][s] * jnp.outer(sr, ss)
        return out

    def Kuf(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Branch-free piecewise-polynomial evaluation Φ(x) — (m, n)."""
        x = jnp.reshape(x, (-1,))
        dtype = jnp.result_type(x)
        K, deg = self.n_intervals, self.degree
        t = (x - self.a) / self.delta
        i = jnp.clip(jnp.floor(t), 0, K - 1).astype(jnp.int32)   # (n,)
        u = t - i
        Cj = jnp.asarray(self._coeffs, dtype)                    # (K, deg+1, deg+1)
        ci = Cj[i]                                               # (n, deg+1, deg+1)
        upow = jnp.stack([u**k for k in range(deg + 1)], axis=1)  # (n, deg+1)
        vals = jnp.einsum("nsc,nc->ns", ci, upow)                # (n, deg+1)
        rows = jnp.arange(self.m, dtype=jnp.int32)[:, None]      # (m, 1)
        out = jnp.zeros((self.m, x.shape[0]), dtype)
        inside = (x >= self.a) & (x <= self.b)
        for s in range(deg + 1):
            out = out + jnp.where(
                (rows == (i + s)[None, :]) & inside[None, :], vals[:, s][None, :], 0.0
            )
        return out

    def Kvu(self, kind: str, p: Params, grid: "CellIntegralFeature") -> jnp.ndarray:
        """Exact integrals of each spline over each grid cell.

        Both meshes are static, so this is a static table (spline
        antiderivatives at clipped cell edges), cast to the traced dtype.
        """
        mesh = np.asarray(grid.mesh)
        anti = [s.antiderivative() for s in self._splines]
        lo = np.clip(mesh[:-1], self.a, self.b)
        hi = np.clip(mesh[1:], self.a, self.b)
        tbl = np.zeros((len(mesh) - 1, self.m))
        for j, A in enumerate(anti):
            tbl[:, j] = np.nan_to_num(A(hi)) - np.nan_to_num(A(lo))
        return jnp.asarray(tbl, jnp.result_type(p["lengthscale"]))


def B2SplineFeature(n_intervals: int, a: float, b: float) -> SplineRKHSFeature:
    """Quadratic-spline ASVGP features (Matérn-3/2)."""
    return SplineRKHSFeature(2, n_intervals, a, b)


def B3SplineFeature(n_intervals: int, a: float, b: float) -> SplineRKHSFeature:
    """Cubic-spline ASVGP features (Matérn-5/2)."""
    return SplineRKHSFeature(3, n_intervals, a, b)


@dataclass(frozen=True)
class CellIntegralFeature(AxisFeature):
    """B0 cell-integral features v_i = ∫_{[mesh_i, mesh_{i+1}]} f(t) dt.

    The "gridded" inducing variables: the model posterior q(v) *is* the
    gridded data product. Closed forms for Matérn-1/2
    (reference ``univariate_structure.py:668-825``).
    """

    mesh: np.ndarray  # (n_cells + 1,) strictly increasing cell edges

    def __post_init__(self):
        mesh = np.asarray(self.mesh, dtype=np.float64)
        if len(mesh) < 2:
            raise ValueError(
                f"CellIntegralFeature: mesh needs at least 2 points, got {len(mesh)}")
        d = np.diff(mesh)
        if not np.all(d > 0):
            raise ValueError("CellIntegralFeature: mesh must be strictly increasing")
        # Non-uniform meshes are supported (beyond the reference's
        # uniform-only GriddedGP, ``univariate_structure.py:668-825``): the
        # generic compensated cell/cell closed form handles arbitrary cells;
        # only the Toeplitz/KMS fast lanes require uniform spacing and are
        # gated off the flag below.
        uniform = bool(np.allclose(d, d[0], rtol=1e-8,
                                   atol=1e-12 * abs(mesh[-1] - mesh[0])))
        object.__setattr__(self, "mesh", mesh)
        object.__setattr__(self, "uniform", uniform)

    @classmethod
    def from_lims(cls, n_cells: int, a: float, b: float) -> "CellIntegralFeature":
        return cls(np.linspace(a, b, n_cells + 1))

    @property
    def m(self) -> int:
        return len(self.mesh) - 1

    @property
    def delta(self) -> float:
        """Cell width — only meaningful for a uniform mesh (Toeplitz/KMS
        fast lanes; guarded by ``self.uniform`` at every call site)."""
        return float(self.mesh[1] - self.mesh[0])

    def mesh_j(self, p: Params) -> jnp.ndarray:
        return jnp.asarray(self.mesh, dtype=jnp.result_type(p["lengthscale"]))

    def Kuu(self, kind: str, p: Params) -> jnp.ndarray:
        if not self.uniform:
            # arbitrary cells: the Gram is not Toeplitz — dense generic
            # compensated cell/cell closed form (quad-oracle tested)
            mesh = self.mesh_j(p)
            return _cell_cell_cov(kind, mesh, mesh, p["variance"], p["lengthscale"])
        row = self.kuu_first_row(kind, p)
        return toeplitz.sym_toeplitz_dense(row)

    def kuu_first_row(self, kind: str, p: Params) -> jnp.ndarray:
        if not self.uniform:
            raise ValueError(
                "kuu_first_row is Toeplitz-only (uniform mesh); use Kuu()")
        dtype = jnp.result_type(p["lengthscale"])
        if kind == "matern12":
            return _m12_toeplitz_first_row(self.m, self.delta, p["variance"], p["lengthscale"], dtype)
        if kind in ("matern32", "matern52"):
            # analytic second-central-difference row: the generic cell/cell
            # form cancels with ~(ℓ/δ)² amplification (see the builder doc)
            return _cell_toeplitz_first_row(kind, self.m, self.delta,
                                            p["variance"], p["lengthscale"], dtype)
        if kind == "rbf":
            # hybrid GL/closed-form row — the generic erf form cancels with
            # the same (ℓ/δ)² amplification as the Matérn orders above
            return _rbf_toeplitz_first_row(self.m, self.delta,
                                           p["variance"], p["lengthscale"], dtype)
        # uniform mesh: the Gram is Toeplitz; build its first row as
        # Cov[cell_0, cell_k] via the generic compensated cell/cell form
        mesh = self.mesh_j(p)
        col = _cell_cell_cov(kind, mesh, mesh[:2], p["variance"], p["lengthscale"])
        return col[:, 0]

    def kuu_matvec(self, kind: str, p: Params, v: jnp.ndarray) -> jnp.ndarray:
        """Kuu @ v via the FFT circulant-embedding Toeplitz matvec, O(m log m).

        Never materializes the (m, m) Gram — the matrix-free path for
        very large 1D cell grids (models.iterative). Non-uniform meshes
        fall back to a dense matvec.
        """
        if not self.uniform:
            return self.Kuu(kind, p) @ v
        return toeplitz.sym_toeplitz_matvec(self.kuu_first_row(kind, p), v)

    def kuu_diag(self, kind: str, p: Params) -> jnp.ndarray:
        """diag(Kuu): constant (Toeplitz first-row[0]) for a uniform mesh,
        the per-cell self-covariances otherwise."""
        if not self.uniform:
            return jnp.diagonal(self.Kuu(kind, p))
        row = self.kuu_first_row(kind, p)
        return jnp.full((self.m,), row[0], dtype=row.dtype)

    def extra_f32_jitter(self, kind: str) -> float:
        """Per-kind f32 jitter floor on top of models.common.KIND_JITTER_F32.

        The Matérn-3/2 and 5/2 CELL Grams sit closer to semidefiniteness
        than the other Gram structures sharing the per-kind floors: even
        with the analytic second-difference row (~3e-6 on-TPU entry error,
        :func:`_cell_toeplitz_first_row`), the measured λ_min dips to
        −1.5e-5 of scale at moderate ℓ/δ — a thin margin under the generic
        1e-4 floor once m grows. 2e-4 doubles the margin at negligible
        bias. (Before the analytic row, the generic cell/cell form's
        (ℓ/δ)²-amplified cancellation reached 1.5e-4 relative entry error
        and the on-device Cholesky NaN'd outright — the Poisson-drive
        failure that motivated this hook.) Matérn-1/2 keeps its dedicated
        row and the ops/kms closed-form factorization and needs nothing.

        RBF: with the hybrid GL/erfc row (:func:`_rbf_toeplitz_first_row`,
        on-TPU entry error ~1e-6 = the f32 transcendental floor) the
        measured λ_min drift is −2.8e-5 of diagonal scale at ℓ/δ = 50,
        m = 256 — same magnitude as the Matérn orders, and the true λ_min
        of the Gaussian cell Gram is ~1e-14 (super-exponential eigendecay),
        so the floor is load-bearing: give it the same 2e-4 margin.
        """
        return 2e-4 if kind in ("matern32", "matern52", "rbf") else 0.0

    def inv_chol_kuu(self, kind: str, p: Params, rel_jitter: float):
        """Closed-form F⁻¹ of the relative-jittered Kuu Cholesky, or None.

        Matérn-1/2 on a UNIFORM mesh only: the Gram is γ·KMS(ρ) + η·I,
        factorizable in O(m²) elementwise work with no sequential Cholesky
        (``ops/kms.py``); other kinds / non-uniform meshes fall back to the
        dense path.
        """
        if kind != "matern12" or not self.uniform:
            return None
        from vggp_tpu.ops.kms import m12_cell_inv_chol

        return m12_cell_inv_chol(
            self.m, self.delta, p["variance"], p["lengthscale"], rel_jitter
        )

    def whiten_band_ratio(self, kind: str, p: Params, rel_jitter: float):
        """Geometric decay ratio of the structured F⁻¹ (ops/kms.py), or
        None when no banded structure is known for ``kind``/mesh."""
        if kind != "matern12" or not self.uniform:
            return None
        from vggp_tpu.ops.kms import m12_geometric_ratio

        return m12_geometric_ratio(self.delta, p["lengthscale"], rel_jitter)

    def Kuf(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.reshape(x, (-1,))
        if kind == "matern12":
            from vggp_tpu import config

            if config.pallas_kuf_enabled(self.m, x.shape[0]):
                from vggp_tpu.ops.pallas_kernels import cell_kuf_op

                return cell_kuf_op(self.mesh_j(p), x, p["variance"], p["lengthscale"])
        return _cell_point_cov(kind, self.mesh_j(p), x, p["variance"], p["lengthscale"])

    def Kuf_dl(self, kind: str, p: Params, x: jnp.ndarray):
        """Analytic ∂Kuf/∂ℓ (matern12 closed form; None → jvp fallback).

        Needed because the matern12 Kuf forward is a Pallas ``custom_vjp``
        (no JVP rule); the scalar-parameter whitening VJP wants a
        precomputed ℓ-tangent instead of reverse-mode through the factor.
        """
        if kind != "matern12":
            return None
        from vggp_tpu.ops.pallas_kernels import cell_kuf_dl

        return cell_kuf_dl(self.mesh_j(p), jnp.reshape(x, (-1,)),
                           p["variance"], p["lengthscale"])

    def Kuf_with_dl(self, kind: str, p: Params, x: jnp.ndarray):
        """Fused (Kuf, ∂Kuf/∂ℓ): one Pallas pass for matern12 — the exp
        chain over the (m, n) grid runs once instead of twice."""
        if kind != "matern12":
            return super().Kuf_with_dl(kind, p, x)
        from vggp_tpu.ops.pallas_kernels import cell_kuf_with_dl

        return cell_kuf_with_dl(self.mesh_j(p), jnp.reshape(x, (-1,)),
                                p["variance"], p["lengthscale"])

    def whitened_kuf_fused(self, kind: str, p: Params, finv, ratio, x):
        """(a, t) = (F⁻¹Kuf, F⁻¹∂Kuf/∂ℓ) fused in one Pallas pass, or None.

        The deepest level of the structured whitening stack (matern12 cell
        features only): Kuf/∂Kuf tiles are generated in VMEM and contracted
        against the block-bidiagonal F⁻¹ on the MXU without an HBM round
        trip. The same ``ratio < 0.7`` gate as ``ops.kms.banded_whiten_apply``
        falls back to the dense two-matmul path (jitter-dominated corner
        where the factor genuinely isn't banded)."""
        from vggp_tpu import config

        x = jnp.reshape(x, (-1,))
        if (kind != "matern12" or ratio is None
                or not config.fused_whiten_enabled(x.shape[0])):
            return None
        from vggp_tpu.ops.kms import BAND_BLOCK

        if (self.m % BAND_BLOCK != 0 or self.m // BAND_BLOCK < 2
                or not config.pallas_kuf_enabled(self.m, x.shape[0])):
            return None
        from jax import lax

        from vggp_tpu.ops.pallas_kernels import (cell_kuf_with_dl,
                                                 fused_banded_whiten_kuf)

        mesh = self.mesh_j(p)

        def fused(args):
            finv, l, v, xx = args
            return fused_banded_whiten_kuf(finv, mesh, xx, v, l,
                                           config.WHITEN_MATMUL_PRECISION,
                                           config.GRAD_MATMUL_PRECISION)

        def fallback(args):
            finv, l, v, xx = args
            kuf, dkuf = cell_kuf_with_dl(mesh, xx, v, l)
            a = jnp.matmul(finv, kuf, precision=config.WHITEN_MATMUL_PRECISION)
            t = jnp.matmul(finv, dkuf, precision=config.GRAD_MATMUL_PRECISION)
            return a, t

        return lax.cond(ratio < 0.7, fused, fallback,
                        (finv, p["lengthscale"], p["variance"], x))

    def Kvu(self, kind: str, p: Params, grid: "CellIntegralFeature") -> jnp.ndarray:
        return _cell_cell_cov(kind, grid.mesh_j(p), self.mesh_j(p), p["variance"], p["lengthscale"])

    def dKuf_dx(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Cov(v_i, ∂f(x)) = ∂/∂x ∫_{α_i}^{β_i} k(t − x) dt
        = k(x − α_i) − k(x − β_i) — a plain kernel-eval difference (exact for
        every kind; also sidesteps the matern12 Pallas forward, which carries
        no JVP rule for the base-class fallback)."""
        x = jnp.reshape(x, (-1,))
        mesh = self.mesh_j(p)
        ka = kernels.gram_1d(kind, mesh[:-1], x, p["variance"], p["lengthscale"])
        kb = kernels.gram_1d(kind, mesh[1:], x, p["variance"], p["lengthscale"])
        return ka - kb

    def dKuf_dx2(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Cov(v_i, ∂²f(x)) = k'(x − α_i) − k'(x − β_i) — closed form
        (derivative of the :meth:`dKuf_dx` kernel-eval difference)."""
        x = jnp.reshape(x, (-1,))[None, :]
        mesh = self.mesh_j(p)
        a = mesh[:-1][:, None]
        b = mesh[1:][:, None]
        da = kernels.dk_dr(kind, x - a, p["variance"], p["lengthscale"])
        db = kernels.dk_dr(kind, x - b, p["variance"], p["lengthscale"])
        return da - db

    def basis_eval(self, x: jnp.ndarray) -> jnp.ndarray:
        """B0 indicator basis evaluation (reference ``bspline.py:4-20,97-103``).

        Cells are half-open [a_i, b_i) with the last cell closed, so the
        basis is an exact partition of unity on [mesh[0], mesh[-1]] (the
        reference's closed-closed cells double-count interior edges).
        """
        x = jnp.reshape(x, (-1,))
        mesh = jnp.asarray(self.mesh, dtype=jnp.result_type(x))
        a = mesh[:-1][:, None]
        b = mesh[1:][:, None]
        ind = (x[None, :] >= a) & (x[None, :] < b)
        last = (jnp.arange(self.m)[:, None] == self.m - 1) & (x[None, :] == b)
        return (ind | last).astype(x.dtype)


@dataclass(frozen=True)
class OutputFeature(AxisFeature):
    """Discrete OUTPUT axis for multi-output (ICM/LMC) models — beyond-reference.

    Pairs with ``kind == "coregion"``. The axis coordinate is the integer
    output index p ∈ {0, …, n_outputs−1} (carried as a float column of X,
    like every other axis); the Gram over indices is the coregionalization
    matrix B = W Wᵀ + diag(κ) (``kernels.coregion_b``). One inducing feature
    per output — u_p = the p-th latent output at the shared spatial features
    of the OTHER axes — so Kuu = B, Kuf gathers B's columns, and the joint
    separable prior is B ⊗ (⊗ K_axis): a full ICM multi-output GP riding the
    existing Kronecker machinery (collapsed bound, posteriors, gridded q(v))
    with no new model code. Gradient/sampling heads reject the coregion axis
    through their differentiability/spectral checks.

    W is initialized with a fixed host-side rng (deterministic across
    processes); κ trains through the softplus floor like every positive
    hyperparameter.
    """

    n_outputs: int
    rank: int = 1

    def __post_init__(self):
        if self.n_outputs < 1 or not 1 <= self.rank <= self.n_outputs:
            raise ValueError(
                f"OutputFeature: need n_outputs ≥ 1 and 1 ≤ rank ≤ n_outputs, "
                f"got ({self.n_outputs}, {self.rank})"
            )

    @property
    def m(self) -> int:
        return self.n_outputs

    def init_params(self, dtype=jnp.float32) -> Dict:
        rng = np.random.default_rng(20260818)
        w = 0.5 * rng.standard_normal((self.n_outputs, self.rank)) + 0.5
        return {
            "w": jnp.asarray(w, dtype=dtype),
            "kappa": jnp.full((self.n_outputs,), 0.5, dtype=dtype),
        }

    def _check_kind(self, kind: str) -> None:
        if kind != kernels.COREGION_KIND:
            raise ValueError(
                f"OutputFeature pairs with kind='coregion', got {kind!r}"
            )

    def Kuu(self, kind: str, p: Params) -> jnp.ndarray:
        self._check_kind(kind)
        return kernels.coregion_b(p)

    def Kuf(self, kind: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """(P, n) gather of B's columns at the batch's output indices.
        Non-integral / out-of-range indices poison the column with NaN
        instead of XLA's silent clip (see ``kernels._as_index``)."""
        self._check_kind(kind)
        idx, valid = kernels._as_index(x, self.n_outputs)
        return kernels._poison(kernels.coregion_b(p)[:, idx], valid[None, :])

    def Kvu(self, kind: str, p: Params, grid: "OutputFeature") -> jnp.ndarray:
        """Cross-covariance with a grid axis: for the output axis the 'grid'
        is the outputs themselves (one product slice per output), so the
        block is B itself. Rejects a mismatched grid axis."""
        self._check_kind(kind)
        if not isinstance(grid, OutputFeature) or grid.n_outputs != self.n_outputs:
            raise ValueError(
                "OutputFeature.Kvu: the grid axis for an output axis must be "
                f"the same outputs (OutputFeature(n_outputs={self.n_outputs}))"
            )
        return kernels.coregion_b(p)
