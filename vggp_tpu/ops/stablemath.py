"""Accuracy-compensated transcendental helpers for TPU.

TPU VPU transcendentals (exp, sinh, expm1) are fast polynomial/table
approximations with absolute error around 1e-6 — fine for neural nets,
fatal for the cancellation-sensitive closed forms in this library. Observed
failure: the Matérn-1/2 cell-integral Kuu diagonal ``2σ²ℓ²(expm1(-δ/ℓ)+δ/ℓ)``
computed with TPU ``expm1`` at δ/ℓ ≈ 0.027 carries 0.5 % relative error,
which makes the (cond ≈ 2e3!) Toeplitz Gram *indefinite* and its Cholesky
NaN. CPU/f64 never sees this because the host libm expm1 is exact-rounded.

The helpers here evaluate the small-|x| regime with explicit Horner series
(coefficients exact in f32), reserving the hardware op for |x| ≥ 1 where no
cancellation occurs. All are branch-free (`jnp.where`) and jit/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# Series coefficients 1/k! for k = 2..18 (float64 literals; enough terms
# that the truncation error at |x| = 1 is below f64 eps).
_INV_FACT = [
    0.5,                       # 1/2!
    1.6666666666666666e-01,    # 1/3!
    4.1666666666666664e-02,    # 1/4!
    8.3333333333333332e-03,    # 1/5!
    1.3888888888888889e-03,    # 1/6!
    1.9841269841269841e-04,    # 1/7!
    2.4801587301587302e-05,    # 1/8!
    2.7557319223985893e-06,    # 1/9!
    2.7557319223985888e-07,    # 1/10!
    2.5052108385441720e-08,    # 1/11!
    2.0876756987868100e-09,    # 1/12!
    1.6059043836821613e-10,    # 1/13!
    1.1470745597729725e-11,    # 1/14!
    7.6471637318198164e-13,    # 1/15!
    4.7794773323873853e-14,    # 1/16!
    2.8114572543455206e-15,    # 1/17!
    1.5619206968586226e-16,    # 1/18!
]


# float32 only needs terms through 1/11! — the next term's contribution at
# |x| = 1 is x¹²/12! ≈ 2.1e-9, below f32 eps (6e-8) relative to
# expm1mx(1) ≈ 0.718. Halves the Horner chain inside the hot Pallas kernels.
_N_TERMS_F32 = 10


def _series_expm1mx(x: jnp.ndarray) -> jnp.ndarray:
    """Σ_{k≥2} x^k / k!  (= e^x - 1 - x), Horner form, |x| ≲ 1."""
    coeffs = _INV_FACT[:_N_TERMS_F32] if x.dtype == jnp.float32 else _INV_FACT
    acc = jnp.zeros_like(x) + coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = acc * x + c
    return acc * x * x


def expm1mx(x: jnp.ndarray) -> jnp.ndarray:
    """e^x − 1 − x, accurate for all x (series for |x| < 1).

    This is the quantity behind the Matérn-1/2 integral Gram diagonal;
    evaluating ``jnp.expm1(x) - x`` directly loses ~2 significant digits per
    decade of smallness of x on TPU. The |x| ≥ 1 branch uses plain
    ``exp(x) − 1 − x`` (cancellation-free there), which also keeps these
    helpers lowerable inside Pallas kernels (Mosaic has no expm1).
    """
    small = jnp.abs(x) < 1.0
    xs = jnp.where(small, x, 0.0)  # keep series argument bounded
    return jnp.where(small, _series_expm1mx(xs), jnp.exp(x) - 1.0 - x)


def expm1s(x: jnp.ndarray) -> jnp.ndarray:
    """e^x − 1 with series evaluation for |x| < 1 (TPU expm1 is inexact)."""
    small = jnp.abs(x) < 1.0
    xs = jnp.where(small, x, 0.0)
    return jnp.where(small, _series_expm1mx(xs) + xs, jnp.exp(x) - 1.0)


# Odd-series coefficients 1/(2k+1)! for k = 1..9 (x³/3! + x⁵/5! + …).
_INV_ODD_FACT = [
    1.6666666666666666e-01,    # 1/3!
    8.3333333333333332e-03,    # 1/5!
    1.9841269841269841e-04,    # 1/7!
    2.7557319223985893e-06,    # 1/9!
    2.5052108385441720e-08,    # 1/11!
    1.6059043836821613e-10,    # 1/13!
    7.6471637318198164e-13,    # 1/15!
    2.8114572543455206e-15,    # 1/17!
    8.2206352466243295e-18,    # 1/19!
]

# f32 needs terms through 1/11!: the next term at |x| = 1 is 1/13! ≈ 1.6e-10,
# below f32 eps (6e-8) relative to sinh(1) − 1 ≈ 0.175.
_N_ODD_TERMS_F32 = 5


def sinhmx(x: jnp.ndarray) -> jnp.ndarray:
    """sinh(x) − x, accurate for all x (odd Horner series for |x| < 1).

    Behind the Matérn-1/2 cell-integral structured factorization
    (``ops/kms.py``): the Gram decomposes as γ·KMS(ρ) + η·I with
    η = −2σ²ℓ²(sinh(δ/ℓ) − δ/ℓ); computing η as a difference of Kuu
    entries loses everything for δ ≪ ℓ. The |x| ≥ 1 branch routes through
    :func:`expm1mx` (mild, bounded cancellation there) to stay on the
    compensated exp path rather than TPU ``sinh``.
    """
    coeffs = (_INV_ODD_FACT[:_N_ODD_TERMS_F32]
              if x.dtype == jnp.float32 else _INV_ODD_FACT)
    small = jnp.abs(x) < 1.0
    xs = jnp.where(small, x, 0.0)
    x2 = xs * xs
    acc = jnp.zeros_like(x) + coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = acc * x2 + c
    series = acc * x2 * xs
    xl = jnp.where(small, 1.0, x)
    return jnp.where(small, series, 0.5 * (expm1mx(xl) - expm1mx(-xl)))


# Series coefficients (k−1)/k! for k = 2..19 and (k−1)(k−2)/k! for k = 3..19
# (exact rationals rounded once to f64), behind the unnormalized lower
# incomplete gammas γ(2, x) and γ(3, x) below.
_G2_COEFF = [
    0.5,                       # (2) 1/2
    0.3333333333333333,        # (3) 1/3
    0.125,                     # (4) 1/8
    0.03333333333333333,       # (5) 1/30
    0.006944444444444444,      # (6) 1/144
    0.0011904761904761906,     # (7) 1/840
    0.00017361111111111112,    # (8) 1/5760
    2.2045855379188714e-05,    # (9) 1/45360
    2.48015873015873e-06,      # (10) 1/403200
    2.505210838544172e-07,     # (11) 1/3991680
    2.296443268665491e-08,     # (12) 1/43545600
    1.9270852604185937e-09,    # (13) 1/518918400
    1.4911969277048643e-10,    # (14) 1/6706022400
    1.0706029224547743e-11,    # (15) 1/93405312000
    7.169215998581078e-13,     # (16) 1/1394852659200
    4.498331606952833e-14,     # (17) 1/22230464256000
    2.6552651846596585e-15,    # (18) 1/376610217984000
    1.4797143443923793e-16,    # (19) 1/6758061133824000
]
_G3_COEFF = [
    0.3333333333333333,        # (3) 1/3
    0.25,                      # (4) 1/4
    0.1,                       # (5) 1/10
    0.027777777777777776,      # (6) 1/36
    0.005952380952380952,      # (7) 1/168
    0.0010416666666666667,     # (8) 1/960
    0.00015432098765432098,    # (9) 1/6480
    1.984126984126984e-05,     # (10) 1/50400
    2.2546897546897547e-06,    # (11) 1/443520
    2.296443268665491e-07,     # (12) 1/4354560
    2.1197937864604532e-08,    # (13) 1/47174400
    1.789436313245837e-09,     # (14) 1/558835200
    1.3917837991912066e-10,    # (15) 1/7185024000
    1.0036902398013508e-11,    # (16) 1/99632332800
    6.74749741042925e-13,      # (17) 1/1482030950400
    4.2484242954554536e-14,    # (18) 1/23538138624000
    2.515514385467045e-15,     # (19) 1/397533007872000
]
# f32: terms through k = 12 put the next term below f32 eps relative to
# γ(2, 1) ≈ 0.264 / γ(3, 1) ≈ 0.160 (same cutoff logic as _N_TERMS_F32).
_N_G_TERMS_F32 = 11


def _gamma_series(x: jnp.ndarray, coeffs, lead: int, sign: float) -> jnp.ndarray:
    cs = coeffs[:_N_G_TERMS_F32] if x.dtype == jnp.float32 else coeffs
    t = -x
    acc = jnp.zeros_like(x) + cs[-1]
    for c in reversed(cs[:-1]):
        acc = acc * t + c
    return sign * acc * t ** lead


def gamma2_lower(x: jnp.ndarray) -> jnp.ndarray:
    """γ(2, x) = 1 − (1 + x)e^{−x}, accurate for all x ≥ 0 (series |x| < 1).

    The x-weighted exponential-tail mass behind the Markov-continuation
    cell integrals (``features.FourierFeature.Kvu`` outside [a, b]):
    ∫₀ʰ t·e^{−λt} dt = γ(2, λh)/λ². The direct form cancels like x²/2 for
    small x (both terms → 1), losing ~2 digits per decade; the series is
    eps-accurate, and the x ≥ 1 branch is cancellation-free.
    """
    small = jnp.abs(x) < 1.0
    xs = jnp.where(small, x, 0.0)
    xl = jnp.where(small, 1.0, x)
    return jnp.where(small, _gamma_series(xs, _G2_COEFF, 2, 1.0),
                     1.0 - (1.0 + xl) * jnp.exp(-xl))


def gamma3_lower(x: jnp.ndarray) -> jnp.ndarray:
    """γ(3, x) = 2 − (2 + 2x + x²)e^{−x}, accurate for all x ≥ 0.

    ∫₀ʰ t²·e^{−λt} dt = γ(3, λh)/λ³ — the r² tail mass of the Matérn-5/2
    Markov continuation integrals. Direct evaluation cancels like x³/3.
    """
    small = jnp.abs(x) < 1.0
    xs = jnp.where(small, x, 0.0)
    xl = jnp.where(small, 1.0, x)
    return jnp.where(small, _gamma_series(xs, _G3_COEFF, 3, -1.0),
                     2.0 - (2.0 + (2.0 + xl) * xl) * jnp.exp(-xl))
