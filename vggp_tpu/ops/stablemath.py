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
