"""Observation models for the whitened minibatch SVGP (beyond-reference).

The reference supports Gaussian observations only (``gpytorch
GaussianLikelihood`` throughout, e.g. ``univariate_structure.py:33``); its
whole pipeline is regression. This module adds non-conjugate likelihoods —
probit classification, Poisson counts, Student-t robust regression — through
the variational expected log-likelihood

    ℓ_i = E_{q(f_i)}[log p(y_i | f_i)],   q(f_i) = N(μ_i, σ_i²),

computed in closed form where one exists (Gaussian, Poisson-log-link) and by
fixed-order Gauss–Hermite quadrature otherwise. The quadrature is one
(n, K) @ (K,) einsum with trace-time-constant nodes — static shapes, no
data-dependent control flow, TPU-friendly by construction.

The gridded q(v) machinery is likelihood-independent (q(v) is a linear
functional of q(u)), so every feature family's gridded products work
unchanged under any of these observation models — e.g. gridded Poisson
intensity maps, which the reference cannot express at all.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import log_ndtr, ndtr, gammaln

Params = Dict

# 64 nodes: heavy-tailed integrands (Student-t log-pdf at var ≈ 2) converge
# slowly — 32 nodes leave 8e-5 absolute error, 64 reach 7e-7. The quadrature
# is one (n, K) einsum; K = 64 is still noise next to any model matmul.
GH_POINTS = 64

# Trace-time constants: physicists' Hermite nodes/weights, exact at build.
_GH_X, _GH_W = np.polynomial.hermite.hermgauss(GH_POINTS)
_GH_WN = _GH_W / math.sqrt(math.pi)          # normalized: Σ w = 1


def gauss_hermite(log_prob, y, mean, var):
    """E_{N(f|mean,var)}[log_prob(y, f)] by Gauss–Hermite quadrature.

    ``log_prob(y, f)`` must broadcast over a trailing quadrature axis.
    Shapes: y, mean, var are (n,) → returns (n,).
    """
    dtype = jnp.result_type(mean)
    x = jnp.asarray(_GH_X, dtype)
    w = jnp.asarray(_GH_WN, dtype)
    f = mean[:, None] + jnp.sqrt(2.0 * var)[:, None] * x[None, :]
    return log_prob(y[:, None], f) @ w


# --------------------------------------------------------------------------- #
# Expected log-likelihoods  ℓ_i(y, μ, σ², params) → (n,)
# --------------------------------------------------------------------------- #

def _ell_gaussian(y, mean, var, params, opts):
    noise = params["noise"]
    return -0.5 * jnp.log(2.0 * jnp.pi * noise) - ((y - mean) ** 2 + var) / (2.0 * noise)


def _ell_bernoulli_probit(y, mean, var, params, opts):
    """y ∈ {0, 1}, p(y=1|f) = Φ(f). Quadrature over log Φ(±f) (stable ndtr)."""
    sign = 2.0 * y - 1.0
    return gauss_hermite(lambda s, f: log_ndtr(s * f), sign, mean, var)


def _ell_poisson_log(y, mean, var, params, opts):
    """y ∈ ℕ, rate λ = e^f (log link). Closed form:
    E[y f − e^f − log y!] = y μ − e^{μ + σ²/2} − log Γ(y+1)."""
    return y * mean - jnp.exp(mean + 0.5 * var) - gammaln(y + 1.0)


def _ell_student_t(y, mean, var, params, opts):
    """Robust regression: y | f ~ StudentT(ν, f, √noise); the (static) degrees
    of freedom come from the spec's ``likelihood_opts`` (default ν = 4); the
    trained ``noise`` parameter plays the squared-scale role."""
    df = float(opts.get("df", 4.0))
    scale2 = params["noise"]

    def logp(yy, f):
        z2 = (yy - f) ** 2 / scale2
        return (
            gammaln((df + 1.0) / 2.0) - gammaln(df / 2.0)
            - 0.5 * jnp.log(jnp.pi * df * scale2)
            - 0.5 * (df + 1.0) * jnp.log1p(z2 / df)
        )

    return gauss_hermite(logp, y, mean, var)


EXPECTED_LOG_LIK = {
    "gaussian": _ell_gaussian,
    "bernoulli": _ell_bernoulli_probit,
    "poisson": _ell_poisson_log,
    "student_t": _ell_student_t,
}


def expected_log_lik(name: str, y, mean, var, params, opts=()) -> jnp.ndarray:
    try:
        fn = EXPECTED_LOG_LIK[name]
    except KeyError:
        raise ValueError(
            f"unknown likelihood {name!r}; have {sorted(EXPECTED_LOG_LIK)}"
        ) from None
    return fn(y, mean, var, params, dict(opts))


# --------------------------------------------------------------------------- #
# Predictive transforms  q(f*) = N(μ, σ²) → observable-space summary
# --------------------------------------------------------------------------- #

def predict_bernoulli(mean, var):
    """p(y*=1) = Φ(μ/√(1+σ²)) — exact under the probit link."""
    return ndtr(mean / jnp.sqrt(1.0 + var))


def predict_poisson(mean, var):
    """Predictive intensity moments under the log link:
    E[λ] = e^{μ+σ²/2}; Var[y] = E[λ] + E[λ]²(e^{σ²} − 1)."""
    lam = jnp.exp(mean + 0.5 * var)
    return lam, lam + lam * lam * jnp.expm1(var)


# --------------------------------------------------------------------------- #
# Observation-space sampling  f-draws → y-draws
#
# Composes with ``sampling.pathwise*``: coherent latent draws pushed through
# the observation model give joint predictive samples of the observables —
# e.g. the distribution of TOTAL counts over a region (Poisson), or joint
# exceedance patterns of noisy measurements. Marginal moment transforms
# (above) cannot express any cross-location functional.
# --------------------------------------------------------------------------- #

def sample_observations(name: str, key, f_samples: jnp.ndarray, params=None,
                        opts=()):
    """Draw y ~ p(y | f) elementwise over latent draws ``f_samples`` (S, n).

    ``name``/``params``/``opts`` follow the same conventions as
    :func:`expected_log_lik` (so a spec's ``likelihood`` string and fitted
    constrained params drop straight in): ``gaussian`` adds N(0, noise);
    ``bernoulli`` returns {0,1} with p = Φ(f); ``poisson`` returns counts
    with λ = eᶠ; ``student_t`` adds √noise-scaled t_ν noise with the
    (static) degrees of freedom from ``opts``.
    """
    import jax

    p = params or {}
    o = dict(opts)
    if name == "gaussian":
        z = jax.random.normal(key, f_samples.shape, dtype=f_samples.dtype)
        return f_samples + jnp.sqrt(p["noise"]) * z
    if name == "bernoulli":
        u = jax.random.uniform(key, f_samples.shape, dtype=f_samples.dtype)
        return (u < ndtr(f_samples)).astype(f_samples.dtype)
    if name == "poisson":
        return jax.random.poisson(key, jnp.exp(f_samples)).astype(f_samples.dtype)
    if name == "student_t":
        df = float(o.get("df", 4.0))
        t = jax.random.t(key, df, f_samples.shape, dtype=f_samples.dtype)
        return f_samples + jnp.sqrt(p["noise"]) * t
    raise ValueError(
        f"unknown likelihood {name!r}; have {sorted(EXPECTED_LOG_LIK)}")
