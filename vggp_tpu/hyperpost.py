"""Hyperparameter-posterior approximation and marginalized prediction.

The reference (like most GP libraries) treats fitted hyperparameters as
point estimates: every predictive interval in nb61 conditions on θ̂ and
ignores hyperparameter uncertainty, which dominates on the small per-window
datasets the experiments use (a few hundred obs per 10-day window —
nb61 cells 27-54). This module adds the standard remedy, TPU-idiomatically:

1. ``laplace`` — a Gaussian (Laplace) approximation N(θ̂, H⁻¹) to the
   hyperparameter posterior in the UNCONSTRAINED (softplus-raw) space, where
   positivity makes the Gaussian well-defined. H = ∇²(−log p(y|θ)) of the
   same scalar objective ``fit`` minimized (exact MLL or the collapsed
   Titsias bound — intended for the collapsed families exact/sgpr/freesvgp/
   additive whose only parameters ARE hyperparameters).
2. ``sample_params`` — constrained hyperparameter draws θ_s ~ N(θ̂, H⁻¹)
   as one stacked pytree (vmap-ready; the TPU way to fan out S predictions).
3. ``predict_marginalized`` — ∫ p(f*|θ) q(θ) dθ by vmapping any predictive
   head over the draws and moment-matching the Gaussian mixture
   (law of total variance). One jit, one device dispatch.

Everything is a pure function; the Hessian is O(p²) with p ≈ 3–7 raw
hyperparameters for these models, trivially cheap next to one ELBO step.
Beyond-reference capability.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from vggp_tpu import train


class LaplaceState(NamedTuple):
    """Gaussian over unconstrained hyperparameters: θ_raw ~ N(mean, L Lᵀ)."""

    mean: jnp.ndarray      # (p,) raw-space optimum
    chol_cov: jnp.ndarray  # (p, p) lower Cholesky of the covariance
    logdet_h: jnp.ndarray  # log|H| (for evidence estimates)
    unravel: Callable      # (p,) -> raw param pytree (static metadata)


def laplace(loss_fn, params, min_eig_rel: float = 1e-8) -> LaplaceState:
    """Laplace approximation at a fitted optimum.

    ``loss_fn(params)`` is the SAME constrained-params scalar ``train.fit``
    minimized (−log marginal likelihood / −ELBO). Curvature is evaluated in
    raw (softplus⁻¹) space, matching the geometry the optimizer ran in and
    making the Gaussian respect positivity when mapped back.

    The Hessian at a finitely-converged optimum can have tiny negative
    eigenvalues (roundoff or residual gradient); eigenvalues are floored at
    ``min_eig_rel`` of the spectral radius before inversion, which bounds
    the approximate posterior instead of exploding a flat direction.
    """
    raw = train.unconstrain(params)
    flat, unravel = ravel_pytree(raw)

    def flat_loss(v):
        return loss_fn(train.constrain(unravel(v)))

    H = jax.hessian(flat_loss)(flat)
    H = 0.5 * (H + H.T)
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, min_eig_rel * jnp.max(jnp.abs(w)))
    # cov = V w⁻¹ Vᵀ; its Cholesky factor for sampling is V w^{-1/2} — not
    # triangular, but any square root works for affine Gaussian sampling.
    half = V * (1.0 / jnp.sqrt(w))[None, :]
    return LaplaceState(mean=flat, chol_cov=half,
                        logdet_h=jnp.sum(jnp.log(w)), unravel=unravel)


def sample_params(state: LaplaceState, key, n_samples: int):
    """``n_samples`` constrained hyperparameter pytrees, stacked on axis 0.

    Returns one pytree whose leaves carry a leading (S,) axis — feed it to
    ``jax.vmap``/``jax.lax.map`` directly rather than looping Python-side.
    """
    eps = jax.random.normal(key, (n_samples, state.mean.shape[0]),
                            dtype=state.mean.dtype)
    flats = state.mean[None, :] + eps @ state.chol_cov.T
    return jax.vmap(lambda v: train.constrain(state.unravel(v)))(flats)


def mixture_moments(means: jnp.ndarray, variances: jnp.ndarray):
    """Moment-match an equal-weight Gaussian mixture along axis 0.

    mean = E_s μ_s;  var = E_s σ_s² + Var_s μ_s  (law of total variance).
    """
    mean = jnp.mean(means, axis=0)
    var = jnp.mean(variances, axis=0) + jnp.mean((means - mean[None]) ** 2, axis=0)
    return mean, var


def predict_marginalized(predict_fn, state: LaplaceState, key,
                         n_samples: int = 64):
    """Hyperparameter-marginalized predictive moments.

    ``predict_fn(params) -> Gaussian`` is any marginal predictive head
    (``posterior``/``q_v``/``q_dv`` with ``full_cov=False``) closed over its
    data; it is vmapped over ``n_samples`` Laplace draws in ONE traced
    computation (S batched Cholesky/solve pipelines — MXU-friendly), then
    the mixture is moment-matched. Returns a ``Gaussian`` with honest
    variances that include hyperparameter uncertainty.
    """
    from vggp_tpu.models.common import Gaussian

    draws = sample_params(state, key, n_samples)
    gs = jax.vmap(lambda p: _mean_var(predict_fn(p)))(draws)
    mean, var = mixture_moments(gs[0], gs[1])
    return Gaussian(mean=mean, var=var)


def _mean_var(g):
    return g.mean, g.variance()


def log_evidence_laplace(loss_fn, params, state: LaplaceState) -> jnp.ndarray:
    """Laplace estimate of the log evidence ∫ p(y|θ) dθ under a flat raw-space
    prior: log p(y) ≈ −loss(θ̂) + (p/2)·log 2π − ½ log|H|.

    Useful for model comparison across kernel orders / feature families on
    the same data (a sharper criterion than training loss alone because it
    charges for hyperparameter complexity via |H|).
    """
    p = state.mean.shape[0]
    return (-loss_fn(params) + 0.5 * p * jnp.log(2.0 * jnp.pi)
            - 0.5 * state.logdet_h)
