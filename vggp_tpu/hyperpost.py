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
4. ``hmc_sample_params`` — full HMC over the same unconstrained space,
   preconditioned by the Laplace factor (whitened coordinates), as the
   asymptotically-exact check on the Laplace Gaussian: vmapped chains of
   ``lax.scan`` leapfrog trajectories, one traced computation.

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

    The Hessian at a finitely-converged optimum can have negative
    eigenvalues — tiny ones from roundoff/residual gradient in f64, but on
    TPU float32 the second-order AD graph of the collapsed bound is noise-
    limited and the computed H can be badly asymmetric and indefinite (O(1)
    negative eigenvalues measured on-device at a converged optimum). The
    saddle-free |H| treatment (absolute eigenvalues, floored at
    ``min_eig_rel`` of the spectral radius) keeps the curvature SCALE of
    such directions instead of exploding them into ~1/floor variances that
    scatter draws to NaN-producing hyperparameters; on a clean positive f64
    spectrum it is a no-op.
    """
    raw = train.unconstrain(params)
    flat, unravel = ravel_pytree(raw)

    def flat_loss(v):
        return loss_fn(train.constrain(unravel(v)))

    H = jax.hessian(flat_loss)(flat)
    H = 0.5 * (H + H.T)
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(jnp.abs(w), min_eig_rel * jnp.max(jnp.abs(w)))
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
    draws = sample_params(state, key, n_samples)
    return predict_marginalized_draws(predict_fn, draws)


def _mean_var(g):
    return g.mean, g.variance()


class HMCResult(NamedTuple):
    """Stacked constrained hyperparameter draws + sampler diagnostics."""

    draws: dict            # constrained param pytree, leaves (S, ...)
    accept_rate: jnp.ndarray  # scalar, post-warmup mean acceptance
    step_size: jnp.ndarray    # (n_chains,) adapted leapfrog step sizes
    raw_draws: jnp.ndarray    # (S, p) unconstrained draws (for diagnostics)


def hmc_sample_params(loss_fn, state: LaplaceState, key, n_samples: int = 256,
                      n_chains: int = 4, n_warmup: int = 128,
                      n_leapfrog: int = 16, target_accept: float = 0.8,
                      init_step: float = 0.25) -> HMCResult:
    """Full-MCMC hyperparameter draws — the gold standard the Laplace
    Gaussian approximates (exact in the n→∞ limit; on the small per-window
    datasets here the posterior can be skewed, which HMC captures).

    Hamiltonian Monte Carlo on the unconstrained raw space, PRECONDITIONED
    by the Laplace factor: positions are sampled in whitened coordinates
    w with θ_raw = μ + L·w (L = ``state.chol_cov``), where the target is
    approximately unit-Gaussian, so a fixed O(0.1–0.5) step size mixes well
    regardless of the raw-space conditioning. TPU-idiomatic throughout: the
    leapfrog integrator is a ``lax.scan``, the (warmup + sampling) chain is
    a second ``lax.scan``, and ``n_chains`` independent chains run as one
    ``vmap`` — a single traced computation, no Python-side loop.

    Warmup adapts log step size by Robbins–Monro toward ``target_accept``;
    warmup draws are discarded. ``n_samples`` is the TOTAL post-warmup draw
    count across chains (rounded up to a multiple of ``n_chains``).

    The potential is U(w) = loss_fn(constrain(μ + L·w)) — i.e. a flat prior
    on the raw hyperparameters, matching ``log_evidence_laplace``.
    """
    p = state.mean.shape[0]
    per_chain = -(-n_samples // n_chains)

    def potential(w):
        raw = state.mean + state.chol_cov @ w
        return loss_fn(train.constrain(state.unravel(raw)))

    grad_u = jax.grad(potential)

    def leapfrog(w, mom, eps):
        mom = mom - 0.5 * eps * grad_u(w)

        def body(carry, _):
            w, mom = carry
            w = w + eps * mom
            mom = mom - eps * grad_u(w)
            return (w, mom), None

        (w, mom), _ = jax.lax.scan(body, (w, mom), None, length=n_leapfrog - 1)
        w = w + eps * mom
        mom = mom - 0.5 * eps * grad_u(w)
        return w, mom

    def step(carry, inputs):
        w, u_w, log_eps, k = carry
        adapt_scale, _ = inputs
        k, k_mom, k_acc, k_eps = jax.random.split(k, 4)
        mom = jax.random.normal(k_mom, (p,), dtype=state.mean.dtype)
        # jitter ε per iteration (uniform ±30%): with a fixed ε·L a Gaussian
        # target hits leapfrog resonances (cos(L·θ(ε)) ≈ ±1 → proposals
        # ≈ ±w, near-certain acceptance but frozen exploration); randomizing
        # the trajectory length is the standard cure (Neal 2011 §3.2)
        eps = jnp.exp(log_eps) * (0.7 + 0.6 * jax.random.uniform(
            k_eps, dtype=state.mean.dtype))
        w_new, mom_new = leapfrog(w, mom, eps)
        u_new = potential(w_new)
        log_accept = (u_w + 0.5 * jnp.sum(mom**2)
                      - u_new - 0.5 * jnp.sum(mom_new**2))
        # a divergent trajectory (NaN energy) must be rejected, not compared
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
        take = jnp.log(jax.random.uniform(k_acc, dtype=w.dtype)) < log_accept
        w = jnp.where(take, w_new, w)
        u_w = jnp.where(take, u_new, u_w)
        # accept_prob carries the loss dtype (may be f64 under x64); keep the
        # carry slot stable by casting the update back to log_eps's dtype
        log_eps = (log_eps
                   + adapt_scale * (accept_prob - target_accept)
                   ).astype(log_eps.dtype)
        return (w, u_w, log_eps, k), (w, accept_prob)

    def run_chain(key):
        k_init, k_run = jax.random.split(key)
        w0 = jax.random.normal(k_init, (p,), dtype=state.mean.dtype)
        # Robbins–Monro gain ~ t^{-0.6} during warmup, frozen afterwards
        t = jnp.arange(1, n_warmup + per_chain + 1, dtype=state.mean.dtype)
        adapt = jnp.where(t <= n_warmup, 1.0 / t**0.6, 0.0)
        carry = (w0, potential(w0), jnp.log(jnp.asarray(init_step, w0.dtype)),
                 k_run)
        carry, (ws, accs) = jax.lax.scan(step, carry, (adapt, t))
        return ws[n_warmup:], jnp.mean(accs[n_warmup:]), jnp.exp(carry[2])

    keys = jax.random.split(key, n_chains)
    ws, acc, eps = jax.vmap(run_chain)(keys)        # (C, S/C, p)
    flat_w = ws.reshape(-1, p)
    raws = flat_w @ state.chol_cov.T + state.mean[None, :]
    draws = jax.vmap(lambda v: train.constrain(state.unravel(v)))(raws)
    return HMCResult(draws=draws, accept_rate=jnp.mean(acc),
                     step_size=eps, raw_draws=raws)


def predict_marginalized_draws(predict_fn, draws):
    """Hyperparameter-marginalized predictive moments from explicit draws
    (e.g. ``HMCResult.draws``): vmap the head, moment-match the mixture."""
    from vggp_tpu.models.common import Gaussian

    gs = jax.vmap(lambda p: _mean_var(predict_fn(p)))(draws)
    mean, var = mixture_moments(gs[0], gs[1])
    return Gaussian(mean=mean, var=var)


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
