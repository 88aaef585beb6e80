"""Pathwise posterior sampling (Matheron's rule + spectral prior features).

Beyond-reference capability: the reference can only report pointwise
posterior moments (gpytorch ``posterior`` calls); it has no way to draw
COHERENT function samples — needed for propagating uncertainty through any
nonlinear downstream functional (extremes, threshold exceedance areas,
trajectories through a gridded product). This module implements the
decoupled sampling of Wilson et al. (2020), "Efficiently sampling functions
from Gaussian process posteriors":

    f_post(·) = f_prior(·) + k_u(·)ᵀ Kuu⁻¹ (u_q − u_prior)

- ``f_prior`` is a random-Fourier-feature prior path. For separable Matérn
  product kernels the spectral measure factorizes per axis, and each axis's
  measure is a Student-t with 2ν degrees of freedom and scale λ/√(2ν) = 1/ℓ
  (Cauchy for Matérn-1/2, normal for RBF) — sampled with static shapes, TPU-friendly.
- ``u_prior`` is the EXACT inducing functional of the prior path: for cell
  integrals the integral of a cosine path is closed-form, so the Matheron
  update introduces no discretization error on the inducing side.
- ``u_q ~ q(u)``: in whitened coordinates u = F w, q(w) = N(μ, S) with the
  Kronecker-factored S = ⊗ᵢ LᵢLᵢᵀ, so a sample is w = μ + (⊗Lᵢ) z and the
  pathwise correction a(·)ᵀ(w − F⁻¹u_prior) reuses the per-axis whitened
  blocks — no m×m object is ever formed (F⁻¹u_prior = per-axis whitening
  solves of the reshaped (m₁, …, m_d) array).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature, PointFeature
from vggp_tpu.models import common
from vggp_tpu.models.svgp import SVGPSpec, _kron_chols, chol_from_raw

_DF = {"matern12": 1.0, "matern32": 3.0, "matern52": 5.0}


def sample_gaussian(key, g, n_samples: int) -> jnp.ndarray:
    """Draw (n_samples, n) from a :class:`models.common.Gaussian`.

    Exact joint samples when the covariance is materialized (e.g.
    ``q_v(..., full_cov=True)`` — gridded products are small); independent
    marginal samples when only the variance diagonal is available.
    """
    n = g.mean.shape[0]
    z = jax.random.normal(key, (n_samples, n), dtype=g.mean.dtype)
    if g.cov is not None:
        # dtype-aware relative nugget: posterior covariances are roundoff-
        # level indefinite subtractions (the reason common.floor_var exists);
        # a 1e-10 relative shift is a NO-OP at f32 resolution and the
        # Cholesky NaNs on rank-deficient draws.
        rel = 1e-6 if g.mean.dtype == jnp.float32 else 1e-12
        eps = rel * jnp.mean(jnp.diagonal(g.cov))
        L = jnp.linalg.cholesky(g.cov + eps * jnp.eye(n, dtype=g.mean.dtype))
        return g.mean[None, :] + z @ L.T
    return g.mean[None, :] + z * jnp.sqrt(g.var)[None, :]


def sample_frequencies(key, kind: str, lengthscale, n_features: int):
    """One axis's spectral frequencies ω ~ S(ω)/(2πσ²) (static shapes).

    Matérn-ν ⇔ Student-t(2ν, scale λ/√(2ν) = 1/ℓ); RBF ⇔ N(0, 1/ℓ²). Student-t is
    sampled as normal/√(χ²_df/df) — no data-dependent control flow.
    """
    from vggp_tpu import kernels

    if kind == "rbf":
        return jax.random.normal(key, (n_features,)) / lengthscale
    df = _DF[kind]
    lam = kernels.lam(kind, lengthscale)
    kn, kg = jax.random.split(key)
    z = jax.random.normal(kn, (n_features,))
    chi2 = 2.0 * jax.random.gamma(kg, df / 2.0, (n_features,))
    # matching S(ω) ∝ (λ² + ω²)^{-(ν+1/2)} to t_df(ω; scale s) ∝
    # (1 + ω²/(df·s²))^{-(df+1)/2} gives df = 2ν AND s = λ/√df (= 1/ℓ for
    # every Matérn order — the √(2ν) in λ cancels)
    return (lam / jnp.sqrt(df)) * z / jnp.sqrt(chi2 / df)


def prior_paths(key, spec: SVGPSpec, params, n_features: int):
    """Spectral prior-path coefficients: (omegas (d, F), phases (F,), amp).

    The path is f(x) = amp · Σ_j cos(Σ_k ω_{kj} x_k + b_j),
    amp = σ_total·√(2/F) with σ²_total = Π per-axis variances.
    """
    d = spec.ndim
    keys = jax.random.split(key, d + 1)
    omegas = []
    var_total = 1.0
    for i in range(d):
        p = common.axis_params(params, i)
        omegas.append(sample_frequencies(keys[i], spec.kinds[i],
                                         p["lengthscale"], n_features))
        var_total = var_total * p["variance"]
    phases = jax.random.uniform(keys[d], (n_features,), maxval=2.0 * jnp.pi)
    amp = jnp.sqrt(2.0 * var_total / n_features)
    return jnp.stack(omegas), phases, amp


def eval_path(omegas, phases, amp, X: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the prior path at (n, d) inputs → (n,)."""
    if X.ndim == 1:
        X = X[:, None]
    arg = X @ omegas + phases[None, :]          # (n, F)
    return amp * jnp.sum(jnp.cos(arg), axis=1)


def _complex_cell_integral(mesh: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """∫_cell e^{iωs} ds for every cell × frequency → complex (m, F).

    The ω → 0 limit is the cell width; guarded branch-free (the |ω| of a
    continuous spectral draw is almost surely nonzero, but static safety
    beats an almost-surely)."""
    lo, hi = mesh[:-1][:, None], mesh[1:][:, None]
    w = omega[None, :]
    tiny = jnp.abs(w) < 1e-12
    ws = jnp.where(tiny, 1.0, w)
    val = (jnp.exp(1j * ws * hi) - jnp.exp(1j * ws * lo)) / (1j * ws)
    return jnp.where(tiny, (hi - lo).astype(val.dtype), val)


def prior_inducing_sample(omegas, phases, amp, spec: SVGPSpec, params) -> jnp.ndarray:
    """EXACT u_prior = inducing functionals of the prior path, (m₁, …, m_d).

    Cell features: u[i⃗] = amp·Σ_j Re[e^{i b_j} Π_k ∫_cell e^{i ω_{kj} s} ds]
    (closed form — zero discretization error). Point features: path values
    at the (trained) Z."""
    factors = _point_factors(omegas, spec, params)
    letters = "abcdefgh"[:spec.ndim]
    sub = ",".join(f"{letters[k]}F" for k in range(spec.ndim))
    u = jnp.einsum(f"F,{sub}->{letters}", jnp.exp(1j * phases), *factors)
    return amp * jnp.real(u)


def _point_factors(omegas, spec, params):
    factors = []
    for k in range(spec.ndim):
        feat = spec.features[k]
        if isinstance(feat, CellIntegralFeature):
            mesh = jnp.asarray(feat.mesh, omegas.dtype)
            factors.append(_complex_cell_integral(mesh, omegas[k]))
        elif isinstance(feat, PointFeature):
            z = common.axis_params(params, k)["z"]
            factors.append(jnp.exp(1j * z[:, None] * omegas[k][None, :]))
        else:
            raise NotImplementedError(type(feat).__name__)
    return factors


def pathwise_posterior(
    spec: SVGPSpec,
    params,
    key,
    xstar: jnp.ndarray,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """Draw coherent posterior function samples at ``xstar`` → (S, n).

    Matheron update in whitened coordinates:
      f_s(x) = f_prior,s(x) + a(x)ᵀ (w_q,s − F⁻¹ u_prior,s),
    with a(x) the per-axis whitened blocks (never materialized jointly for
    the Kronecker family) and F⁻¹u via per-axis whitening solves.
    """
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    d = spec.ndim
    q = params["q"]
    chols = common.axis_chol_kuu(spec, params)
    blocks = common.axis_whitened_kuf(spec, params, chols, xstar)

    def one(key_s):
        kp, kw = jax.random.split(key_s)
        omegas, phases, amp = prior_paths(kp, spec, params, n_features)
        f_prior = eval_path(omegas, phases, amp, xstar)

        u_prior = prior_inducing_sample(omegas, phases, amp, spec, params)

        # w_prior = F⁻¹ u_prior: per-axis whitening solves along each axis
        w = u_prior
        for k in range(d):
            moved = jnp.moveaxis(w, k, 0).reshape(w.shape[k], -1)
            solved = chols[k].whiten(moved)
            w = jnp.moveaxis(solved.reshape(w.shape[k], *[s for i, s in
                             enumerate(w.shape) if i != k]), 0, k)

        # w_q ~ N(μ, ⊗ LᵢLᵢᵀ)
        if spec.variational == "full":
            m = spec.num_inducing
            z = jax.random.normal(kw, (m,), dtype=f_prior.dtype)
            w_q = q["mu"] + chol_from_raw(q["raw_L"]) @ z
            diff = (w_q - w.reshape(-1))
            a = common.khatri_rao_all(blocks)
            corr = a.T @ diff
        else:
            Ls = _kron_chols(spec, q)
            z = jax.random.normal(kw, tuple(spec.axis_m), dtype=f_prior.dtype)
            lz = z
            for k in range(d):
                lz = jnp.moveaxis(
                    (Ls[k] @ jnp.moveaxis(lz, k, 0).reshape(lz.shape[k], -1))
                    .reshape(lz.shape[k], *[s for i, s in enumerate(lz.shape)
                                            if i != k]), 0, k)
            diff = q["mu"] + lz - w
            from vggp_tpu.models.svgp import _kron_contract

            corr = _kron_contract(diff, blocks, out="n")
        return f_prior + corr

    keys = jax.random.split(key, n_samples)
    return jax.vmap(one)(keys)
