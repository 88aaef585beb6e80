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

from typing import NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

from vggp_tpu.features import (
    B1SplineFeature,
    CellIntegralFeature,
    FourierFeature,
    PointFeature,
    SplineRKHSFeature,
)
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
    if "coregion" in spec.kinds:
        raise NotImplementedError(
            "prior_paths is single-output; a coregion spec draws through "
            "prior_paths_multioutput (chol(B)-mixed per-output bundles), "
            "which pathwise_posterior / pathwise_posterior_collapsed "
            "dispatch to automatically"
        )
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


# --------------------------------------------------------------------------- #
# multi-output (ICM coregion axis) prior paths — beyond-reference
#
# The joint prior over (x, output p) is B ⊗ K. A coherent draw is
#   f(x, p) = Σ_r L_B[p, r] · g_r(x),   L_B = chol(B), g_r iid ~ GP(0, K):
# P independent spectral path BUNDLES over the CONTINUOUS axes, mixed by
# chol(B) rows. Inducing functionals inherit the same mixing (they are
# linear), with the coregion feature's "functional" being evaluation at
# output p — so u[(cells…, p)] = Σ_r L_B[p, r] · u_r[cells…].
# --------------------------------------------------------------------------- #


class _ContSubSpec(NamedTuple):
    """Continuous-axes view of a coregion spec for the path functionals."""

    kinds: tuple
    features: tuple

    @property
    def ndim(self) -> int:
        return len(self.kinds)


def _coregion_split(spec):
    """(co_axis_index, continuous-axes subspec) or (None, spec)."""
    if "coregion" not in spec.kinds:
        return None, spec
    co = spec.kinds.index("coregion")
    kinds = tuple(k for i, k in enumerate(spec.kinds) if i != co)
    feats = tuple(f for i, f in enumerate(getattr(spec, "features", ()) or ())
                  if i != co)
    return co, _ContSubSpec(kinds=kinds, features=feats)


def _cont_params(params, co):
    return {"axes": tuple(ax for i, ax in enumerate(params["axes"]) if i != co),
            "noise": params["noise"]}


def prior_paths_multioutput(key, spec, params, n_features: int):
    """P chol(B)-mixed bundles: (omegas (P, d_cont, F), phases (P, F), amp,
    LB (P, P), co_axis). amp carries the continuous axes' variance product;
    B carries the output scales."""
    from vggp_tpu import kernels as _k

    co, sub = _coregion_split(spec)
    p_co = common.axis_params(params, co)
    B = _k.coregion_b(p_co)
    P = B.shape[0]
    # B = WWᵀ + diag(κ) is PD by construction (κ floored); tiny absolute
    # jitter guards the f32 Cholesky only
    LB = jnp.linalg.cholesky(B + 1e-10 * jnp.eye(P, dtype=B.dtype))
    cont = [i for i in range(spec.ndim) if i != co]
    keys = jax.random.split(key, P)
    var_total = 1.0
    for i in cont:
        var_total = var_total * common.axis_params(params, i)["variance"]
    om_all, ph_all = [], []
    for r in range(P):
        ks = jax.random.split(keys[r], len(cont) + 1)
        om_all.append(jnp.stack([
            sample_frequencies(ks[j], spec.kinds[i],
                               common.axis_params(params, i)["lengthscale"],
                               n_features)
            for j, i in enumerate(cont)
        ]))
        ph_all.append(jax.random.uniform(ks[-1], (n_features,),
                                         maxval=2.0 * jnp.pi))
    amp = jnp.sqrt(2.0 * var_total / n_features)
    return jnp.stack(om_all), jnp.stack(ph_all), amp, LB, co


def eval_path_multioutput(omegas, phases, amp, LB, co, X: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the mixed multi-output path at (n, d) inputs (the coregion
    column carries integer output indices) → (n,)."""
    if X.ndim == 1:
        X = X[:, None]
    d = X.shape[1]
    cont = [i for i in range(d) if i != co]
    Xc = X[:, cont]
    idx = jnp.round(X[:, co]).astype(jnp.int32)
    bundle = jax.vmap(lambda om, ph: eval_path(om, ph, amp, Xc))(
        omegas, phases)                               # (P, n)
    return jnp.sum(LB[idx, :] * bundle.T, axis=1)     # Σ_r L_B[p_i, r] g_r(x_i)


def prior_inducing_sample_multioutput(omegas, phases, amp, LB, co,
                                      spec, params) -> jnp.ndarray:
    """EXACT u_prior for a coregion spec → (m₁, …, m_d) with the coregion
    axis (length P) in its spec slot: per-bundle continuous functionals
    einsum-mixed by chol(B)."""
    _, sub = _coregion_split(spec)
    p_cont = _cont_params(params, co)
    u_r = jnp.stack([
        prior_inducing_sample(omegas[r], phases[r], amp, sub, p_cont)
        for r in range(LB.shape[0])
    ])                                                 # (P, m_cont…)
    u = jnp.einsum("pr,r...->...p", LB, u_r)           # coregion axis last
    return jnp.moveaxis(u, -1, co)


def eval_path_deriv(omegas, phases, amp, X: jnp.ndarray, orders) -> jnp.ndarray:
    """Mixed partial ∂^{o₁}_{x₁}…∂^{o_d}_{x_d} of the prior path → (n,).

    Each derivative of cos advances the phase by π/2 and multiplies by the
    axis frequency: the total-order-n mixed partial is
    amp Σ_j (Π_k ω_{kj}^{o_k}) cos(ωᵀx + b_j + nπ/2) — still exact.
    """
    if X.ndim == 1:
        X = X[:, None]
    n_total = int(sum(orders))
    arg = X @ omegas + phases[None, :] + 0.5 * jnp.pi * n_total
    coef = jnp.ones_like(phases)
    for k, o in enumerate(orders):
        for _ in range(int(o)):
            coef = coef * omegas[k]
    return amp * jnp.sum(coef[None, :] * jnp.cos(arg), axis=1)


# --------------------------------------------------------------------------- #
# Real-pair complex arithmetic
#
# Every closed-form functional below is the real part of a complex
# expression, but the experimental TPU backend in this environment does not
# lower complex64 arithmetic (complex mul/exp raise UNIMPLEMENTED — found by
# driving the sampler on-device), so all "complex" values are carried as
# explicit (re, im) pairs of real arrays. This is also how a TPU wants the
# math anyway: pure VPU elementwise f32, no complex legalization pass.
# --------------------------------------------------------------------------- #


def _cmul(a, b):
    """(re, im) product of two pairs (broadcasts like the components)."""
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _cexp(theta):
    """e^{iθ} as a pair."""
    return jnp.cos(theta), jnp.sin(theta)


def _cpow_int(a, p: int):
    """Integer power p ≥ 1 of a pair (repeated multiplication — p ≤ 3)."""
    out = a
    for _ in range(p - 1):
        out = _cmul(out, a)
    return out


def _cell_integral_pair(mesh: jnp.ndarray, omega: jnp.ndarray):
    """∫_cell e^{iωs} ds for every cell × frequency → (re, im) of (m, F).

    re = (sin(ωβ) − sin(ωα))/ω, im = −(cos(ωβ) − cos(ωα))/ω. The ω → 0
    limit is the cell width; guarded branch-free (the |ω| of a continuous
    spectral draw is almost surely nonzero, but static safety beats an
    almost-surely)."""
    lo, hi = mesh[:-1][:, None], mesh[1:][:, None]
    w = omega[None, :]
    tiny = jnp.abs(w) < 1e-12
    ws = jnp.where(tiny, 1.0, w)
    re = (jnp.sin(ws * hi) - jnp.sin(ws * lo)) / ws
    im = -(jnp.cos(ws * hi) - jnp.cos(ws * lo)) / ws
    return (jnp.where(tiny, hi - lo, re),
            jnp.where(tiny, jnp.zeros_like(im), im))


def prior_inducing_sample(omegas, phases, amp, spec: SVGPSpec, params) -> jnp.ndarray:
    """EXACT u_prior = inducing functionals of the prior path, (m₁, …, m_d).

    Cell features: u[i⃗] = amp·Σ_j Re[e^{i b_j} Π_k ∫_cell e^{i ω_{kj} s} ds]
    (closed form — zero discretization error). Point features: path values
    at the (trained) Z. VFF / spline-RKHS features: the closed-form Markov
    RKHS projection functionals (below). The running product over axes is
    accumulated in (re, im) pairs; only the final real part is kept."""
    factors = _point_factors(omegas, spec, params)
    return _accumulate_factors(phases, amp, factors)


def _accumulate_factors(phases, amp, factors) -> jnp.ndarray:
    """amp · Σ_j Re[e^{i b_j} Π_k factor_kj] over per-axis (re, im) factors.

    The running (re, im) product covers all but the LAST factor; the final
    factor is contracted over F as a matmul (MXU, no (m₁, …, m_d, F)
    intermediate — elementwise-accumulating every factor peaks at
    O(Π m_k · F) HBM, ~2 GB per sample at a 512² grid with F = 1024)."""
    pr, pi = jnp.cos(phases), jnp.sin(phases)          # (F,)
    for fr, fi in factors[:-1]:                        # (m_k, F) each
        pr, pi = (pr[..., None, :] * fr - pi[..., None, :] * fi,
                  pr[..., None, :] * fi + pi[..., None, :] * fr)
    fr, fi = factors[-1]
    # Re[(pr + i·pi)(fr + i·fi)] summed over F: (..., F) @ (F, m_last)
    return amp * (pr @ fr.T - pi @ fi.T)


def prior_grid_integral_sample(omegas, phases, amp, grid_axes) -> jnp.ndarray:
    """EXACT v_prior = cell integrals of the prior path over a product
    prediction grid → (g₁, …, g_d). Same closed-form ∫_cell e^{iωs} ds
    machinery as the inducing functionals — zero discretization error."""
    factors = [_cell_integral_pair(jnp.asarray(g.mesh, omegas.dtype), omegas[k])
               for k, g in enumerate(grid_axes)]
    return _accumulate_factors(phases, amp, factors)


def _face_diff_pair(mesh: jnp.ndarray, omega: jnp.ndarray):
    """e^{iωβ} − e^{iωα} for every cell × frequency → (re, im) of (g, F).

    The gridded-GRADIENT product's axis functional: by the fundamental
    theorem of calculus ∫_cell ∂f = f(β) − f(α), so the differentiated
    axis's factor on the spectral path is a plain face difference of
    evaluations (exact — no quadrature). ω → 0 limit is 0."""
    lo, hi = mesh[:-1][:, None], mesh[1:][:, None]
    w = omega[None, :]
    return (jnp.cos(w * hi) - jnp.cos(w * lo),
            jnp.sin(w * hi) - jnp.sin(w * lo))


def prior_grid_grad_sample(omegas, phases, amp, grid_axes,
                           axis: int) -> jnp.ndarray:
    """EXACT v'_prior = cell integrals of ∂f/∂x_axis of the prior path over
    a product grid → (g₁, …, g_d): face differences on ``axis``, closed-form
    cell integrals elsewhere. The gradient observable's prior functional —
    pairs with ``models.common.grad_grid_kvu`` exactly."""
    factors = [
        (_face_diff_pair if k == axis else _cell_integral_pair)(
            jnp.asarray(g.mesh, omegas.dtype), omegas[k])
        for k, g in enumerate(grid_axes)
    ]
    return _accumulate_factors(phases, amp, factors)


def prior_grid_integral_sample_multioutput(omegas, phases, amp, LB, co,
                                           grid_axes) -> jnp.ndarray:
    """EXACT v_prior for a coregion spec's product grid → (g₁, …, g_d) with
    the output axis (length P) in its slot.

    Cell integrals are linear, so they inherit the chol(B) bundle mixing
    verbatim: v[(cells…, p)] = Σ_r L_B[p, r] · v_r[cells…] with v_r the
    continuous-axes grid functional of bundle r. The grid's output axis
    must be the model's outputs themselves (one product slice per output —
    ``OutputFeature.Kvu`` semantics)."""
    g_co = grid_axes[co]
    P = LB.shape[0]
    if getattr(g_co, "n_outputs", None) != P:
        raise ValueError(
            f"grid axis {co} of a coregion spec must be "
            f"OutputFeature(n_outputs={P}), got {type(g_co).__name__}")
    cont_axes = tuple(g for i, g in enumerate(grid_axes) if i != co)
    v_r = jnp.stack([
        prior_grid_integral_sample(omegas[r], phases[r], amp, cont_axes)
        for r in range(P)
    ])                                                 # (P, g_cont…)
    v = jnp.einsum("pr,r...->...p", LB, v_r)           # output axis last
    return jnp.moveaxis(v, -1, co)


def prior_grid_grad_sample_multioutput(omegas, phases, amp, LB, co,
                                       grid_axes, axis: int) -> jnp.ndarray:
    """Coregion variant of :func:`prior_grid_grad_sample` — the face
    differences on continuous ``axis`` (full-spec index) inherit the
    chol(B) bundle mixing like every linear functional."""
    if axis == co:
        raise ValueError("cannot differentiate along the discrete output axis")
    cont_axes = tuple(g for i, g in enumerate(grid_axes) if i != co)
    cont_axis = axis - (1 if axis > co else 0)
    v_r = jnp.stack([
        prior_grid_grad_sample(omegas[r], phases[r], amp, cont_axes, cont_axis)
        for r in range(LB.shape[0])
    ])
    v = jnp.einsum("pr,r...->...p", LB, v_r)
    return jnp.moveaxis(v, -1, co)


# --------------------------------------------------------------------------- #
# Spectral RKHS functionals for projection-defined inducing features
#
# VFF and spline-RKHS inducing variables are RKHS projections u_j = ⟨f, φ_j⟩_H
# (not integrals), so their exact value on the cosine prior path needs the
# interval RKHS inner product applied to e^{iωx}. All half-integer Matérn
# RKHSs share the Markov-state form (the derivation behind
# ``FourierFeature.kuu_diag_lowrank`` and ``SplineRKHSFeature.Kuu``):
#
#   ⟨g, h⟩_H = (1/c) ∫_a^b (Lg)(Lh) dt + state_g(a)ᵀ P₀⁻¹ state_h(a),
#   L = (d/dt + λ)^p,  state = (g, g', …, g^{(p-1)}),
#
# with p = kernels.MARKOV_ORDER[kind], c = kernels.white_noise_intensity and
# P₀⁻¹ = kernels.p0_inv_rows. For g = e^{iωx}: Lg = (λ+iω)^p e^{iωx} and
# state_g(a) = e^{iωa}·((iω)^r)_r, so the functional reduces to closed-form
# integrals of e^{iωx} against Lφ_j — trigonometric for VFF, piecewise
# polynomial for splines. The bilinear (not sesquilinear) extension is what a
# real-linear functional applied to Re[e^{ib}·Π_k e^{iω_k x_k}] requires.
# --------------------------------------------------------------------------- #


def _E_interval(u: jnp.ndarray, T):
    """∫_0^T e^{iut} dt = sin(uT)/u + i(1 − cos(uT))/u, series near u = 0."""
    theta = u * T
    small = jnp.abs(theta) < 1e-3
    us = jnp.where(small, 1.0, u)
    re = jnp.sin(theta) / us
    im = (1.0 - jnp.cos(theta)) / us
    re_s = T * (1.0 - theta**2 / 6.0)
    im_s = T * (theta / 2.0 - theta**3 / 24.0)
    return jnp.where(small, re_s, re), jnp.where(small, im_s, im)


_J_SERIES_TERMS = 20  # θ^20/20! at |θ| = 2 ≈ 4e-13: below the f64 need here


def _J_powers(theta: jnp.ndarray, cmax: int):
    """J_c(θ) = ∫_0^1 e^{iθv} v^c dv for c = 0..cmax (tuple of pairs).

    Upward recursion J_c = (e^{iθ} − c·J_{c−1})/(iθ) for |θ| ≥ 2 (each step
    divides the error by |θ|, stable); Taylor series
    J_c = Σ_k (iθ)^k / (k!(c+k+1)) below. Division by iθ in pairs:
    (x + iy)/(iθ) = y/θ − i·x/θ.
    """
    small = jnp.abs(theta) < 2.0
    ct, st = jnp.cos(theta), jnp.sin(theta)
    ths = jnp.where(small, 1.0, theta)

    # series branch (computed everywhere, selected where small)
    ts = jnp.where(small, theta, 0.0)
    tr, ti = jnp.ones_like(ts), jnp.zeros_like(ts)  # (iθ)^k / k!
    accs = [(jnp.zeros_like(ts), jnp.zeros_like(ts)) for _ in range(cmax + 1)]
    for k in range(_J_SERIES_TERMS):
        for c in range(cmax + 1):
            accs[c] = (accs[c][0] + tr / (c + k + 1.0),
                       accs[c][1] + ti / (c + k + 1.0))
        tr, ti = _cmul((tr, ti), (jnp.zeros_like(ts), ts))
        tr, ti = tr / (k + 1.0), ti / (k + 1.0)

    out = []
    jr, ji = st / ths, (1.0 - ct) / ths
    out.append((jnp.where(small, accs[0][0], jr),
                jnp.where(small, accs[0][1], ji)))
    for c in range(1, cmax + 1):
        xr, xi = ct - c * jr, st - c * ji
        jr, ji = xi / ths, -xr / ths
        out.append((jnp.where(small, accs[c][0], jr),
                    jnp.where(small, accs[c][1], ji)))
    return tuple(out)


def _markov_prefactor(kind: str, p_ax, omega: jnp.ndarray):
    """(λ, p, (λ+iω)^p / c as a pair) of the Markov RKHS for one axis."""
    from vggp_tpu import kernels

    lam = kernels.lam(kind, p_ax["lengthscale"])
    p = kernels.MARKOV_ORDER[kind]
    c = kernels.white_noise_intensity(kind, p_ax["variance"], p_ax["lengthscale"])
    pref = _cpow_int((lam * jnp.ones_like(omega), omega), p)
    return lam, p, (pref[0] / c, pref[1] / c)


def _state_term(kind: str, p_ax, omega: jnp.ndarray, a: float, state_rows):
    """Boundary part Σ_{r,s} (iω)^r e^{iωa} P₀⁻¹[r,s] φ_j^{(s)}(a) → pair (m, F).

    ``state_rows``: (p, m) array of basis-state values at the left edge.
    Static zeros of P₀⁻¹ skip their term at trace time. (iω)^r pairs:
    r = 0 → (1, 0); r = 1 → (0, ω); r = 2 → (−ω², 0).
    """
    from vggp_tpu import kernels

    pinv = kernels.p0_inv_rows(kind, p_ax["variance"], p_ax["lengthscale"])
    phase = _cexp(omega * a)  # (F,) pair
    one = jnp.ones_like(omega)
    zero = jnp.zeros_like(omega)
    iw_pows = [(one, zero), (zero, omega), (-(omega**2), zero)]
    out_r = 0.0
    out_i = 0.0
    for r in range(len(pinv)):
        wr = _cmul(iw_pows[r], phase)  # (F,) pair
        for s in range(len(pinv)):
            if isinstance(pinv[r][s], float) and pinv[r][s] == 0.0:
                continue
            coef = pinv[r][s] * state_rows[s][:, None]  # (m, 1)
            out_r = out_r + coef * wr[0][None, :]
            out_i = out_i + coef * wr[1][None, :]
    return out_r, out_i


def _rkhs_fourier_factor(feat: FourierFeature, kind: str, p_ax, omega):
    """⟨e^{iωx}, φ_j⟩_H for the VFF basis — pair of (m, F).

    With z_j(x) = e^{iω_j(x−a)}: L cos_j = ((λ+iω_j)^p z_j + (λ−iω_j)^p z̄_j)/2
    and ∫_a^b e^{iωx} z_j^{±1} dx = e^{iωa} E(ω ± ω_j), so the integral part is
    a two-term combination of E(ω ± ω_j) per feature; the boundary part uses
    the basis state (cos_j: (1, 0, −ω_j²); sin_j: (0, ω_j, 0)) at a.
    """
    lam, p, pref = _markov_prefactor(kind, p_ax, omega)
    om_j = feat.omegas(dtype=jnp.result_type(p_ax["lengthscale"]))  # (M+1,)
    T = feat.b - feat.a
    Ep = _E_interval(omega[None, :] + om_j[:, None], T)  # pair (M+1, F)
    Em = _E_interval(omega[None, :] - om_j[:, None], T)
    lam_col = lam * jnp.ones_like(om_j)
    zp = _cpow_int((lam_col, om_j), p)    # pair (M+1,)
    zm = _cpow_int((lam_col, -om_j), p)
    tp = _cmul((zp[0][:, None], zp[1][:, None]), Ep)  # pair (M+1, F)
    tm = _cmul((zm[0][:, None], zm[1][:, None]), Em)
    I_cos = (0.5 * (tp[0] + tm[0]), 0.5 * (tp[1] + tm[1]))
    # (tp − tm)/(2i): (x + iy)/(2i) = y/2 − i·x/2
    I_sin = (0.5 * (tp[1] - tm[1]), -0.5 * (tp[0] - tm[0]))
    integ = (jnp.concatenate([I_cos[0], I_sin[0][1:]], axis=0),
             jnp.concatenate([I_cos[1], I_sin[1][1:]], axis=0))  # (m, F)
    mult = _cmul(pref, _cexp(omega * feat.a))  # (F,) pair
    factor = (integ[0] * mult[0][None, :] - integ[1] * mult[1][None, :],
              integ[0] * mult[1][None, :] + integ[1] * mult[0][None, :])

    zc = jnp.zeros_like(om_j)
    zs = jnp.zeros_like(om_j[1:])
    rows = [jnp.concatenate([jnp.ones_like(om_j), zs])]
    if p >= 2:
        rows.append(jnp.concatenate([zc, om_j[1:]]))
    if p >= 3:
        rows.append(jnp.concatenate([-(om_j**2), zs]))
    st = _state_term(kind, p_ax, omega, feat.a, rows)
    return factor[0] + st[0], factor[1] + st[1]


def _poly_rkhs_factor(kind: str, p_ax, omega, a: float, delta: float,
                      coeffs: np.ndarray, m: int, state_rows):
    """⟨e^{iωx}, φ_j⟩_H for a uniform piecewise-polynomial basis — pair (m, F).

    ``coeffs``: static (K, S, C) local-coordinate table — basis j = i+s has
    polynomial Σ_c coeffs[i,s,c]·v^c on interval i (v = (x−lo_i)/δ). Then
    Lφ_j = Σ_r C(p,r) λ^{p−r} δ^{−r} D^r applied to the table (D = d/dv), and
    ∫_i e^{iωx}·poly(v) dx = δ·e^{iω·lo_i}·Σ_c coef_c·J_c(ωδ).
    """
    lam, p, pref = _markov_prefactor(kind, p_ax, omega)
    K, S, C = coeffs.shape

    def dmat(n):  # d/dv on coefficient vectors of length C
        d = np.zeros((C, C))
        for k in range(1, C):
            d[k - 1, k] = k
        out = np.eye(C)
        for _ in range(n):
            out = d @ out
        return out

    # Lcoef[i,s,c] = Σ_r comb(p,r)·λ^{p−r}·δ^{−r}·(D^r coeffs)[i,s,c]
    import math as _math

    real_dtype = jnp.result_type(lam)
    Lcoef = 0.0
    for r in range(p + 1):
        tab = np.einsum("cd,isd->isc", dmat(r), coeffs)  # static
        Lcoef = Lcoef + (_math.comb(p, r) * delta ** (-r)) * (
            lam ** (p - r) * jnp.asarray(tab, real_dtype)
        )

    theta = omega * delta  # (F,)
    Js = _J_powers(theta, C - 1)
    Jr = jnp.stack([j[0] for j in Js], axis=0)  # (C, F)
    Ji = jnp.stack([j[1] for j in Js], axis=0)
    er = jnp.einsum("isc,cf->isf", Lcoef, Jr)
    ei = jnp.einsum("isc,cf->isf", Lcoef, Ji)
    lo = a + delta * jnp.arange(K, dtype=real_dtype)  # (K,)
    ph = _cexp(omega[None, :] * lo[:, None])          # pair (K, F)
    contrib_r = delta * (ph[0][:, None, :] * er - ph[1][:, None, :] * ei)
    contrib_i = delta * (ph[0][:, None, :] * ei + ph[1][:, None, :] * er)
    Ir = jnp.zeros((m, omega.shape[0]), real_dtype)
    Ii = jnp.zeros((m, omega.shape[0]), real_dtype)
    for s in range(S):
        Ir = Ir.at[s:s + K].add(contrib_r[:, s])
        Ii = Ii.at[s:s + K].add(contrib_i[:, s])
    out_r = Ir * pref[0][None, :] - Ii * pref[1][None, :]
    out_i = Ir * pref[1][None, :] + Ii * pref[0][None, :]
    st = _state_term(kind, p_ax, omega, a, state_rows)
    return out_r + st[0], out_i + st[1]


def _rkhs_b1_factor(feat: B1SplineFeature, kind: str, p_ax, omega):
    """⟨e^{iωx}, hat_j⟩_H — hats as degree-1 piecewise polynomials."""
    m = feat.m
    K = m - 1
    # interval i: hat_i descends (1 − v), hat_{i+1} ascends (v)
    coeffs = np.zeros((K, 2, 2))
    coeffs[:, 0, 0] = 1.0
    coeffs[:, 0, 1] = -1.0
    coeffs[:, 1, 1] = 1.0
    state = [jnp.asarray(np.eye(1, m, 0)[0])]  # φ_j(a) = δ_{j,0}
    return _poly_rkhs_factor(kind, p_ax, omega, float(feat.mesh[0]), feat.delta,
                             coeffs, m, state)


def _rkhs_spline_factor(feat: SplineRKHSFeature, kind: str, p_ax, omega):
    """⟨e^{iωx}, B_j⟩_H for the degree-2/3 open-clamped B-spline basis."""
    state = [jnp.asarray(feat._state[r]) for r in range(feat.degree)]
    return _poly_rkhs_factor(kind, p_ax, omega, feat.a, feat.delta,
                             np.asarray(feat._coeffs), feat.m, state)


def _axis_factor(feat, kind: str, p_ax, omega):
    """One axis's inducing functionals of e^{iωx} → an (re, im) pair,
    each (m, F)."""
    if isinstance(feat, CellIntegralFeature):
        mesh = jnp.asarray(feat.mesh, omega.dtype)
        return _cell_integral_pair(mesh, omega)
    if isinstance(feat, PointFeature):
        z = p_ax["z"]
        arg = z[:, None] * omega[None, :]
        return (jnp.cos(arg), jnp.sin(arg))
    if isinstance(feat, FourierFeature):
        return _rkhs_fourier_factor(feat, kind, p_ax, omega)
    if isinstance(feat, SplineRKHSFeature):
        return _rkhs_spline_factor(feat, kind, p_ax, omega)
    if isinstance(feat, B1SplineFeature):
        return _rkhs_b1_factor(feat, kind, p_ax, omega)
    raise NotImplementedError(type(feat).__name__)


def _point_factors(omegas, spec, params):
    """Per-axis inducing functionals of e^{iωx} → list of (re, im) pairs."""
    return [
        _axis_factor(spec.features[k], spec.kinds[k],
                     common.axis_params(params, k), omegas[k])
        for k in range(spec.ndim)
    ]


def _whiten_axes(w: jnp.ndarray, chols) -> jnp.ndarray:
    """Apply the per-axis whitening solve F_k⁻¹ along every axis of ``w``."""
    for k in range(w.ndim):
        moved = jnp.moveaxis(w, k, 0).reshape(w.shape[k], -1)
        solved = chols[k].whiten(moved)
        w = jnp.moveaxis(solved.reshape(w.shape[k], *[s for i, s in
                         enumerate(w.shape) if i != k]), 0, k)
    return w


@common.highest_precision
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
    chols = common.axis_chol_kuu(spec, params)
    blocks = common.axis_whitened_kuf(spec, params, chols, xstar)
    co, _ = _coregion_split(spec)

    def one(key_s):
        kp, kw = jax.random.split(key_s)
        if co is None:
            omegas, phases, amp = prior_paths(kp, spec, params, n_features)
            f_prior = eval_path(omegas, phases, amp, xstar)
            u_prior = prior_inducing_sample(omegas, phases, amp, spec, params)
        else:  # ICM: chol(B)-mixed per-output path bundles
            omegas, phases, amp, LBm, _ = prior_paths_multioutput(
                kp, spec, params, n_features)
            f_prior = eval_path_multioutput(omegas, phases, amp, LBm, co, xstar)
            u_prior = prior_inducing_sample_multioutput(
                omegas, phases, amp, LBm, co, spec, params)
        diff = _svgp_diff_sample(spec, params, chols, kw, u_prior,
                                 f_prior.dtype)
        return f_prior + _apply_blocks(spec, diff, blocks)

    keys = jax.random.split(key, n_samples)
    return jax.vmap(one)(keys) + common.mean_fn(spec, params, xstar)


def _svgp_diff_sample(spec, params, chols, kw, u_prior, dtype):
    """One Matheron residual w_q − F⁻¹u_prior for the (whitened) SVGP family:
    (m,) for the full family, (m₁, …, m_d) for the Kronecker family."""
    q = params["q"]
    w = _whiten_axes(u_prior, chols)   # F⁻¹ u_prior, per-axis solves
    if spec.variational == "full":
        m = spec.num_inducing
        z = jax.random.normal(kw, (m,), dtype=dtype)
        w_q = q["mu"] + chol_from_raw(q["raw_L"]) @ z
        return w_q - w.reshape(-1)
    Ls = _kron_chols(spec, q)
    z = jax.random.normal(kw, tuple(spec.axis_m), dtype=dtype)
    lz = z
    for k in range(spec.ndim):
        lz = jnp.moveaxis(
            (Ls[k] @ jnp.moveaxis(lz, k, 0).reshape(lz.shape[k], -1))
            .reshape(lz.shape[k], *[s for i, s in enumerate(lz.shape)
                                    if i != k]), 0, k)
    return q["mu"] + lz - w


def _apply_blocks(spec, diff, blocks):
    """Contract a Matheron residual against per-axis whitened blocks → (n,)."""
    if diff.ndim == 1:
        a = common.khatri_rao_all(blocks)
        return a.T @ diff
    from vggp_tpu.models.svgp import _kron_contract

    return _kron_contract(diff, blocks, out="n")


@common.highest_precision
def pathwise_posterior_with_grads(
    spec: SVGPSpec,
    params,
    key,
    xstar: jnp.ndarray,
    grad_axes=None,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """JOINT coherent draws of (f, ∂f/∂x_j for j in grad_axes) at ``xstar``
    → (S, 1 + len(grad_axes), n*).

    Every row of a sample rides the SAME prior path and the SAME Matheron
    residual — the function value and its derivative components are drawn
    jointly, which is what nonlinear functionals of the gradient need (e.g.
    the current-speed field ‖(u_g, v_g)‖ from SSH: speed is nonlinear in the
    gradient, so marginal moments cannot give its distribution). The path
    derivatives are exact (finite cosine sum); the correction derivatives
    ride the closed-form whitened ∂Kuf blocks.

    ``grad_axes`` entries are either an int axis j (= ∂/∂x_j) or a per-axis
    order tuple for mixed/higher partials — e.g. in 2D ``(2, 0)`` is ∂²/∂x²
    and ``(1, 1)`` is ∂²/∂x∂y, so relative vorticity/Laplacian and strain
    fields come from the same joint draw. First derivatives need a
    once-differentiable kernel on that axis (Matérn ≥ 3/2, RBF), second
    derivatives a twice-differentiable one (Matérn ≥ 5/2, RBF).

    Heavy-tail caveat: the spectral path frequencies for matern32 are
    Student-t₃ draws whose 4th moment is infinite, so per-sample gradient
    amplitudes (∝ Σ_j ω_j²) are heavy-tailed at any finite ``n_features`` —
    a single tail ω occasionally inflates one sample's gradient row by tens
    of percent. Small-S Monte-Carlo functionals of matern32 gradients
    (exceedance maps, quantiles) carry that extra variance; prefer matern52
    or rbf for gradient observables, or raise ``n_samples`` well past ~10².
    Beyond-reference.
    """
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    if grad_axes is None:
        grad_axes = tuple(range(spec.ndim))
    orders_list = [common.normalize_deriv_orders(spec, e) for e in grad_axes]
    chols = common.axis_chol_kuu(spec, params)
    blocks = common.axis_whitened_kuf(spec, params, chols, xstar)
    dblocks = [common.axis_whitened_deriv_kuf(spec, params, chols, xstar, o)
               for o in orders_list]

    def one(key_s):
        kp, kw = jax.random.split(key_s)
        omegas, phases, amp = prior_paths(kp, spec, params, n_features)
        f_prior = eval_path(omegas, phases, amp, xstar)
        u_prior = prior_inducing_sample(omegas, phases, amp, spec, params)
        diff = _svgp_diff_sample(spec, params, chols, kw, u_prior,
                                 f_prior.dtype)
        rows = [f_prior + _apply_blocks(spec, diff, blocks)
                + common.mean_fn(spec, params, xstar)]
        for o, db in zip(orders_list, dblocks):
            g_prior = eval_path_deriv(omegas, phases, amp, xstar, o)
            rows.append(g_prior + _apply_blocks(spec, diff, db))
        return jnp.stack(rows)

    return jax.vmap(one)(jax.random.split(key, n_samples))


# --------------------------------------------------------------------------- #
# Pathwise sampling for the collapsed families (SGPR / FreeSVGP) and the
# exact GP — together with ``pathwise_posterior`` above this makes coherent
# function draws available for EVERY model family in the framework. The
# reference (pointwise gpytorch moments throughout,
# e.g. ``univariate_structure.py:184-232``) has no sampling path at all.
#
# Collapsed models: the Titsias-optimal posterior over the whitened inducing
# coordinates w = F⁻¹u is available in closed form from the factored state
# (A, L_B, c) that the ELBO already computes (``common.factored_state``):
#     q*(w) = N(L_B⁻ᵀ c,  B⁻¹),      B = L_B L_Bᵀ = I + AAᵀ,
# so a sample is w_q = L_B⁻ᵀ (c + z), z ~ N(0, I) — one extra triangular
# solve per draw. The Matheron correction is then identical to the SVGP
# case: f_s(x) = f_prior,s(x) + a(x)ᵀ (w_q,s − F⁻¹ u_prior,s).
#
# Exact GP: Matheron's rule against the data itself,
#     f_s(x) = f_prior,s(x) + k(x,X) (Kxx + σ²I)⁻¹ (y − f_prior,s(X) − ε_s),
# ε_s ~ N(0, σ²I) — the classical form (Wilson et al. 2020, eq. 7).
# --------------------------------------------------------------------------- #


@common.highest_precision
def pathwise_posterior_collapsed(
    spec,
    params,
    key,
    X: jnp.ndarray,
    y: jnp.ndarray,
    xstar: jnp.ndarray,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """Coherent draws from the collapsed-optimal posterior of an
    ``SGPRSpec`` model (any feature family, any ndim) → (S, n*)."""
    from vggp_tpu.ops import tri_solve

    if xstar.ndim == 1:
        xstar = xstar[:, None]
    chols, A, LB, c, y = common.factored_state(
        spec, params, X, y, common.khatri_rao_all)
    blocks_star = common.axis_whitened_kuf(spec, params, chols, xstar)
    a = common.khatri_rao_all(blocks_star)          # (m, n*)
    m = a.shape[0]
    co, _ = _coregion_split(spec)

    def one(key_s):
        kp, kw = jax.random.split(key_s)
        if co is None:
            omegas, phases, amp = prior_paths(kp, spec, params, n_features)
            f_prior = eval_path(omegas, phases, amp, xstar)
            u_prior = prior_inducing_sample(omegas, phases, amp, spec, params)
        else:  # ICM: chol(B)-mixed per-output path bundles
            omegas, phases, amp, LBm, _ = prior_paths_multioutput(
                kp, spec, params, n_features)
            f_prior = eval_path_multioutput(omegas, phases, amp, LBm, co, xstar)
            u_prior = prior_inducing_sample_multioutput(
                omegas, phases, amp, LBm, co, spec, params)
        w = _whiten_axes(u_prior, chols).reshape(-1)
        z = jax.random.normal(kw, (m,), dtype=f_prior.dtype)
        w_q = tri_solve(LB, c + z, trans=True)       # L_B⁻ᵀ (c + z)
        return f_prior + a.T @ (w_q - w)

    return (jax.vmap(one)(jax.random.split(key, n_samples))
            + common.mean_fn(spec, params, xstar))


@common.highest_precision
def pathwise_posterior_collapsed_with_grads(
    spec,
    params,
    key,
    X: jnp.ndarray,
    y: jnp.ndarray,
    xstar: jnp.ndarray,
    grad_axes=None,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """Joint (f, derivative rows) draws from the collapsed-optimal posterior
    of an ``SGPRSpec`` model → (S, 1 + len(grad_axes), n*). See
    :func:`pathwise_posterior_with_grads` for semantics (incl. higher/mixed
    partials via per-axis order tuples)."""
    from vggp_tpu.ops import tri_solve

    if xstar.ndim == 1:
        xstar = xstar[:, None]
    if grad_axes is None:
        grad_axes = tuple(range(spec.ndim))
    orders_list = [common.normalize_deriv_orders(spec, e) for e in grad_axes]
    chols, A, LB, c, y = common.factored_state(
        spec, params, X, y, common.khatri_rao_all)
    a = common.khatri_rao_all(common.axis_whitened_kuf(spec, params, chols, xstar))
    da = [common.khatri_rao_all(
        common.axis_whitened_deriv_kuf(spec, params, chols, xstar, o))
        for o in orders_list]
    m = a.shape[0]

    def one(key_s):
        kp, kw = jax.random.split(key_s)
        omegas, phases, amp = prior_paths(kp, spec, params, n_features)
        f_prior = eval_path(omegas, phases, amp, xstar)
        u_prior = prior_inducing_sample(omegas, phases, amp, spec, params)
        w = _whiten_axes(u_prior, chols).reshape(-1)
        z = jax.random.normal(kw, (m,), dtype=f_prior.dtype)
        diff = tri_solve(LB, c + z, trans=True) - w    # w_q − F⁻¹u_prior
        rows = [f_prior + a.T @ diff + common.mean_fn(spec, params, xstar)]
        for o, dai in zip(orders_list, da):
            g_prior = eval_path_deriv(omegas, phases, amp, xstar, o)
            rows.append(g_prior + dai.T @ diff)
        return jnp.stack(rows)

    return jax.vmap(one)(jax.random.split(key, n_samples))


@common.highest_precision
def pathwise_posterior_free(
    spec,
    params,
    key,
    X: jnp.ndarray,
    y: jnp.ndarray,
    xstar: jnp.ndarray,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """Coherent draws for the free-inducing-point ``FreeSVGPSpec`` model
    (collapsed-optimal q; inducing functionals are point evaluations at the
    trained d-dimensional Z) → (S, n*)."""
    from vggp_tpu.models import freesvgp
    from vggp_tpu.ops import tri_solve

    if xstar.ndim == 1:
        xstar = xstar[:, None]
    chol, A, LB, c, y = freesvgp._factored_state(spec, params, X, y)
    a = chol.whiten(freesvgp._hadamard_gram(spec, params, params["z"], xstar))
    m = a.shape[0]

    def one(key_s):
        kp, kw = jax.random.split(key_s)
        omegas, phases, amp = prior_paths(kp, spec, params, n_features)
        f_prior = eval_path(omegas, phases, amp, xstar)
        u_prior = eval_path(omegas, phases, amp, params["z"])   # (m,)
        w = chol.whiten(u_prior[:, None])[:, 0]
        z = jax.random.normal(kw, (m,), dtype=f_prior.dtype)
        w_q = tri_solve(LB, c + z, trans=True)
        return f_prior + a.T @ (w_q - w)

    return jax.vmap(one)(jax.random.split(key, n_samples))


@common.highest_precision
def pathwise_posterior_exact(
    spec,
    params,
    key,
    X: jnp.ndarray,
    y: jnp.ndarray,
    xstar: jnp.ndarray,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """Coherent draws from the exact GP posterior via Matheron's rule
    against the data (Wilson et al. 2020, eq. 7) → (S, n*)."""
    from vggp_tpu.models import exact
    from vggp_tpu.ops import tri_solve

    if X.ndim == 1:
        X = X[:, None]
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    y = jnp.reshape(y, (-1,)) - common.mean_fn(spec, params, X)  # residual
    L = exact._chol_ky(spec, params, X)              # chol(Kxx + σ²I)
    ksx = common.gram_full(spec, params, xstar, X)   # (n*, n)
    sigma = jnp.sqrt(common.obs_noise(spec, params, X))  # scalar or (n,)
    co, _ = _coregion_split(spec)

    def one(key_s):
        kp, ke = jax.random.split(key_s)
        if co is None:
            omegas, phases, amp = prior_paths(kp, spec, params, n_features)
            f_star = eval_path(omegas, phases, amp, xstar)
            f_X = eval_path(omegas, phases, amp, X)
        else:  # ICM: chol(B)-mixed per-output path bundles
            omegas, phases, amp, LBm, _ = prior_paths_multioutput(
                kp, spec, params, n_features)
            f_star = eval_path_multioutput(omegas, phases, amp, LBm, co, xstar)
            f_X = eval_path_multioutput(omegas, phases, amp, LBm, co, X)
        eps = sigma * jax.random.normal(ke, f_X.shape, dtype=f_X.dtype)
        resid = y - f_X - eps
        alpha = tri_solve(L, tri_solve(L, resid), trans=True)
        return f_star + ksx @ alpha

    return (jax.vmap(one)(jax.random.split(key, n_samples))
            + common.mean_fn(spec, params, xstar))


@common.highest_precision
def pathwise_posterior_additive(
    spec,
    params,
    key,
    X: jnp.ndarray,
    y: jnp.ndarray,
    xstar: jnp.ndarray,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """Coherent draws for the additive-structure model (``AdditiveSGPRSpec``).

    The prior path for f(x) = Σ_d f_d(x_d) is a SUM of independent 1-D
    spectral paths (one per component, each with its own variance), and the
    inducing functionals are the per-component functionals of that
    component's path, concatenated — mirroring the model's block-diagonal
    Kuu. The collapsed-optimal q(w) sample is the same L_B⁻ᵀ(c + z) as SGPR.
    """
    from vggp_tpu.models import additive
    from vggp_tpu.ops import tri_solve

    if xstar.ndim == 1:
        xstar = xstar[:, None]
    d = spec.ndim
    chols, A, LB, c, y = additive._factored_state(spec, params, X, y)
    blocks_star = common.axis_whitened_kuf(spec, params, chols, xstar)
    a = jnp.concatenate(blocks_star, axis=0)         # (m, n*)
    m = a.shape[0]

    def one(key_s):
        keys = jax.random.split(key_s, 2 * d + 1)
        f_prior = jnp.zeros((xstar.shape[0],), dtype=a.dtype)
        w_parts = []
        for i in range(d):
            p_ax = common.axis_params(params, i)
            om = sample_frequencies(keys[2 * i], spec.kinds[i],
                                    p_ax["lengthscale"], n_features)
            ph = jax.random.uniform(keys[2 * i + 1], (n_features,),
                                    maxval=2.0 * jnp.pi)
            amp = jnp.sqrt(2.0 * p_ax["variance"] / n_features)
            f_prior = f_prior + eval_path(om[None, :], ph, amp,
                                          xstar[:, i:i + 1])
            factor = _axis_factor(spec.features[i], spec.kinds[i], p_ax, om)
            u_i = _accumulate_factors(ph, amp, [factor])
            w_parts.append(chols[i].whiten(u_i[:, None])[:, 0])
        w = jnp.concatenate(w_parts)
        z = jax.random.normal(keys[-1], (m,), dtype=a.dtype)
        w_q = tri_solve(LB, c + z, trans=True)
        return f_prior + a.T @ (w_q - w)

    return jax.vmap(one)(jax.random.split(key, n_samples))


@common.highest_precision
def pathwise_posterior_sum(
    spec,
    params,
    key,
    X: jnp.ndarray,
    y: jnp.ndarray,
    xstar: jnp.ndarray,
    n_samples: int = 8,
    n_features: int = 1024,
) -> jnp.ndarray:
    """Coherent draws for the sum-of-separable-kernels model
    (``models.sum.SumSGPRSpec``) → (S, n*).

    The prior path of f = Σ_q f_q is the SUM of independent per-component
    paths (each a full separable product over the input axes, ICM coregion
    components included via the chol(B)-mixed bundles); inducing functionals
    stack blockwise, mirroring the block-diagonal Kuu. The collapsed-optimal
    q(w) sample is the same L_B⁻ᵀ(c + z) as SGPR."""
    from vggp_tpu.models import sum as msum
    from vggp_tpu.ops import tri_solve

    if xstar.ndim == 1:
        xstar = xstar[:, None]
    chols, A, LB, c, _ = msum._factored_state(spec, params, X, y)
    rows = []
    for q, comp in enumerate(spec.components):
        cp = msum._comp_params(params, q)
        rows.append(common.khatri_rao_all(
            common.axis_whitened_kuf(comp, cp, chols[q], xstar)))
    a = jnp.concatenate(rows, axis=0)                # (Σm_q, n*)
    m = a.shape[0]

    def one(key_s):
        keys = jax.random.split(key_s, len(spec.components) + 1)
        f_prior = jnp.zeros((xstar.shape[0],), dtype=a.dtype)
        w_parts = []
        for q, comp in enumerate(spec.components):
            cp = msum._comp_params(params, q)
            co, _ = _coregion_split(comp)
            if co is None:
                om, ph, amp = prior_paths(keys[q], comp, cp, n_features)
                f_prior = f_prior + eval_path(om, ph, amp, xstar)
                u_q = prior_inducing_sample(om, ph, amp, comp, cp)
            else:
                om, ph, amp, LBm, _ = prior_paths_multioutput(
                    keys[q], comp, cp, n_features)
                f_prior = f_prior + eval_path_multioutput(
                    om, ph, amp, LBm, co, xstar)
                u_q = prior_inducing_sample_multioutput(
                    om, ph, amp, LBm, co, comp, cp)
            w_parts.append(_whiten_axes(u_q, chols[q]).reshape(-1))
        w = jnp.concatenate(w_parts)
        z = jax.random.normal(keys[-1], (m,), dtype=a.dtype)
        w_q = tri_solve(LB, c + z, trans=True)
        return f_prior + a.T @ (w_q - w)

    return (jax.vmap(one)(jax.random.split(key, n_samples))
            + common.mean_fn(spec, params, xstar))


def pathwise(spec, params, key, xstar, data=None, n_samples: int = 8,
             n_features: int = 1024) -> jnp.ndarray:
    """Family-dispatching entry: coherent posterior draws for ANY model spec.

    ``data=(X, y)`` is required for the collapsed/exact families (their
    posterior is a function of the data); the uncollapsed SVGP ignores it.
    """
    from vggp_tpu.models.additive import AdditiveSGPRSpec
    from vggp_tpu.models.exact import ExactGPSpec
    from vggp_tpu.models.freesvgp import FreeSVGPSpec
    from vggp_tpu.models.sgpr import SGPRSpec
    from vggp_tpu.models.sum import SumSGPRSpec

    if isinstance(spec, SVGPSpec):
        return pathwise_posterior(spec, params, key, xstar,
                                  n_samples=n_samples, n_features=n_features)
    if data is None:
        raise ValueError(f"{type(spec).__name__} needs data=(X, y) to sample "
                         "its (collapsed/exact) posterior")
    X, y = data
    if isinstance(spec, SGPRSpec):
        fn = pathwise_posterior_collapsed
    elif isinstance(spec, FreeSVGPSpec):
        fn = pathwise_posterior_free
    elif isinstance(spec, ExactGPSpec):
        fn = pathwise_posterior_exact
    elif isinstance(spec, AdditiveSGPRSpec):
        fn = pathwise_posterior_additive
    elif isinstance(spec, SumSGPRSpec):
        fn = pathwise_posterior_sum
    else:
        raise NotImplementedError(type(spec).__name__)
    return fn(spec, params, key, X, y, xstar,
              n_samples=n_samples, n_features=n_features)


# --------------------------------------------------------------------------- #
# Pathwise sampling of the GRIDDED PRODUCT v (cell-integral functionals)
#
# The library's headline output is q(v), the posterior over cell integrals of
# the latent field on a product prediction grid (reference
# ``gridded_kronecker_structure.py`` heads). ``q_v`` gives its mean/variance;
# sampling it coherently needs joint draws of the m-dimensional functional
# vector — which Matheron's rule gives in closed form, because BOTH the
# inducing functionals u AND the product functionals v of the cosine prior
# path are exact per-axis integrals:
#
#     v_s = v_prior,s + R (w_q,s − F⁻¹ u_prior,s),     R_i = Kvu_i F_i⁻ᵀ.
#
# No lattice discretization anywhere: the sample v_s IS a draw of the exact
# integral functionals, enabling distributions of nonlinear functionals OF
# THE PRODUCT (exceedance areas of gridded SSH, basin totals, extremes).
# --------------------------------------------------------------------------- #


@common.highest_precision
def pathwise_q_v(
    spec,
    params,
    key,
    grid_axes,
    n_samples: int = 8,
    n_features: int = 1024,
    data=None,
) -> jnp.ndarray:
    """Coherent joint draws of the gridded product v → (S, g) flat row-major
    (``numpy.kron`` convention, matching ``q_v``).

    Supports the uncollapsed ``SVGPSpec`` (kron or full variational family)
    and the collapsed ``SGPRSpec`` (pass ``data=(X, y)``).
    """
    from vggp_tpu.models.sgpr import SGPRSpec
    from vggp_tpu.models.svgp import _kron_contract
    from vggp_tpu.ops import tri_solve

    collapsed = isinstance(spec, SGPRSpec)
    if collapsed:
        if data is None:
            raise ValueError("SGPRSpec needs data=(X, y) to sample q(v)")
        X, y = data
        chols, A, LB, c, _ = common.factored_state(
            spec, params, X, y, common.khatri_rao_all)
    elif isinstance(spec, SVGPSpec):
        chols = common.axis_chol_kuu(spec, params)
        q = params["q"]
    else:
        raise NotImplementedError(
            f"pathwise_q_v supports SVGPSpec and SGPRSpec; got "
            f"{type(spec).__name__} (use sampling.pathwise for function-"
            "space draws of the other families)")
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)
    r_blocks = tuple(chols[i].whiten(kvu_blocks[i].T).T
                     for i in range(spec.ndim))      # (g_i, m_i)
    m = int(np.prod([b.shape[1] for b in r_blocks]))

    def one(key_s):
        kp, kw = jax.random.split(key_s)
        omegas, phases, amp = prior_paths(kp, spec, params, n_features)
        v_prior = prior_grid_integral_sample(omegas, phases, amp, grid_axes)
        u_prior = prior_inducing_sample(omegas, phases, amp, spec, params)
        w = _whiten_axes(u_prior, chols)
        if collapsed:
            z = jax.random.normal(kw, (m,), dtype=v_prior.dtype)
            diff = (tri_solve(LB, c + z, trans=True) - w.reshape(-1)
                    ).reshape(w.shape)
        elif spec.variational == "full":
            z = jax.random.normal(kw, (m,), dtype=v_prior.dtype)
            w_q = q["mu"] + chol_from_raw(q["raw_L"]) @ z
            diff = (w_q - w.reshape(-1)).reshape(w.shape)
        else:
            Ls = _kron_chols(spec, q)
            z = jax.random.normal(kw, tuple(spec.axis_m), dtype=v_prior.dtype)
            lz = z
            for k in range(len(Ls)):
                lz = jnp.moveaxis(
                    (Ls[k] @ jnp.moveaxis(lz, k, 0).reshape(lz.shape[k], -1))
                    .reshape(lz.shape[k], *[s for i, s in enumerate(lz.shape)
                                            if i != k]), 0, k)
            diff = q["mu"] + lz - w
        corr = _kron_contract(diff, r_blocks, out="grid")
        return v_prior.reshape(-1) + corr

    return jax.vmap(one)(jax.random.split(key, n_samples))
