"""Shared model plumbing: axis blocks, Khatri–Rao assembly, Gaussian results."""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vggp_tpu import kernels
from vggp_tpu.ops import safe_cholesky, tri_solve, khatri_rao_rows, kron_dense
from vggp_tpu.ops.chol import psd_factor, PSDFactor

Params = Dict


def highest_precision(fn):
    """Run ``fn`` under float32-accurate matmuls.

    TPU matmuls default to bfloat16 passes; GP bounds and predictive
    variances involve large cancellations (k_ff - ‖a‖² + …) that lose all
    significance at bf16. The 3/6-pass f32 MXU mode is still orders of
    magnitude faster than the reference's CPU float64 path (SURVEY.md §7
    precision strategy).

    The pass count is ``config.MATMUL_PRECISION`` (read at trace time):
    "highest" = 6-pass f32 (default), "high" = 3-pass (~1e-7 relative —
    measured equivalent through a full 512² gridded fit, 2× MXU rate).
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from vggp_tpu import config

        with jax.default_matmul_precision(config.MATMUL_PRECISION):
            return fn(*args, **kwargs)

    return wrapped


@dataclass
class Gaussian:
    """A multivariate normal result (mean, covariance or variance diag).

    Registered as a pytree so prediction functions returning it can be
    jit-compiled (essential on remote-TPU backends where eager dispatch pays
    a network round-trip per op).
    """

    mean: jnp.ndarray
    cov: jnp.ndarray = None  # (n, n) when materialized
    var: jnp.ndarray = None  # (n,) diagonal when cov is not materialized

    def variance(self) -> jnp.ndarray:
        return self.var if self.var is not None else jnp.diagonal(self.cov)

    def stddev(self) -> jnp.ndarray:
        return jnp.sqrt(self.variance())


jax.tree_util.register_pytree_node(
    Gaussian,
    lambda g: ((g.mean, g.cov, g.var), None),
    lambda _, c: Gaussian(*c),
)


def axis_params(params: Params, i: int) -> Params:
    return params["axes"][i]


def shift_mean(g: Gaussian, delta) -> Gaussian:
    """Gaussian with ``delta`` added to the mean (0.0 → unchanged, free)."""
    if isinstance(delta, float) and delta == 0.0:
        return g
    return Gaussian(mean=g.mean + delta, cov=g.cov, var=g.var)


def floor_var(var: jnp.ndarray, ref_diag: jnp.ndarray) -> jnp.ndarray:
    """Floor predictive variances at a tiny fraction of the prior diagonal.

    The subtracted forms ``k_diag - Σa² + Σt²`` can go slightly negative in
    float32 (roundoff, not model error); a negative variance poisons NLPD and
    plotting. The floor is relative to the prior marginal variance so it is
    scale-free.
    """
    return jnp.maximum(var, 1e-6 * ref_diag)


# float32 Kuu jitter floors by kernel smoothness: smoother Matérn orders
# have exponentially faster eigendecay of the cell-integral / point Grams, so
# the f32 Cholesky needs a larger relative nugget (measured on v5e: gridded
# Matérn-3/2 and 5/2 training NaNs below 1e-4; Matérn-1/2 is fine at 1e-6,
# and larger values measurably bias its converged ELBO).
KIND_JITTER_F32 = {"matern12": 1e-6, "matern32": 1e-4, "matern52": 1e-4, "rbf": 1e-4}


def axis_chol_kuu(spec, params: Params, method: str | None = None) -> Tuple[PSDFactor, ...]:
    """Per-axis PSD factors of Kuu.

    Default is jittered Cholesky (differentiable, cheap) with a per-kernel
    float32 jitter floor (see :data:`KIND_JITTER_F32`). Specs may set
    ``factor_method="eigh"`` for the clamped-eigendecomposition factor on
    non-differentiated prediction paths (see ops.chol.PSDFactor).
    """
    if method is None:
        method = getattr(spec, "factor_method", "chol")
    out = []
    for i, (kind, feat) in enumerate(zip(spec.kinds, spec.features)):
        kuu = feat.Kuu(kind, axis_params(params, i))
        jitter = spec.jitter
        if kuu.dtype != jnp.float64:
            jitter = max(jitter, KIND_JITTER_F32.get(kind, 1e-4),
                         _feature_f32_jitter(feat, kind))
        out.append(psd_factor(kuu, method=method, jitter=jitter))
    return tuple(out)


def _feature_f32_jitter(feat, kind: str) -> float:
    """Per-(feature, kind) f32 jitter floor on top of KIND_JITTER_F32.

    Needed because the floor that suffices for one Gram structure can sit
    exactly at the failure boundary for another: the Matérn-3/2 CELL Gram's
    TPU-built rows carry ~5e-6 relative entry error (bench smoke golden),
    which shifts λ_min by up to ~m·err ≈ 1e-4 of scale — equal to the
    generic 1e-4 floor, so its f32 Cholesky NaNs on-device at moderate δ/ℓ
    (observed in the Poisson drive at m = 24, ℓ = 0.48; CPU f32, with
    ~50× smaller row error, survives the identical matrix).
    """
    return getattr(feat, "extra_f32_jitter", lambda k: 0.0)(kind)


def axis_rel_jitter(spec, kind: str, dtype, feat=None) -> float:
    """Effective relative Kuu jitter for one axis.

    Mirrors exactly what :func:`axis_chol_kuu` + ``ops.chol.safe_cholesky``
    apply: float64 uses ``spec.jitter`` as given; float32 floors it at the
    per-kernel :data:`KIND_JITTER_F32`, the per-feature floor, and the
    global f32 minimum.
    """
    from vggp_tpu.ops.chol import F32_MIN_JITTER

    jitter = spec.jitter
    if dtype != jnp.float64:
        jitter = max(jitter, KIND_JITTER_F32.get(kind, 1e-4), F32_MIN_JITTER)
        if feat is not None:
            jitter = max(jitter, _feature_f32_jitter(feat, kind))
    return jitter


def scalar_whiten_eligible(spec, params: Params) -> bool:
    """True when the scalar-tangent whitening VJP applies: Cholesky factors
    and every axis trained through exactly (variance, lengthscale) — i.e.
    fixed bases, no learnable inducing locations."""
    from vggp_tpu import config

    if not config.SCALAR_WHITEN_VJP:
        return False
    if getattr(spec, "factor_method", "chol") != "chol":
        return False
    return all(set(ax) <= {"variance", "lengthscale"} for ax in params["axes"])


def whitened_kuf_scalar(feat, kind: str, rel_jitter: float, p: Params,
                        x: jnp.ndarray) -> jnp.ndarray:
    """a = F⁻¹ Kuf with a scalar-tangent custom VJP (fixed-basis features).

    The primal is bit-identical to ``axis_chol_kuu`` → ``PSDFactor.whiten``
    (jittered Cholesky, explicit triangular inverse, one 6-pass matmul). The
    gradient path exploits that ``a`` depends on exactly two trained scalars:

    - variance: every fixed basis satisfies a(ℓ, v) = √v·a(ℓ, 1) exactly —
      cell-integral/point Kuu and Kuf scale as v (so F ∝ √v, a ∝ v/√v),
      VFF/spline-RKHS Kuu scale as 1/v with v-free Kuf (a ∝ √v), and the
      relative jitter preserves the scaling. Hence ∂a/∂v = a/(2v).
    - lengthscale: one precomputed JVP. With M = F⁻¹ (∂Kuu) F⁻ᵀ and the
      Cholesky differential dF = F·Φ(M) (Φ = strict lower + half diagonal),
      F⁻¹dF = Φ(M), so ∂a/∂ℓ = F⁻¹ ∂Kuf − Φ(M)·a — two (m,m)×(m,n) matmuls
      at ambient precision.

    The backward is then two dot-reductions against the stored tangents —
    no reverse-mode through Cholesky, no triangular-inverse VJP, and no
    (m,n)×(n,m) cotangent matmuls (the dominant backward cost at the
    512²/4096 bench shapes; see PERFORMANCE.md round-2 notes).
    """
    from vggp_tpu import config

    def kuu_jittered(ll, vv):
        k = feat.Kuu(kind, {"lengthscale": ll, "variance": vv})
        k = 0.5 * (k + k.T)
        scale = jnp.mean(jnp.diagonal(k)) * rel_jitter
        return k + scale * jnp.eye(k.shape[0], dtype=k.dtype)

    def finv_of(K):
        F = jnp.linalg.cholesky(K)
        return jax.scipy.linalg.solve_triangular(
            F, jnp.eye(F.shape[0], dtype=F.dtype), lower=True
        )

    def finv_of_params(l, v):
        """(F⁻¹, band ratio or None) of the jittered Kuu: closed form when
        the feature has one (ops/kms.py — O(m²) elementwise, no sequential
        chol/trisolve, and far more f32-accurate than dense chol), dense
        otherwise. The ratio gates the block-banded apply."""
        if config.STRUCTURED_FINV:
            hook = getattr(feat, "inv_chol_kuu", None)
            if hook is not None:
                fi = hook(kind, {"lengthscale": l, "variance": v}, rel_jitter)
                if fi is not None:
                    ratio = None
                    if config.BANDED_WHITEN_APPLY:
                        rhook = getattr(feat, "whiten_band_ratio", None)
                        if rhook is not None:
                            ratio = rhook(kind, {"lengthscale": l, "variance": v},
                                          rel_jitter)
                    return fi, ratio
        return finv_of(kuu_jittered(l, v)), None

    def apply_finv(finv, ratio, kuf):
        from vggp_tpu.ops.kms import banded_whiten_apply

        if ratio is None:
            return jnp.matmul(finv, kuf, precision=config.WHITEN_MATMUL_PRECISION)
        return banded_whiten_apply(finv, kuf, ratio,
                                   config.WHITEN_MATMUL_PRECISION)

    @jax.custom_vjp
    def wk(l, v, x):
        finv, ratio = finv_of_params(l, v)
        kuf = feat.Kuf(kind, {"lengthscale": l, "variance": v}, x)
        return apply_finv(finv, ratio, kuf)

    def wk_fwd(l, v, x):
        # the ℓ-tangent is gradient-only signal: its two (m, n) matmuls ride
        # the gradient precision (1-pass bf16, config.GRAD_MATMUL_PRECISION
        # — same rationale as the bf16 moments backward); the small (m, m)
        # M build keeps the ambient precision.
        prec = config.MATMUL_PRECISION
        gprec = config.GRAD_MATMUL_PRECISION
        _, dK = jax.jvp(lambda t: kuu_jittered(t, v), (l,), (jnp.ones_like(l),))
        finv, ratio = finv_of_params(l, v)
        p_lv = {"lengthscale": l, "variance": v}
        fused_hook = getattr(feat, "whitened_kuf_fused", None)
        fused = fused_hook(kind, p_lv, finv, ratio, x) if fused_hook else None
        if fused is not None:
            # deepest structured path: Kuf/∂Kuf generated in VMEM and
            # contracted against the banded F⁻¹ in one Pallas pass — the
            # (m, n) intermediates never round-trip HBM
            a, t = fused
        else:
            kuf, dkuf = feat.Kuf_with_dl(kind, p_lv, x)
            a = apply_finv(finv, ratio, kuf)
            t = jnp.matmul(finv, dkuf, precision=gprec)
        M = jnp.matmul(jnp.matmul(finv, dK, precision=prec), finv.T, precision=prec)
        Phi = jnp.tril(M, -1) + 0.5 * jnp.diag(jnp.diagonal(M))
        da_dl = t - jnp.matmul(Phi, a, precision=gprec)
        return a, (a, da_dl, v, x)

    def wk_bwd(res, g):
        a, da_dl, v, x = res
        dl = jnp.sum(g * da_dl)
        dv = jnp.sum(g * a) / (2.0 * v)
        return dl, dv, jnp.zeros_like(x)

    wk.defvjp(wk_fwd, wk_bwd)
    return wk(p["lengthscale"], p["variance"], x)


def axis_whitened_kuf_scalar(spec, params: Params, X: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-axis A_i = F_i⁻¹ Kuf_i via :func:`whitened_kuf_scalar`."""
    if X.ndim == 1:
        X = X[:, None]
    dtype = jnp.result_type(params["noise"])
    out = []
    for i, (kind, feat) in enumerate(zip(spec.kinds, spec.features)):
        rel = axis_rel_jitter(spec, kind, dtype, feat)
        out.append(whitened_kuf_scalar(feat, kind, rel, axis_params(params, i), X[:, i]))
    return tuple(out)


def axis_whitened_kuf(spec, params: Params, chols, X: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-axis A_i = F_i⁻¹ Kuf_i(x_i) — (m_i, n) each.

    X is (n, d) (or (n,)/(n,1) in 1D). For separable kernels and per-axis
    features the joint whitened cross-covariance is the column-wise Kronecker
    (Khatri–Rao) of these blocks: never materialize until needed.
    """
    if X.ndim == 1:
        X = X[:, None]
    out = []
    for i, (kind, feat) in enumerate(zip(spec.kinds, spec.features)):
        kuf = feat.Kuf(kind, axis_params(params, i), X[:, i])
        out.append(chols[i].whiten(kuf))
    return tuple(out)


def khatri_rao_all(blocks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    out = blocks[0]
    for b in blocks[1:]:
        out = khatri_rao_rows(out, b)
    return out


def kdiag(spec, params: Params, X: jnp.ndarray) -> jnp.ndarray:
    """diag K_ff — product of per-axis Gram diagonals (the stationary
    variance for continuous axes; B[p, p] gathered for a coregion axis)."""
    if X.ndim == 1:
        X = X[:, None]
    n = X.shape[0]
    v = jnp.ones((n,), dtype=X.dtype)
    for i, kind in enumerate(spec.kinds):
        v = v * kernels.axis_kdiag(kind, axis_params(params, i), X[:, i])
    return v


def gram_full(spec, params: Params, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Dense K(x1, x2) — product over axes of 1D Grams (coregion-aware)."""
    if x1.ndim == 1:
        x1 = x1[:, None]
    if x2.ndim == 1:
        x2 = x2[:, None]
    out = None
    for i, kind in enumerate(spec.kinds):
        g = kernels.axis_gram(kind, axis_params(params, i), x1[:, i], x2[:, i])
        out = g if out is None else out * g
    return out


def grid_kvu(spec, params: Params, grid_axes) -> Tuple[jnp.ndarray, ...]:
    """Per-axis Kvu blocks between grid cell integrals and the model features."""
    return tuple(
        feat.Kvu(kind, axis_params(params, i), grid_axes[i])
        for i, (kind, feat) in enumerate(zip(spec.kinds, spec.features))
    )


def grid_kvv(spec, params: Params, grid_axes, dense: bool = True):
    """Per-axis grid-cell prior covariances (Toeplitz Kuu of the cell grid)."""
    blocks = tuple(
        grid_axes[i].Kuu(spec.kinds[i], axis_params(params, i))
        for i in range(len(spec.kinds))
    )
    return kron_dense(blocks) if dense else blocks


# --------------------------------------------------------------------------- #
# gradient observables (beyond-reference): ∂f/∂x_j as a GP linear functional
#
# For the separable kernel k(x, x') = Π_i k_i(x_i − x'_i), differentiating
# along axis j touches only that axis's factor:
#   Cov(∂_j f(x), u)          = (∂ Kuf_j) ⊙ Π_{i≠j} Kuf_i       (Khatri–Rao)
#   Var[∂_j f(x)]             = (−k_j''(0)) Π_{i≠j} σ²_i
# and the gridded-gradient product v'_c = ∫_cell_c ∂_j f dx collapses, by the
# fundamental theorem of calculus on axis j, to a FACE DIFFERENCE of point
# evaluations tensored with the other axes' cell integrals:
#   ∫_cell ∂_j f = [f at x_j = β] − [f at x_j = α]   (cell faces), so
#   Cov(v', u)   = (Kuf_j(β) − Kuf_j(α)) ⊗ Kvu_{i≠j}
# — every new block is plain kernel/Kuf evaluations; no new quadrature.
# The face-difference product exists for EVERY kind (it never differentiates
# pointwise); the pointwise gradient requires a once-differentiable kernel
# (kernels.DIFFERENTIABLE_KINDS). The reference has no gradient observables.
# --------------------------------------------------------------------------- #


def canonical_axis(spec, axis: int) -> int:
    """Normalize a (possibly negative) axis index against the spec's ndim.

    Raises on out-of-range rather than wrapping silently: ``i == axis`` loops
    over per-axis blocks would otherwise never match (e.g. ``axis=-1``) and
    return the plain-f product labeled as a gradient head.
    """
    nd = len(spec.kinds)
    if not -nd <= axis < nd:
        raise ValueError(f"axis {axis} out of range for a {nd}-axis model")
    return axis % nd


def grad_kdiag(spec, params: Params, X: jnp.ndarray, axis: int) -> jnp.ndarray:
    """diag Cov[∂_axis f] = −k_axis''(0) · Π_{i≠axis} diag K_i (stationary
    variance per continuous axis; B[p, p] for a coregion axis)."""
    axis = canonical_axis(spec, axis)
    if X.ndim == 1:
        X = X[:, None]
    n = X.shape[0]
    p_ax = axis_params(params, axis)
    v = kernels.grad_variance(spec.kinds[axis], p_ax["variance"], p_ax["lengthscale"])
    out = jnp.ones((n,), dtype=X.dtype) * v
    for i, kind in enumerate(spec.kinds):
        if i != axis:
            out = out * kernels.axis_kdiag(kind, axis_params(params, i), X[:, i])
    return out


def grad_gram_full(spec, params: Params, x1: jnp.ndarray, x2: jnp.ndarray,
                   axis: int) -> jnp.ndarray:
    """Dense Cov(∂_axis f(x1), ∂_axis f(x2)) = (−k_axis'') · Π_{i≠axis} k_i."""
    axis = canonical_axis(spec, axis)
    if x1.ndim == 1:
        x1 = x1[:, None]
    if x2.ndim == 1:
        x2 = x2[:, None]
    out = None
    for i, kind in enumerate(spec.kinds):
        p = axis_params(params, i)
        if i == axis:
            g = kernels.grad_gram_1d(kind, x1[:, i], x2[:, i],
                                     p["variance"], p["lengthscale"])
        else:
            g = kernels.axis_gram(kind, p, x1[:, i], x2[:, i])
        out = g if out is None else out * g
    return out


def normalize_deriv_orders(spec, entry) -> Tuple[int, ...]:
    """Canonicalize a derivative spec: int axis j → one-hot order tuple;
    a tuple gives the order per axis (0, 1, or 2). Validates that each
    differentiated axis's kernel supports that order."""
    if isinstance(entry, int):
        entry = canonical_axis(spec, entry)
        orders = tuple(1 if i == entry else 0 for i in range(len(spec.kinds)))
    else:
        orders = tuple(int(o) for o in entry)
        if len(orders) != len(spec.kinds):
            raise ValueError(
                f"derivative orders {orders} must have one entry per axis "
                f"({len(spec.kinds)})")
    for i, o in enumerate(orders):
        if o == 1:
            kernels.require_differentiable(spec.kinds[i])
        elif o == 2:
            kernels.require_twice_differentiable(spec.kinds[i])
        elif o != 0:
            raise ValueError(f"derivative order {o} not supported (0, 1, 2)")
    return orders


def axis_whitened_deriv_kuf(spec, params: Params, chols, X: jnp.ndarray,
                            orders) -> Tuple[jnp.ndarray, ...]:
    """Per-axis whitened blocks F_i⁻¹ ∂^{o_i}Kuf_i — the cross-covariance of
    the whitened inducing coordinates with the mixed partial Π ∂^{o_i}f."""
    if X.ndim == 1:
        X = X[:, None]
    out = []
    for i, (kind, feat) in enumerate(zip(spec.kinds, spec.features)):
        p = axis_params(params, i)
        o = orders[i]
        if o == 0:
            blk = feat.Kuf(kind, p, X[:, i])
        elif o == 1:
            blk = feat.dKuf_dx(kind, p, X[:, i])
        else:
            blk = feat.dKuf_dx2(kind, p, X[:, i])
        out.append(chols[i].whiten(blk))
    return tuple(out)


def axis_whitened_dkuf(spec, params: Params, chols, X: jnp.ndarray,
                       axis: int) -> Tuple[jnp.ndarray, ...]:
    """Per-axis whitened blocks with axis ``axis`` carrying F⁻¹ ∂Kuf/∂x."""
    orders = normalize_deriv_orders(spec, axis)
    return axis_whitened_deriv_kuf(spec, params, chols, X, orders)


def grad_grid_kvu(spec, params: Params, grid_axes, axis: int) -> Tuple[jnp.ndarray, ...]:
    """Per-axis Kv'u blocks of the gridded-gradient product along ``axis``:
    face differences of Kuf at the cell edges there, plain Kvu elsewhere."""
    axis = canonical_axis(spec, axis)
    out = []
    for i, (kind, feat) in enumerate(zip(spec.kinds, spec.features)):
        p = axis_params(params, i)
        if i == axis:
            kue = feat.Kuf(kind, p, grid_axes[i].mesh_j(p))   # (m, g+1)
            out.append((kue[:, 1:] - kue[:, :-1]).T)          # (g, m)
        else:
            out.append(feat.Kvu(kind, p, grid_axes[i]))
    return tuple(out)


def _face_diff_gram(kind: str, p: Params, grid) -> jnp.ndarray:
    """(g, g) Cov of face differences f(β_c) − f(α_c) on the grid's mesh.

    Built as −2·kdiff0 double differences so the dominant k(0) never enters:
    Cov(Δ_i, Δ_j) = [D(β_i−α_j) + D(α_i−β_j)] − [D(β_i−β_j) + D(α_i−α_j)]
    with D(r) = k(0) − k(r) (stable, kernels.kdiff0); every term is O(δ²/ℓ²)
    of scale rather than O(1), which removes the (ℓ/δ)² f32 cancellation of
    differencing raw Gram entries.
    """
    mesh = grid.mesh_j(p)
    a, b = mesh[:-1], mesh[1:]
    var, ell = p["variance"], p["lengthscale"]

    def D(u, w):
        return kernels.kdiff0(kind, u[:, None] - w[None, :], var, ell)

    return (D(b, a) + D(a, b)) - (D(b, b) + D(a, a))


def grad_grid_kvv(spec, params: Params, grid_axes, axis: int,
                  dense: bool = True):
    """Per-axis prior covariance blocks of the gridded-gradient product."""
    axis = canonical_axis(spec, axis)
    blocks = []
    for i, kind in enumerate(spec.kinds):
        p = axis_params(params, i)
        if i == axis:
            blocks.append(_face_diff_gram(kind, p, grid_axes[i]))
        else:
            blocks.append(grid_axes[i].Kuu(kind, p))
    blocks = tuple(blocks)
    return kron_dense(blocks) if dense else blocks


# --------------------------------------------------------------------------- #
# collapsed-SGPR factored pipeline, parameterized by the axis-block combiner
#
# The Kronecker-product models (models.sgpr) assemble the joint whitened
# cross-covariance as a Khatri–Rao product of per-axis blocks; the additive
# models (models.additive) concatenate them (block-diagonal Kuu). Everything
# downstream — the Titsias bound, conditionals, the B⁻¹ factorization — is
# identical, so it lives here once, taking ``combine(blocks) -> (m, n)``.
# --------------------------------------------------------------------------- #

def mean_fn(spec, params: Params, X: jnp.ndarray):
    """Prior mean m(x) at the inputs — 0.0 (static skip) when no mean is
    learned.

    ``params["mean"]`` is an optional leaf (specs opt in via
    ``learn_mean=True``): a scalar constant, or an (n_outputs,) vector of
    PER-OUTPUT constants gathered by the coregion axis's index column (the
    proper form of inter-mission bias removal — no more manual centering).
    The model is f = m + g with g the zero-mean GP the inducing machinery
    sees; every training head subtracts m from y, every predictive head adds
    it back, and gridded products add the exact cell integrals of m
    (:func:`grid_mean`). Constant means have zero derivative, so gradient
    heads are untouched. Beyond-reference (the reference is ZeroMean-only,
    ``gpytorch.means.ZeroMean`` throughout ``src/models``).
    """
    m = params.get("mean")
    if m is None:
        return 0.0
    if m.ndim == 0:
        return m
    try:
        i = spec.kinds.index("coregion")
    except ValueError:
        raise ValueError(
            "vector params['mean'] is a per-output mean and requires a "
            "'coregion' axis to carry the output index") from None
    if X.ndim == 1:
        X = X[:, None]
    idx = jnp.round(X[:, i]).astype(jnp.int32)
    return m[idx]


def grid_mean(spec, params: Params, grid_axes):
    """Exact cell integrals of the constant/per-output mean over a product
    grid → 0.0 or a flat (Π gᵢ,) vector in the kron row-major order.

    ∫_cell m = m_p · Π |cellᵢ|: a Kronecker product of per-axis vectors —
    cell widths for integral axes, the per-output mean (or ones) for the
    coregion axis."""
    m = params.get("mean")
    if m is None:
        return 0.0
    from vggp_tpu.ops import kron_diag

    vecs = []
    scalar = m if m.ndim == 0 else None
    for i, g in enumerate(grid_axes):
        if spec.kinds[i] == "coregion":
            ones = jnp.ones((g.n_outputs,), dtype=jnp.result_type(m))
            vecs.append(ones * m if m.ndim == 1 else ones)
        else:
            vecs.append(jnp.asarray(np.diff(np.asarray(g.mesh)),
                                    dtype=jnp.result_type(m)))
    out = kron_diag(vecs)
    return out * scalar if scalar is not None else out


def obs_noise(spec, params: Params, X: jnp.ndarray):
    """Per-observation noise variance.

    Scalar ``params["noise"]`` is the homoscedastic default. A VECTOR noise
    (shape (P,)) means per-OUTPUT noise for a multi-output model: the entry
    is gathered by the integer output index carried in the coregion axis's
    column of X (per-mission noise levels — beyond-reference capability).
    Returns a scalar or an (n,) vector; all consumers broadcast either.
    """
    noise = params["noise"]
    if noise.ndim == 0:
        return noise
    try:
        i = spec.kinds.index("coregion")
    except ValueError:
        raise ValueError(
            "vector params['noise'] is per-output noise and requires a "
            "'coregion' axis to carry the output index") from None
    if X.ndim == 1:
        X = X[:, None]
    idx = jnp.round(X[:, i]).astype(jnp.int32)
    return noise[idx]


def factored_state(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray, combine):
    """(chols, A, L_B, c, y) of the collapsed bound's stable factored form:

    A = L⁻¹Kuf D^{-1/2}, B = I + AAᵀ, L_B = chol(B), c = L_B⁻¹A D^{-1/2}y —
    everything the bound, posteriors, and gridded heads need (sgpr.py module
    docstring for the math; reference ``univariate_structure.py:234-263`` is
    the O(n³) original). D = σ²I for scalar noise; heteroscedastic
    per-output noise makes D the gathered diagonal (the factored Titsias
    bound holds verbatim with D⁻¹ in place of σ⁻²I).
    """
    y = jnp.reshape(y, (-1,)) - mean_fn(spec, params, X)  # residual vs m(x)
    noise = obs_noise(spec, params, X)
    sigma = jnp.sqrt(noise)
    chols = axis_chol_kuu(spec, params)
    if scalar_whiten_eligible(spec, params):
        # fixed bases: (ℓ, σ²) gradients ride precomputed scalar tangents
        # instead of reverse-mode through the factor chain. The unused-for-
        # gradients chols stay available for downstream posterior/q_v use
        # (their forward is CSE'd/DCE'd by XLA as appropriate).
        blocks = axis_whitened_kuf_scalar(spec, params, X)
    else:
        blocks = axis_whitened_kuf(spec, params, chols, X)
    A = combine(blocks) / sigma  # (m, n); (n,) sigma column-scales
    m = A.shape[0]
    B = jnp.eye(m, dtype=A.dtype) + A @ A.T
    LB = safe_cholesky(B, 1e-12)
    c = tri_solve(LB, A @ (y / sigma))
    return chols, A, LB, c, y


def collapsed_elbo(spec, params: Params, X: jnp.ndarray, y: jnp.ndarray,
                   combine, kdiag_fn) -> jnp.ndarray:
    """Collapsed (Titsias) evidence lower bound — scalar.

    ``kdiag_fn(spec, params, X) -> (n,)`` supplies diag K_ff (product of axis
    variances for separable kernels, sum for additive ones). Heteroscedastic
    D = diag(σ²_i) (per-output noise) drops in exactly: every σ² below is
    the per-observation value and tr(D⁻¹Qff) = ‖A‖²_F by A's D^{-1/2}.
    """
    chols, A, LB, c, y = factored_state(spec, params, X, y, combine)
    n = y.shape[0]
    noise = jnp.broadcast_to(obs_noise(spec, params, X), (n,))
    kff = kdiag_fn(spec, params, X)
    bound = -0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * noise))
    bound -= jnp.sum(jnp.log(jnp.diagonal(LB)))
    bound -= 0.5 * jnp.sum(y * y / noise)
    bound += 0.5 * jnp.sum(c * c)
    # trace gap tr(D⁻¹(Kff − Qff)) ≥ 0 always (Qff ⪯ Kff); clamp the f32
    # cancellation error so it can never flip into a spurious reward.
    bound -= 0.5 * jnp.maximum(jnp.sum(kff / noise) - jnp.sum(A * A), 0.0)
    return bound


def collapsed_posterior(spec, params: Params, state, xstar: jnp.ndarray,
                        combine, kdiag_fn, gram_fn,
                        full_cov: bool = False, predictive: bool = False,
                        blocks_fn=None) -> Gaussian:
    """q(f*) from a factored state (reference ``univariate_structure.py:184-232``).

    ``blocks_fn(spec, params, chols, xstar)`` builds the whitened per-axis
    cross blocks (defaults to F⁻¹Kuf*); gradient heads pass F⁻¹∂Kuf instead
    and reuse the same conditional algebra (incl. the variance floor).
    """
    chols, A, LB, c = state[:4]
    if blocks_fn is None:
        blocks_fn = axis_whitened_kuf
    blocks_star = blocks_fn(spec, params, chols, xstar)
    w = combine(blocks_star)  # (m, n*) = L⁻¹ Kuf*
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c
    if blocks_fn is axis_whitened_kuf:  # the f head carries m(x*); gradient
        mean = mean + mean_fn(spec, params, xstar)  # heads see ∂m = 0
    noise = obs_noise(spec, params, xstar) if predictive else 0.0
    if full_cov:
        kss = gram_fn(spec, params, xstar, xstar)
        cov = kss - w.T @ w + tmp.T @ tmp
        if predictive:
            n_star = cov.shape[0]
            cov = cov + jnp.broadcast_to(noise, (n_star,)) * jnp.eye(
                n_star, dtype=cov.dtype)
        return Gaussian(mean=mean, cov=cov)
    kss = kdiag_fn(spec, params, xstar)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=floor_var(var, kss) + noise)
