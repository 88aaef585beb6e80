"""Whitened, uncollapsed, minibatchable SVGP — the scalable TPU path.

The reference's collapsed ELBO is O(n³) and not minibatchable (SURVEY.md §3a).
This model provides the standard whitened parameterization u = L w,
q(w) = N(μ, S), giving

    ELBO = (n/|b|) Σ_{i∈b} E_{q(f_i)}[log N(y_i | f_i, σ²)] - KL[q(w) ‖ N(0,I)]

with q(f(x)) = N(aᵀμ, k_ff - ‖a‖² + aᵀS a), a = L⁻¹ k_uf(x).

For Kronecker-structured features (separable kernel, per-axis features) the
per-point whitened feature factorizes: a = a₁ ⊗ a₂ with a_i = L_i⁻¹ k_uf,i.
With a Kronecker-factored variational covariance S = S₁ ⊗ S₂ every ELBO term
is computable from per-axis (m_i × m_i) matrices and batched (n × m_i)
matmuls — an m = m₁·m₂ = 512² = 262 144 inducing grid never materializes any
m-sized matrix. This is the architecture the BASELINE.json north star asks
for; all heavy ops are MXU matmuls.

Variational families:
- ``variational="full"``: dense lower-triangular S factor (any ndim, small m)
- ``variational="kron"``: S = S₁ ⊗ ⋯ ⊗ S_d (ndim ≥ 2, huge m) — e.g. a
  1024³ ≈ 10⁹-cell lon×lat×time grid holds per-axis (1024, 1024) state only.
  The reference is strictly 1D/2D; d ≥ 3 is an extension.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from vggp_tpu.features import AxisFeature, CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.models.common import Gaussian
from vggp_tpu.ops import kron_dense, kron_diag

Params = Dict


def chol_from_raw(raw: jnp.ndarray) -> jnp.ndarray:
    """Unconstrained (m, m) → lower-triangular with positive (softplus) diag."""
    lower = jnp.tril(raw, -1)
    diag = jnp.logaddexp(jnp.diagonal(raw), 0.0)  # softplus
    return lower + jnp.diag(diag)


def raw_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`chol_from_raw` (for initialization)."""
    d = jnp.diagonal(L)
    inv_softplus = jnp.log(jnp.expm1(d))
    return jnp.tril(L, -1) + jnp.diag(inv_softplus)


@dataclass(frozen=True)
class SVGPSpec:
    kinds: Tuple[str, ...]
    features: Tuple[AxisFeature, ...]
    num_data: int                     # n_total, for minibatch scaling
    variational: str = "full"         # "full" | "kron"
    jitter: float = 1e-6
    factor_method: str = "chol"       # Kuu factorization: "chol" | "eigh"
    likelihood: str = "gaussian"      # see vggp_tpu.likelihoods (beyond-reference)
    likelihood_opts: Tuple[Tuple[str, float], ...] = ()  # static, e.g. (("df", 4.0),)
    per_output_noise: bool = False    # per-mission noise vector (needs coregion)
    learn_mean: bool = False          # constant mean; per-output with coregion

    def __post_init__(self):
        if self.variational not in ("full", "kron"):
            raise ValueError(self.variational)
        if self.variational == "kron" and len(self.features) < 2:
            raise ValueError("kron variational family requires ndim >= 2")
        from vggp_tpu.likelihoods import EXPECTED_LOG_LIK

        if self.likelihood not in EXPECTED_LOG_LIK:
            raise ValueError(
                f"unknown likelihood {self.likelihood!r}; "
                f"have {sorted(EXPECTED_LOG_LIK)}"
            )

    @property
    def ndim(self) -> int:
        return len(self.kinds)

    @property
    def axis_m(self) -> Tuple[int, ...]:
        return tuple(f.m for f in self.features)

    @property
    def num_inducing(self) -> int:
        m = 1
        for f in self.features:
            m *= f.m
        return m

    def init_params(self, dtype=jnp.float32) -> Params:
        axes = []
        for kind, f in zip(self.kinds, self.features):
            if kind == "coregion":
                p = {}  # the discrete axis owns its (w, kappa) B-params
            else:
                p = {"variance": jnp.asarray(1.0, dtype), "lengthscale": jnp.asarray(1.0, dtype)}
            p.update(f.init_params(dtype))
            axes.append(p)
        noise = jnp.asarray(0.1, dtype)
        if self.per_output_noise:
            i = self.kinds.index("coregion")
            noise = jnp.full((self.features[i].n_outputs,), 0.1, dtype)
        mean = None
        if self.learn_mean:
            mean = (jnp.zeros((self.features[self.kinds.index("coregion")].n_outputs,), dtype)
                    if "coregion" in self.kinds else jnp.asarray(0.0, dtype))
        if self.variational == "full":
            m = self.num_inducing
            q = {
                "mu": jnp.zeros((m,), dtype),
                "raw_L": raw_from_chol(jnp.eye(m, dtype=dtype)),
            }
        else:
            q = {"mu": jnp.zeros(self.axis_m, dtype)}
            for i, mi in enumerate(self.axis_m):
                q[f"raw_L{i + 1}"] = raw_from_chol(jnp.eye(mi, dtype=dtype))
        out = {"axes": tuple(axes), "noise": noise, "q": q}
        if mean is not None:
            out["mean"] = mean
        return out


def _whitened_blocks(spec: SVGPSpec, params: Params, x: jnp.ndarray):
    if common.scalar_whiten_eligible(spec, params):
        # fixed bases: same primal, but gradients w.r.t. (ℓ, σ²) ride
        # precomputed scalar tangents instead of reverse-mode through the
        # Cholesky/triangular-inverse chain (see common.whitened_kuf_scalar).
        return None, common.axis_whitened_kuf_scalar(spec, params, x)
    chols = common.axis_chol_kuu(spec, params)
    blocks = common.axis_whitened_kuf(spec, params, chols, x)
    return chols, blocks


_AXIS_LETTERS = "abcdefgh"


def _kron_chols(spec: SVGPSpec, q: Params) -> Tuple[jnp.ndarray, ...]:
    return tuple(chol_from_raw(q[f"raw_L{i + 1}"]) for i in range(spec.ndim))


def _kron_contract(mu: jnp.ndarray, mats: Sequence[jnp.ndarray], out: str) -> jnp.ndarray:
    """einsum of μ (m₁…m_d) against one (·, m_i) matrix per axis.

    ``out`` is 'n' for shared-column contractions (q(f) means: mats are
    (m_i, n) with columns aligned) or 'grid' for an outer grid (q(v) means:
    mats are (g_i, m_i), result reshaped flat row-major — the numpy.kron
    index convention).
    """
    d = len(mats)
    L = _AXIS_LETTERS[:d]
    if out == "n":
        sub = ",".join(f"{L[i]}n" for i in range(d))
        return jnp.einsum(f"{L},{sub}->n", mu, *[m for m in mats])
    G = _AXIS_LETTERS[d:2 * d].upper()
    sub = ",".join(f"{G[i]}{L[i]}" for i in range(d))
    return jnp.einsum(f"{L},{sub}->{G}", mu, *[m for m in mats]).reshape(-1)


def _mean_cotangent_einsums(d: int):
    """einsum strings for the q(f)-mean backward at ndim = d."""
    L = _AXIS_LETTERS[:d]
    blocks_sub = [f"{L[i]}n" for i in range(d)]
    dmu = ",".join(["n"] + blocks_sub) + f"->{L}"
    das = []
    for j in range(d):
        ins = ",".join([L] + [blocks_sub[i] for i in range(d) if i != j])
        das.append(f"{ins}->{L[j]}n")
    return dmu, das


def _kron_moments(spec: SVGPSpec, mu, Ls, blocks):
    """(mean, var_red, var_add) for the Kronecker variational family, with a
    hand-written VJP whose cotangent matmuls run at single-pass bf16.

    The forward is bit-identical to the straightforward implementation (and
    is what the recorded ELBO sees). The backward's ~6 (m, n)-sized matmuls
    are gradient-only signal — SGD-tolerant, like the 3-pass whitening
    cotangents of round 2 (PERFORMANCE.md) — so they drop from the ambient
    3-pass bf16 to 1-pass. Toggle: ``config.FAST_MOMENTS_BWD``.
    """
    d = spec.ndim

    def fwd_math(mu, Ls, blocks):
        mean = _kron_contract(mu, blocks, out="n")
        ts, rs, vs = [], [], []
        for i, a in enumerate(blocks):
            t = Ls[i].T @ a                # (m_i, n)
            ts.append(t)
            rs.append(jnp.sum(a * a, axis=0))
            vs.append(jnp.sum(t * t, axis=0))
        var_red, var_add = rs[0], vs[0]
        for i in range(1, d):
            var_red = var_red * rs[i]
            var_add = var_add * vs[i]
        return mean, var_red, var_add, tuple(ts), tuple(rs), tuple(vs)

    @jax.custom_vjp
    def f(mu, Ls, blocks):
        mean, var_red, var_add, *_ = fwd_math(mu, Ls, blocks)
        return mean, var_red, var_add

    def f_fwd(mu, Ls, blocks):
        mean, var_red, var_add, ts, rs, vs = fwd_math(mu, Ls, blocks)
        return (mean, var_red, var_add), (mu, Ls, blocks, ts, rs, vs)

    def f_bwd(res, g):
        from vggp_tpu import config

        mu, Ls, blocks, ts, rs, vs = res
        gm, gr, gv = g
        prec = config.GRAD_MATMUL_PRECISION
        dmu_str, da_strs = _mean_cotangent_einsums(d)
        dmu = jnp.einsum(dmu_str, gm, *blocks, precision=prec)
        dLs, das = [], []
        for i in range(d):
            r_oth = None
            v_oth = None
            for k in range(d):
                if k == i:
                    continue
                r_oth = rs[k] if r_oth is None else r_oth * rs[k]
                v_oth = vs[k] if v_oth is None else v_oth * vs[k]
            if r_oth is None:          # d == 1 (not reachable: kron needs d>=2)
                r_oth = jnp.ones_like(rs[i])
                v_oth = jnp.ones_like(vs[i])
            da = jnp.einsum(da_strs[i], mu,
                            *[blocks[k] for k in range(d) if k != i],
                            precision=prec) * gm[None, :]
            da = da + 2.0 * blocks[i] * (gr * r_oth)[None, :]
            dt = 2.0 * ts[i] * (gv * v_oth)[None, :]
            da = da + jnp.matmul(Ls[i], dt, precision=prec)
            dL = jnp.matmul(blocks[i], dt.T, precision=prec)  # ∂(t=Lᵀa)/∂L = a dtᵀ
            das.append(da)
            dLs.append(dL)
        return dmu, tuple(dLs), tuple(das)

    f.defvjp(f_fwd, f_bwd)
    return f(mu, Ls, blocks)


def _qf_mean_var(spec: SVGPSpec, params: Params, blocks,
                 Ls=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Marginal q(f) mean/variance at the points whose whitened features are
    ``blocks`` (per-axis (m_i, n)). ``Ls`` optionally supplies the already-
    built variational Cholesky factor(s) (the warm serving path)."""
    from vggp_tpu import config

    q = params["q"]
    if spec.variational == "full":
        a = common.khatri_rao_all(blocks)  # (m, n)
        if Ls is None:
            Ls = chol_from_raw(q["raw_L"])
        mean = a.T @ q["mu"]
        sa = Ls.T @ a
        var_red = jnp.sum(a * a, axis=0)
        var_add = jnp.sum(sa * sa, axis=0)
    else:
        if Ls is None:
            Ls = _kron_chols(spec, q)
        if config.FAST_MOMENTS_BWD:
            return _kron_moments(spec, q["mu"], Ls, blocks)
        mean = _kron_contract(q["mu"], blocks, out="n")
        var_red = None
        var_add = None
        for i, a in enumerate(blocks):
            t = Ls[i].T @ a                # (m_i, n)
            r = jnp.sum(a * a, axis=0)
            v = jnp.sum(t * t, axis=0)
            var_red = r if var_red is None else var_red * r
            var_add = v if var_add is None else var_add * v
    return mean, var_red, var_add


@common.highest_precision
def kl(spec: SVGPSpec, params: Params) -> jnp.ndarray:
    """KL[q(w) ‖ N(0, I)] in whitened coordinates."""
    q = params["q"]
    if spec.variational == "full":
        Ls = chol_from_raw(q["raw_L"])
        m = Ls.shape[0]
        tr = jnp.sum(Ls * Ls)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
        quad = jnp.sum(q["mu"] ** 2)
        return 0.5 * (quad + tr - m - logdet)
    Ls = _kron_chols(spec, q)
    ms = [L.shape[0] for L in Ls]
    m_total = 1
    tr = 1.0
    for L in Ls:
        tr = tr * jnp.sum(L * L)
    logdet = 0.0
    for i, L in enumerate(Ls):
        others = 1
        for j, mj in enumerate(ms):
            if j != i:
                others *= mj
        m_total *= ms[i]
        logdet = logdet + 2.0 * others * jnp.sum(jnp.log(jnp.diagonal(L)))
    quad = jnp.sum(q["mu"] ** 2)
    return 0.5 * (quad + tr - m_total - logdet)


@common.highest_precision
def elbo(spec: SVGPSpec, params: Params, xb: jnp.ndarray, yb: jnp.ndarray) -> jnp.ndarray:
    """Minibatch ELBO estimate (scaled to the full dataset).

    The Gaussian expected log-likelihood stays inline (the bench-hot path);
    other observation models route through :mod:`vggp_tpu.likelihoods`
    (probit classification, Poisson counts, Student-t — beyond-reference).
    """
    yb = jnp.reshape(yb, (-1,))
    nb = yb.shape[0]
    _, blocks = _whitened_blocks(spec, params, xb)
    mean, var_red, var_add = _qf_mean_var(spec, params, blocks)
    mean = mean + common.mean_fn(spec, params, xb)  # f = m + g
    kff = common.kdiag(spec, params, xb)
    var_f = jnp.maximum(kff - var_red, 0.0) + var_add
    if spec.likelihood == "gaussian":
        noise = common.obs_noise(spec, params, xb)  # scalar or per-output
        ell_i = (-0.5 * jnp.log(2.0 * jnp.pi * noise)
                 - ((yb - mean) ** 2 + var_f) / (2.0 * noise))
    else:
        from vggp_tpu.likelihoods import expected_log_lik

        ell_i = expected_log_lik(spec.likelihood, yb, mean, var_f, params,
                                 spec.likelihood_opts)
    scale = spec.num_data / nb
    return scale * jnp.sum(ell_i) - kl(spec, params)


def loss(spec: SVGPSpec, params: Params, xb: jnp.ndarray, yb: jnp.ndarray) -> jnp.ndarray:
    return -elbo(spec, params, xb, yb)


@common.highest_precision
def elbo_muS(
    spec: SVGPSpec,
    params: Params,
    mu: jnp.ndarray,
    S: jnp.ndarray,
    xb: jnp.ndarray,
    yb: jnp.ndarray,
) -> jnp.ndarray:
    """ELBO with the variational distribution given explicitly as q(w)=N(μ, S).

    The (μ, S) parameterization is what natural-gradient updates differentiate
    against (``train.fit_natgrad``); ``params["q"]`` is ignored. Full
    variational family only. Any registered likelihood works: the
    natural-gradient recipe only needs ∂ELBO/∂(μ, S), and the non-conjugate
    expected log-likelihoods (:mod:`vggp_tpu.likelihoods`) are smooth
    functions of the marginal (mean, var) pair (Salimbeni et al. 2018's
    "natural gradients in practice" setting — γ < 1 instead of the
    conjugate single-step jump).
    """
    if spec.variational != "full":
        raise ValueError("elbo_muS supports the full variational family")
    yb = jnp.reshape(yb, (-1,))
    nb = yb.shape[0]
    _, blocks = _whitened_blocks(spec, params, xb)
    a = common.khatri_rao_all(blocks)             # (m, n)
    mean = a.T @ mu + common.mean_fn(spec, params, xb)  # f = m + g
    var_red = jnp.sum(a * a, axis=0)
    var_add = jnp.sum(a * (S @ a), axis=0)
    kff = common.kdiag(spec, params, xb)
    var_f = jnp.maximum(kff - var_red, 0.0) + var_add
    if spec.likelihood == "gaussian":
        noise = common.obs_noise(spec, params, xb)  # scalar or per-output
        ell_i = (-0.5 * jnp.log(2.0 * jnp.pi * noise)
                 - ((yb - mean) ** 2 + var_f) / (2.0 * noise))
    else:
        from vggp_tpu.likelihoods import expected_log_lik

        ell_i = expected_log_lik(spec.likelihood, yb, mean, var_f, params,
                                 spec.likelihood_opts)
    m = S.shape[0]
    Ls = jnp.linalg.cholesky(S)
    kl_val = 0.5 * (
        jnp.sum(mu * mu) + jnp.trace(S) - m - 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
    )
    return (spec.num_data / nb) * jnp.sum(ell_i) - kl_val


@common.highest_precision
def posterior(
    spec: SVGPSpec, params: Params, xstar: jnp.ndarray,
    full_cov: bool = False, predictive: bool = False,
) -> Gaussian:
    chols, blocks = _whitened_blocks(spec, params, xstar)
    mean, var_red, var_add = _qf_mean_var(spec, params, blocks)
    mean = mean + common.mean_fn(spec, params, xstar)  # f = m + g
    noise = common.obs_noise(spec, params, xstar) if predictive else 0.0
    if not full_cov:
        kss = common.kdiag(spec, params, xstar)
        var = jnp.maximum(kss - var_red, 0.0) + var_add + noise
        return Gaussian(mean=mean, var=var)
    # full covariance: materialize a (m, n*) whitened block (small n* only)
    a = common.khatri_rao_all(blocks)
    kss = common.gram_full(spec, params, xstar, xstar)
    q = params["q"]
    if spec.variational == "full":
        Ls = chol_from_raw(q["raw_L"])
        sa = Ls.T @ a
    else:
        Lk = _kron_chols(spec, q)
        sa = common.khatri_rao_all(tuple(Lk[i].T @ blocks[i] for i in range(spec.ndim)))
    cov = kss - a.T @ a + sa.T @ sa
    if predictive:
        cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
    return Gaussian(mean=mean, cov=cov)


def posterior_predictive(spec, params, xstar, full_cov: bool = False) -> Gaussian:
    return posterior(spec, params, xstar, full_cov=full_cov, predictive=True)


def predict_y(spec: SVGPSpec, params: Params, xstar: jnp.ndarray):
    """Observable-space prediction under the spec's likelihood.

    gaussian/student_t → Gaussian(mean, var + noise-ish); bernoulli → class-1
    probability Φ(μ/√(1+σ²)) (exact under probit); poisson → (E[λ], Var[y]).
    """
    q = posterior(spec, params, xstar, full_cov=False)
    if spec.likelihood == "bernoulli":
        from vggp_tpu.likelihoods import predict_bernoulli

        return predict_bernoulli(q.mean, q.var)
    if spec.likelihood == "poisson":
        from vggp_tpu.likelihoods import predict_poisson

        return predict_poisson(q.mean, q.var)
    if spec.likelihood == "student_t":
        df = dict(spec.likelihood_opts).get("df", 4.0)
        scale = df / max(df - 2.0, 1e-12)  # Var[T] = ν/(ν−2)·scale²
        return Gaussian(mean=q.mean, var=q.var + scale * params["noise"])
    return posterior_predictive(spec, params, xstar)


def prior(spec: SVGPSpec, params: Params, xstar: jnp.ndarray) -> Gaussian:
    """Prior N(m, K**) at test inputs (reference ``univariate_structure.py:169-182``)."""
    cov = common.gram_full(spec, params, xstar, xstar)
    mean = jnp.zeros(cov.shape[0], dtype=cov.dtype) + common.mean_fn(
        spec, params, xstar)
    return Gaussian(mean=mean, cov=cov)


@common.highest_precision
def q_u(spec: SVGPSpec, params: Params) -> Gaussian:
    """q(u) = N(F μ, F S Fᵀ) — the variational distribution unwhitened
    (reference ``univariate_structure.py:693-717`` exposes the optimal q(u);
    here q is free-form and this is its image under u = F w)."""
    chols = common.axis_chol_kuu(spec, params)
    q = params["q"]
    if spec.variational == "full":
        F = chols[0].F if spec.ndim == 1 else kron_dense([c.F for c in chols])
        Ls = chol_from_raw(q["raw_L"])
        half = F @ Ls
        return Gaussian(mean=F @ q["mu"], cov=half @ half.T)
    Fs = [c.F for c in chols]
    Lk = _kron_chols(spec, q)
    mean = _kron_contract(q["mu"], Fs, out="grid")
    halves = [Fs[i] @ Lk[i] for i in range(spec.ndim)]
    return Gaussian(mean=mean, cov=kron_dense([h @ h.T for h in halves]))


@common.highest_precision
def p_v_u(
    spec: SVGPSpec, params: Params, grid_axes: Sequence[CellIntegralFeature]
) -> Gaussian:
    """p(v | u = E_q[u]): conditional of the cell integrals on the mean
    inducing state (reference ``gridded_univariate_structure.py:462-473``).
    Adds the learned mean's cell integral back, consistently with
    :func:`q_v` (v = ∫_cell f includes the mean function)."""
    chols = common.axis_chol_kuu(spec, params)
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)
    r_blocks = tuple(chols[i].whiten(kvu_blocks[i].T).T for i in range(spec.ndim))
    q = params["q"]
    if spec.variational == "full":
        R = r_blocks[0] if spec.ndim == 1 else kron_dense(r_blocks)
        mean = R @ q["mu"]
        RR = R @ R.T
    else:
        mean = _kron_contract(q["mu"], r_blocks, out="grid")
        RR = kron_dense([R @ R.T for R in r_blocks])
    kvv = common.grid_kvv(spec, params, grid_axes, dense=True)
    g = Gaussian(mean=mean, cov=kvv - RR)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))


def _grid_gaussian(spec: SVGPSpec, params: Params, r_blocks, kvv_blocks,
                   full_cov: bool, Ls=None) -> Gaussian:
    """Assemble a grid-product posterior from whitened per-axis cross blocks
    R_i (g_i, m_i) and per-axis prior blocks Kvv_i: mean = (⊗R_i) μ,
    cov = Kvv − R Rᵀ + (R L_S)(R L_S)ᵀ. Shared by :func:`q_v` (cell
    integrals) and :func:`q_dv` (gridded gradients); for ``full_cov=False``
    only per-cell variances are formed (kron-diagonals — O(g) memory).
    ``Ls`` optionally supplies prebuilt variational factor(s) (warm path)."""
    q = params["q"]
    if spec.variational == "full":
        R = r_blocks[0] if spec.ndim == 1 else kron_dense(r_blocks)
        Ls = chol_from_raw(q["raw_L"]) if Ls is None else Ls
        mean = R @ q["mu"]
        RS = R @ Ls
        if full_cov:
            kvv = kron_dense(kvv_blocks)
            return Gaussian(mean=mean, cov=kvv - R @ R.T + RS @ RS.T)
        kvv_diag = kron_diag([jnp.diagonal(b) for b in kvv_blocks])
        var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(RS * RS, axis=1)
        return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))
    # kron family (any ndim ≥ 2)
    Lk = _kron_chols(spec, q) if Ls is None else Ls
    mean = _kron_contract(q["mu"], r_blocks, out="grid")
    rs_blocks = [r_blocks[i] @ Lk[i] for i in range(spec.ndim)]
    if full_cov:
        kvv = kron_dense(kvv_blocks)
        cov = (kvv - kron_dense([R @ R.T for R in r_blocks])
               + kron_dense([RS @ RS.T for RS in rs_blocks]))
        return Gaussian(mean=mean, cov=cov)
    kvv_diag = kron_diag([jnp.diagonal(b) for b in kvv_blocks])
    var = (
        kvv_diag
        - kron_diag([jnp.sum(R * R, axis=1) for R in r_blocks])
        + kron_diag([jnp.sum(RS * RS, axis=1) for RS in rs_blocks])
    )
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))


@common.highest_precision
def q_v(
    spec: SVGPSpec,
    params: Params,
    grid_axes: Sequence[CellIntegralFeature],
    full_cov: bool = False,
) -> Gaussian:
    """Gridded posterior q(v) from the (whitened) variational distribution.

    R_i = Kvu_i L_i⁻ᵀ per axis; see :func:`_grid_gaussian` for the assembly.
    This is the gridded data product with its per-cell uncertainty field.
    """
    chols = common.axis_chol_kuu(spec, params)
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)
    r_blocks = tuple(
        chols[i].whiten(kvu_blocks[i].T).T for i in range(spec.ndim)
    )  # R_i = Kvu_i F_i⁻ᵀ  (g_i, m_i)
    kvv_blocks = common.grid_kvv(spec, params, grid_axes, dense=False)
    g = _grid_gaussian(spec, params, r_blocks, kvv_blocks, full_cov)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))


@common.highest_precision
def q_dv(
    spec: SVGPSpec,
    params: Params,
    grid_axes: Sequence[CellIntegralFeature],
    axis: int,
    full_cov: bool = False,
) -> Gaussian:
    """Gridded-GRADIENT posterior: q over v'_c = ∫_cell_c ∂f/∂x_axis dx.

    By the fundamental theorem of calculus the axis-``axis`` factor collapses
    to a face difference of point evaluations (``common.grad_grid_kvu``), so
    every block is closed-form kernel evaluations — exact, no finite
    differencing, valid for every kernel kind. Divide by the cell measure for
    the mean-gradient field (e.g. geostrophic velocities from SSH).
    Beyond-reference capability.
    """
    chols = common.axis_chol_kuu(spec, params)
    kvu_blocks = common.grad_grid_kvu(spec, params, grid_axes, axis)
    r_blocks = tuple(
        chols[i].whiten(kvu_blocks[i].T).T for i in range(spec.ndim)
    )
    kvv_blocks = common.grad_grid_kvv(spec, params, grid_axes, axis, dense=False)
    return _grid_gaussian(spec, params, r_blocks, kvv_blocks, full_cov)


# --------------------------------------------------------------------------- #
# Warm serving path: cache the Kuu factorizations + variational Cholesky
# once, then every head is query-size work only. Mirrors the collapsed
# model's precompute/..._from_state (models/sgpr.py) for the family that
# actually scales; the state is a pytree (PSDFactor is registered), so it
# jits, ships across devices, and checkpoints.
# --------------------------------------------------------------------------- #


def precompute(spec: SVGPSpec, params: Params):
    """Cache (per-axis Kuu factors, variational Cholesky) for frozen-param
    serving. The O(m³) per-axis factorizations happen once here; every
    subsequent :func:`posterior_from_state` / :func:`q_v_from_state` /
    :func:`q_dv_from_state` / :func:`posterior_grad_from_state` call pays
    only the per-query solves. Rebuild the state after ANY param update —
    it is a pure function of ``params``.

    gpytorch's ``fast_pred_var`` caches play this role in the reference
    stack; the reference itself re-derives everything per call.
    """
    chols = common.axis_chol_kuu(spec, params)
    q = params["q"]
    Ls = (chol_from_raw(q["raw_L"]) if spec.variational == "full"
          else _kron_chols(spec, q))
    return (chols, Ls)


@common.highest_precision
def posterior_from_state(
    spec: SVGPSpec, params: Params, state, xstar: jnp.ndarray,
    full_cov: bool = False, predictive: bool = False,
) -> Gaussian:
    """q(f*) from a :func:`precompute` state — no Kuu factorization."""
    chols, Ls = state
    blocks = common.axis_whitened_kuf(spec, params, chols, xstar)
    mean, var_red, var_add = _qf_mean_var(spec, params, blocks, Ls=Ls)
    mean = mean + common.mean_fn(spec, params, xstar)
    noise = common.obs_noise(spec, params, xstar) if predictive else 0.0
    if not full_cov:
        kss = common.kdiag(spec, params, xstar)
        var = jnp.maximum(kss - var_red, 0.0) + var_add + noise
        return Gaussian(mean=mean, var=var)
    a = common.khatri_rao_all(blocks)
    kss = common.gram_full(spec, params, xstar, xstar)
    if spec.variational == "full":
        sa = Ls.T @ a
    else:
        sa = common.khatri_rao_all(
            tuple(Ls[i].T @ blocks[i] for i in range(spec.ndim)))
    cov = kss - a.T @ a + sa.T @ sa
    if predictive:
        cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
    return Gaussian(mean=mean, cov=cov)


@common.highest_precision
def q_v_from_state(
    spec: SVGPSpec, params: Params, state,
    grid_axes: Sequence[CellIntegralFeature], full_cov: bool = False,
) -> Gaussian:
    """q(v) from a :func:`precompute` state (the warm gridded-product head)."""
    chols, Ls = state
    kvu_blocks = common.grid_kvu(spec, params, grid_axes)
    r_blocks = tuple(
        chols[i].whiten(kvu_blocks[i].T).T for i in range(spec.ndim))
    kvv_blocks = common.grid_kvv(spec, params, grid_axes, dense=False)
    g = _grid_gaussian(spec, params, r_blocks, kvv_blocks, full_cov, Ls=Ls)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))


@common.highest_precision
def q_dv_from_state(
    spec: SVGPSpec, params: Params, state,
    grid_axes: Sequence[CellIntegralFeature], axis: int,
    full_cov: bool = False,
) -> Gaussian:
    """q(∫_cell ∂f/∂x_axis) from a :func:`precompute` state."""
    chols, Ls = state
    kvu_blocks = common.grad_grid_kvu(spec, params, grid_axes, axis)
    r_blocks = tuple(
        chols[i].whiten(kvu_blocks[i].T).T for i in range(spec.ndim))
    kvv_blocks = common.grad_grid_kvv(spec, params, grid_axes, axis, dense=False)
    return _grid_gaussian(spec, params, r_blocks, kvv_blocks, full_cov, Ls=Ls)


@common.highest_precision
def posterior_grad_from_state(
    spec: SVGPSpec, params: Params, state, xstar: jnp.ndarray, axis: int,
    full_cov: bool = False,
) -> Gaussian:
    """Pointwise-gradient posterior from a :func:`precompute` state."""
    chols, Ls = state
    blocks = common.axis_whitened_dkuf(spec, params, chols, xstar, axis)
    mean, var_red, var_add = _qf_mean_var(spec, params, blocks, Ls=Ls)
    if not full_cov:
        kdd = common.grad_kdiag(spec, params, xstar, axis)
        var = jnp.maximum(kdd - var_red, 0.0) + var_add
        return Gaussian(mean=mean, var=common.floor_var(var, kdd))
    a = common.khatri_rao_all(blocks)
    kss = common.grad_gram_full(spec, params, xstar, xstar, axis)
    if spec.variational == "full":
        sa = Ls.T @ a
    else:
        sa = common.khatri_rao_all(
            tuple(Ls[i].T @ blocks[i] for i in range(spec.ndim)))
    cov = kss - a.T @ a + sa.T @ sa
    return Gaussian(mean=mean, cov=cov)


@common.highest_precision
def posterior_grad(
    spec: SVGPSpec, params: Params, xstar: jnp.ndarray, axis: int,
    full_cov: bool = False,
) -> Gaussian:
    """Posterior over the pointwise gradient ∂f/∂x_axis at ``xstar``.

    Exact GP linear-functional posterior (mean = ∂aᵀμ, variance
    −k''(0)·Π σ² − ‖∂a‖² + ‖L_Sᵀ∂a‖² with ∂a = F⁻¹ ∂Kuf) — requires a
    once-differentiable kernel on ``axis`` (Matérn ≥ 3/2 or RBF).
    Beyond-reference capability (e.g. geostrophic currents from SSH).
    """
    chols = common.axis_chol_kuu(spec, params)
    blocks = common.axis_whitened_dkuf(spec, params, chols, xstar, axis)
    mean, var_red, var_add = _qf_mean_var(spec, params, blocks)
    if not full_cov:
        kdd = common.grad_kdiag(spec, params, xstar, axis)
        var = jnp.maximum(kdd - var_red, 0.0) + var_add
        return Gaussian(mean=mean, var=common.floor_var(var, kdd))
    a = common.khatri_rao_all(blocks)
    kss = common.grad_gram_full(spec, params, xstar, xstar, axis)
    q = params["q"]
    if spec.variational == "full":
        Ls = chol_from_raw(q["raw_L"])
        sa = Ls.T @ a
    else:
        Lk = _kron_chols(spec, q)
        sa = common.khatri_rao_all(tuple(Lk[i].T @ blocks[i] for i in range(spec.ndim)))
    cov = kss - a.T @ a + sa.T @ sa
    return Gaussian(mean=mean, cov=cov)
