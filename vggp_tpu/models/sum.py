"""Sum-of-separable-kernels sparse GP: f(x) = Σ_q f_q(x), collapsed ELBO.

Beyond-reference capability that closes the gap between the Kronecker
models (ONE separable product — ``models/sgpr.py``) and the additive model
(sum of 1-D components — ``models/additive.py``): each component q is a
full separable product over ALL input axes with its own kernels and
inducing features,

    k(x, x') = Σ_q Π_i k_qi(x_i, x'_i)
    Kuu  = blockdiag(Kuu_1, …, Kuu_Q)      (components independent a priori)
    Kuf  = vstack(KhatriRao_q(x), …)        per-component Khatri–Rao rows
    kff  = Σ_q Π_i diag K_qi

so the collapsed (Titsias) bound keeps the factored O(n·m²) form with
m = Σ_q m_q. Two headline uses:

- **multi-scale fields**: a long-lengthscale component on a coarse grid
  plus a short-lengthscale component on a fine grid (mesoscale +
  large-scale SSH) — each scale gets the inducing resolution it needs;
- **full LMC multi-output**: components with a coregion axis give
  cov = Σ_q B_q ⊗ K_q — the Linear Model of Coregionalization with Q
  latent kernels, strictly richer than the single-B ICM of
  ``features.OutputFeature`` alone.

Components see the same input columns; a component's spec is an ordinary
``SGPRSpec`` (its ``jitter``/``factor_method`` apply to its own blocks).
Scalar noise and (scalar or per-output) mean live on the sum spec.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import common
from vggp_tpu.models.common import Gaussian
from vggp_tpu.models.sgpr import SGPRSpec
from vggp_tpu.ops import kron_dense, safe_cholesky, tri_solve

Params = Dict


@dataclass(frozen=True)
class SumSGPRSpec:
    """Static config: one ``SGPRSpec`` per additive component.

    Every component must span the same input axes (equal ``ndim``); the
    coregion axis, if any, must sit at the same position in every component
    (the output-index column is shared).
    """

    components: Tuple[SGPRSpec, ...]
    per_output_noise: bool = False
    learn_mean: bool = False

    def __post_init__(self):
        nd = {c.ndim for c in self.components}
        if len(self.components) < 1 or len(nd) != 1:
            raise ValueError("components must be non-empty and share ndim")
        cos = {c.kinds.index("coregion") if "coregion" in c.kinds else None
               for c in self.components}
        if len(cos) != 1:
            raise ValueError(
                "the coregion axis must sit at the same position in every "
                f"component (got positions {sorted(map(str, cos))})")

    @property
    def ndim(self) -> int:
        return self.components[0].ndim

    @property
    def kinds(self) -> Tuple[str, ...]:
        """Axis kinds as seen by the shared input columns (coregion position
        is what ``common.obs_noise`` / ``common.mean_fn`` dispatch on; the
        continuous kinds may differ per component — the first component's
        are reported)."""
        return self.components[0].kinds

    @property
    def num_inducing(self) -> int:
        return sum(c.num_inducing for c in self.components)

    def _n_outputs(self) -> int:
        c0 = self.components[0]
        return c0.features[c0.kinds.index("coregion")].n_outputs

    def init_params(self, dtype=jnp.float32) -> Params:
        comps = tuple(
            {"axes": c.init_params(dtype)["axes"]} for c in self.components
        )
        noise = jnp.asarray(0.1, dtype)
        if self.per_output_noise:
            noise = jnp.full((self._n_outputs(),), 0.1, dtype)
        out = {"components": comps, "noise": noise}
        if self.learn_mean:
            out["mean"] = (jnp.zeros((self._n_outputs(),), dtype)
                           if "coregion" in self.kinds
                           else jnp.asarray(0.0, dtype))
        return out


def _comp_params(params: Params, q: int) -> Params:
    """Per-component param view compatible with the per-axis helpers."""
    return {"axes": params["components"][q]["axes"], "noise": params["noise"]}


def _comp_whitened(spec: SumSGPRSpec, params: Params, X: jnp.ndarray):
    """(chols_q, a_q) per component: a_q = KhatriRao_i(F_qi⁻¹ Kuf_qi)."""
    chols, rows = [], []
    for q, c in enumerate(spec.components):
        cp = _comp_params(params, q)
        ch = common.axis_chol_kuu(c, cp)
        blocks = common.axis_whitened_kuf(c, cp, ch, X)
        chols.append(ch)
        rows.append(common.khatri_rao_all(blocks))
    return tuple(chols), rows


def _factored_state(spec: SumSGPRSpec, params: Params, X: jnp.ndarray,
                    y: jnp.ndarray):
    """(chols, A, L_B, c, y_resid) — the stacked-component factored form."""
    if X.ndim == 1:
        X = X[:, None]
    y = jnp.reshape(y, (-1,)) - common.mean_fn(spec, params, X)
    sigma = jnp.sqrt(common.obs_noise(spec, params, X))
    chols, rows = _comp_whitened(spec, params, X)
    A = jnp.concatenate(rows, axis=0) / sigma        # (Σm_q, n)
    m = A.shape[0]
    B = jnp.eye(m, dtype=A.dtype) + A @ A.T
    LB = safe_cholesky(B, 1e-12)
    c = tri_solve(LB, A @ (y / sigma))
    return chols, A, LB, c, y


def precompute(spec: SumSGPRSpec, params: Params, X: jnp.ndarray,
               y: jnp.ndarray):
    """Training-set factored state for repeated predictions (pytree)."""
    return _factored_state(spec, params, X, y)[:4]


def kdiag(spec: SumSGPRSpec, params: Params, X: jnp.ndarray) -> jnp.ndarray:
    """diag K_ff = Σ_q Π_i diag K_qi."""
    if X.ndim == 1:
        X = X[:, None]
    out = jnp.zeros((X.shape[0],), dtype=jnp.result_type(params["noise"]))
    for q, c in enumerate(spec.components):
        out = out + common.kdiag(c, _comp_params(params, q), X)
    return out


def gram_full(spec: SumSGPRSpec, params: Params, x1, x2) -> jnp.ndarray:
    """Dense Σ_q Π_i K_qi(x1, x2)."""
    out = None
    for q, c in enumerate(spec.components):
        g = common.gram_full(c, _comp_params(params, q), x1, x2)
        out = g if out is None else out + g
    return out


@common.highest_precision
def elbo(spec: SumSGPRSpec, params: Params, X: jnp.ndarray,
         y: jnp.ndarray) -> jnp.ndarray:
    """Collapsed (Titsias) bound over the stacked components — same factored
    form as ``common.collapsed_elbo`` (heteroscedastic D included)."""
    if X.ndim == 1:
        X = X[:, None]
    chols, A, LB, c, y = _factored_state(spec, params, X, y)
    n = y.shape[0]
    noise = jnp.broadcast_to(common.obs_noise(spec, params, X), (n,))
    kff = kdiag(spec, params, X)
    bound = -0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * noise))
    bound -= jnp.sum(jnp.log(jnp.diagonal(LB)))
    bound -= 0.5 * jnp.sum(y * y / noise)
    bound += 0.5 * jnp.sum(c * c)
    bound -= 0.5 * jnp.maximum(jnp.sum(kff / noise) - jnp.sum(A * A), 0.0)
    return bound


def loss(spec, params, X, y):
    return -elbo(spec, params, X, y)


@common.highest_precision
def posterior_from_state(
    spec: SumSGPRSpec, params: Params, state, xstar: jnp.ndarray,
    full_cov: bool = False, predictive: bool = False,
) -> Gaussian:
    """q(f*) from a :func:`precompute` state."""
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    chols, A, LB, c = state[:4]
    rows = []
    for q, comp in enumerate(spec.components):
        cp = _comp_params(params, q)
        blocks = common.axis_whitened_kuf(comp, cp, chols[q], xstar)
        rows.append(common.khatri_rao_all(blocks))
    w = jnp.concatenate(rows, axis=0)            # (Σm_q, n*)
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c + common.mean_fn(spec, params, xstar)
    noise = common.obs_noise(spec, params, xstar) if predictive else 0.0
    if full_cov:
        kss = gram_full(spec, params, xstar, xstar)
        cov = kss - w.T @ w + tmp.T @ tmp
        if predictive:
            n_star = cov.shape[0]
            cov = cov + jnp.broadcast_to(noise, (n_star,)) * jnp.eye(
                n_star, dtype=cov.dtype)
        return Gaussian(mean=mean, cov=cov)
    kss = kdiag(spec, params, xstar)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss) + noise)


@common.highest_precision
def posterior(spec: SumSGPRSpec, params: Params, X, y, xstar,
              full_cov: bool = False, predictive: bool = False) -> Gaussian:
    state = _factored_state(spec, params, X, y)
    return posterior_from_state(spec, params, state, xstar,
                                full_cov=full_cov, predictive=predictive)


def posterior_predictive(spec, params, X, y, xstar,
                         full_cov: bool = False) -> Gaussian:
    return posterior(spec, params, X, y, xstar, full_cov=full_cov,
                     predictive=True)


def prior(spec: SumSGPRSpec, params: Params, xstar: jnp.ndarray) -> Gaussian:
    cov = gram_full(spec, params, xstar, xstar)
    mean = jnp.zeros(cov.shape[0], dtype=cov.dtype) + common.mean_fn(
        spec, params, xstar)
    return Gaussian(mean=mean, cov=cov)


@common.highest_precision
def q_u(spec: SumSGPRSpec, params: Params, X, y) -> Gaussian:
    """Optimal q(u) over the stacked u = (u¹, …, u^Q)."""
    import jax

    chols, A, LB, c, _ = _factored_state(spec, params, X, y)
    L = jax.scipy.linalg.block_diag(
        *[kron_dense([f.F for f in ch]) for ch in chols])
    half = tri_solve(LB, L.T).T
    return Gaussian(mean=half @ c, cov=half @ half.T)


@common.highest_precision
def q_v_from_state(
    spec: SumSGPRSpec, params: Params, state,
    grid_axes: Sequence[CellIntegralFeature], full_cov: bool = False,
) -> Gaussian:
    """Gridded q(v): v = ∫_cell Σ_q f_q, so Kvu = [Kvu_1, …, Kvu_Q] and
    Kvv = Σ_q ⊗_i Kvv_qi. Cholesky-propagated like ``sgpr.q_v``."""
    chols, A, LB, c = state[:4]
    r_rows = []
    kvv = None
    kvv_diag = None
    from vggp_tpu.ops import kron_diag

    for q, comp in enumerate(spec.components):
        cp = _comp_params(params, q)
        kvu_blocks = common.grid_kvu(comp, cp, grid_axes)
        r_blocks = tuple(chols[q][i].whiten(kvu_blocks[i].T).T
                         for i in range(comp.ndim))
        r_rows.append(kron_dense(r_blocks).T)        # (m_q, g)
        kvv_blocks = common.grid_kvv(comp, cp, grid_axes, dense=False)
        if full_cov:
            kq = kron_dense(kvv_blocks)
            kvv = kq if kvv is None else kvv + kq
        else:
            dq = kron_diag([jnp.diagonal(b) for b in kvv_blocks])
            kvv_diag = dq if kvv_diag is None else kvv_diag + dq
    R = jnp.concatenate(r_rows, axis=0).T            # (g, Σm_q)
    T = tri_solve(LB, R.T).T
    mean = T @ c + common.grid_mean(spec, params, grid_axes)
    if full_cov:
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))


@common.highest_precision
def q_v(spec: SumSGPRSpec, params: Params, X, y,
        grid_axes: Sequence[CellIntegralFeature],
        full_cov: bool = False) -> Gaussian:
    state = _factored_state(spec, params, X, y)[:4]
    return q_v_from_state(spec, params, state, grid_axes, full_cov=full_cov)


def _grid_r_rows(spec: SumSGPRSpec, params: Params, chols, grid_axes,
                 kvu_fn) -> jnp.ndarray:
    """R = [⊗(Kvu_1i F_1i⁻ᵀ), …, ⊗(Kvu_Qi F_Qi⁻ᵀ)] (g, Σm_q): the whitened
    grid/inducing cross block for the stacked components. ``kvu_fn(comp, cp)``
    yields the per-axis Kvu blocks (plain cell integrals or face-difference
    gradient blocks)."""
    r_rows = []
    for q, comp in enumerate(spec.components):
        cp = _comp_params(params, q)
        kvu_blocks = kvu_fn(comp, cp)
        r_blocks = tuple(chols[q][i].whiten(kvu_blocks[i].T).T
                         for i in range(comp.ndim))
        r_rows.append(kron_dense(r_blocks).T)        # (m_q, g)
    return jnp.concatenate(r_rows, axis=0).T         # (g, Σm_q)


@common.highest_precision
def p_v_u(spec: SumSGPRSpec, params: Params, X, y,
          grid_axes: Sequence[CellIntegralFeature]) -> Gaussian:
    """p(v | u = E_q[u]) for the stacked components: mean = Kvu Kuu⁻¹ m_u =
    R L_B⁻ᵀ c, cov = Kvv − R Rᵀ with Kvv = Σ_q ⊗_i Kvv_qi (reference head
    shape at ``gridded_univariate_structure.py:462-473``; blockdiag Kuu)."""
    chols, A, LB, c, _ = _factored_state(spec, params, X, y)
    R = _grid_r_rows(spec, params, chols, grid_axes,
                     lambda comp, cp: common.grid_kvu(comp, cp, grid_axes))
    mean = tri_solve(LB, R.T).T @ c
    kvv = None
    for q, comp in enumerate(spec.components):
        kq = kron_dense(common.grid_kvv(comp, _comp_params(params, q),
                                        grid_axes, dense=False))
        kvv = kq if kvv is None else kvv + kq
    g = Gaussian(mean=mean, cov=kvv - R @ R.T)
    return common.shift_mean(g, common.grid_mean(spec, params, grid_axes))


@common.highest_precision
def q_dv(spec: SumSGPRSpec, params: Params, X, y,
         grid_axes: Sequence[CellIntegralFeature], axis: int,
         full_cov: bool = False) -> Gaussian:
    """Gridded-gradient posterior q(∫_cell ∂f/∂x_axis) of the summed field:
    the gradient distributes over the sum, so Kvu stacks per-component
    face-difference blocks and Kvv = Σ_q grad-Kvv_q (same algebra as
    ``sgpr.q_dv_from_state`` per component)."""
    from vggp_tpu.ops import kron_diag

    axis = common.canonical_axis(spec.components[0], axis)
    chols, A, LB, c, _ = _factored_state(spec, params, X, y)
    R = _grid_r_rows(spec, params, chols, grid_axes,
                     lambda comp, cp: common.grad_grid_kvu(comp, cp, grid_axes, axis))
    T = tri_solve(LB, R.T).T
    mean = T @ c
    kvv = None
    kvv_diag = None
    for q, comp in enumerate(spec.components):
        blocks = common.grad_grid_kvv(comp, _comp_params(params, q),
                                      grid_axes, axis, dense=False)
        if full_cov:
            kq = kron_dense(blocks)
            kvv = kq if kvv is None else kvv + kq
        else:
            dq = kron_diag([jnp.diagonal(b) for b in blocks])
            kvv_diag = dq if kvv_diag is None else kvv_diag + dq
    if full_cov:
        return Gaussian(mean=mean, cov=kvv - R @ R.T + T @ T.T)
    var = kvv_diag - jnp.sum(R * R, axis=1) + jnp.sum(T * T, axis=1)
    return Gaussian(mean=mean, var=common.floor_var(var, kvv_diag))


@common.highest_precision
def posterior_grad(spec: SumSGPRSpec, params: Params, X, y,
                   xstar: jnp.ndarray, axis: int,
                   full_cov: bool = False) -> Gaussian:
    """Pointwise-gradient posterior ∂f/∂x_axis of the summed field: the w
    block stacks per-component whitened ∂Kuf rows; the prior marginal is
    Σ_q grad-kdiag_q. Requires every component's ``axis`` kind to be once
    differentiable (matern32/52/rbf — not matern12)."""
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    axis = common.canonical_axis(spec.components[0], axis)
    chols, A, LB, c, _ = _factored_state(spec, params, X, y)
    rows = []
    for q, comp in enumerate(spec.components):
        cp = _comp_params(params, q)
        blocks = common.axis_whitened_dkuf(comp, cp, chols[q], xstar, axis)
        rows.append(common.khatri_rao_all(blocks))
    w = jnp.concatenate(rows, axis=0)               # (Σm_q, n*)
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c
    if full_cov:
        kss = None
        for q, comp in enumerate(spec.components):
            g = common.grad_gram_full(comp, _comp_params(params, q),
                                      xstar, xstar, axis)
            kss = g if kss is None else kss + g
        return Gaussian(mean=mean, cov=kss - w.T @ w + tmp.T @ tmp)
    kss = None
    for q, comp in enumerate(spec.components):
        g = common.grad_kdiag(comp, _comp_params(params, q), xstar, axis)
        kss = g if kss is None else kss + g
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss))


def component_posterior(spec: SumSGPRSpec, params: Params, state,
                        xstar: jnp.ndarray, q: int,
                        full_cov: bool = False) -> Gaussian:
    """q(f_q*) — the posterior of ONE component at test inputs (the additive
    decomposition: attribute signal to scales/latents). Cross-covariance of
    f_q with the stacked u is nonzero only on the q-th block."""
    if xstar.ndim == 1:
        xstar = xstar[:, None]
    chols, A, LB, c = state[:4]
    comp = spec.components[q]
    cp = _comp_params(params, q)
    blocks = common.axis_whitened_kuf(comp, cp, chols[q], xstar)
    w_q = common.khatri_rao_all(blocks)              # (m_q, n*)
    sizes = [cc.num_inducing for cc in spec.components]
    lo = sum(sizes[:q])
    w = jnp.zeros((sum(sizes), xstar.shape[0]), dtype=w_q.dtype)
    w = w.at[lo:lo + sizes[q]].set(w_q)
    tmp = tri_solve(LB, w)
    mean = tmp.T @ c
    if full_cov:
        kss = common.gram_full(comp, cp, xstar, xstar)
        return Gaussian(mean=mean, cov=kss - w.T @ w + tmp.T @ tmp)
    kss = common.kdiag(comp, cp, xstar)
    var = kss - jnp.sum(w * w, axis=0) + jnp.sum(tmp * tmp, axis=0)
    return Gaussian(mean=mean, var=common.floor_var(var, kss))
