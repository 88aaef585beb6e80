"""High-level object API: the reference's class ergonomics over the functional core.

The reference exposes one PyTorch class per (kernel x feature x dimension)
combination, each with ``non_informative_initialise`` / an optimizer loop /
``q_v()`` (e.g. ``src/models/sparse/gridded_kronecker_structure.py:1255-1433``).
vggp_tpu's core is functional — frozen ``*Spec`` + pure functions — which is
what jit/vmap/shard want, but migrating users keep reaching for
``model.fit(X, y); model.q_v(grid)``. :class:`GP` is that thin, stateful
facade: it owns ``(spec, params, data)``, jit-caches every prediction head
per static-flag combination, and delegates 1:1 to ``models.sgpr`` /
``models.exact`` / ``train`` / ``sampling``.

Everything the facade does is available (and documented) functionally; no
numerics live here. See ``docs/MIGRATION.md`` for the class-by-class map.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from vggp_tpu import sampling, train
from vggp_tpu.features import (
    B1SplineFeature,
    CellIntegralFeature,
    FourierFeature,
    OutputFeature,
    PointFeature,
    SplineRKHSFeature,
)
from vggp_tpu.models import additive, exact, freesvgp, sgpr, svgp as msvgp
from vggp_tpu.models import sum as msum
from vggp_tpu.models.common import Gaussian

Lims = Tuple[float, float]


def _module_for(spec):
    """Functional-core module for a collapsed/exact spec (the GP facade)."""
    if isinstance(spec, exact.ExactGPSpec):
        return exact
    if isinstance(spec, sgpr.SGPRSpec):
        return sgpr
    if isinstance(spec, additive.AdditiveSGPRSpec):
        return additive
    if isinstance(spec, msum.SumSGPRSpec):
        return msum
    if isinstance(spec, freesvgp.FreeSVGPSpec):
        return freesvgp
    if isinstance(spec, msvgp.SVGPSpec):
        raise TypeError(
            "GP is the collapsed/exact facade; wrap an SVGPSpec in api.SVGP "
            "(minibatch trainer, data-free heads) instead"
        )
    raise TypeError(f"no facade dispatch for spec type {type(spec).__name__}")


def _lims_per_axis(lims, ndim: int) -> Tuple[Lims, ...]:
    """One (a, b) pair per axis; a single pair broadcasts to every axis."""
    if isinstance(lims[0], (tuple, list, np.ndarray)):
        pairs = tuple((float(a), float(b)) for a, b in lims)
    else:
        a, b = lims
        pairs = ((float(a), float(b)),) * ndim
    if len(pairs) != ndim:
        raise ValueError(f"expected {ndim} (a, b) lims pairs, got {len(pairs)}")
    return pairs


def _kinds(kinds: Union[str, Sequence[str]], ndim: int) -> Tuple[str, ...]:
    if isinstance(kinds, str):
        return (kinds,) * ndim
    kinds = tuple(kinds)
    if len(kinds) != ndim:
        raise ValueError(f"expected {ndim} kernel kinds, got {len(kinds)}")
    return kinds


def _infer_ndim(counts, lims, kinds, ndim: Optional[int]) -> int:
    """ndim from whichever argument is a sequence — counts, lims pairs, or
    kinds — never silently truncating a mismatch (zip would otherwise turn
    ``GP.gridded((6, 5), (0.0, 1.0))`` into a 1-D 6-cell model)."""
    if ndim is not None:
        return int(ndim)
    if isinstance(counts, (list, tuple, np.ndarray)):
        return len(counts)
    if isinstance(lims[0], (tuple, list, np.ndarray)):
        return len(lims)
    if not isinstance(kinds, str):
        return len(tuple(kinds))
    return 1


def _counts_per_axis(counts, ndim: int, name: str) -> Tuple[int, ...]:
    """One positive int per axis; a scalar broadcasts, a sequence must match."""
    if isinstance(counts, (list, tuple, np.ndarray)):
        out = tuple(int(c) for c in counts)
        if len(out) != ndim:
            raise ValueError(f"expected {ndim} {name} values, got {len(out)}")
    else:
        out = (int(counts),) * ndim
    if any(c <= 0 for c in out):
        raise ValueError(f"{name} must be positive, got {out}")
    return out


def _feature_key(f) -> tuple:
    """Content key for jit caches: equal-but-distinct grid features must hit
    the same compiled program (id()-keyed caches recompile per object and
    only stay correct while the closure pins the object alive)."""
    mesh = getattr(f, "mesh", None)
    if mesh is not None:
        return (type(f).__name__, np.asarray(mesh).tobytes())
    return (type(f).__name__, f.m, getattr(f, "a", None), getattr(f, "b", None))


class GP:
    """Stateful facade over a collapsed (SGPR) or exact GP spec.

    Construct via a factory (:meth:`gridded`, :meth:`vff`, :meth:`asvgp`,
    :meth:`svgp`, :meth:`exact`) or pass any ``SGPRSpec`` / ``ExactGPSpec``
    directly. The reference classes these replace are cited on each factory.
    """

    def __init__(self, spec, params: Optional[Dict] = None):
        self.spec = spec
        self.params = params if params is not None else spec.init_params()
        # user-supplied / restored / trained params must survive fit()'s
        # default auto-initialisation (ADVICE r2)
        self._params_are_fresh = params is None
        self.history: Optional[Dict] = None
        self._X = self._y = None
        self._jitted: Dict = {}
        self._mod = _module_for(spec)
        self._w = None        # cached CG solve (solve_iterative)
        self._laplace = None  # cached (min_eig_rel, LaplaceState)
        self._hmc = None      # cached (settings key, HMCResult)

    # ------------------------------------------------------------------ #
    # Factories (one per reference model family)
    # ------------------------------------------------------------------ #

    @classmethod
    def gridded(cls, n_cells: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
                kinds: Union[str, Sequence[str]] = "matern12", ndim: Optional[int] = None) -> "GP":
        """B0 cell-integral inducing features — the reference's ``GriddedGP`` /
        ``Matern12B0SplineGriddedGP`` zoo (``gridded_kronecker_structure.py:1255``)."""
        ndim = _infer_ndim(n_cells, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        cells = _counts_per_axis(n_cells, ndim, "n_cells")
        feats = tuple(CellIntegralFeature.from_lims(c, float(a), float(b))
                      for c, (a, b) in zip(cells, lims_ax))
        return cls(sgpr.SGPRSpec(kinds=_kinds(kinds, ndim), features=feats))

    @classmethod
    def vff(cls, n_frequencies: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
            kinds: Union[str, Sequence[str]] = "matern12", ndim: Optional[int] = None) -> "GP":
        """Variational Fourier features — the reference's ``VFFGP``
        (``univariate_structure.py:364``, Kronecker form at ``kronecker_structure.py``)."""
        ndim = _infer_ndim(n_frequencies, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        nfreq = _counts_per_axis(n_frequencies, ndim, "n_frequencies")
        feats = tuple(FourierFeature(nf, float(a), float(b))
                      for nf, (a, b) in zip(nfreq, lims_ax))
        return cls(sgpr.SGPRSpec(kinds=_kinds(kinds, ndim), features=feats))

    @classmethod
    def asvgp(cls, n_knots: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
              kinds: Union[str, Sequence[str]] = "matern12", ndim: Optional[int] = None) -> "GP":
        """Spline-RKHS features — the reference's ``ASVGP`` (B1 hats,
        ``univariate_structure.py:531``). Higher Matérn orders get the matching
        B2/B3 spline degree (beyond the reference's 1/2-only version)."""
        ndim = _infer_ndim(n_knots, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        kds = _kinds(kinds, ndim)
        nk = _counts_per_axis(n_knots, ndim, "n_knots")
        feats = []
        for kind, k, (a, b) in zip(kds, nk, lims_ax):
            if kind == "matern12":
                feats.append(B1SplineFeature(np.linspace(float(a), float(b), int(k))))
            elif kind == "matern32":
                feats.append(SplineRKHSFeature(2, int(k) - 2, float(a), float(b)))
            elif kind == "matern52":
                feats.append(SplineRKHSFeature(3, int(k) - 3, float(a), float(b)))
            else:
                raise ValueError(f"no spline-RKHS pairing for kind {kind!r}")
        return cls(sgpr.SGPRSpec(kinds=kds, features=tuple(feats)))

    @classmethod
    def svgp(cls, n_inducing: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
             kinds: Union[str, Sequence[str]] = "matern12", ndim: Optional[int] = None) -> "GP":
        """Learnable inducing points on each axis — the reference's ``SVGP``
        (``univariate_structure.py:273``); z lives in the param pytree."""
        ndim = _infer_ndim(n_inducing, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        nz = _counts_per_axis(n_inducing, ndim, "n_inducing")
        feats = []
        for m, (a, b) in zip(nz, lims_ax):
            pad = 0.05 * (float(b) - float(a))
            feats.append(PointFeature(int(m), np.linspace(float(a) + pad, float(b) - pad, int(m))))
        return cls(sgpr.SGPRSpec(kinds=_kinds(kinds, ndim), features=tuple(feats)))

    @classmethod
    def exact(cls, kinds: Union[str, Sequence[str]] = "matern12", ndim: int = 1) -> "GP":
        """Dense exact GP (``exact/univariate_structure.py``, separable-product
        2D at ``bivariate_structure.py:144``)."""
        return cls(exact.ExactGPSpec(kinds=_kinds(kinds, ndim)))

    @classmethod
    def additive(cls, n_cells: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
                 kinds: Union[str, Sequence[str]] = "matern12",
                 ndim: Optional[int] = None) -> "GP":
        """Additive-structure GP f(x) = Σ_d f_d(x_d), one B0 cell-integral
        feature set per input axis (the reference's empty
        ``sparse/additive_structure.py`` placeholder, fully implemented in
        ``models.additive``)."""
        ndim = _infer_ndim(n_cells, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        cells = _counts_per_axis(n_cells, ndim, "n_cells")
        feats = tuple(CellIntegralFeature.from_lims(c, float(a), float(b))
                      for c, (a, b) in zip(cells, lims_ax))
        return cls(additive.AdditiveSGPRSpec(kinds=_kinds(kinds, ndim), features=feats))

    @classmethod
    def free_z(cls, n_inducing: int, lims: Union[Lims, Sequence[Lims]],
               kinds: Union[str, Sequence[str]] = "matern12",
               ndim: Optional[int] = None, seed: int = 0) -> "GP":
        """FREE d-dimensional inducing points z_i ∈ ℝᵈ (Hadamard-product
        Grams) — the reference's nb61 Z-sweep model
        (``gridded_kronecker_structure.py:222-460``), ``models.freesvgp``.
        Unlike :meth:`svgp` (separable per-axis points), the m points do not
        factorize across axes; Z initializes uniformly at random in ``lims``.
        Grid heads (``q_v``/``q_dv``/``p_v_u``) need explicit ``grid_axes``.
        ``n_inducing`` is the TOTAL point count (not per-axis) — pass lims
        pairs or ``ndim`` for a multi-dimensional model."""
        ndim = _infer_ndim(None, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        spec = freesvgp.FreeSVGPSpec(kinds=_kinds(kinds, ndim), m=int(n_inducing))
        lo = np.array([a for a, _ in lims_ax])
        hi = np.array([b for _, b in lims_ax])
        z0 = lo + (hi - lo) * np.random.default_rng(seed).random((int(n_inducing), ndim))
        gp = cls(spec, params=spec.init_params(z_init=z0))
        gp._params_are_fresh = True  # factory-made init counts as fresh
        return gp

    @classmethod
    def sum(cls, components: Sequence, per_output_noise: bool = False,
            learn_mean: bool = False) -> "GP":
        """Sum-of-kernels GP over shared axes (``models.sum``): each component
        is an ``SGPRSpec`` — or a :class:`GP` built by any factory above, whose
        spec is taken. Free per-component lengthscales are unidentifiable;
        freeze them via ``fit(trainable=...)`` (see ``models/sum.py``)."""
        specs = tuple(c.spec if isinstance(c, GP) else c for c in components)
        if not all(isinstance(s, sgpr.SGPRSpec) for s in specs):
            raise TypeError("sum components must be SGPRSpec (or GP over one)")
        return cls(msum.SumSGPRSpec(components=specs,
                                    per_output_noise=per_output_noise,
                                    learn_mean=learn_mean))

    @classmethod
    def multioutput(cls, n_cells: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
                    n_outputs: int, kinds: Union[str, Sequence[str]] = "matern12",
                    ndim: Optional[int] = None, per_output_noise: bool = False,
                    learn_mean: bool = True) -> "GP":
        """Multi-output ICM: gridded continuous axes plus one coregion axis
        (Kuu = B = WWᵀ + diag κ). The integer output index rides as the LAST
        column of X (float-valued, validated in ``features.OutputFeature``).
        ``learn_mean`` defaults on: a zero-mean GP absorbs inter-output
        offsets into κ, deflating the learned correlation (CLAUDE.md)."""
        ndim = _infer_ndim(n_cells, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        cells = _counts_per_axis(n_cells, ndim, "n_cells")
        feats = tuple(CellIntegralFeature.from_lims(c, float(a), float(b))
                      for c, (a, b) in zip(cells, lims_ax))
        return cls(sgpr.SGPRSpec(
            kinds=_kinds(kinds, ndim) + ("coregion",),
            features=feats + (OutputFeature(n_outputs=int(n_outputs)),),
            per_output_noise=per_output_noise, learn_mean=learn_mean))

    # ------------------------------------------------------------------ #
    # Training
    # ------------------------------------------------------------------ #

    def non_informative_initialise(self, X, y, lmbda: float = 1.0, kappa: float = 2.0) -> "GP":
        """Reference ``non_informative_initialise`` (``univariate_structure.py:86``)."""
        self.params = train.non_informative_init(self.params, jnp.asarray(X), jnp.asarray(y),
                                                 lmbda=lmbda, kappa=kappa)
        self._w = None
        self._laplace = None
        self._hmc = None
        return self

    def fit(self, X, y, n_iters: int = 1000, learning_rate: float = 0.1,
            initialise: Optional[bool] = None, **fit_kwargs) -> "GP":
        """Full-batch Adam fit of the collapsed bound / exact MLL; stores the
        data so every prediction head below needs no further arguments.

        ``initialise=None`` (default) runs ``non_informative_initialise``
        only on fresh ``spec.init_params()`` params — explicitly supplied,
        restored, or already-trained params are kept (continued training);
        pass ``True``/``False`` to force either way.
        """
        self._X, self._y = jnp.asarray(X), jnp.asarray(y)
        if initialise is None:
            initialise = self._params_are_fresh
        if initialise:
            self.non_informative_initialise(self._X, self._y)
        self._params_are_fresh = False
        spec = self.spec
        self.params, self.history = train.fit(
            lambda p: self._mod.loss(spec, p, self._X, self._y),
            self.params, n_iters, learning_rate, **fit_kwargs)
        self._jitted.clear()  # params changed shape-compatibly; keep caches keyed small
        self._w = None
        self._laplace = None
        self._hmc = None
        return self

    def elbo(self) -> float:
        """Collapsed ELBO (exact GP: log marginal likelihood)."""
        self._need_data()
        fn = self._get("elbo", lambda s: jax.jit(
            lambda p, X, y: -self._mod.loss(s, p, X, y)))
        return float(fn(self.params, self._X, self._y))

    # ------------------------------------------------------------------ #
    # Prediction heads
    # ------------------------------------------------------------------ #

    def predict(self, xstar, full_cov: bool = False, predictive: bool = False) -> Gaussian:
        """Posterior q(f*) (``predictive=True`` adds observation noise)."""
        self._need_data()
        fn = self._get(("predict", full_cov, predictive), lambda s: jax.jit(
            lambda p, X, y, xs: (self._mod.posterior_predictive(s, p, X, y, xs, full_cov=full_cov)
                                 if predictive else
                                 self._mod.posterior(s, p, X, y, xs, full_cov=full_cov))))
        return fn(self.params, self._X, self._y, jnp.asarray(xstar))

    def q_v(self, grid_axes=None, full_cov: bool = False) -> Gaussian:
        """Gridded product: posterior over cell integrals (the headline output).

        ``grid_axes`` defaults to the model's own cell features (the
        reference's *direct* GriddedGP, where q(v) == q(u))."""
        self._need_data()
        axes = self._grid_axes(grid_axes)
        fn = self._get(("q_v", tuple(map(_feature_key, axes)), full_cov), lambda s: jax.jit(
            lambda p, X, y: self._mod.q_v(s, p, X, y, axes, full_cov=full_cov)))
        return fn(self.params, self._X, self._y)

    def q_dv(self, grid_axes=None, axis: int = 0, full_cov: bool = False) -> Gaussian:
        """Gridded-gradient product along ``axis`` (face differences)."""
        self._need_data()
        axes = self._grid_axes(grid_axes)
        fn = self._get(("q_dv", tuple(map(_feature_key, axes)), axis, full_cov), lambda s: jax.jit(
            lambda p, X, y: self._mod.q_dv(s, p, X, y, axes, axis=axis, full_cov=full_cov)))
        return fn(self.params, self._X, self._y)

    def posterior_grad(self, xstar, axis: int = 0, full_cov: bool = False) -> Gaussian:
        """Pointwise-gradient posterior ∂f/∂x_axis (needs a once-differentiable
        kernel on ``axis`` — Matérn ≥ 3/2 or RBF, not matern12)."""
        self._need_data()
        fn = self._get(("posterior_grad", axis, full_cov), lambda s: jax.jit(
            lambda p, X, y, xs: self._mod.posterior_grad(s, p, X, y, xs,
                                                         axis=axis, full_cov=full_cov)))
        return fn(self.params, self._X, self._y, jnp.asarray(xstar))

    def q_u(self) -> Gaussian:
        """Optimal q(u) of the collapsed bound (undefined for exact GPs)."""
        self._need_data()
        if self._mod is exact:
            raise ValueError("exact GPs have no inducing variables u")
        fn = self._get("q_u", lambda s: jax.jit(
            lambda p, X, y: self._mod.q_u(s, p, X, y)))
        return fn(self.params, self._X, self._y)

    def p_v_u(self, grid_axes=None) -> Gaussian:
        """p(v | u = E_q[u]) over the grid (undefined for exact GPs)."""
        self._need_data()
        if self._mod is exact:
            raise ValueError("exact GPs have no inducing variables u")
        axes = self._grid_axes(grid_axes)
        fn = self._get(("p_v_u", tuple(map(_feature_key, axes))), lambda s: jax.jit(
            lambda p, X, y: self._mod.p_v_u(s, p, X, y, axes)))
        return fn(self.params, self._X, self._y)

    def sample(self, key, xstar, n_samples: int = 8, n_features: int = 1024) -> jnp.ndarray:
        """Coherent pathwise posterior draws at xstar (Matheron's rule)."""
        self._need_data()
        return sampling.pathwise(self.spec, self.params, key, jnp.asarray(xstar),
                                 data=(self._X, self._y),
                                 n_samples=n_samples, n_features=n_features)

    def sample_q_v(self, key, grid_axes=None, n_samples: int = 8,
                   n_features: int = 1024) -> jnp.ndarray:
        """Joint draws of the gridded product itself (exact integral functionals)."""
        self._need_data()
        return sampling.pathwise_q_v(self.spec, self.params, key, self._grid_axes(grid_axes),
                                     n_samples=n_samples, n_features=n_features,
                                     data=(self._X, self._y))

    # ------------------------------------------------------------------ #
    # Matrix-free (CG) mean heads — very large 1D inducing grids
    # ------------------------------------------------------------------ #

    def solve_iterative(self, tol: Optional[float] = None, maxiter: int = 1000) -> "GP":
        """Run the Jacobi-preconditioned CG solve (``models.iterative``) and
        cache w = (σ²Kuu + KufKufᵀ)⁻¹Kuf y for the mean heads below. Any
        number of Kronecker axes (continuous kinds); O(iters·(m log m + n·m))
        with no (m, m) factorization, so m ≈ 10⁴–10⁵ inducing cells (e.g. a
        512² grid's means) is fine where dense :meth:`q_v` is not.
        Invalidated by ``fit``/``restore`` (w is a function of the params)."""
        self._need_data()
        from vggp_tpu.models import iterative

        fn = self._get(("solve_w", tol, maxiter), lambda s: jax.jit(
            lambda p, X, y: iterative.solve_w(s, p, X, y, tol=tol, maxiter=maxiter)))
        self._w = fn(self.params, self._X, self._y)
        return self

    def predict_mean_iterative(self, xstar) -> jnp.ndarray:
        """E_q[f*] via the cached CG solve (== ``predict(...).mean``);
        runs :meth:`solve_iterative` with defaults if not yet solved."""
        if getattr(self, "_w", None) is None:
            self.solve_iterative()
        from vggp_tpu.models import iterative

        fn = self._get("cg_post_mean", lambda s: jax.jit(
            lambda p, xs, w: iterative.posterior_mean_from_w(s, p, xs, w)))
        return fn(self.params, jnp.asarray(xstar), self._w)

    def q_v_mean_iterative(self, grid_axes=None) -> jnp.ndarray:
        """E_q[v] (gridded-product mean field) via the cached CG solve
        (== ``q_v(...).mean``); for matching matrix-free uncertainties see
        :meth:`q_v_pathwise_iterative`."""
        if getattr(self, "_w", None) is None:
            self.solve_iterative()
        from vggp_tpu.models import iterative

        axes = self._grid_axes(grid_axes)
        fn = self._get(("cg_qv_mean", tuple(map(_feature_key, axes))), lambda s: jax.jit(
            lambda p, w: iterative.q_v_mean_from_w(s, p, axes, w)))
        return fn(self.params, self._w)

    def q_dv_mean_iterative(self, grid_axes=None, axis: int = 0) -> jnp.ndarray:
        """Gridded-GRADIENT product mean ∫_cell ∂f/∂x_axis via the cached CG
        solve (== ``q_dv(...).mean``): the face-difference head at scales
        where the dense pipeline cannot factor (m, m). Valid for every kind
        incl. matern12."""
        if getattr(self, "_w", None) is None:
            self.solve_iterative()
        from vggp_tpu.models import iterative

        axes = self._grid_axes(grid_axes)
        fn = self._get(("cg_qdv_mean", tuple(map(_feature_key, axes)), axis),
                       lambda s: jax.jit(
            lambda p, w: iterative.q_dv_mean_from_w(s, p, axes, axis, w)))
        return fn(self.params, self._w)

    def predict_grad_mean_iterative(self, xstar, axis: int = 0) -> jnp.ndarray:
        """Pointwise-gradient posterior mean ∂f/∂x_axis via the cached CG
        solve (== ``posterior_grad(...).mean``); needs a once-differentiable
        kernel on ``axis``."""
        if getattr(self, "_w", None) is None:
            self.solve_iterative()
        from vggp_tpu.models import iterative

        fn = self._get(("cg_grad_mean", axis), lambda s: jax.jit(
            lambda p, xs, w: iterative.posterior_grad_mean_from_w(
                s, p, xs, axis, w)))
        return fn(self.params, jnp.asarray(xstar), self._w)

    def q_v_pathwise_iterative(self, grid_axes=None, n_samples: int = 64,
                               n_features: int = 1024, seed: int = 0,
                               **cg_kwargs) -> Gaussian:
        """Matrix-free gridded product WITH per-cell uncertainty: Matheron
        posterior draws through CG solves (``iterative.q_v_pathwise``) —
        exact moments up to MC error ~√(2/S), no (m, m) factorization, so
        it serves grids far past :meth:`q_v`'s dense range."""
        self._need_data()
        from vggp_tpu.models import iterative

        axes = self._grid_axes(grid_axes)
        fn = self._get(("cg_qv_pathwise", tuple(map(_feature_key, axes)),
                        n_samples, n_features, tuple(sorted(cg_kwargs.items()))),
                       lambda s: jax.jit(
            lambda p, X, y, k: iterative.q_v_pathwise(
                s, p, X, y, axes, k, n_samples=n_samples,
                n_features=n_features, **cg_kwargs)))
        return fn(self.params, self._X, self._y, jax.random.PRNGKey(seed))

    def q_dv_pathwise_iterative(self, grid_axes=None, axis: int = 0,
                                n_samples: int = 64, n_features: int = 1024,
                                seed: int = 0, **cg_kwargs) -> Gaussian:
        """Matrix-free gridded-GRADIENT product WITH per-cell uncertainty
        (face-difference Matheron draws through CG solves) — the velocity
        product's uncertainty channel past dense range."""
        self._need_data()
        from vggp_tpu.models import iterative

        axes = self._grid_axes(grid_axes)
        fn = self._get(("cg_qdv_pathwise", tuple(map(_feature_key, axes)),
                        axis, n_samples, n_features,
                        tuple(sorted(cg_kwargs.items()))),
                       lambda s: jax.jit(
            lambda p, X, y, k: iterative.q_dv_pathwise(
                s, p, X, y, axes, axis, k, n_samples=n_samples,
                n_features=n_features, **cg_kwargs)))
        return fn(self.params, self._X, self._y, jax.random.PRNGKey(seed))

    # ------------------------------------------------------------------ #
    # Hyperparameter-posterior (Laplace) marginalized prediction
    # ------------------------------------------------------------------ #

    def laplace(self, min_eig_rel: float = 1e-8):
        """Laplace approximation N(θ̂, H⁻¹) to the hyperparameter posterior
        at the current (fitted) params (``vggp_tpu.hyperpost.laplace``), over
        the same collapsed bound / MLL ``fit`` minimized. Cached until the
        params change OR ``min_eig_rel`` differs from the cached build's
        (ADVICE r4: a stale state built with another floor must not be
        returned silently); returned for direct use with ``hyperpost.*``."""
        self._need_data()
        from vggp_tpu import hyperpost

        cached = getattr(self, "_laplace", None)
        if cached is None or cached[0] != min_eig_rel:
            spec, X, y = self.spec, self._X, self._y
            self._laplace = (min_eig_rel, hyperpost.laplace(
                lambda p: self._mod.loss(spec, p, X, y), self.params,
                min_eig_rel=min_eig_rel))
        return self._laplace[1]

    def hmc(self, n_samples: int = 256, n_chains: int = 4,
            n_warmup: int = 128, seed: int = 0, **hmc_kwargs):
        """Full-MCMC hyperparameter draws (``hyperpost.hmc_sample_params``) —
        the exact check on :meth:`laplace`'s Gaussian (which preconditions
        the sampler). Returns an ``HMCResult``; cached until the params
        change or the sampler settings differ. Beyond-reference."""
        self._need_data()
        from vggp_tpu import hyperpost

        key = (n_samples, n_chains, n_warmup, seed,
               tuple(sorted(hmc_kwargs.items())))
        cached = getattr(self, "_hmc", None)
        if cached is None or cached[0] != key:
            state = self.laplace()
            spec, X, y = self.spec, self._X, self._y
            self._hmc = (key, hyperpost.hmc_sample_params(
                lambda p: self._mod.loss(spec, p, X, y), state,
                jax.random.PRNGKey(seed), n_samples=n_samples,
                n_chains=n_chains, n_warmup=n_warmup, **hmc_kwargs))
        return self._hmc[1]

    def _marginal_draws(self, method: str, n_samples: int, seed: int):
        """Hyperparameter draws for the marginalized heads: n_samples fresh
        Gaussian draws from the Laplace state, or an even thinning of the
        (cached) HMC chain."""
        from vggp_tpu import hyperpost

        if method == "laplace":
            return hyperpost.sample_params(self.laplace(),
                                           jax.random.PRNGKey(seed), n_samples)
        if method == "hmc":
            res = self.hmc(n_samples=max(n_samples, 256), seed=seed)
            total = jax.tree_util.tree_leaves(res.draws)[0].shape[0]
            idx = jnp.linspace(0, total - 1, min(n_samples, total)).astype(jnp.int32)
            return jax.tree_util.tree_map(lambda a: a[idx], res.draws)
        raise ValueError(f"method must be 'laplace' or 'hmc', got {method!r}")

    def predict_marginalized(self, xstar, n_samples: int = 64, seed: int = 0,
                             method: str = "laplace") -> Gaussian:
        """q(f*) with hyperparameter uncertainty: vmap the posterior head
        over hyperparameter draws and moment-match (law of total variance).
        ``method="laplace"`` (default) draws from the Gaussian Laplace
        state; ``method="hmc"`` thins the full-MCMC chain (:meth:`hmc`) —
        exact where the posterior is skewed. Honest intervals on the small
        per-window datasets of nb61 — beyond-reference
        (``hyperpost.predict_marginalized``)."""
        self._need_data()
        from vggp_tpu import hyperpost

        draws = self._marginal_draws(method, n_samples, seed)
        spec, X, y = self.spec, self._X, self._y
        xs = jnp.asarray(xstar)
        return hyperpost.predict_marginalized_draws(
            lambda p: self._mod.posterior(spec, p, X, y, xs, full_cov=False),
            draws)

    def q_v_marginalized(self, grid_axes=None, n_samples: int = 64,
                         seed: int = 0, method: str = "laplace") -> Gaussian:
        """Gridded product q(v) marginalized over the hyperparameter
        posterior (moment-matched mixture of per-draw q_v marginals);
        ``method`` as in :meth:`predict_marginalized`."""
        self._need_data()
        from vggp_tpu import hyperpost

        draws = self._marginal_draws(method, n_samples, seed)
        axes = self._grid_axes(grid_axes)
        spec, X, y = self.spec, self._X, self._y
        return hyperpost.predict_marginalized_draws(
            lambda p: self._mod.q_v(spec, p, X, y, axes, full_cov=False),
            draws)

    # ------------------------------------------------------------------ #
    # Persistence
    # ------------------------------------------------------------------ #

    def save(self, path: str, step: int = 0) -> None:
        """Checkpoint the (constrained) params with orbax; the spec is static
        Python — rebuild it from code and :meth:`restore`."""
        train.save_checkpoint(path, self.params, step=step)

    def restore(self, path: str, step: int = 0) -> "GP":
        self.params = train.load_checkpoint(path, step=step, like=self.params)
        self._params_are_fresh = False  # continued training keeps the restore
        self._jitted.clear()
        self._w = None
        self._laplace = None
        self._hmc = None
        return self

    # ------------------------------------------------------------------ #

    def _grid_axes(self, grid_axes) -> tuple:
        if grid_axes is None:
            feats = getattr(self.spec, "features", None)
            if feats is None:
                comps = getattr(self.spec, "components", None)
                if comps is None:  # free-Z: no per-axis features to default to
                    raise ValueError(
                        "this spec has no per-axis grid features (free "
                        "inducing points); pass grid_axes explicitly")
                feats = comps[0].features  # sum-of-kernels: shared axes
            if not all(isinstance(f, (CellIntegralFeature, OutputFeature))
                       for f in feats):
                raise ValueError("grid_axes is required unless every model axis "
                                 "is a CellIntegralFeature (direct GriddedGP) "
                                 "or the coregion OutputFeature")
            return tuple(feats)
        if isinstance(grid_axes, CellIntegralFeature):
            return (grid_axes,)
        return tuple(grid_axes)

    def _need_data(self) -> None:
        if self._X is None:
            raise ValueError("call .fit(X, y) first (the collapsed/exact "
                             "posterior is a function of the training data)")

    def _get(self, key, build):
        fn = self._jitted.get(key)
        if fn is None:
            fn = self._jitted[key] = build(self.spec)
        return fn


class SVGP:
    """Stateful facade over the uncollapsed minibatch SVGP (``models.svgp``).

    The scalable flagship path the reference lacks: whitened variational
    family (``variational="kron"`` Kronecker-factored covariance scales to
    512²+ inducing grids on one chip), stochastic ``fit`` over minibatches,
    hybrid natural-gradient ``fit_natgrad``, non-Gaussian likelihoods via
    ``spec.likelihood``. Unlike :class:`GP`, the posterior lives entirely in
    the variational parameters, so every prediction head is data-free.
    """

    def __init__(self, spec: msvgp.SVGPSpec, params: Optional[Dict] = None):
        if not isinstance(spec, msvgp.SVGPSpec):
            raise TypeError(f"SVGP facade needs an SVGPSpec, got {type(spec).__name__}")
        self.spec = spec
        self.params = params if params is not None else spec.init_params()
        self._params_are_fresh = params is None
        self.history: Optional[Dict] = None
        self._jitted: Dict = {}
        self._state = None  # warm serving cache (see precompute())

    # ------------------------------------------------------------------ #
    # Factories
    # ------------------------------------------------------------------ #

    @classmethod
    def gridded(cls, n_cells: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
                num_data: int, kinds: Union[str, Sequence[str]] = "matern12",
                variational: Optional[str] = None, likelihood: str = "gaussian",
                ndim: Optional[int] = None, learn_mean: bool = False,
                **spec_kwargs) -> "SVGP":
        """B0 cell-integral inducing grid, minibatch-trainable. ``variational``
        defaults to the Kronecker-factored family for ndim ≥ 2 (the 512²-grid
        configuration of ``bench.py``) and the full family for 1D."""
        ndim = _infer_ndim(n_cells, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        cells = _counts_per_axis(n_cells, ndim, "n_cells")
        feats = tuple(CellIntegralFeature.from_lims(c, float(a), float(b))
                      for c, (a, b) in zip(cells, lims_ax))
        if variational is None:
            variational = "kron" if ndim >= 2 else "full"
        return cls(msvgp.SVGPSpec(kinds=_kinds(kinds, ndim), features=feats,
                                  num_data=int(num_data), variational=variational,
                                  likelihood=likelihood, learn_mean=learn_mean,
                                  **spec_kwargs))

    @classmethod
    def multioutput(cls, n_cells: Union[int, Sequence[int]], lims: Union[Lims, Sequence[Lims]],
                    n_outputs: int, num_data: int,
                    kinds: Union[str, Sequence[str]] = "matern12",
                    ndim: Optional[int] = None, per_output_noise: bool = False,
                    learn_mean: bool = True, variational: str = "kron",
                    **spec_kwargs) -> "SVGP":
        """Multi-output ICM SVGP: continuous cell axes + a coregion axis; the
        output index is the LAST column of X. ``variational`` defaults to the
        Kronecker family; pass ``"full"`` for a natgrad-trainable / streamable
        model. Prefer collapsed :meth:`GP.multioutput` at small n — an
        undertrained Kronecker S is measurably overconfident there
        (CLAUDE.md)."""
        ndim = _infer_ndim(n_cells, lims, kinds, ndim)
        lims_ax = _lims_per_axis(lims, ndim)
        cells = _counts_per_axis(n_cells, ndim, "n_cells")
        feats = tuple(CellIntegralFeature.from_lims(c, float(a), float(b))
                      for c, (a, b) in zip(cells, lims_ax))
        return cls(msvgp.SVGPSpec(
            kinds=_kinds(kinds, ndim) + ("coregion",),
            features=feats + (OutputFeature(n_outputs=int(n_outputs)),),
            num_data=int(num_data), variational=variational,
            per_output_noise=per_output_noise, learn_mean=learn_mean,
            **spec_kwargs))

    # ------------------------------------------------------------------ #
    # Training
    # ------------------------------------------------------------------ #

    def non_informative_initialise(self, X, y, lmbda: float = 1.0, kappa: float = 2.0) -> "SVGP":
        self.params = train.non_informative_init(self.params, jnp.asarray(X), jnp.asarray(y),
                                                 lmbda=lmbda, kappa=kappa)
        self._state = None  # params changed; warm cache is stale
        return self

    def fit(self, X, y, n_iters: int = 1000, batch_size: int = 4096,
            learning_rate: float = 0.01, seed: int = 0,
            initialise: Optional[bool] = None, **fit_kwargs) -> "SVGP":
        """Stochastic ELBO fit: ``train.fit_minibatch`` (uniform minibatches
        drawn inside one jitted ``lax.scan``). Fresh params are
        non-informatively initialised; supplied/restored/trained params are
        kept (pass ``initialise=True/False`` to force)."""
        X, y = jnp.asarray(X), jnp.asarray(y)
        if initialise is None:
            initialise = self._params_are_fresh
        if initialise:
            self.non_informative_initialise(X, y)
        self._params_are_fresh = False
        spec = self.spec
        self.params, self.history = train.fit_minibatch(
            lambda p, xb, yb: msvgp.loss(spec, p, xb, yb),
            self.params, X, y, n_iters, min(int(batch_size), y.shape[0]),
            learning_rate, seed=seed, **fit_kwargs)
        self._jitted.clear()
        self._state = None
        return self

    def fit_natgrad(self, X, y, n_iters: int = 200, gamma: float = 0.5,
                    hyper_lr: float = 0.01, batch_size: Optional[int] = None,
                    seed: int = 0, initialise: Optional[bool] = None) -> "SVGP":
        """Hybrid trainer: natural-gradient steps on q, Adam on the hypers
        (``train.fit_natgrad``; full variational family only)."""
        X, y = jnp.asarray(X), jnp.asarray(y)
        if initialise is None:
            initialise = self._params_are_fresh
        if initialise:
            self.non_informative_initialise(X, y)
        self._params_are_fresh = False
        self.params, self.history = train.fit_natgrad(
            self.spec, self.params, X, y, n_iters, gamma=gamma,
            hyper_lr=hyper_lr, batch_size=batch_size, seed=seed)
        self._jitted.clear()
        self._state = None
        return self

    def elbo(self, X, y) -> float:
        """Full-dataset ELBO at the current params (one jitted evaluation)."""
        fn = self._get("elbo", lambda s: jax.jit(
            lambda p, X, y: msvgp.elbo(s, p, X, y)))
        return float(fn(self.params, jnp.asarray(X), jnp.asarray(y)))

    # ------------------------------------------------------------------ #
    # Prediction heads (data-free: the posterior lives in q)
    # ------------------------------------------------------------------ #

    def precompute(self) -> "SVGP":
        """Build the frozen-param serving cache (``models.svgp.precompute``):
        per-axis Kuu factorizations + the variational Cholesky, computed once.
        Until the params change (``fit``/``restore`` invalidate it), every
        ``predict`` / ``q_v`` / ``q_dv`` / ``posterior_grad`` call rides the
        warm ``*_from_state`` heads — query-size work only."""
        fn = self._get("precompute", lambda s: jax.jit(
            lambda p: msvgp.precompute(s, p)))
        self._state = fn(self.params)
        return self

    def predict(self, xstar, full_cov: bool = False, predictive: bool = False) -> Gaussian:
        if self._state is not None:
            fn = self._get(("predict_warm", full_cov, predictive), lambda s: jax.jit(
                lambda p, st, xs: msvgp.posterior_from_state(
                    s, p, st, xs, full_cov=full_cov, predictive=predictive)))
            return fn(self.params, self._state, jnp.asarray(xstar))
        fn = self._get(("predict", full_cov, predictive), lambda s: jax.jit(
            lambda p, xs: msvgp.posterior(s, p, xs, full_cov=full_cov,
                                          predictive=predictive)))
        return fn(self.params, jnp.asarray(xstar))

    def predict_y(self, xstar):
        """Observable-space prediction under the spec's likelihood (probit
        class probability, Poisson rate, Student-t predictive, …)."""
        fn = self._get("predict_y", lambda s: jax.jit(
            lambda p, xs: msvgp.predict_y(s, p, xs)))
        return fn(self.params, jnp.asarray(xstar))

    def prior(self, xstar) -> Gaussian:
        fn = self._get("prior", lambda s: jax.jit(
            lambda p, xs: msvgp.prior(s, p, xs)))
        return fn(self.params, jnp.asarray(xstar))

    def q_u(self) -> Gaussian:
        fn = self._get("q_u", lambda s: jax.jit(lambda p: msvgp.q_u(s, p)))
        return fn(self.params)

    def p_v_u(self, grid_axes=None) -> Gaussian:
        axes = self._grid_axes(grid_axes)
        fn = self._get(("p_v_u", tuple(map(_feature_key, axes))), lambda s: jax.jit(
            lambda p: msvgp.p_v_u(s, p, axes)))
        return fn(self.params)

    def q_v(self, grid_axes=None, full_cov: bool = False) -> Gaussian:
        """Gridded product q(v) straight from the variational state (the
        serving path; sharded analogue: ``parallel.make_sharded_qv``)."""
        axes = self._grid_axes(grid_axes)
        if self._state is not None:
            fn = self._get(("q_v_warm", tuple(map(_feature_key, axes)), full_cov),
                           lambda s: jax.jit(
                lambda p, st: msvgp.q_v_from_state(s, p, st, axes, full_cov=full_cov)))
            return fn(self.params, self._state)
        fn = self._get(("q_v", tuple(map(_feature_key, axes)), full_cov), lambda s: jax.jit(
            lambda p: msvgp.q_v(s, p, axes, full_cov=full_cov)))
        return fn(self.params)

    def q_dv(self, grid_axes=None, axis: int = 0, full_cov: bool = False) -> Gaussian:
        axes = self._grid_axes(grid_axes)
        if self._state is not None:
            fn = self._get(("q_dv_warm", tuple(map(_feature_key, axes)), axis, full_cov),
                           lambda s: jax.jit(
                lambda p, st: msvgp.q_dv_from_state(s, p, st, axes, axis=axis,
                                                    full_cov=full_cov)))
            return fn(self.params, self._state)
        fn = self._get(("q_dv", tuple(map(_feature_key, axes)), axis, full_cov), lambda s: jax.jit(
            lambda p: msvgp.q_dv(s, p, axes, axis=axis, full_cov=full_cov)))
        return fn(self.params)

    def posterior_grad(self, xstar, axis: int = 0, full_cov: bool = False) -> Gaussian:
        if self._state is not None:
            fn = self._get(("posterior_grad_warm", axis, full_cov), lambda s: jax.jit(
                lambda p, st, xs: msvgp.posterior_grad_from_state(
                    s, p, st, xs, axis=axis, full_cov=full_cov)))
            return fn(self.params, self._state, jnp.asarray(xstar))
        fn = self._get(("posterior_grad", axis, full_cov), lambda s: jax.jit(
            lambda p, xs: msvgp.posterior_grad(s, p, xs, axis=axis, full_cov=full_cov)))
        return fn(self.params, jnp.asarray(xstar))

    def sample(self, key, xstar, n_samples: int = 8, n_features: int = 1024) -> jnp.ndarray:
        return sampling.pathwise(self.spec, self.params, key, jnp.asarray(xstar),
                                 n_samples=n_samples, n_features=n_features)

    def sample_q_v(self, key, grid_axes=None, n_samples: int = 8,
                   n_features: int = 1024) -> jnp.ndarray:
        return sampling.pathwise_q_v(self.spec, self.params, key,
                                     self._grid_axes(grid_axes),
                                     n_samples=n_samples, n_features=n_features)

    # ------------------------------------------------------------------ #

    def streaming(self, dtype=None) -> "Streaming":
        """Open an online-assimilation stream at the current hyperparameters
        (``vggp_tpu.streaming``; full variational family only)."""
        return Streaming(self.spec, self.params, dtype=dtype)

    def save(self, path: str, step: int = 0) -> None:
        train.save_checkpoint(path, self.params, step=step)

    def restore(self, path: str, step: int = 0) -> "SVGP":
        self.params = train.load_checkpoint(path, step=step, like=self.params)
        self._params_are_fresh = False
        self._jitted.clear()
        self._state = None
        return self

    def _grid_axes(self, grid_axes) -> tuple:
        return GP._grid_axes(self, grid_axes)

    def _get(self, key, build):
        fn = self._jitted.get(key)
        if fn is None:
            fn = self._jitted[key] = build(self.spec)
        return fn


class Streaming:
    """Stateful facade over :mod:`vggp_tpu.streaming` — exact online
    assimilation of the whitened SVGP posterior (natural-parameter RLS).

    Hyperparameters are FIXED while assimilating (that is the exactness
    contract); drift is handled by :meth:`reanchor`. Conjugate (Gaussian)
    batches use the closed-form update; non-conjugate specs route through
    the CVI site update automatically. All updates run as one jitted call
    per batch shape.
    """

    def __init__(self, spec: msvgp.SVGPSpec, params: Dict, dtype=None):
        from vggp_tpu import streaming as _streaming

        self._streaming = _streaming
        self.spec = spec
        self.params = params
        dtype = dtype or params["noise"].dtype
        self.state = _streaming.init_state(spec, dtype)
        self._jitted: Dict = {}

    @property
    def n_seen(self) -> float:
        return float(self.state["n_seen"])

    def assimilate(self, X, y, noise=None, gamma: float = 0.5) -> "Streaming":
        """Fold one batch in. Gaussian likelihood → exact closed-form update
        (chunk/order independent); non-conjugate → damped CVI site update."""
        st = self._streaming
        X, y = jnp.asarray(X), jnp.asarray(y)
        if self.spec.likelihood == "gaussian":
            fn = self._get("assim", lambda s: jax.jit(
                lambda p, state, xb, yb, nb: st.assimilate(s, p, state, xb, yb, noise=nb)))
            nb = None if noise is None else jnp.asarray(noise)
            self.state = fn(self.params, self.state, X, y, nb)
        else:
            if noise is not None:
                raise ValueError(
                    "per-point noise is a Gaussian-likelihood concept; the "
                    "CVI site update for a non-conjugate spec takes no noise "
                    "argument (it would be silently ignored)")
            fn = self._get(("assim_cvi", gamma), lambda s: jax.jit(
                lambda p, state, xb, yb: st.assimilate_natgrad(s, p, state, xb, yb,
                                                               gamma=gamma)))
            self.state = fn(self.params, self.state, X, y)
        return self

    def forget(self, rho: float) -> "Streaming":
        """Exponentially discount past data toward the prior (Λ ⪰ I kept)."""
        self.state = self._streaming.forget(self.state, rho)
        return self

    def reanchor(self, params_new: Dict) -> "Streaming":
        """Transfer the stream state to new hyperparameters (online drift:
        refit hypers on a window, reanchor, keep assimilating)."""
        fn = self._get("reanchor", lambda s: jax.jit(
            lambda po, pn, state: self._streaming.reanchor(s, po, pn, state)))
        self.state = fn(self.params, params_new, self.state)
        self.params = params_new
        return self

    def to_svgp(self) -> "SVGP":
        """Materialize the streamed q(w) into SVGP params: every head
        (predict / q_v / sample) then works as if that q had been trained."""
        return SVGP(self.spec, params=self._streaming.to_params(
            self.spec, self.params, self.state))

    # convenience heads (delegate through the materialized params)
    def predict(self, xstar, full_cov: bool = False, predictive: bool = False) -> Gaussian:
        fn = self._get(("predict", full_cov, predictive), lambda s: jax.jit(
            lambda p, state, xs: msvgp.posterior(
                s, self._streaming.to_params(s, p, state), xs,
                full_cov=full_cov, predictive=predictive)))
        return fn(self.params, self.state, jnp.asarray(xstar))

    def q_v(self, grid_axes, full_cov: bool = False) -> Gaussian:
        axes = (grid_axes,) if isinstance(grid_axes, CellIntegralFeature) else tuple(grid_axes)
        fn = self._get(("q_v", tuple(map(_feature_key, axes)), full_cov), lambda s: jax.jit(
            lambda p, state: msvgp.q_v(
                s, self._streaming.to_params(s, p, state), axes, full_cov=full_cov)))
        return fn(self.params, self.state)

    def _get(self, key, build):
        fn = self._jitted.get(key)
        if fn is None:
            fn = self._jitted[key] = build(self.spec)
        return fn
