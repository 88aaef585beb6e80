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
from vggp_tpu.models import additive, exact, sgpr, svgp as msvgp
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
        return self

    # ------------------------------------------------------------------ #

    def _grid_axes(self, grid_axes) -> tuple:
        if grid_axes is None:
            feats = getattr(self.spec, "features", None)
            if feats is None:  # sum-of-kernels: components share the axes
                feats = self.spec.components[0].features
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
        return self

    def elbo(self, X, y) -> float:
        """Full-dataset ELBO at the current params (one jitted evaluation)."""
        fn = self._get("elbo", lambda s: jax.jit(
            lambda p, X, y: msvgp.elbo(s, p, X, y)))
        return float(fn(self.params, jnp.asarray(X), jnp.asarray(y)))

    # ------------------------------------------------------------------ #
    # Prediction heads (data-free: the posterior lives in q)
    # ------------------------------------------------------------------ #

    def predict(self, xstar, full_cov: bool = False, predictive: bool = False) -> Gaussian:
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
        fn = self._get(("q_v", tuple(map(_feature_key, axes)), full_cov), lambda s: jax.jit(
            lambda p: msvgp.q_v(s, p, axes, full_cov=full_cov)))
        return fn(self.params)

    def q_dv(self, grid_axes=None, axis: int = 0, full_cov: bool = False) -> Gaussian:
        axes = self._grid_axes(grid_axes)
        fn = self._get(("q_dv", tuple(map(_feature_key, axes)), axis, full_cov), lambda s: jax.jit(
            lambda p: msvgp.q_dv(s, p, axes, axis=axis, full_cov=full_cov)))
        return fn(self.params)

    def posterior_grad(self, xstar, axis: int = 0, full_cov: bool = False) -> Gaussian:
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
