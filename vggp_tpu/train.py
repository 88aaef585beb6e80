"""Training loops, parameter transforms, init heuristics, checkpointing.

Replaces the reference's hand-rolled notebook Adam loops (e.g. nb61 cell 35:
``for i in range(N_ITER): loss = -model._elbo(); loss.backward(); step()``)
with a single jit-compiled ``lax.scan`` over optimizer steps — one XLA
program for the whole fit, no per-step Python dispatch.

Positivity constraints (variance, lengthscale, noise) use a softplus
bijector; models always see constrained values. History dicts mirror the
reference's per-iteration records ``{elbo, scale_sigma_i, lengthscale_i,
noise}`` (nb61 cells 28/35/42).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

POSITIVE_KEYS = ("variance", "lengthscale", "noise", "kappa")

# Positivity floors added under the softplus bijector. The noise floor is
# load-bearing on TPU float32: without it the collapsed ELBO's cancellation
# error (~ε·‖y‖²/σ²) becomes a spurious reward as σ²→0 and Adam drives the
# likelihood noise to 1e-17 (observed on v5e). 1e-6 matches GPflow's default
# positive_minimum; data is assumed roughly unit-scaled (the experiment
# pipelines min-max/z-scale, as the reference's notebooks do).
FLOORS = {"noise": 1e-6, "variance": 1e-8, "lengthscale": 1e-8, "kappa": 1e-8}


# --------------------------------------------------------------------------- #
# softplus bijector for positive hyperparameters
# --------------------------------------------------------------------------- #

def softplus(x):
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y):
    # log(e^y - 1), stable for large y
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def _map_positive(tree, fn):
    """Apply ``fn(key, value)`` to values stored under POSITIVE_KEYS anywhere
    in a nested dict/tuple/list structure; leave everything else untouched."""
    if isinstance(tree, dict):
        return {
            k: (fn(k, v) if k in POSITIVE_KEYS else _map_positive(v, fn))
            for k, v in tree.items()
        }
    if isinstance(tree, (tuple, list)):
        t = type(tree)
        return t(_map_positive(v, fn) for v in tree)
    return tree


def unconstrain(params: Dict) -> Dict:
    """Constrained → unconstrained (softplus⁻¹ on positive leaves, floored)."""
    return _map_positive(
        params,
        lambda k, v: inv_softplus(jnp.maximum(v - FLOORS[k], 1e-10)),
    )


def constrain(raw_params: Dict) -> Dict:
    """Unconstrained → constrained (floor + softplus on positive leaves)."""
    return _map_positive(raw_params, lambda k, v: FLOORS[k] + softplus(v))


# --------------------------------------------------------------------------- #
# init heuristics (reference univariate_structure.py:45-87,
# kronecker_structure.py:34-88 semantics)
# --------------------------------------------------------------------------- #

def non_informative_init(params: Dict, X: jnp.ndarray, y: jnp.ndarray,
                         lmbda: float = 1.0, kappa: float = 2.0) -> Dict:
    """variance ← var(y); noise ← variance/κ²; lengthscale_i ← std(x_i)/λ."""
    if X.ndim == 1:
        X = X[:, None]
    y = jnp.reshape(y, (-1,))
    yvar = jnp.var(y)
    if "components" in params:  # sum-of-kernels: init every component's axes
        out = dict(params)
        out["components"] = tuple(
            {**cp, "axes": non_informative_init(
                {"axes": cp["axes"], "noise": params["noise"]},
                X, y, lmbda=lmbda, kappa=kappa)["axes"]}
            for cp in params["components"])
        out["noise"] = jnp.broadcast_to(
            (yvar / (kappa**2)).astype(params["noise"].dtype),
            params["noise"].shape)
        if "mean" in params:
            out["mean"] = jnp.broadcast_to(
                jnp.mean(y).astype(params["mean"].dtype), params["mean"].shape)
        return out
    axes = []
    for i, p in enumerate(params["axes"]):
        q = dict(p)
        # a discrete coregion axis has no (variance, lengthscale); its
        # B-matrix params keep their feature-owned init
        if "variance" in q:
            q["variance"] = yvar.astype(p["variance"].dtype)
        if "lengthscale" in q:
            q["lengthscale"] = (jnp.std(X[:, i]) / lmbda).astype(p["lengthscale"].dtype)
        axes.append(q)
    out = dict(params)
    out["axes"] = tuple(axes)
    out["noise"] = jnp.broadcast_to(  # keep a per-output noise vector's shape
        (yvar / (kappa**2)).astype(params["noise"].dtype), params["noise"].shape)
    if "mean" in params:  # learnable constant mean starts at the sample mean
        out["mean"] = jnp.broadcast_to(
            jnp.mean(y).astype(params["mean"].dtype), params["mean"].shape)
    return out


def informative_init(params: Dict, X: jnp.ndarray, y: jnp.ndarray,
                     prior_amplitude: float, lmbda: float = 1.0) -> Dict:
    """variance ← (amplitude/2)²; noise ← var(y) − variance; ls_i ← std(x_i)/λ."""
    if X.ndim == 1:
        X = X[:, None]
    y = jnp.reshape(y, (-1,))
    var = jnp.asarray((prior_amplitude / 2.0) ** 2)
    axes = []
    for i, p in enumerate(params["axes"]):
        q = dict(p)
        if "variance" in q:
            q["variance"] = var.astype(p["variance"].dtype)
        if "lengthscale" in q:
            q["lengthscale"] = (jnp.std(X[:, i]) / lmbda).astype(p["lengthscale"].dtype)
        axes.append(q)
    out = dict(params)
    out["axes"] = tuple(axes)
    out["noise"] = jnp.broadcast_to(jnp.maximum(
        jnp.var(y) - var, 1e-6 * jnp.var(y)).astype(params["noise"].dtype),
        params["noise"].shape)
    return out


# --------------------------------------------------------------------------- #
# fit loops
# --------------------------------------------------------------------------- #

def guarded_update(opt, raw, opt_state, val, grads):
    """Apply an optimizer update only when loss and grads are all finite.

    The NaN/PSD guard SURVEY.md §5 calls for: a non-finite step (e.g. a
    transiently ill-conditioned Kuu during hyperparameter optimization) is
    skipped instead of poisoning the parameters for every later iteration.
    Branch-free (jnp.where) so it jits inside lax.scan.
    """
    finite = jax.tree.reduce(
        lambda a, leaf: a & jnp.all(jnp.isfinite(leaf)), grads, jnp.isfinite(val)
    )
    updates, new_state = opt.update(grads, opt_state, raw)
    new_raw = optax.apply_updates(raw, updates)
    sel = lambda n, o: jnp.where(finite, n, o)
    return jax.tree.map(sel, new_raw, raw), jax.tree.map(sel, new_state, opt_state)


def _history_entry(params: Dict, loss_val) -> Dict:
    h = {"loss": loss_val, "elbo": -loss_val, "noise": params["noise"]}
    if "axes" not in params:  # component-structured params (models.sum):
        return h              # per-iteration hyper traces stay model-side
    for i, p in enumerate(params["axes"]):
        if "variance" in p:  # a coregion axis records its B diagonal instead
            h[f"scale_sigma_{i + 1}"] = p["variance"]
            h[f"lengthscale_{i + 1}"] = p["lengthscale"]
        else:
            from vggp_tpu import kernels

            h[f"coregion_bdiag_{i + 1}"] = kernels.coregion_b_diag(p)
    return h


def fit(
    loss_fn: Callable[[Dict], jnp.ndarray],
    params: Dict,
    n_iters: int,
    learning_rate: float = 0.1,
    optimizer: Optional[optax.GradientTransformation] = None,
    trainable: Optional[Callable[[Dict], Dict]] = None,
) -> Tuple[Dict, Dict]:
    """Full-batch fit: jitted lax.scan over Adam steps.

    ``loss_fn(params)`` takes *constrained* params. Returns (final constrained
    params, history dict of per-iteration arrays).

    ``trainable(params) -> pytree of bools`` (same structure as ``params``)
    freezes the False leaves: their gradients are zeroed before the
    optimizer update, so they keep their initial values exactly (e.g. fix
    per-band lengthscales in a multi-scale ``models.sum`` fit, where free
    lengthscales make the scale attribution unidentifiable).
    """
    opt = optimizer or optax.adam(learning_rate)
    raw = unconstrain(params)
    opt_state = opt.init(raw)
    mask = None
    if trainable is not None:
        mask = jax.tree.map(lambda b: jnp.asarray(b, bool), trainable(params))

    def raw_loss(raw_p):
        return loss_fn(constrain(raw_p))

    @jax.jit
    def run(raw, opt_state):
        def step(carry, _):
            raw, opt_state = carry
            val, grads = jax.value_and_grad(raw_loss)(raw)
            if mask is not None:
                grads = jax.tree.map(
                    lambda g, m: jnp.where(m, g, jnp.zeros_like(g)),
                    grads, mask)
            raw, opt_state = guarded_update(opt, raw, opt_state, val, grads)
            return (raw, opt_state), _history_entry(constrain(raw), val)

        (raw, opt_state), hist = jax.lax.scan(step, (raw, opt_state), None, length=n_iters)
        return raw, opt_state, hist

    raw, opt_state, hist = run(raw, opt_state)
    return constrain(raw), jax.tree.map(jnp.asarray, hist)


def fit_minibatch(
    loss_fn: Callable[[Dict, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params: Dict,
    X: jnp.ndarray,
    y: jnp.ndarray,
    n_iters: int,
    batch_size: int,
    learning_rate: float = 0.01,
    seed: int = 0,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> Tuple[Dict, Dict]:
    """Stochastic fit: each step draws a uniform minibatch (with replacement)
    inside the jitted scan — the scalable SVGP path the reference lacks."""
    opt = optimizer or optax.adam(learning_rate)
    raw = unconstrain(params)
    opt_state = opt.init(raw)
    y = jnp.reshape(y, (-1,))
    n = y.shape[0]
    key = jax.random.PRNGKey(seed)

    def raw_loss(raw_p, xb, yb):
        return loss_fn(constrain(raw_p), xb, yb)

    @jax.jit
    def run(raw, opt_state, key):
        def step(carry, _):
            raw, opt_state, key = carry
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (batch_size,), 0, n)
            xb = X[idx]
            yb = y[idx]
            val, grads = jax.value_and_grad(raw_loss)(raw, xb, yb)
            raw, opt_state = guarded_update(opt, raw, opt_state, val, grads)
            return (raw, opt_state, key), _history_entry(constrain(raw), val)

        (raw, opt_state, key), hist = jax.lax.scan(step, (raw, opt_state, key), None, length=n_iters)
        return raw, opt_state, hist

    raw, opt_state, hist = run(raw, opt_state, key)
    return constrain(raw), jax.tree.map(jnp.asarray, hist)


def make_step_fn(loss_fn, optimizer: optax.GradientTransformation):
    """Return a jitted single train step over raw params — building block for
    custom loops, benchmarking, and the multi-chip path."""

    def raw_loss(raw_p, *args):
        return loss_fn(constrain(raw_p), *args)

    @jax.jit
    def step(raw, opt_state, *args):
        val, grads = jax.value_and_grad(raw_loss)(raw, *args)
        raw, opt_state = guarded_update(optimizer, raw, opt_state, val, grads)
        return raw, opt_state, val

    return step


# --------------------------------------------------------------------------- #
# multi-start fitting (vmapped restarts) and L-BFGS
# --------------------------------------------------------------------------- #

def init_restarts(params: Dict, key, n_restarts: int,
                  spread: float = 0.5) -> Dict:
    """Batch a base init into ``n_restarts`` starts along a new leading axis.

    Restart 0 is the base init verbatim; restarts 1.. multiply every positive
    hyperparameter (``POSITIVE_KEYS`` leaves) by an independent
    ``exp(spread · N(0, 1))`` log-normal factor. Non-positive leaves
    (variational params, inducing locations) are tiled unchanged. Feed the
    result to :func:`fit_restarts`.
    """
    import itertools

    tiled = jax.tree.map(
        lambda v: jnp.broadcast_to(jnp.asarray(v), (n_restarts,) + jnp.shape(v)),
        params,
    )
    counter = itertools.count()

    def jitter(_k, v):
        sub = jax.random.fold_in(key, next(counter))
        factor = jnp.exp(
            spread * jax.random.normal(sub, v.shape, dtype=jnp.result_type(v))
        )
        return v * factor.at[0].set(1.0)

    return _map_positive(tiled, jitter)


def fit_restarts(
    loss_fn: Callable[[Dict], jnp.ndarray],
    params_batch: Dict,
    n_iters: int,
    learning_rate: float = 0.1,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> Tuple[Dict, Dict]:
    """Multi-start fit: the whole scanned Adam loop of :func:`fit`, vmapped
    over a leading restart axis — R restarts run as ONE jitted XLA program
    (batched (R, m, …) matmuls on the MXU instead of R sequential fits).

    GP hyperparameter surfaces are multimodal (short-lengthscale/high-noise
    vs long-lengthscale/low-noise basins); the reference fits one
    hand-picked init per model (nb61 cell 24 constants). ``params_batch``
    comes from :func:`init_restarts` (or any pytree with a leading restart
    axis on every leaf). Returns ``(best_params, hist)`` where ``best_params``
    is the restart with the lowest final loss (non-finite → +inf) and
    ``hist`` arrays are (R, n_iters) with ``hist["best"]`` the winning index.
    """
    opt = optimizer or optax.adam(learning_rate)
    raw_b = unconstrain(params_batch)

    def one(raw):
        opt_state = opt.init(raw)

        def step(carry, _):
            raw, opt_state = carry
            val, grads = jax.value_and_grad(lambda r: loss_fn(constrain(r)))(raw)
            raw, opt_state = guarded_update(opt, raw, opt_state, val, grads)
            return (raw, opt_state), _history_entry(constrain(raw), val)

        (raw, _), hist = jax.lax.scan(step, (raw, opt_state), None, length=n_iters)
        return raw, hist

    raw_b, hist = jax.jit(jax.vmap(one))(raw_b)
    final = jnp.asarray(hist["loss"])[:, -1]
    best = int(jnp.argmin(jnp.where(jnp.isfinite(final), final, jnp.inf)))
    best_params = jax.tree.map(lambda v: v[best], constrain(raw_b))
    hist = {k: jnp.asarray(v) for k, v in hist.items()}
    hist["best"] = best
    return best_params, hist


def fit_lbfgs(
    loss_fn: Callable[[Dict], jnp.ndarray],
    params: Dict,
    n_iters: int = 100,
    memory_size: int = 10,
) -> Tuple[Dict, Dict]:
    """Full-batch fit with L-BFGS + zoom linesearch (optax.lbfgs), scanned
    and jitted like :func:`fit`.

    For smooth full-batch objectives (exact MLL, collapsed SGPR ELBO) the
    curvature-aware step typically converges in tens of iterations where
    Adam needs the reference's 1000 (nb61 cell 24) — each iteration costs a
    few extra loss evaluations inside the linesearch. Not for minibatched
    losses (use :func:`fit_minibatch`). Returns (params, history); the
    history may flatline once the linesearch detects convergence.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    raw0 = unconstrain(params)

    def raw_loss(raw_p):
        return loss_fn(constrain(raw_p))

    value_and_grad = optax.value_and_grad_from_state(raw_loss)

    @jax.jit
    def run(raw, opt_state):
        def step(carry, _):
            raw, opt_state = carry
            val, grads = value_and_grad(raw, state=opt_state)
            updates, new_state = opt.update(
                grads, opt_state, raw, value=val, grad=grads, value_fn=raw_loss
            )
            new_raw = optax.apply_updates(raw, updates)
            # NaN guard (same contract as guarded_update): keep a step only
            # when the proposed iterate is finite everywhere.
            finite = jax.tree.reduce(
                lambda a, leaf: a & jnp.all(jnp.isfinite(leaf)),
                new_raw,
                jnp.asarray(True),
            )
            sel = lambda n, o: jnp.where(finite, n, o)
            raw = jax.tree.map(sel, new_raw, raw)
            opt_state = jax.tree.map(sel, new_state, opt_state)
            return (raw, opt_state), _history_entry(constrain(raw), val)

        (raw, opt_state), hist = jax.lax.scan(
            step, (raw, opt_state), None, length=n_iters
        )
        return raw, hist

    raw, hist = run(raw0, opt.init(raw0))
    return constrain(raw), jax.tree.map(jnp.asarray, hist)


def fit_natgrad(
    spec,
    params: Dict,
    X: jnp.ndarray,
    y: jnp.ndarray,
    n_iters: int,
    gamma: float = 0.5,
    hyper_lr: float = 0.01,
    batch_size: Optional[int] = None,
    seed: int = 0,
) -> Tuple[Dict, Dict]:
    """Hybrid trainer for the full-family whitened SVGP: natural-gradient
    steps on the variational parameters, Adam on the hyperparameters.

    Natural params of q(w)=N(μ, S): θ₁ = S⁻¹μ, θ₂ = −½S⁻¹; expectation
    params ξ₁ = μ, ξ₂ = S + μμᵀ. The natural-gradient step is
    θ ← θ − γ · dL/dξ with dL/dξ₁ = ∇_μL − 2(∇_S L)μ, dL/dξ₂ = ∇_S L
    (Hensman/Salimbeni recipe). For a Gaussian likelihood and full batch,
    γ = 1 jumps to the optimal q(u) in a single step — the collapsed-SGPR
    bound — so convergence is limited only by the hyperparameters. The
    recipe is likelihood-agnostic: non-conjugate observation models
    (probit / Poisson / Student-t via :mod:`vggp_tpu.likelihoods`) work
    with γ < 1 (≈ 0.1–0.5 — Salimbeni et al. 2018), where natural-gradient
    variational steps converge in tens of iterations vs thousands for Adam
    on the same q. The reference's Adam-on-everything loops (nb61 cell 35)
    have no analogue.

    A guarded update skips steps that would make −2θ₂ non-PD or non-finite.
    """
    from vggp_tpu.models import svgp as _svgp

    if getattr(spec, "variational", "full") != "full":
        raise ValueError(
            "fit_natgrad requires the full variational family (the Kronecker-"
            "factored covariance is not an exponential family, so the natural-"
            "gradient step has no closed form); use train.fit_minibatch for "
            "variational='kron'"
        )
    opt = optax.adam(hyper_lr)
    y = jnp.reshape(y, (-1,))
    n = y.shape[0]
    m = spec.num_inducing
    dtype = params["noise"].dtype

    q0 = params["q"]
    S0 = (lambda L: L @ L.T)(_svgp.chol_from_raw(q0["raw_L"]))
    hyp = {k: v for k, v in params.items() if k != "q"}
    raw = unconstrain(hyp)
    opt_state = opt.init(raw)
    theta1 = jnp.linalg.solve(S0, q0["mu"])
    theta2 = -0.5 * jnp.linalg.inv(S0)
    key = jax.random.PRNGKey(seed)

    def neg_elbo(raw_h, mu, S, xb, yb):
        p = dict(constrain(raw_h))
        p["q"] = None  # unused by elbo_muS
        return -_svgp.elbo_muS(spec, p, mu, S, xb, yb)

    @jax.jit
    def run(raw, opt_state, theta1, theta2, key):
        def step(carry, _):
            raw, opt_state, th1, th2, key = carry
            # recover (μ, S) from natural params
            Sinv = -2.0 * th2
            Ls_inv = jnp.linalg.cholesky(0.5 * (Sinv + Sinv.T))
            S = jax.scipy.linalg.cho_solve((Ls_inv, True), jnp.eye(m, dtype=dtype))
            S = 0.5 * (S + S.T)
            mu = S @ th1
            if batch_size is None:
                xb, yb = X, y
            else:
                key, sub = jax.random.split(key)
                idx = jax.random.randint(sub, (batch_size,), 0, n)
                xb, yb = X[idx], y[idx]
            val, (g_h, g_mu, g_S) = jax.value_and_grad(neg_elbo, argnums=(0, 1, 2))(
                raw, mu, S, xb, yb
            )
            g_S = 0.5 * (g_S + g_S.T)
            dxi1 = g_mu - 2.0 * (g_S @ mu)
            new_th1 = th1 - gamma * dxi1
            new_th2 = th2 - gamma * g_S
            # guard: keep the step only if finite and -2θ₂ stays PD
            probe = jnp.linalg.cholesky(-2.0 * 0.5 * (new_th2 + new_th2.T))
            ok = (
                jnp.isfinite(val)
                & jnp.all(jnp.isfinite(new_th1))
                & jnp.all(jnp.isfinite(probe))
            )
            th1 = jnp.where(ok, new_th1, th1)
            th2 = jnp.where(ok, new_th2, th2)
            raw, opt_state = guarded_update(opt, raw, opt_state, val, g_h)
            return (raw, opt_state, th1, th2, key), val

        (raw, opt_state, th1, th2, key), losses = jax.lax.scan(
            step, (raw, opt_state, theta1, theta2, key), None, length=n_iters
        )
        # final (μ, raw_L) back in the standard parameterization
        Sinv = -2.0 * th2
        Ls_inv = jnp.linalg.cholesky(0.5 * (Sinv + Sinv.T))
        S = jax.scipy.linalg.cho_solve((Ls_inv, True), jnp.eye(m, dtype=dtype))
        S = 0.5 * (S + S.T)
        mu = S @ th1
        return raw, S, mu, losses

    raw, S, mu, losses = run(raw, opt_state, theta1, theta2, key)
    out = constrain(raw)
    from vggp_tpu.models.svgp import raw_from_chol
    from vggp_tpu.ops import safe_cholesky

    out["q"] = {"mu": mu, "raw_L": raw_from_chol(safe_cholesky(S, 1e-10))}
    return out, {"loss": losses, "elbo": -losses}


# --------------------------------------------------------------------------- #
# checkpointing (orbax) and metrics logging
# --------------------------------------------------------------------------- #

def save_checkpoint(path: str, params: Dict, step: int = 0) -> None:
    """Save a param pytree with orbax (reference has no checkpointing —
    SURVEY.md §5)."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, str(step)), params, force=True)


def load_checkpoint(path: str, step: int = 0, like: Optional[Dict] = None) -> Dict:
    """Restore a param pytree. ``like`` (a same-structure pytree, e.g.
    ``spec.init_params()``) restores the exact container types — without it
    orbax returns lists where the live params had tuples."""
    import orbax.checkpoint as ocp
    import os

    ckptr = ocp.PyTreeCheckpointer()
    target = os.path.join(os.path.abspath(path), str(step))
    # Fall back to the legacy item= API only when the modern API-SHAPE itself
    # is unavailable — a genuine restore failure (e.g. pytree-structure
    # mismatch against ``like``) must surface as-is, not be retried and
    # masked behind an unrelated "unexpected keyword 'item'" error.
    try:
        restore_args = ocp.args.PyTreeRestore(item=like)
    except AttributeError:  # pragma: no cover - orbax < 0.5: no ocp.args
        return ckptr.restore(target, item=like)
    try:
        return ckptr.restore(target, args=restore_args)
    except TypeError as e:  # pragma: no cover - old orbax restore signature
        if "args" not in str(e):
            raise
        return ckptr.restore(target, item=like)


class MetricsLogger:
    """Minimal structured metrics logger (jsonl) with optional profiler hooks."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records = []

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step)}
        for k, v in metrics.items():
            rec[k] = float(v)
        self.records.append(rec)
        if self.path:
            import json

            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")


def profile_trace(log_dir: str):
    """Context manager emitting a jax.profiler trace (SURVEY.md §5 tracing)."""
    return jax.profiler.trace(log_dir)
