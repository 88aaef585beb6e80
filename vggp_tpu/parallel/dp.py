"""Sharded SVGP training steps (pjit / GSPMD).

The ELBO is a sum over data points, so sharding the minibatch over the
``data`` axis and keeping parameters replicated makes XLA emit a psum over
per-shard gradient contributions — classic DP with zero custom collectives.
The Kronecker variational state additionally admits tensor-model parallelism
over BOTH grid axes: μ (m₁, m₂) → P('model1', 'model2'),
raw_L₁ (m₁, m₁) → P('model1', None), raw_L₂ (m₂, m₂) → P('model2', None);
the per-axis matmuls become collective matmuls planned by the GSPMD
partitioner over ICI. A legacy single 'model' axis shards only the second
grid axis.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vggp_tpu import train as vtrain
from vggp_tpu.models import svgp


def _param_pspec(spec, params: Dict, model_axes: Tuple[Optional[str], ...]) -> Dict:
    """PartitionSpecs for the raw parameter pytree.

    ``model_axes`` has one (possibly None) mesh-axis name per Kronecker grid
    axis: μ (m₁, …, m_d) is sharded over all of them, each raw_L_i over its
    own.
    """

    def replicated(tree):
        return jax.tree.map(lambda _: P(), tree)

    pspec = replicated(params)
    if spec.variational == "kron" and any(a is not None for a in model_axes):
        q = dict(pspec["q"])
        q["mu"] = P(*model_axes)
        for i, a in enumerate(model_axes):
            if a is not None:
                q[f"raw_L{i + 1}"] = P(a, None)
        pspec = dict(pspec)
        pspec["q"] = q
    return pspec


def shard_params(params: Dict, mesh: Mesh, pspec_tree: Dict) -> Dict:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        pspec_tree,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )


def shard_batch(xb: jnp.ndarray, yb: jnp.ndarray, mesh: Mesh, data_axis: str = "data"):
    xs = NamedSharding(mesh, P(data_axis) if xb.ndim == 1 else P(data_axis, None))
    ys = NamedSharding(mesh, P(data_axis))
    return jax.device_put(xb, xs), jax.device_put(yb, ys)


def make_sharded_svgp_step(
    spec: svgp.SVGPSpec,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str | None = "model",
    model_axes: Optional[Sequence[Optional[str]]] = None,
):
    """Build (init_fn, step_fn) for a GSPMD-sharded SVGP training step.

    ``step_fn(raw_params, opt_state, xb, yb) -> (raw_params, opt_state, loss)``
    is jit-compiled with explicit output shardings; the batch must be sharded
    over ``data_axis`` (see :func:`shard_batch`).

    ``model_axes`` names one mesh axis per Kronecker grid axis (entries may
    be None; shorter tuples are right-padded with None). The legacy
    ``model_axis`` shards the second axis only and is ignored when
    ``model_axes`` is given. A named axis is dropped (state replicated — DP
    still applies) when it is absent from the mesh, has size 1, or does not
    divide the corresponding inducing-grid size (GSPMD divisibility).
    """
    ndim = spec.ndim
    if model_axes is None:
        model_axes = (None, model_axis) if ndim >= 2 else (None,)
    axes = list(model_axes)[:ndim]
    axes += [None] * (ndim - len(axes))
    for i in range(ndim):
        a = axes[i]
        if a is None:
            continue
        if a not in mesh.axis_names or mesh.shape.get(a, 1) == 1:
            axes[i] = None
        elif spec.variational == "kron" and spec.axis_m[i] % mesh.shape[a] != 0:
            axes[i] = None
    model_axes = tuple(axes)

    def raw_loss(raw, xb, yb):
        return svgp.loss(spec, vtrain.constrain(raw), xb, yb)

    def init_fn(params: Dict):
        raw = vtrain.unconstrain(params)
        pspec = _param_pspec(spec, raw, model_axes)
        raw = shard_params(raw, mesh, pspec)
        opt_state = optimizer.init(raw)
        return raw, opt_state

    @jax.jit
    def step_fn(raw, opt_state, xb, yb):
        val, grads = jax.value_and_grad(raw_loss)(raw, xb, yb)
        raw, opt_state = vtrain.guarded_update(optimizer, raw, opt_state, val, grads)
        return raw, opt_state, val

    return init_fn, step_fn


def make_sharded_qv(
    spec: svgp.SVGPSpec,
    mesh: Mesh,
    grid_axes,
    full_cov: bool = False,
):
    """Jitted gridded-prediction head over the sharded variational state.

    ``fn(raw_params) -> Gaussian`` consumes the raw parameter pytree exactly
    as :func:`make_sharded_svgp_step` leaves it (μ / raw_L_i model-sharded);
    the per-axis whitens become GSPMD collective matmuls and the (small)
    grid posterior is returned replicated, so training and serving share one
    placement — no host gather of the inducing state in between.
    """
    rep = NamedSharding(mesh, P())

    @jax.jit
    def qv_fn(raw):
        q = svgp.q_v(spec, vtrain.constrain(raw), grid_axes, full_cov=full_cov)
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, rep), q)

    return qv_fn


def make_sharded_assimilate(
    spec: svgp.SVGPSpec,
    params: Dict,
    mesh: Mesh,
    data_axis: str = "data",
    heteroscedastic: bool = False,
):
    """Jitted data-parallel streaming assimilation over ``mesh``.

    The stream update (``vggp_tpu.streaming``) is a sum over data points —
    Λ += A D⁻¹ Aᵀ, η += A D⁻¹ y — so sharding the pass over ``data_axis``
    while the (m, m) state stays replicated makes the GSPMD partitioner emit
    exactly one psum of per-shard outer products over ICI: each chip whitens
    its own track segments, the pod reduces. Returned
    ``fn(state, xb, yb[, noise]) -> state`` expects ``shard_batch``-placed
    inputs; hyperparameters are closed over (they define the whitening and
    must be identical across the stream).
    """
    from vggp_tpu import streaming

    rep = NamedSharding(mesh, P())
    state_sh = {"lam": rep, "eta": rep, "n_seen": rep}
    # Pin the batch inputs to data_axis so the partitioner splits the
    # whitening over chips even if the caller passed unplaced arrays.
    batch_sh = (NamedSharding(mesh, P(data_axis))
                if data_axis in mesh.axis_names else rep)

    if heteroscedastic:
        @jax.jit
        def fn(state, xb, yb, noise):
            xb = jax.lax.with_sharding_constraint(xb, batch_sh)
            yb = jax.lax.with_sharding_constraint(yb, batch_sh)
            noise = jax.lax.with_sharding_constraint(noise, batch_sh)
            out = streaming.assimilate(spec, params, state, xb, yb, noise=noise)
            return jax.lax.with_sharding_constraint(out, state_sh)
    else:
        @jax.jit
        def fn(state, xb, yb):
            xb = jax.lax.with_sharding_constraint(xb, batch_sh)
            yb = jax.lax.with_sharding_constraint(yb, batch_sh)
            out = streaming.assimilate(spec, params, state, xb, yb)
            return jax.lax.with_sharding_constraint(out, state_sh)
    return fn
