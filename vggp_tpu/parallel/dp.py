"""Sharded SVGP training steps (pjit / GSPMD).

The ELBO is a sum over data points, so sharding the minibatch over the
``data`` axis and keeping parameters replicated makes XLA emit a psum over
per-shard gradient contributions — classic DP with zero custom collectives.
With ``model`` > 1 the Kronecker variational state is sharded along its
second axis: μ (m₁, m₂) → P(None, 'model'), raw_L₂ (m₂, m₂) →
P('model', None); the per-axis matmuls become collective matmuls planned by
the GSPMD partitioner over ICI.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vggp_tpu import train as vtrain
from vggp_tpu.models import svgp


def _param_pspec(spec, params: Dict, model_axis: str | None) -> Dict:
    """PartitionSpecs for the raw parameter pytree."""

    def replicated(tree):
        return jax.tree.map(lambda _: P(), tree)

    pspec = replicated(params)
    if model_axis is not None and spec.variational == "kron":
        q = dict(pspec["q"])
        q["mu"] = P(None, model_axis)
        q["raw_L2"] = P(model_axis, None)
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
):
    """Build (init_fn, step_fn) for a GSPMD-sharded SVGP training step.

    ``step_fn(raw_params, opt_state, xb, yb) -> (raw_params, opt_state, loss)``
    is jit-compiled with explicit output shardings; the batch must be sharded
    over ``data_axis`` (see :func:`shard_batch`).
    """
    if model_axis is not None and model_axis not in mesh.axis_names:
        model_axis = None
    if model_axis is not None and mesh.shape.get(model_axis, 1) == 1:
        model_axis = None
    if (
        model_axis is not None
        and spec.variational == "kron"
        and spec.axis_m[1] % mesh.shape[model_axis] != 0
    ):
        # GSPMD needs the sharded dim divisible by the axis size; fall back
        # to replicating the variational state (DP still applies).
        model_axis = None

    def raw_loss(raw, xb, yb):
        return svgp.loss(spec, vtrain.constrain(raw), xb, yb)

    def init_fn(params: Dict):
        raw = vtrain.unconstrain(params)
        pspec = _param_pspec(spec, raw, model_axis)
        raw = shard_params(raw, mesh, pspec)
        opt_state = optimizer.init(raw)
        return raw, opt_state

    @jax.jit
    def step_fn(raw, opt_state, xb, yb):
        val, grads = jax.value_and_grad(raw_loss)(raw, xb, yb)
        raw, opt_state = vtrain.guarded_update(optimizer, raw, opt_state, val, grads)
        return raw, opt_state, val

    return init_fn, step_fn
