"""Sharded matrix-free CG heads (GSPMD over a device mesh).

The matrix-free path (``models.iterative``) is the only one that reaches
m ≈ 10⁶ inducing cells, and both of its hot contractions are data sums:

    b      = Kuf y            — einsum over the n axis,
    G @ w  = σ²Kuu w + Kuf (Kufᵀ w)   — the KufKufᵀ term sums over n.

So the natural multi-chip decomposition shards the DATA axis: each chip
builds the per-axis (m_i, n/p) Kuf blocks for its own slice of X, the
w-tensor (4 MB f32 even at m = 10⁶ — cheap to replicate) stays replicated,
and the GSPMD partitioner turns every contraction over n into a per-shard
partial sum + one psum over ICI. No custom collectives: the functions below
only place inputs/outputs with ``with_sharding_constraint`` and let XLA
plan the rest (the scaling-book recipe), exactly like
:func:`vggp_tpu.parallel.dp.make_sharded_svgp_step` does for the dense
ELBO step. The structured Kuu matvecs (FFT circulant / banded / tridiag
preconditioners) are per-axis local ops on the replicated w-tensor — no
communication inside the CG iteration beyond the single n-psum.

The reference has no distributed backend and materializes every Kuu
(``src/models/sparse/kronecker_structure.py:496,513``); this path serves
the nb7-style monthly products at grid sizes the dense pipeline cannot
represent, across however many chips the mesh names.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vggp_tpu.models import iterative


def _data_shardings(mesh: Mesh, data_axis: str, x_ndim: int):
    if data_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {data_axis!r}: {mesh.axis_names}")
    xs = NamedSharding(mesh, P(data_axis, None) if x_ndim == 2 else P(data_axis))
    ys = NamedSharding(mesh, P(data_axis))
    return xs, ys


def make_sharded_solve_w(
    spec,
    mesh: Mesh,
    data_axis: str = "data",
    tol: Optional[float] = None,
    maxiter: int = 1000,
):
    """Build ``fn(params, X, y) -> w`` running the CG solve data-sharded.

    ``X``/``y`` are placed (or re-placed) over ``data_axis``; the returned
    flat (m,) ``w`` is replicated, ready for any of the ``*_from_w`` heads
    on any chip. n must be divisible by the data-axis size (shard_batch's
    usual contract). Bit-level: per-shard partial sums reduce in a fixed
    order, matching the unsharded einsum to ULP level per contraction (the
    drift is amplified by cond(G) through the CG iterates; tested to 1e-6
    relative after a full f64 solve on the virtual mesh).
    """
    iterative._check_spec(spec)
    rep = NamedSharding(mesh, P())

    @jax.jit
    def fn(params, X, y):
        xs, ys = _data_shardings(mesh, data_axis, X.ndim)
        X = jax.lax.with_sharding_constraint(X, xs)
        y = jax.lax.with_sharding_constraint(y, ys)
        w = iterative.solve_w(spec, params, X, y, tol=tol, maxiter=maxiter)
        return jax.lax.with_sharding_constraint(w, rep)

    return fn


def make_sharded_qv_mean_cg(
    spec,
    mesh: Mesh,
    grid_axes: Sequence,
    data_axis: str = "data",
    tol: Optional[float] = None,
    maxiter: int = 1000,
):
    """``fn(params, X, y) -> E_q[v]`` (flat, replicated): the full sharded
    solve + gridded-product mean head in one jitted program."""
    iterative._check_spec(spec)
    rep = NamedSharding(mesh, P())
    grid_axes = tuple(grid_axes)

    @jax.jit
    def fn(params, X, y):
        xs, ys = _data_shardings(mesh, data_axis, X.ndim)
        X = jax.lax.with_sharding_constraint(X, xs)
        y = jax.lax.with_sharding_constraint(y, ys)
        w = iterative.solve_w(spec, params, X, y, tol=tol, maxiter=maxiter)
        vm = iterative.q_v_mean_from_w(spec, params, grid_axes, w)
        return jax.lax.with_sharding_constraint(vm, rep)

    return fn


def make_sharded_qdv_mean_cg(
    spec,
    mesh: Mesh,
    grid_axes: Sequence,
    axis: int,
    data_axis: str = "data",
    tol: Optional[float] = None,
    maxiter: int = 1000,
):
    """``fn(params, X, y) -> E_q[∫_cell ∂f/∂x_axis]`` (flat, replicated):
    the sharded solve + gridded-GRADIENT product mean — the velocity-field
    head (``iterative.q_dv_mean_from_w``, face-difference Kv'u, valid for
    every kind incl. matern12) at multi-chip CG scale. Divide by the cell
    measure for velocities."""
    iterative._check_spec(spec)
    rep = NamedSharding(mesh, P())
    grid_axes = tuple(grid_axes)

    @jax.jit
    def fn(params, X, y):
        xs, ys = _data_shardings(mesh, data_axis, X.ndim)
        X = jax.lax.with_sharding_constraint(X, xs)
        y = jax.lax.with_sharding_constraint(y, ys)
        w = iterative.solve_w(spec, params, X, y, tol=tol, maxiter=maxiter)
        dm = iterative.q_dv_mean_from_w(spec, params, grid_axes, axis, w)
        return jax.lax.with_sharding_constraint(dm, rep)

    return fn


def make_sharded_pathwise_qv(
    spec,
    mesh: Mesh,
    grid_axes: Sequence,
    data_axis: str = "data",
    n_samples: int = 64,
    n_features: int = 1024,
    **cg_kwargs,
):
    """``fn(params, X, y, key) -> Gaussian(mean, var)``: the matrix-free
    pathwise q(v) UNCERTAINTY head, data-sharded.

    Every per-sample step decomposes the same way as the mean solve — the
    prior-path projection at the data, the ε draw, and the Kuf contractions
    are all n-local with one psum; the two CG solves per sample run on the
    replicated w/u tensors. The vmap over samples composes with GSPMD (the
    sample axis is unsharded; shard the DATA, not the draws, because every
    draw touches all the data)."""
    iterative._check_spec(spec, pathwise=True)
    rep = NamedSharding(mesh, P())
    grid_axes = tuple(grid_axes)

    @jax.jit
    def fn(params, X, y, key):
        xs, ys = _data_shardings(mesh, data_axis, X.ndim)
        X = jax.lax.with_sharding_constraint(X, xs)
        y = jax.lax.with_sharding_constraint(y, ys)
        g = iterative.q_v_pathwise(spec, params, X, y, grid_axes, key,
                                   n_samples=n_samples,
                                   n_features=n_features, **cg_kwargs)
        return jax.tree.map(
            lambda t: jax.lax.with_sharding_constraint(t, rep), g)

    return fn


def make_sharded_pathwise_qdv(
    spec,
    mesh: Mesh,
    grid_axes: Sequence,
    axis: int,
    data_axis: str = "data",
    n_samples: int = 64,
    n_features: int = 1024,
    **cg_kwargs,
):
    """``fn(params, X, y, key) -> Gaussian(mean, var)``: the matrix-free
    gridded-GRADIENT uncertainty head (``iterative.q_dv_pathwise``),
    data-sharded exactly like :func:`make_sharded_pathwise_qv` — the
    face-difference spectral functional and the Matheron updates are
    n-local with one psum per contraction; the sample axis stays
    unsharded."""
    iterative._check_spec(spec, pathwise=True)
    rep = NamedSharding(mesh, P())
    grid_axes = tuple(grid_axes)

    @jax.jit
    def fn(params, X, y, key):
        xs, ys = _data_shardings(mesh, data_axis, X.ndim)
        X = jax.lax.with_sharding_constraint(X, xs)
        y = jax.lax.with_sharding_constraint(y, ys)
        g = iterative.q_dv_pathwise(spec, params, X, y, grid_axes, axis, key,
                                    n_samples=n_samples,
                                    n_features=n_features, **cg_kwargs)
        return jax.tree.map(
            lambda t: jax.lax.with_sharding_constraint(t, rep), g)

    return fn
