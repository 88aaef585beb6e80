"""Multi-chip execution: jax.sharding meshes + pjit-sharded training steps.

The reference is single-process CPU with no distributed backend (SURVEY.md
§2/§5). The TPU-native equivalent is GSPMD over an ICI mesh:

- data parallelism: minibatches sharded over a ``data`` mesh axis; gradient
  all-reduce is inserted by XLA from sharding annotations (rides ICI),
- model parallelism: for very large inducing grids the second Kronecker axis
  of the variational state (μ, L₂) is sharded over a ``model`` axis, turning
  the whitened-feature einsums into collective matmuls.

No hand-written collectives: pick a mesh, annotate shardings, let XLA insert
psum/all-gather (scaling-book recipe).
"""

from vggp_tpu.parallel.mesh import make_mesh, data_model_mesh
from vggp_tpu.parallel.dp import (make_sharded_svgp_step, make_sharded_assimilate,
                                  make_sharded_qv, shard_params, shard_batch)
from vggp_tpu.parallel.cg import (make_sharded_solve_w, make_sharded_qv_mean_cg,
                                  make_sharded_qdv_mean_cg,
                                  make_sharded_pathwise_qv,
                                  make_sharded_pathwise_qdv)

__all__ = [
    "make_mesh",
    "data_model_mesh",
    "make_sharded_svgp_step",
    "make_sharded_assimilate",
    "make_sharded_qv",
    "make_sharded_solve_w",
    "make_sharded_qv_mean_cg",
    "make_sharded_qdv_mean_cg",
    "make_sharded_pathwise_qv",
    "make_sharded_pathwise_qdv",
    "shard_params",
    "shard_batch",
]
