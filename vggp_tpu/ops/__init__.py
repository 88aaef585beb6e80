"""Structured linear operators for gridded GP computations.

These replace the reference's reliance on ``linear_operator.operators``
(Toeplitz / Diag / LowRank / Kronecker — e.g. reference
``src/models/sparse/univariate_structure.py:10,504,621-635,823``) with
jit-friendly pure functions and pytree-compatible representations. Hot paths
(Toeplitz materialization, Khatri–Rao products, kron matvec) are fused XLA
expressions; batched B0 cell-integral Kuf has a Pallas TPU kernel in
:mod:`vggp_tpu.ops.pallas_kernels`.
"""

from vggp_tpu.ops.chol import (
    safe_cholesky,
    tri_solve,
    solve_psd,
    logdet_from_chol,
    psd_factor,
    psd_factor_eigh,
    PSDFactor,
)
from vggp_tpu.ops.toeplitz import sym_toeplitz_dense, sym_toeplitz_matvec
from vggp_tpu.ops.realfft import (
    circulant_matvec,
    fft_pair,
    ifft_pair,
    sym_toeplitz_matvec_real,
)
from vggp_tpu.ops.kron import (
    kron_dense,
    kron_matvec,
    khatri_rao_rows,
    kron_diag,
)
from vggp_tpu.ops.diag_lowrank import (
    diag_rank1_dense,
    diag_rank1_solve,
    diag_rank1_logdet,
    diag_rank1_matvec,
    diag_lowrank_dense,
    diag_lowrank_solve,
    diag_lowrank_logdet,
    diag_lowrank_matvec,
)
from vggp_tpu.ops.banded import banded_to_dense, dense_to_banded, banded_matvec
from vggp_tpu.ops.stablemath import expm1mx, expm1s

__all__ = [
    "safe_cholesky",
    "psd_factor",
    "psd_factor_eigh",
    "PSDFactor",
    "tri_solve",
    "solve_psd",
    "logdet_from_chol",
    "sym_toeplitz_dense",
    "sym_toeplitz_matvec",
    "sym_toeplitz_matvec_real",
    "fft_pair",
    "ifft_pair",
    "circulant_matvec",
    "kron_dense",
    "kron_matvec",
    "khatri_rao_rows",
    "kron_diag",
    "diag_rank1_dense",
    "diag_rank1_solve",
    "diag_rank1_logdet",
    "diag_rank1_matvec",
    "diag_lowrank_dense",
    "diag_lowrank_solve",
    "diag_lowrank_logdet",
    "diag_lowrank_matvec",
    "banded_to_dense",
    "dense_to_banded",
    "banded_matvec",
    "expm1mx",
    "expm1s",
]
