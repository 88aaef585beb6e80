"""Library-wide toggles."""

from __future__ import annotations

import jax

# Route large structured-covariance constructions through the Pallas TPU
# kernels (vggp_tpu.ops.pallas_kernels). Off-TPU the jnp reference
# implementations are used regardless (interpret-mode Pallas is for tests).
USE_PALLAS: bool = True

# Below these sizes the (128, 128) tile padding costs more than the fused
# kernel saves; the jnp implementation is used instead.
PALLAS_MIN_CELLS: int = 64
PALLAS_MIN_POINTS: int = 128


def pallas_kuf_enabled(m: int, n: int) -> bool:
    return (
        USE_PALLAS
        and m >= PALLAS_MIN_CELLS
        and n >= PALLAS_MIN_POINTS
        and jax.default_backend() == "tpu"
    )
