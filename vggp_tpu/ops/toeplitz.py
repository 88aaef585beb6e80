"""Symmetric Toeplitz operators.

The reference builds dense Toeplitz matrices through
``linear_operator.operators.ToeplitzLinearOperator`` (e.g.
``src/models/sparse/univariate_structure.py:823``). Here:

- ``sym_toeplitz_dense`` materializes via a single gather ``first_row[|i-j|]``
  (one fused XLA op, no Python loops) — used when an O(m²) factorization is
  needed anyway (Cholesky of a per-axis Kuu).
- ``sym_toeplitz_matvec`` is the O(m log m) FFT circulant-embedding matvec for
  iterative paths and very large axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sym_toeplitz_dense(first_row: jnp.ndarray) -> jnp.ndarray:
    """Dense symmetric Toeplitz matrix T[i, j] = first_row[|i - j|].

    Built with the pad/reshape "skew" trick (broadcast the mirrored row,
    pad one lane, reflatten with a stride of 2m so each row shifts by one)
    instead of a gather table: TPU gathers with m² indices cost ~2.3 ms at
    m = 512 and their backward is a scatter-add (~4.6 ms) — the skew form is
    pure layout ops, microseconds in both directions.
    """
    m = first_row.shape[0]
    # r2[t] = first_row[|t - (m-1)|], length 2m-1
    r2 = jnp.concatenate([first_row[::-1], first_row[1:]])
    x = jnp.broadcast_to(r2, (m, 2 * m - 1))
    x = jnp.pad(x, ((0, 0), (0, 1)))                 # (m, 2m)
    f = x.reshape(-1)
    g = f[m - 1 : m - 1 + m * (2 * m - 1)].reshape(m, 2 * m - 1)
    return g[:, :m]


def sym_toeplitz_matvec(first_row: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Matvec T @ v via circulant embedding + FFT, O(m log m).

    ``v`` may be (m,) or (m, k); the product is applied down the first axis.

    Backend dispatch: ``jnp.fft.rfft`` where the backend lowers complex ops
    natively (CPU, GPU); the complex-free (re, im)-pair radix-2 FFT
    (:mod:`vggp_tpu.ops.realfft`) on ANY tpu backend — the axon remote-TPU
    plugin identifies as plain "tpu" yet implements no complex64 ops at all
    (rfft raises UNIMPLEMENTED), and the pair FFT is correct (and
    layout-op/VPU-friendly) on real TPU runtimes too.
    See ``config.REAL_FFT_TOEPLITZ``.
    """
    from vggp_tpu import config

    mode = config.REAL_FFT_TOEPLITZ
    if mode is True or (mode == "auto" and jax.default_backend() == "tpu"):
        from vggp_tpu.ops.realfft import sym_toeplitz_matvec_real

        return sym_toeplitz_matvec_real(first_row, v)
    m = first_row.shape[0]
    # circulant embedding of length 2m: [r0, r1, ..., r_{m-1}, 0, r_{m-1}, ..., r1]
    c = jnp.concatenate(
        [first_row, jnp.zeros((1,), dtype=first_row.dtype), first_row[1:][::-1]]
    )
    fc = jnp.fft.rfft(c)
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    vpad = jnp.concatenate([v, jnp.zeros((m, v.shape[1]), dtype=v.dtype)], axis=0)
    fv = jnp.fft.rfft(vpad, axis=0)
    out = jnp.fft.irfft(fc[:, None] * fv, n=2 * m, axis=0)[:m]
    out = out.astype(v.dtype)
    return out[:, 0] if squeeze else out
