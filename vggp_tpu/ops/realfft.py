"""Radix-2 FFT over explicit (re, im) pairs — no complex dtypes anywhere.

The axon TPU backend implements NO complex64 ops (even ``jnp.fft.rfft``
raises UNIMPLEMENTED — CLAUDE.md), which made the O(m log m) Toeplitz
circulant matvec (:func:`vggp_tpu.ops.toeplitz.sym_toeplitz_matvec`) and
with it the whole matrix-free CG path (``models/iterative.py``) CPU-only.
This module carries the same (re, im)-pair technique the spectral sampling
functionals already use (``sampling.py``), generalized to a full iterative
Cooley–Tukey FFT:

- ``fft_pair`` / ``ifft_pair``: decimation-in-time radix-2 over a
  power-of-two leading axis. The bit-reversal permutation is pure layout
  (reshape to (2,)*k, reverse the axes, flatten) — no gather, which on this
  TPU costs milliseconds at 10⁴+ indices (CLAUDE.md). Twiddle factors are
  host-side numpy constants baked into the trace (they depend only on N).
- ``circulant_matvec``: C @ v for a real circulant first column via
  FFT → pointwise complex product in (re, im) arithmetic → inverse FFT.

Everything is real adds/multiplies on the VPU: log2(N) unrolled stages of
elementwise work, static shapes, jit/vmap/grad-safe. Float32 roundoff grows
like √(log N)·eps — at N = 2¹⁵ the matvec agrees with the dense product to
~1e-6 relative, well inside the CG tolerance regime.

Reference parity: the reference's Toeplitz algebra lives in
``linear_operator.operators.ToeplitzLinearOperator`` (used at
``src/models/sparse/univariate_structure.py:823``), which materializes the
dense matrix; this path never does.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _bit_reverse(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Bit-reverse the leading axis of length 2**k via reshape/transpose."""
    rest = x.shape[1:]
    x = x.reshape((2,) * k + rest)
    perm = tuple(reversed(range(k))) + tuple(range(k, k + len(rest)))
    return x.transpose(perm).reshape((2**k,) + rest)


def fft_pair(re: jnp.ndarray, im: jnp.ndarray):
    """Forward DFT along axis 0 (length must be a power of two, static).

    Takes and returns explicit (re, im) arrays; trailing axes are batch.
    Sign convention matches ``numpy.fft.fft``: X_j = Σ_t x_t e^{-2πi jt/N}.
    """
    n = re.shape[0]
    k = int(n).bit_length() - 1
    if (1 << k) != n:
        raise ValueError(f"fft_pair needs a power-of-two length, got {n}")
    bshape = (1, -1) + (1,) * (re.ndim - 1)  # broadcast twiddles over batch
    re, im = _bit_reverse(re, k), _bit_reverse(im, k)
    for s in range(1, k + 1):
        size = 1 << s          # current block length
        half = size >> 1
        ang = -2.0 * np.pi * np.arange(half) / size
        wr = jnp.asarray(np.cos(ang), re.dtype).reshape(bshape)
        wi = jnp.asarray(np.sin(ang), re.dtype).reshape(bshape)
        rr = re.reshape((n // size, 2, half) + re.shape[1:])
        ri = im.reshape((n // size, 2, half) + im.shape[1:])
        er, ei = rr[:, 0], ri[:, 0]
        orr, oi = rr[:, 1], ri[:, 1]
        tr = wr * orr - wi * oi
        ti = wr * oi + wi * orr
        re = jnp.stack([er + tr, er - tr], axis=1).reshape((n,) + re.shape[1:])
        im = jnp.stack([ei + ti, ei - ti], axis=1).reshape((n,) + im.shape[1:])
    return re, im


def ifft_pair(re: jnp.ndarray, im: jnp.ndarray):
    """Inverse DFT along axis 0 via conj(FFT(conj(x)))/N."""
    n = re.shape[0]
    rr, ri = fft_pair(re, -im)
    return rr / n, -ri / n


def circulant_matvec(col: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(C @ v) for the real circulant matrix with first column ``col``.

    ``col`` is (N,) with N a power of two; ``v`` is (N,) or (N, b).
    All-real arithmetic: FFT both, multiply as (re, im) pairs, invert.
    """
    zero = jnp.zeros_like(col)
    cr, ci = fft_pair(col, zero)
    vr, vi = fft_pair(v, jnp.zeros_like(v))
    if v.ndim > 1:
        cr, ci = cr[:, None], ci[:, None]
    pr = cr * vr - ci * vi
    pi = cr * vi + ci * vr
    out_r, _ = ifft_pair(pr, pi)
    return out_r


def sym_toeplitz_matvec_real(first_row: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """T @ v for symmetric Toeplitz T — complex-free circulant embedding.

    Drop-in replacement for ``toeplitz.sym_toeplitz_matvec`` on backends
    without complex ops. Embeds T (first row length m) in an N-circulant
    with N = next power of two ≥ 2m: col = [r₀..r_{m-1}, 0…0, r_{m-1}..r₁]
    (position N-d holds r_d, so (i-j) mod N indexes correctly for i, j < m).
    """
    m = first_row.shape[0]
    n_fft = 1 << int(2 * m - 1).bit_length() if m > 1 else 2
    if n_fft < 2 * m - 1:  # pragma: no cover - bit_length guarantees this
        n_fft *= 2
    pad_mid = n_fft - (2 * m - 1)
    col = jnp.concatenate([
        first_row,
        jnp.zeros((pad_mid,), dtype=first_row.dtype),
        first_row[1:][::-1],
    ])
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    vpad = jnp.concatenate(
        [v, jnp.zeros((n_fft - m, v.shape[1]), dtype=v.dtype)], axis=0)
    out = circulant_matvec(col, vpad)[:m].astype(v.dtype)
    return out[:, 0] if squeeze else out
