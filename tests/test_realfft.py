"""Complex-free (re, im)-pair FFT (ops.realfft) vs numpy complex oracles.

These guarantee the axon-TPU fallback path of
``ops.toeplitz.sym_toeplitz_matvec`` computes the same product as the
rfft route it replaces (the axon backend has no complex64 ops at all).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggp_tpu import config, features
from vggp_tpu.models import iterative, sgpr
from vggp_tpu.ops import realfft, toeplitz

P = {"variance": jnp.asarray(1.2), "lengthscale": jnp.asarray(0.25)}


@pytest.mark.parametrize("n", [2, 8, 64, 1024])
def test_fft_pair_matches_numpy(n, rng):
    re = rng.normal(size=n)
    im = rng.normal(size=n)
    want = np.fft.fft(re + 1j * im)
    got_r, got_i = realfft.fft_pair(jnp.asarray(re), jnp.asarray(im))
    np.testing.assert_allclose(np.asarray(got_r), want.real, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_i), want.imag, rtol=1e-10, atol=1e-10)


def test_fft_pair_batched_matches_numpy(rng):
    x = rng.normal(size=(128, 5))
    want = np.fft.fft(x, axis=0)
    got_r, got_i = realfft.fft_pair(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(got_r), want.real, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_i), want.imag, rtol=1e-10, atol=1e-10)


def test_ifft_pair_roundtrip(rng):
    re = jnp.asarray(rng.normal(size=256))
    im = jnp.asarray(rng.normal(size=256))
    fr, fi = realfft.fft_pair(re, im)
    rr, ri = realfft.ifft_pair(fr, fi)
    np.testing.assert_allclose(np.asarray(rr), np.asarray(re), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ri), np.asarray(im), atol=1e-12)


def test_circulant_matvec_matches_dense(rng):
    n = 64
    col = rng.normal(size=n)
    # circulant with first column col: C[i, j] = col[(i - j) mod n]
    C = np.empty((n, n))
    for j in range(n):
        C[:, j] = np.roll(col, j)
    v = rng.normal(size=(n, 3))
    got = np.asarray(realfft.circulant_matvec(jnp.asarray(col), jnp.asarray(v)))
    np.testing.assert_allclose(got, C @ v, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("m", [1, 3, 17, 128, 500])
def test_sym_toeplitz_matvec_real_matches_dense(m, rng):
    first_row = np.exp(-0.3 * np.arange(m)) * (1.0 + 0.1 * rng.normal(size=m))
    T = np.asarray(toeplitz.sym_toeplitz_dense(jnp.asarray(first_row)))
    v = rng.normal(size=(m, 2))
    got = np.asarray(realfft.sym_toeplitz_matvec_real(
        jnp.asarray(first_row), jnp.asarray(v)))
    np.testing.assert_allclose(got, T @ v, rtol=1e-9, atol=1e-10)
    # 1-D vector path
    got1 = np.asarray(realfft.sym_toeplitz_matvec_real(
        jnp.asarray(first_row), jnp.asarray(v[:, 0])))
    np.testing.assert_allclose(got1, T @ v[:, 0], rtol=1e-9, atol=1e-10)


def test_real_path_matches_rfft_path(rng):
    """config.REAL_FFT_TOEPLITZ=True must give the identical product the
    default rfft route computes (same circulant math, different FFT)."""
    first_row = jnp.asarray(np.exp(-0.1 * np.arange(200)))
    v = jnp.asarray(rng.normal(size=(200, 4)))
    want = np.asarray(toeplitz.sym_toeplitz_matvec(first_row, v))
    old = config.REAL_FFT_TOEPLITZ
    try:
        config.REAL_FFT_TOEPLITZ = True
        got = np.asarray(toeplitz.sym_toeplitz_matvec(first_row, v))
    finally:
        config.REAL_FFT_TOEPLITZ = old
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_fft_pair_jits_and_differentiates(rng):
    """The pair FFT must stay jit/grad-safe (it feeds CG under jit)."""
    v = jnp.asarray(rng.normal(size=64))
    row = jnp.asarray(np.exp(-0.2 * np.arange(64)))

    f = jax.jit(lambda r, x: jnp.sum(realfft.sym_toeplitz_matvec_real(r, x) ** 2))
    g = jax.grad(f, argnums=1)(row, v)
    T = np.asarray(toeplitz.sym_toeplitz_dense(row))
    want = 2.0 * T.T @ (T @ np.asarray(v))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-8, atol=1e-9)


def test_iterative_cg_through_real_fft_matches_dense_pipeline():
    """End-to-end: the full CG q_v mean through the complex-free matvec ==
    the dense collapsed-SGPR pipeline (the config an axon-TPU run uses)."""
    feat = features.CellIntegralFeature.from_lims(48, 0.0, 1.0)
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(size=80))
    y = np.sin(7 * x) + 0.05 * rng.standard_normal(80)
    X, Y = jnp.asarray(x), jnp.asarray(y)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({**P, **feat.init_params(jnp.float64)},),
         "noise": jnp.asarray(0.01)}
    grids = (features.CellIntegralFeature.from_lims(10, 0.0, 1.0),)
    want = np.asarray(sgpr.q_v(spec, p, X, Y, grids, full_cov=False).mean)
    old = config.REAL_FFT_TOEPLITZ
    try:
        config.REAL_FFT_TOEPLITZ = True
        got = np.asarray(iterative.q_v_mean_cg(spec, p, X, Y, grids, tol=1e-12))
    finally:
        config.REAL_FFT_TOEPLITZ = old
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
