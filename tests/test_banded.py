"""Banded operator tests."""

import numpy as np
import jax.numpy as jnp

from vggp_tpu.ops.banded import banded_matvec, banded_to_dense, dense_to_banded


def _random_banded_dense(m, bw, rng):
    a = np.zeros((m, m))
    for k in range(bw + 1):
        d = rng.standard_normal(m - k)
        a += np.diag(d, k)
        if k:
            a += np.diag(d, -k)
    return a


def test_banded_roundtrip_and_matvec():
    rng = np.random.default_rng(0)
    for m, bw in ((7, 1), (20, 3), (64, 2)):
        dense = _random_banded_dense(m, bw, rng)
        bands = dense_to_banded(jnp.asarray(dense), bw)
        np.testing.assert_allclose(np.asarray(banded_to_dense(bands)), dense, atol=1e-12)
        v = rng.standard_normal(m)
        np.testing.assert_allclose(
            np.asarray(banded_matvec(bands, jnp.asarray(v))), dense @ v, atol=1e-10)
        V = rng.standard_normal((m, 4))
        np.testing.assert_allclose(
            np.asarray(banded_matvec(bands, jnp.asarray(V))), dense @ V, atol=1e-10)
