"""Pallas kernels vs their jnp reference implementations (interpret mode on
the CPU backend; the same code compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from vggp_tpu.features import _m12_cell_point_cov
from vggp_tpu.ops.pallas_kernels import cell_kuf


def test_cell_kuf_matches_reference():
    rng = np.random.default_rng(0)
    mesh = jnp.asarray(np.linspace(0.0, 1.0, 11))
    x = jnp.asarray(rng.random(37) * 1.4 - 0.2)  # includes points outside cells
    got = cell_kuf(mesh, x, 1.3, 0.27)
    want = _m12_cell_point_cov(mesh, x, 1.3, 0.27)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-14)


def test_cell_kuf_nonaligned_sizes():
    mesh = jnp.asarray(np.linspace(-0.5, 2.0, 201))  # m=200
    x = jnp.asarray(np.linspace(-1.0, 3.0, 301))
    got = cell_kuf(mesh, x, 0.7, 1.5)
    want = _m12_cell_point_cov(mesh, x, 0.7, 1.5)
    assert got.shape == (200, 301)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-14)


def test_cell_kuf_op_gradients_match_reference():
    """custom_vjp backward (analytic) == autodiff of the jnp reference."""
    import jax

    rng = np.random.default_rng(2)
    mesh = jnp.asarray(np.linspace(0.0, 1.0, 9))
    x = jnp.asarray(rng.random(21))
    g = jnp.asarray(rng.standard_normal((8, 21)))

    from vggp_tpu.ops.pallas_kernels import cell_kuf_op

    def loss_pallas(v, l):
        return jnp.sum(cell_kuf_op(mesh, x, v, l) * g)

    def loss_ref(v, l):
        return jnp.sum(_m12_cell_point_cov(mesh, x, v, l) * g)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(1.3), jnp.asarray(0.4))
    gr = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(1.3), jnp.asarray(0.4))
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), rtol=1e-10)


def test_fused_banded_whiten_kuf_matches_unfused():
    """fused Kuf→whiten kernel == banded apply of the materialized Kuf
    (and its ℓ-tangent == F⁻¹·∂Kuf), interpret mode, float64."""
    import jax.numpy as jnp

    from vggp_tpu.ops.kms import m12_cell_inv_chol, m12_geometric_ratio
    from vggp_tpu.ops.kms import banded_whiten_apply
    from vggp_tpu.ops.pallas_kernels import (cell_kuf_with_dl,
                                             fused_banded_whiten_kuf)

    m, n = 256, 300
    mesh = jnp.asarray(np.linspace(0.0, 1.0, m + 1))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random(n) * 1.2 - 0.1)
    v, l, jit = jnp.asarray(1.3), jnp.asarray(0.27), 1e-6
    finv = m12_cell_inv_chol(m, 1.0 / m, v, l, jit)
    ratio = m12_geometric_ratio(1.0 / m, l, jit)
    assert float(ratio) < 0.7

    a, t = fused_banded_whiten_kuf(finv, mesh, x, v, l, "highest", "highest")
    kuf, dkuf = cell_kuf_with_dl(mesh, x, v, l)
    a_ref = banded_whiten_apply(finv, kuf, ratio, "highest")
    t_ref = finv @ dkuf
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-10, atol=1e-12)
