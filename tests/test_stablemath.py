"""Series-compensated transcendental helpers vs mpmath-grade f64 references."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from vggp_tpu.ops.stablemath import expm1mx, expm1s


@pytest.mark.parametrize("x", [-3.0, -1.0, -0.5, -0.1, -1e-3, -1e-6, 0.0,
                               1e-6, 1e-3, 0.1, 0.5, 1.0, 3.0])
def test_expm1mx_accuracy(x):
    got = float(expm1mx(jnp.asarray(x, jnp.float64)))
    # 80-bit oracle: f64 `expm1(x) - x` itself cancels for small |x|
    want = float(np.expm1(np.longdouble(x)) - np.longdouble(x))
    assert got == pytest.approx(want, rel=1e-12, abs=1e-300)


@pytest.mark.parametrize("x", [-3.0, -0.5, -1e-4, 0.0, 1e-4, 0.5, 3.0])
def test_expm1s_accuracy(x):
    got = float(expm1s(jnp.asarray(x, jnp.float64)))
    assert got == pytest.approx(math.expm1(x), rel=1e-13, abs=1e-300)


def test_f32_relative_accuracy_small_args():
    """The motivating case: f32 evaluation stays ~eps-accurate where the
    naive form loses digits (TPU Kuu diagonal at δ/ℓ ≈ 0.027)."""
    for d in (0.3, 0.027, 1e-3, 1e-5):
        got = float(expm1mx(jnp.asarray(-d, jnp.float32)))
        want = math.expm1(-d) + d
        assert got == pytest.approx(want, rel=2e-6), d


def test_grad_safe():
    import jax

    g = jax.grad(lambda x: expm1mx(x))(jnp.asarray(0.02, jnp.float64))
    # d/dx (e^x - 1 - x) = e^x - 1
    assert float(g) == pytest.approx(math.expm1(0.02), rel=1e-10)
    g0 = jax.grad(lambda x: expm1mx(x))(jnp.asarray(0.0, jnp.float64))
    assert float(g0) == pytest.approx(0.0, abs=1e-15)
