import numpy as np
import jax.numpy as jnp
import pytest

from vggp_tpu import kernels


KINDS = ["matern12", "matern32", "matern52", "rbf"]


def brute_k(kind, r, var, ls):
    if kind == "matern12":
        return var * np.exp(-r / ls)
    if kind == "matern32":
        z = np.sqrt(3) * r / ls
        return var * (1 + z) * np.exp(-z)
    if kind == "matern52":
        z = np.sqrt(5) * r / ls
        return var * (1 + z + z**2 / 3) * np.exp(-z)
    z = r / ls
    return var * np.exp(-0.5 * z * z)


@pytest.mark.parametrize("kind", KINDS)
def test_gram_matches_bruteforce(kind, rng):
    x1 = rng.normal(size=7)
    x2 = rng.normal(size=5)
    var, ls = 1.7, 0.6
    g = kernels.gram_1d(kind, jnp.asarray(x1), jnp.asarray(x2), var, ls)
    ref = brute_k(kind, np.abs(x1[:, None] - x2[None, :]), var, ls)
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-12)


@pytest.mark.parametrize("kind", KINDS)
def test_gram_psd(kind, rng):
    x = rng.normal(size=20)
    g = np.asarray(kernels.gram_1d(kind, jnp.asarray(x), jnp.asarray(x), 1.0, 0.5))
    evals = np.linalg.eigvalsh(g + 1e-10 * np.eye(20))
    assert evals.min() > -1e-8


@pytest.mark.parametrize("kind", ["matern12", "matern32", "matern52", "rbf"])
def test_spectral_density_integrates_to_variance(kind):
    # ∫ S(ω) dω / (2π) = k(0) = variance  (S over ω ∈ ℝ, symmetric)
    var, ls = 1.3, 0.7
    om = np.linspace(0, 4000, 4_000_001)
    s = np.asarray(kernels.spectral_density(kind, jnp.asarray(om), var, ls))
    total = 2 * np.trapezoid(s, om) / (2 * np.pi)
    np.testing.assert_allclose(total, var, rtol=1e-3)


def test_product_gram_2d(rng):
    x1 = rng.normal(size=(6, 2))
    x2 = rng.normal(size=(4, 2))
    p1 = {"variance": 1.2, "lengthscale": 0.4}
    p2 = {"variance": 0.8, "lengthscale": 1.1}
    g = kernels.gram_product_2d(("matern12", "matern32"), jnp.asarray(x1), jnp.asarray(x2), p1, p2)
    ref = brute_k("matern12", np.abs(x1[:, None, 0] - x2[None, :, 0]), 1.2, 0.4) * brute_k(
        "matern32", np.abs(x1[:, None, 1] - x2[None, :, 1]), 0.8, 1.1
    )
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-12)
