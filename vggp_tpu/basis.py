"""Standalone basis-function API (reference ``src/basis/`` parity layer).

The reference exposes callable basis objects ``basis(x) -> (m, n)`` built
from per-function Python loops (``bspline.py:92-94``, ``fourier.py:58-68``
— SURVEY.md §2 hot spots). Here each call is a single fused, vectorized
expression; the same math also powers the inducing features in
:mod:`vggp_tpu.features` (these wrappers exist for API parity and direct
basis use).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from vggp_tpu.features import B1SplineFeature, CellIntegralFeature, FourierFeature


@dataclass(frozen=True)
class B0SplineBasis:
    """Piecewise-constant (indicator) basis on a uniform mesh
    (reference ``bspline.py:97-103``)."""

    a: float
    b: float
    m: int

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = CellIntegralFeature.from_lims(self.m, self.a, self.b)
        return feat.basis_eval(jnp.reshape(jnp.asarray(x), (-1,)))

    @property
    def mesh(self) -> np.ndarray:
        return np.linspace(self.a, self.b, self.m + 1)


@dataclass(frozen=True)
class B1SplineBasis:
    """Hat-function basis with half-hats at the boundary
    (reference ``bspline.py:106-112``)."""

    a: float
    b: float
    m: int  # number of basis functions == number of knots

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = B1SplineFeature(np.linspace(self.a, self.b, self.m))
        p = {"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(1.0)}
        return feat.Kuf("matern12", p, jnp.asarray(x))

    @property
    def mesh(self) -> np.ndarray:
        return np.linspace(self.a, self.b, self.m)


@dataclass(frozen=True)
class FourierBasis:
    """VFF Fourier basis [1, cos_1.., sin_1..] with Matérn boundary
    continuation outside [a, b] (reference ``fourier.py:5-135``)."""

    n_frequencies: int
    a: float
    b: float
    kind: str = "matern12"   # matern12 | matern32 | matern52 continuation
    lengthscale: float = 1.0

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = FourierFeature(self.n_frequencies, self.a, self.b)
        p = {"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(self.lengthscale)}
        return feat.Kuf(self.kind, p, jnp.asarray(x))

    @property
    def m(self) -> int:
        return 2 * self.n_frequencies + 1


def FourierBasisMatern12(n_frequencies, a, b, lengthscale=1.0):
    return FourierBasis(n_frequencies, a, b, "matern12", lengthscale)


def FourierBasisMatern32(n_frequencies, a, b, lengthscale=1.0):
    return FourierBasis(n_frequencies, a, b, "matern32", lengthscale)


def FourierBasisMatern52(n_frequencies, a, b, lengthscale=1.0):
    return FourierBasis(n_frequencies, a, b, "matern52", lengthscale)
