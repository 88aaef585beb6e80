"""Numerical integrators for gridded ground truth.

- :func:`integrate_1d` — per-mesh-interval adaptive quadrature (reference
  ``src/utils/integrators.py:10-30``): the analytic-truth oracle for
  validating q(v) cell-integral means.
- :func:`simpson_grid_2d` / :func:`trapz_grid_2d` / :func:`average_grid_2d` —
  grid a dense 2D field into n×n cell integrals/means (reference
  ``src/utils/dataloaders.py:461-539``, GulfStream ground-truth gridding).
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
from scipy import integrate as _integrate


def integrate_1d(function: Callable, mesh: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """scipy ``quad`` of ``function`` over each [mesh[i-1], mesh[i]] interval."""
    areas, errors = [], []
    mesh = np.asarray(mesh)
    for i in range(1, len(mesh)):
        result, error = _integrate.quad(function, mesh[i - 1], mesh[i])
        areas.append(result)
        errors.append(error)
    return np.array(areas), np.array(errors)


def _grid_cells(field: np.ndarray, n_grids: int):
    npts = field.shape[0]
    if field.shape[0] != field.shape[1]:
        raise ValueError("field must be square")
    if npts % n_grids != 0:
        raise ValueError(f"{npts} points not divisible into {n_grids} cells")
    k = npts // n_grids
    return k


def average_grid_2d(field: np.ndarray, n_grids: int) -> np.ndarray:
    """Per-cell mean of a dense square field → (n_grids, n_grids)."""
    k = _grid_cells(field, n_grids)
    n = n_grids
    return field[: n * k, : n * k].reshape(n, k, n, k).mean(axis=(1, 3))


def trapz_grid_2d(field: np.ndarray, xs: np.ndarray, ys: np.ndarray, n_grids: int) -> np.ndarray:
    """Per-cell trapezoid double integral of a dense field."""
    k = _grid_cells(field, n_grids)
    dx = xs[1] - xs[0]
    dy = ys[1] - ys[0]
    out = np.empty((n_grids, n_grids))
    for i in range(n_grids):
        for j in range(n_grids):
            cell = field[i * k : (i + 1) * k, j * k : (j + 1) * k]
            out[i, j] = np.trapezoid(np.trapezoid(cell, dx=dx, axis=1), dx=dy)
    return out


def simpson_grid_2d(field: np.ndarray, xs: np.ndarray, ys: np.ndarray, n_grids: int) -> np.ndarray:
    """Per-cell Simpson double integral (reference ``dataloaders.py:513-539``)."""
    k = _grid_cells(field, n_grids)
    dx = xs[1] - xs[0]
    dy = ys[1] - ys[0]
    out = np.empty((n_grids, n_grids))
    for i in range(n_grids):
        for j in range(n_grids):
            cell = field[i * k : (i + 1) * k, j * k : (j + 1) * k]
            out[i, j] = _integrate.simpson(_integrate.simpson(cell, dx=dx, axis=1), dx=dy)
    return out
