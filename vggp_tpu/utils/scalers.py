"""Min-max / z-score scalers (reference ``src/utils/dataprocessors.py:3-73``)."""

from __future__ import annotations

import jax.numpy as jnp


def min_max_scaling(x: jnp.ndarray, min=None, max=None):
    if min is None:
        min = jnp.min(x)
    if max is None:
        max = jnp.max(x)
    return (x - min) / (max - min), min, max


def min_max_inverse(x: jnp.ndarray, min, max):
    return x * (max - min) + min


def z_scaling(x: jnp.ndarray):
    mean = jnp.mean(x)
    std = jnp.std(x, ddof=1)
    return (x - mean) / std, mean, std


def z_inverse(x: jnp.ndarray, mean, std):
    return x * std + mean
