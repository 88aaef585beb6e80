"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_names: Sequence[str], axis_sizes: Sequence[int],
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    total = int(np.prod(axis_sizes))
    if total != len(devices):
        raise ValueError(f"mesh wants {total} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def data_model_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """('data', 'model') mesh over the first n_devices devices.

    ``model_parallel`` shards the second Kronecker axis of the variational
    state; the rest of the chips do data parallelism.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    return make_mesh(("data", "model"), (n // model_parallel, model_parallel), devs[:n])
