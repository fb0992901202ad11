"""Device mesh construction.

The reference has no multi-device support at all (SURVEY §2.3: single
process, single device, ``tch::Device`` placement only).  Here the mesh is a
first-class object: one 2-D ``('data', 'model')`` mesh serves data
parallelism over utterances/windows and tensor parallelism over
heads/MLP/vocab for models that exceed one chip (large-v3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_model: int = 1,
    n_data: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over the given (default: all) devices.

    ``n_model`` chips cooperate on one model replica (TP); the remaining
    factor is data-parallel.  TP groups are laid out on the fastest-varying
    axis so TP collectives ride ICI neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading array sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
