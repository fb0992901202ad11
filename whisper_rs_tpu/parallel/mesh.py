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
STAGE_AXIS = "stage"


def make_mesh(
    n_model: int = 1,
    n_data: Optional[int] = None,
    devices: Optional[Sequence] = None,
    n_stage: int = 1,
) -> Mesh:
    """('data', 'model') — or, with ``n_stage > 1``,
    ('stage', 'data', 'model') — mesh over the given (default: all) devices.

    ``n_model`` chips cooperate on one model replica (TP); ``n_stage``
    groups form an encoder pipeline (parallel/pipeline.py); the remaining
    factor is data-parallel.  TP groups are laid out on the fastest-varying
    axis so TP collectives ride ICI neighbors; stage hops are the
    slowest-varying axis (one [B,1500,D] activation per tick — the
    cheapest traffic class).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % (n_model * n_stage) != 0:
        raise ValueError(
            f"{n} devices not divisible by n_model*n_stage="
            f"{n_model}*{n_stage}"
        )
    if n_data is None:
        n_data = n // (n_model * n_stage)
    if n_stage * n_data * n_model != n:
        raise ValueError(
            f"mesh {n_stage}x{n_data}x{n_model} != {n} devices"
        )
    if n_stage > 1:
        arr = np.asarray(devices).reshape(n_stage, n_data, n_model)
        return Mesh(arr, (STAGE_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading array sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
