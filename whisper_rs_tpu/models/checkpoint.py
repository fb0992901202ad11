"""Native checkpoint save/load for converted parameters.

The reference only *loads* pre-converted tch weights, with the converter
kept out of the repo (examples/transcribe.rs:37; SURVEY §5 checkpoint row).
Here conversion (params.py) and persistence are both first-class: the
converted pytree round-trips through a single ``.npz`` whose keys encode the
tree paths, plus the ModelDims, so subsequent loads skip torch entirely.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelDims


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: dict):
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, params, dims: ModelDims) -> None:
    flat = _flatten(params)
    flat["__dims__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(dims)).encode(), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_params(path: str, dtype=jnp.float32) -> Tuple[dict, ModelDims]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    dims = ModelDims(**json.loads(bytes(flat.pop("__dims__")).decode()))
    # Cast only floating leaves: integer leaves (int8 quantized weights,
    # token tables) keep their stored dtype — casting int8 weights to f32
    # would silently quadruple the HBM weight stream.
    params = jax.tree.map(
        lambda a: jnp.asarray(
            a, dtype if np.issubdtype(a.dtype, np.floating) else a.dtype
        ),
        _unflatten(flat),
    )
    return params, dims
