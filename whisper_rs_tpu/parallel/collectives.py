"""Explicit collective wrappers over the ('data','model') mesh.

This is the communication layer of the framework (the reference has no
distributed communication at all — SURVEY §2.3).  Most sharded execution
rides GSPMD (param/batch shardings + XLA-inserted collectives), but
shard_map-style code and tests need the collectives spelled out; these thin
wrappers pin axis names and document which wire each op rides:

  * TP reductions (psum of row-parallel partial sums) and TP gathers run on
    the `model` axis — laid out fastest-varying so they ride ICI neighbors;
  * DP reductions (metrics, throughput counters) run on `data` and may
    cross DCN on multi-host meshes;
  * the beam-reorder KV gather is deliberately NOT a collective: source
    indices are batch-local per audio, so under DP it is a shard-local
    gather (models.whisper.KVCache.reorder).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def psum_model(x):
    """Sum partial results across the tensor-parallel group (e.g. the
    row-parallel out-projection/fc2 partials)."""
    return jax.lax.psum(x, MODEL_AXIS)


def psum_data(x):
    """Sum across the data-parallel group (metrics/counters)."""
    return jax.lax.psum(x, DATA_AXIS)


def all_gather_model(x, axis: int = -1):
    """Concatenate model-axis shards (e.g. vocab-sharded logits before a
    full-vocab top_k)."""
    return jax.lax.all_gather(x, MODEL_AXIS, axis=axis, tiled=True)


def all_to_all_model(x, split_axis: int, concat_axis: int):
    """Ulysses-style resharding (seq-sharded -> head-sharded and back)."""
    return jax.lax.all_to_all(
        x, MODEL_AXIS, split_axis=split_axis, concat_axis=concat_axis, tiled=True
    )


def ppermute_model(x, perm):
    """Neighbor exchange on the TP ring (building block for manual ring
    collectives)."""
    return jax.lax.ppermute(x, MODEL_AXIS, perm=perm)


def shard_map_over(mesh: Mesh, fn, in_specs, out_specs):
    """Convenience shard_map binding against the framework mesh."""
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def tp_row_parallel_matmul(mesh: Mesh, x, w_sharded):
    """Reference pattern: w [K, N] row-sharded on `model`, x [.., K] split
    along K to match; each shard computes a partial product and psums — the
    manual spelling of what GSPMD does for our row-parallel projections."""

    def body(x_local, w_local):
        return psum_model(x_local @ w_local)

    return shard_map_over(
        mesh,
        body,
        in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS, None)),
        out_specs=P(),
    )(x, w_sharded)
