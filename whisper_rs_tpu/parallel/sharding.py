"""Sharding rules: tensor-parallel params + data-parallel batch.

Megatron-style TP mapped onto the params pytree (no reference counterpart —
SURVEY §2.3):

  * attn/cross-attn q,k,v: column-sharded ``[D, D/mp]`` (heads split across
    the model axis — head_dim stays whole so attention is head-local);
  * attn out: row-sharded ``[D/mp, D]`` — XLA inserts the psum;
  * MLP fc1 column- / fc2 row-sharded (the 4D hidden dim splits);
  * LayerNorms, convs, embeddings replicated (embeddings are small relative
    to HBM; convs are <15% of encoder FLOPs — revisit if profiling says so).

Batch ('data' axis) shards utterances/windows; the beam KV-cache reorder
gathers with batch-local indices so it stays shard-local under DP.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _spec_for_path(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    stacked = "blocks" in joined  # stacked leaves carry a leading L axis
    pre = (None,) if stacked else ()

    def spec(*axes):
        return P(*pre, *axes)

    if joined.endswith("ln/scale") or joined.endswith("ln/bias") or "_ln/" in joined or "ln_post" in joined:
        return spec(*([None] * (leaf.ndim - len(pre))))
    if "conv" in joined or "token_emb" in joined or "pos_emb" in joined:
        return P(*([None] * leaf.ndim))

    is_w = joined.endswith("/w")
    if any(k in joined for k in ("query", "key", "value")) or "fc1" in joined:
        # column parallel: output dim sharded
        if is_w:
            return spec(None, MODEL_AXIS)
        return spec(MODEL_AXIS)  # bias follows the sharded output
    if "/out/" in joined or joined.endswith("out/w") or joined.endswith("out/b") or "fc2" in joined:
        # row parallel: contracting dim sharded, bias replicated
        if is_w:
            return spec(MODEL_AXIS, None)
        return spec(None)

    return P(*([None] * leaf.ndim))


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding pytree matching ``params`` (TP over the model axis)."""

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for_path(path, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(mesh: Mesh, params: Any):
    """Place (and if needed re-place) the params according to the TP rules."""
    return jax.device_put(params, param_shardings(mesh, params))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
