"""Sharding rules: tensor-parallel params + data-parallel batch.

Megatron-style TP mapped onto the params pytree (no reference counterpart —
SURVEY §2.3):

  * attn/cross-attn q,k,v: column-sharded ``[D, D/mp]`` (heads split across
    the model axis — head_dim stays whole so attention is head-local);
  * attn out: row-sharded ``[D/mp, D]`` — XLA inserts the psum;
  * MLP fc1 column- / fc2 row-sharded (the 4D hidden dim splits);
  * tied token embedding: VOCAB-row sharded ``[V/mp, D]`` (the reference's
    tied-logits matmul seam, model.rs:521).  The embedding lookup becomes a
    GSPMD partitioned gather (mask + psum) and the logits einsum
    ``btd,vd->btv`` keeps its output vocab-sharded until the top-k /
    filters force the gather — per-chip params drop by V·D·(mp-1)/mp
    (~130 MB for large-v3 at TP2);
  * conv stem: conv1 output-channel column-sharded, conv2 input-channel
    row-sharded (psum on its output) — encoder stem compute no longer
    duplicated per TP rank;
  * LayerNorms, positional embeddings replicated (small).

Batch ('data' axis) shards utterances/windows; the beam KV-cache reorder
gathers with batch-local indices so it stays shard-local under DP.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, STAGE_AXIS


def _spec_for_path(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    stacked = "blocks" in joined  # stacked leaves carry a leading L axis
    pre = (None,) if stacked else ()

    def spec(*axes):
        return P(*pre, *axes)

    if joined.endswith("ln/scale") or joined.endswith("ln/bias") or "_ln/" in joined or "ln_post" in joined:
        return spec(*([None] * (leaf.ndim - len(pre))))
    if "pos_emb" in joined:
        return P(*([None] * leaf.ndim))
    if "token_emb" in joined:
        # vocab-row sharding of the tied embedding (model.rs:521 seam); the
        # int8 per-row scale leaf ("token_emb_scale", 1-D [V]) follows it
        return P(MODEL_AXIS, *([None] * (leaf.ndim - 1)))
    if "conv1" in joined:
        # column parallel: output channels sharded ([C_out, C_in, K] / [C_out])
        return P(MODEL_AXIS, *([None] * (leaf.ndim - 1)))
    if "conv2" in joined:
        # row parallel: contract over conv1's sharded channels, psum output
        if leaf.ndim == 3:
            return P(None, MODEL_AXIS, None)
        return P(None)  # bias replicated

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
    """NamedSharding pytree matching ``params`` (TP over the model axis).

    On a 3-axis ('stage','data','model') mesh the encoder block stack's
    stacked [L, ...] leaves are additionally sharded along 'stage' —
    placement IS the pipeline assignment (parallel/pipeline.py); decoder
    blocks and all non-block leaves stay replicated across stages."""
    pp = STAGE_AXIS in mesh.axis_names

    def to_sharding(path, leaf):
        spec = _spec_for_path(path, leaf)
        if pp:
            names = "/".join(
                str(getattr(p, "key", getattr(p, "name", p))) for p in path
            )
            if names.startswith("encoder/blocks"):
                spec = P(STAGE_AXIS, *tuple(spec)[1:])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(mesh: Mesh, params: Any):
    """Place (and if needed re-place) the params according to the TP rules."""
    return jax.device_put(params, param_shardings(mesh, params))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
