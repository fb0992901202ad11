"""Pipeline parallelism (GPipe) for the encoder block stack.

The reference is single-device (SURVEY §2.3: PP row "absent"); this closes
the remaining parallelism row.  Whisper's encoder is a clean pipeline
target: a homogeneous stack of residual blocks (model.rs:384-394) with a
fixed [B, 1500, D] activation between them.  The decoder is better served
by TP+DP (its autoregressive step is latency-bound), so PP here covers the
encoder only — which is also where PP makes sense for models that exceed a
TP group's HBM.

Design (TPU-idiomatic, no host scheduler):
  * a dedicated 1-D ``('stage',)`` mesh; the stacked per-layer block params
    ([L, ...] leaves) are sharded along L so each stage holds L/S
    contiguous blocks — placement IS the pipeline assignment;
  * ``shard_map`` + ``lax.ppermute`` implement the GPipe schedule: over
    ``n_micro + S - 1`` ticks, each stage runs its blocks on the activation
    it holds and passes the result to the right neighbor over ICI;
  * microbatches enter at stage 0 and finished activations accumulate on
    the last stage, then are broadcast with a masked psum (small: one
    [B, 1500, D] per call);
  * the conv stem + positional embedding run before the pipeline and the
    post-LN after it (replicated — they are <5% of encoder FLOPs).

Bubble fraction = (S-1)/(n_micro+S-1); choose n_micro >= 4*S in practice.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax>=0.7 top-level; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import ModelDims
from ..models.whisper import (
    _conv1d_mm,
    gelu,
    layer_norm,
    linear,
    mha_self,
    sinusoids,
)

STAGE_AXIS = "stage"


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(f"{n_stages} stages > {len(devices)} devices")
    return Mesh(np.asarray(devices[:n_stages]), (STAGE_AXIS,))


def _block_forward(x, bp, n_head):
    """One encoder residual block (same math as encoder_forward's scan)."""
    x = x + mha_self(layer_norm(x, bp["attn_ln"]), bp["attn"], n_head, None)
    h = layer_norm(x, bp["mlp_ln"])
    return x + linear(gelu(linear(h, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])


def encoder_forward_pp(
    params: dict,
    mel: jnp.ndarray,  # [B, n_mels, 3000]
    dims: ModelDims,
    mesh: Mesh,
    n_micro: Optional[int] = None,
) -> jnp.ndarray:
    """Pipeline-parallel encoder forward over the ('stage',) mesh.

    Numerically identical to models.whisper.encoder_forward; the batch is
    cut into ``n_micro`` microbatches (default: 2 per stage) that flow
    through the stages GPipe-style.
    """
    S = mesh.shape[STAGE_AXIS]
    L = dims.n_audio_layer
    if L % S:
        raise ValueError(f"n_audio_layer={L} not divisible by {S} stages")
    B = mel.shape[0]
    if n_micro is None:
        n_micro = min(B, 2 * S)
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")

    enc = params["encoder"]
    n_head = dims.n_audio_head

    # stem (replicated): conv1 + conv2 + sinusoid position table
    x = mel.transpose(0, 2, 1)
    x = gelu(_conv1d_mm(x, enc["conv1"], stride=1))
    x = gelu(_conv1d_mm(x, enc["conv2"], stride=2))  # [B, 1500, D]
    pos = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state), x.dtype)
    x = x + pos

    mb = B // n_micro
    xs = x.reshape(n_micro, mb, x.shape[1], x.shape[2])

    # stage placement: shard stacked block leaves along L
    blocks = enc["blocks"]
    block_sharding = jax.tree.map(
        lambda leaf: NamedSharding(mesh, P(STAGE_AXIS, *([None] * (leaf.ndim - 1)))),
        blocks,
    )
    blocks = jax.device_put(blocks, block_sharding)
    xs = jax.device_put(xs, NamedSharding(mesh, P()))

    def stage_fn(blocks_local, xs_all):
        stage = lax.axis_index(STAGE_AXIS)
        total = n_micro + S - 1
        fwd_perm = [(s, (s + 1) % S) for s in range(S)]

        def run_my_blocks(act):
            def body(a, bp):
                return _block_forward(a, bp, n_head), None

            out, _ = lax.scan(body, act, blocks_local)
            return out

        def tick(t, state):
            buf, outs = state
            # stage 0 injects microbatch t (clamped; masked out later)
            inject = lax.dynamic_index_in_dim(
                xs_all, jnp.minimum(t, n_micro - 1), keepdims=False
            )
            cur = jnp.where(stage == 0, inject, buf)
            y = run_my_blocks(cur)
            # last stage captures finished microbatch t-(S-1)
            out_idx = t - (S - 1)
            capture = (stage == S - 1) & (out_idx >= 0)
            upd = lax.dynamic_update_index_in_dim(
                outs, y, jnp.maximum(out_idx, 0), axis=0
            )
            outs = jnp.where(capture, upd, outs)
            buf = lax.ppermute(y, STAGE_AXIS, fwd_perm)
            return buf, outs

        buf0 = jnp.zeros_like(xs_all[0])
        outs0 = jnp.zeros_like(xs_all)
        _, outs = lax.fori_loop(0, total, tick, (buf0, outs0))
        # broadcast the last stage's results to every stage
        outs = lax.psum(
            jnp.where(stage == S - 1, outs, jnp.zeros_like(outs)), STAGE_AXIS
        )
        return outs

    blocks_specs = jax.tree.map(
        lambda leaf: P(STAGE_AXIS, *([None] * (leaf.ndim - 1))), blocks
    )
    outs = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(blocks_specs, P()),
        out_specs=P(),
        check_vma=False,
    )(blocks, xs)

    x = outs.reshape(B, dims.n_audio_ctx, dims.n_audio_state)
    return layer_norm(x, enc["ln_post"])
