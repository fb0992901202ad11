"""Ulysses sequence parallelism for the audio encoder (opt-in).

SURVEY §2.3's named SP/CP candidate: the encoder's fixed 1500-frame
self-attention (model.rs:420-440) is the only long-attention site in
Whisper — long audio is chunked, so DP over windows is the default
answer.  Ulysses is the complementary opt-in for the *latency* regime:
few windows, a large model (large-v3's 20 heads >= any realistic TP
group), and idle chips that DP cannot use.

Layout (DeepSpeed-Ulysses head-scatter/seq-gather, arXiv:2309.14509,
expressed with XLA collectives over the ``model`` mesh axis):

  * activations live SEQUENCE-SHARDED ``[B, T/n, D]`` on the ``model``
    axis; LN, QKV/out projections, and the MLP are row-local, so their
    FLOPs split n ways with fully replicated weights (no psum — unlike
    TP, which shards the weights and reduces partial sums);
  * attention needs the full sequence per head, so q/k/v ride ONE
    ``all_to_all`` each ([B, H, T/n, dh] -> [B, H/n, T, dh]: scatter
    heads, gather sequence), run the standard attention kernel suite on
    their local heads, and ride one ``all_to_all`` back.  Per block that
    is 4 all-to-alls of [B, T, D]/n elements each — O(T·D/n) per chip,
    vs TP's 2 all-reduces of O(T·D);
  * the conv stem + positional embedding run replicated (three thin
    matmuls, <1% of encoder FLOPs) and the sequence is sharded after.

Constraints: n_head and the padded sequence must divide by the ``model``
axis size (1500 pads to 1536 = 128·12, so n in {2, 4} works for every
model family; large-v3's H=20 also allows n=2, 4, not 8).

The decode stack plugs this in through the same ``encoder_fn`` seam as
pipeline parallelism: ``DecodeTask(..., encoder_fn=ulysses_encoder_fn
(mesh))``.  Exact-match vs the single-device encoder is locked by
tests/test_ulysses.py on the fake 8-device mesh; tools/bench_ulysses.py
is the hardware bench hook.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .collectives import all_to_all_model
from .mesh import MODEL_AXIS


def _ulysses_pad_to(T: int, n_model: int) -> int:
    """Pad target: multiple of both the flash kernel's 128 and n_model."""
    from ..ops.encoder_attention import flash_pad_to

    Tp = flash_pad_to(T)
    while Tp % n_model:
        Tp += 128
    return Tp


def encoder_forward_ulysses(
    params: dict, mel: jnp.ndarray, dims, mesh: Mesh
) -> jnp.ndarray:
    """[B, n_mels, 3000] -> [B, 1500, n_state], sequence-parallel over the
    mesh's ``model`` axis.  Bit-matches ``encoder_forward`` up to f32
    reduction order (exact-match-tested on the fake mesh)."""
    if not isinstance(mel, jax.core.Tracer):
        # partial-manual shard_map only lowers under jit; give eager
        # callers (tests, tools) the jitted path transparently
        return _encoder_forward_ulysses_jit(params, mel, dims, mesh)
    return _encoder_forward_ulysses_impl(params, mel, dims, mesh)


@functools.partial(jax.jit, static_argnames=("dims", "mesh"))
def _encoder_forward_ulysses_jit(params, mel, dims, mesh):
    return _encoder_forward_ulysses_impl(params, mel, dims, mesh)


def _encoder_forward_ulysses_impl(
    params: dict, mel: jnp.ndarray, dims, mesh: Mesh
) -> jnp.ndarray:
    from ..models.whisper import (
        _conv1d_mm,
        _merge_heads,
        _split_heads,
        gelu,
        layer_norm,
        linear,
        sinusoids,
    )
    from ..ops.encoder_attention import encoder_attention

    n_model = mesh.shape[MODEL_AXIS]
    H = dims.n_audio_head
    if H % n_model:
        raise ValueError(
            f"Ulysses needs n_head ({H}) divisible by the model axis "
            f"({n_model})"
        )

    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)
    x = gelu(_conv1d_mm(x, enc["conv1"], stride=1))
    x = gelu(_conv1d_mm(x, enc["conv2"], stride=2))  # [B, T, D]
    pos = jnp.asarray(
        sinusoids(dims.n_audio_ctx, dims.n_audio_state), dtype=x.dtype
    )
    x = x + pos

    T = dims.n_audio_ctx
    Tp = _ulysses_pad_to(T, n_model)
    n_valid = T if Tp != T else None
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    d_head = dims.n_audio_state // H
    scale = d_head**-0.5

    def stage(x_local, blocks):
        # x_local: [B, Tp/n, D] — this chip's sequence shard
        def block(x, bp):
            h = layer_norm(x, bp["attn_ln"])
            q = _split_heads(linear(h, bp["attn"]["query"]), H)
            k = _split_heads(linear(h, bp["attn"]["key"]), H)
            v = _split_heads(linear(h, bp["attn"]["value"]), H)
            # head-scatter / seq-gather: [B, H, T/n, dh] -> [B, H/n, T, dh]
            q = all_to_all_model(q, split_axis=1, concat_axis=2)
            k = all_to_all_model(k, split_axis=1, concat_axis=2)
            v = all_to_all_model(v, split_axis=1, concat_axis=2)
            out = encoder_attention(q, k, v, scale, n_valid=n_valid)
            # seq-scatter / head-gather back: [B, H/n, T, dh] -> [B, H, T/n, dh]
            out = all_to_all_model(out, split_axis=2, concat_axis=1)
            x = x + linear(_merge_heads(out), bp["attn"]["out"])
            hm = layer_norm(x, bp["mlp_ln"])
            return x + linear(gelu(linear(hm, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])

        x_local, _ = lax.scan(
            lambda c, bp: (block(c, bp), None), x_local, blocks
        )
        return x_local

    # partial-manual: only the model axis is manual (the batch stays free
    # for GSPMD data sharding); like the PP splice, this form only lowers
    # under jit, so eager callers route through a jitted wrapper (see
    # _encoder_forward_ulysses_jit)
    y = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(P(None, MODEL_AXIS, None), P()),
        out_specs=P(None, MODEL_AXIS, None),
        axis_names=frozenset({MODEL_AXIS}),
        check_vma=False,
    )(x, enc["blocks"])
    if Tp != T:
        y = y[:, :T]
    return layer_norm(y, enc["ln_post"])


def ulysses_encoder_fn(mesh: Mesh):
    """``encoder_fn`` hook for DecodeTask/decode_greedy/decode_beam —
    same seam as ``pp_encoder_fn`` (parallel/pipeline.py)."""

    @functools.wraps(encoder_forward_ulysses)
    def fn(params, mel, dims):
        return encoder_forward_ulysses(params, mel, dims, mesh)

    return fn
