"""Fused Pallas decode-step MLP: stream fc1+fc2 as ONE packed HBM array.

The incremental decode step's MLP is pure weight bandwidth: per layer it
reads fc1 [D, 4D] and fc2 [4D, D] once to transform a tiny [B, D]
activation (reference seam: model.rs:279-292 driven per step from
decode/mod.rs:236-244).  The XLA formulation streams the two weights as
separate scan-xs slices and runs each matvec as its own fusion — measured
~210-260 GB/s at large-v3 b12 (device trace, r4), while the Pallas cross
kernel sustains ~713 GB/s on the same step.  ROADMAP's megakernel probes
showed stream STRUCTURE is what matters on v5e: the same bytes move ~1.6x
faster as one packed array than as many small per-layer arrays.

So: pack both weights hidden-major into one [L, 4D, 2D] array
(``w_pack[l, j] = [fc1_w[:, j] ; fc2_w[j, :]]``), grid over hidden chunks,
and compute the full fc1 -> +b1 -> GELU -> fc2 chain per chunk with an f32
VMEM accumulator — one contiguous DMA stream, Pallas double-buffered
across grid steps, compute hidden under the DMA (megakernel finding:
DMA-only == full-compute at these shapes).

The layer index is a scalar-prefetch block coordinate (same pattern as
ops/decode_attention.py), so the stacked weights stay OUT of the layer
scan's xs — no per-layer dynamic-slice copies.

Mosaic notes honored: block last-two dims (Hc multiple of 8, 2D multiple
of 128); the bf16 fc1 dot contracts the last dim of both operands with the
SMALLER operand first (the swapped form miscompiles, ROADMAP); every
Whisper width has 4D % 512 == 0 so Hc=512 always divides evenly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_mlp_params(blocks: dict) -> tuple:
    """Stacked decoder blocks -> (w_pack [L, 4D, 2D], b1 [L, 4D]).

    Call OUTSIDE the decode while-loop: packing is loop-invariant, and the
    megakernel round measured +0.3 ms/step when done inside the body."""
    w1 = blocks["mlp"]["fc1"]["w"]  # [L, D, 4D]
    w2 = blocks["mlp"]["fc2"]["w"]  # [L, 4D, D]
    w_pack = jnp.concatenate([w1.transpose(0, 2, 1), w2], axis=-1)
    return w_pack, blocks["mlp"]["fc1"]["b"].astype(jnp.float32)


def mlp_fused_ok(blocks: dict) -> bool:
    """int8-quantized linears keep the XLA path (the "s" scale epilogue
    is not worth a second kernel variant until the int8 default flips)."""
    return "s" not in blocks["mlp"]["fc1"]


def _mlp_kernel(l_ref, h_ref, w_ref, b1_ref, o_ref, acc_ref):
    j = pl.program_id(0)
    D = h_ref.shape[-1]

    h = h_ref[...]  # [B, D] compute dtype
    w1t = w_ref[0, :, :D]  # [Hc, D]
    w2 = w_ref[0, :, D:]  # [Hc, D]

    # fc1 chunk: contract D (last dim of both; smaller operand first)
    a = jax.lax.dot_general(
        h, w1t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, Hc]
    a = a + b1_ref[0, 0][None, :]
    # match the XLA path's numerics: linear() emits the fc1 output in the
    # compute dtype, then gelu runs on it (tanh form in bf16; the f32 erf
    # form via kernel_math — lax.erfc has no Mosaic lowering, caught by
    # the r5 on-chip suite)
    from .kernel_math import kernel_gelu

    g = kernel_gelu(a.astype(h.dtype))
    part = jax.lax.dot_general(
        g, w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, D]

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def decoder_mlp_step(
    h: jnp.ndarray,  # [B, D] post-LN activation (compute dtype)
    w_pack: jnp.ndarray,  # [L, 4D, 2D] from pack_mlp_params
    b1: jnp.ndarray,  # [L, 4D] f32
    layer: jnp.ndarray,  # scalar i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, D] — fc2 bias NOT added (caller adds the tiny b2)
    B, D = h.shape
    L, H4, D2 = w_pack.shape
    assert D2 == 2 * D
    Hc = 512 if H4 % 512 == 0 else H4
    n_chunks = H4 // Hc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j, l: (0, 0)),
            pl.BlockSpec((1, Hc, D2), lambda j, l: (l[0], j, 0)),
            # [L, 1, 4D]: the dummy middle axis makes the block's last-two
            # dims (1, Hc) Mosaic-legal (second-minor equals the array dim)
            pl.BlockSpec((1, 1, Hc), lambda j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((B, D), lambda j, l: (0, 0)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
    )
    return pl.pallas_call(
        _mlp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), h.dtype),
        interpret=interpret,
    )(
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        h,
        w_pack,
        b1.reshape(L, 1, H4),
    )
