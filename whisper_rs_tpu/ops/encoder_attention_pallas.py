"""Custom single-pass encoder self-attention kernel (Pallas, TPU).

Whisper's encoder attends over a FIXED 1500-frame context (padded to 1536
for tiling), head dim 64.  At that shape the general flash-attention
kernel (jax.experimental.pallas.ops.tpu.flash_attention) measures ~2x its
MXU bound on v5e (large-v3 class: 2.84 ms vs a ~1.5 ms dh=64 bound at
b16·H20): its streaming running-max/sum machinery, all-f32 compute, and
segment-id masking all cost VPU passes this shape never needed — a whole
[1536, 1536] f32 score block is only 9.4 MB, which fits VMEM outright.

This kernel does the obvious thing instead, per (batch, head, q-block):

  s   = q_blk @ k^T          (MXU, bf16 in / f32 out, contracts dh=64)
  s   = s * sm_scale + bias  (ONE fused VPU pass; ``bias`` carries the
                              pad-tail key mask, so masking is FREE —
                              no segment-ids, no extra compare/select)
  p   = exp(s - rowmax(s))   (single-pass softmax: no flash rescaling)
  o   = (p.bf16 @ v) / rowsum(p)
                             (bf16 MXU dot at FULL rate — the f32 P@V
                              dot is where the stock kernel loses the
                              second factor of ~2)

K/V blocks are indexed constant across the q-block grid axis, so Mosaic
keeps them VMEM-resident per (b, h) and only re-streams q/out tiles.

bf16 P matches the XLA fallback path exactly (models/whisper.py::_attend
casts softmax weights to q.dtype before the weighted sum), so parity
tolerances are unchanged.

Gating: ``WHISPER_PALLAS_ENCODER`` = ``auto`` (default: this kernel on
TPU), ``0``/``flash`` (stock flash kernel), ``interpret`` (interpret mode,
CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, n_valid, T):
    # q [1,1,BQ,dh] bf16; k,v [1,1,T,dh] bf16; o [1,1,BQ,dh]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    # scores: contract dh on both operands (q smaller operand first — the
    # swapped order trips a Mosaic bf16 verification bug, ROADMAP r2)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, T] f32

    if n_valid is not None and n_valid < T:
        # pad-tail key mask folded into the scale multiply: one fused
        # VPU fma instead of iota+compare+select per element
        col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        bias = jnp.where(col >= n_valid, NEG_INF, 0.0).astype(jnp.float32)
        s = s * sm_scale + bias
    else:
        s = s * sm_scale

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, dh] f32
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _attn_kernel_merged(q_ref, k_ref, v_ref, o_ref, *, sm_scale, n_valid,
                        T, dh):
    # q [1,BQ,128]; k,v [1,T,128]; o [1,BQ,128] — two heads side by side
    # in the lane dim (merged [B, T, D] layout, D-index = h*dh + d)
    if n_valid is not None and n_valid < T:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        bias = jnp.where(col >= n_valid, NEG_INF, 0.0).astype(jnp.float32)
    else:
        bias = None
    outs = []
    for hh in range(2):
        q = q_ref[0][:, hh * dh : (hh + 1) * dh]
        k = k_ref[0][:, hh * dh : (hh + 1) * dh]
        v = v_ref[0][:, hh * dh : (hh + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, T]
        s = s * sm_scale + bias if bias is not None else s * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "sm_scale", "n_valid", "block_q",
                              "interpret")
)
def encoder_attention_merged(
    q: jnp.ndarray,  # [B, T, D] (unscaled, heads packed in the lane dim)
    k: jnp.ndarray,  # [B, T, D]
    v: jnp.ndarray,  # [B, T, D]
    n_head: int,
    sm_scale: float,
    n_valid=None,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, T, D]
    """Same math as encoder_attention_pallas but on the MERGED head layout:
    q/k/v come straight from the projection matmuls ([B, T, D]) and the
    output feeds the out-projection directly — the [B,T,D] -> [B,H,T,dh]
    head-split transposes (3 × ~1.2 ms/layer at large-v3-turbo b64) and
    the merge on the way out disappear.  Each program owns TWO adjacent
    heads so lane blocks stay 128-wide (Mosaic-legal); the 64-lane
    in-kernel slices are VPU relayouts, far cheaper than HBM copies."""
    B, T, D = q.shape
    dh = D // n_head
    assert dh == 64 and n_head % 2 == 0, (n_head, dh)
    if T % block_q:
        block_q = T
    n_q = T // block_q

    kernel = functools.partial(
        _attn_kernel_merged, sm_scale=sm_scale, n_valid=n_valid, T=T, dh=dh
    )
    grid = (B, n_head // 2, n_q)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, 2 * dh), lambda b, hp, qi: (b, qi, hp),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T, 2 * dh), lambda b, hp, qi: (b, 0, hp),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T, 2 * dh), lambda b, hp, qi: (b, 0, hp),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 2 * dh), lambda b, hp, qi: (b, qi, hp),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * T * D,
            bytes_accessed=(B * T * D * 4) * 2,
            transcendentals=B * n_head * T * T,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "n_valid", "block_q", "interpret")
)
def encoder_attention_pallas(
    q: jnp.ndarray,  # [B, H, T, dh] (unscaled)
    k: jnp.ndarray,  # [B, H, T, dh]
    v: jnp.ndarray,  # [B, H, T, dh]
    sm_scale: float,
    n_valid=None,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, T, dh = q.shape
    if T % block_q:
        block_q = T  # tiny test shapes: one block
    n_q = T // block_q

    kernel = functools.partial(
        _attn_kernel, sm_scale=sm_scale, n_valid=n_valid, T=T
    )
    # grid iterates q-blocks fastest: k/v index is constant across that
    # axis, so the same VMEM block is reused (no re-DMA) per (b, h)
    grid = (B, H, n_q)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, dh), lambda b, h, qi: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T, dh), lambda b, h, qi: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T, dh), lambda b, h, qi: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dh), lambda b, h, qi: (b, h, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * dh,
            bytes_accessed=(B * H * T * dh * 4) * 2,
            transcendentals=B * H * T * T,
        ),
        interpret=interpret,
    )(q, k, v)
