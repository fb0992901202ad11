"""Fused Pallas decode-step attention: read K/V straight from HBM.

The incremental decode step (T==1) is pure HBM bandwidth: per layer it must
read the self-attention cache ([B, H, W, dh]) and the per-audio cross
K/V ([A, H, 1500, dh]) exactly once.  The XLA formulation pays extra:
the layer scan streams cross-K/V through ``xs`` (a dynamic-slice copy per
layer) and extracts the cache layer with another ``dynamic_slice`` copy,
roughly doubling the dominant streams (BASELINE.md round-1: step cost
2.2-2.8x the HBM roofline).

These kernels instead take the FULL stacked arrays as HBM refs and use the
layer index as a scalar-prefetch block coordinate, so each grid step DMAs
its K/V tile HBM->VMEM exactly once, with Pallas double-buffering across
grid steps.  Math matches models.whisper._attend / _attend_grouped
(reference semantics model.rs:158-206): q pre-scaled by head_dim**-0.5,
qk in f32, additive causal/key_start mask, f32 softmax, optional int8 K/V
with per-position scales (k scale on the logits, v scale on the softmax
weights).

Mosaic constraints shaping the design (see ROADMAP "facts"):
  * dynamic sublane slices must be 8-aligned -> heads are never sliced
    dynamically; the self kernel runs one program per batch row with a
    STATIC unrolled head loop (leading block dims take static indices
    freely), and per-head rows of 2-D blocks are selected with masked
    reductions;
  * blocks with a trailing length-1 lane dim pad 1 -> 128 in VMEM, so the
    per-position int8 scales are passed squeezed to 4-D.

Reference seam being accelerated: the per-step decoder attention of
model.rs:186-206 driven from decode/mod.rs:236-244.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # finite mask value (NaN-free, matches decode loop's BIG_NEG)


def _row(block2d: jnp.ndarray, h) -> jnp.ndarray:
    """Select row h of a [H, N] block as [1, N] via masked reduction
    (Mosaic-safe for unaligned/dynamic h)."""
    H = block2d.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, block2d.shape, 0)
    zero = jnp.zeros((), block2d.dtype)
    return jnp.sum(
        jnp.where(rows == h, block2d, zero), axis=0, keepdims=True
    )


# ---------------------------------------------------------------------------
# self-attention over the static KV cache (one query token per row)
# ---------------------------------------------------------------------------


def _self_attn_kernel(
    # scalar prefetch
    l_ref,  # [1] layer index
    pos_ref,  # [1] absolute query position
    ks_ref,  # [B] first valid cache slot per row
    # tensor blocks
    q_ref,  # [1, H, dh]
    k_ref,  # [1, 1, 1, H, W, dh]  (cache viewed [L, B, 1, H, W, dh])
    v_ref,
    ks_scale_ref,  # [1, 1, H, W] f32 or None
    vs_scale_ref,
    o_ref,  # [1, H, dh]
):
    b = pl.program_id(0)
    _, H, dh = q_ref.shape
    W = k_ref.shape[4]

    ids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    visible = (ids <= pos_ref[0]) & (ids >= ks_ref[b])

    qblk = q_ref[0]  # [H, dh], compute dtype
    acc = jnp.zeros((H, dh), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, dh), 0)
    for h in range(H):  # static unroll: leading-dim indices are free
        q = _row(qblk, h)  # [1, dh]
        k = k_ref[0, 0, 0, h]  # [W, dh]
        if k_ref.dtype == jnp.int8:
            k = k.astype(qblk.dtype)
        qk = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, W]
        if ks_scale_ref is not None:
            qk = qk * _row(ks_scale_ref[0, 0], h)
        qk = jnp.where(visible, qk, NEG)
        m = jnp.max(qk, axis=-1, keepdims=True)
        e = jnp.exp(qk - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)  # [1, W] f32
        if vs_scale_ref is not None:
            w = w * _row(vs_scale_ref[0, 0], h)
        v = v_ref[0, 0, 0, h]
        if v_ref.dtype == jnp.int8:
            w = w.astype(jnp.float32)
            v = v.astype(jnp.float32)
        else:
            w = w.astype(v_ref.dtype)
        out = jax.lax.dot_general(
            w, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, dh]
        acc = jnp.where(rows == h, out, acc)
    o_ref[0] = acc.astype(o_ref.dtype)


def self_attention_step(
    q: jnp.ndarray,  # [B, H, dh], pre-scaled
    k_all: jnp.ndarray,  # [L, B, H, n_ctx, dh]
    v_all: jnp.ndarray,
    layer: jnp.ndarray,  # scalar i32
    q_pos: jnp.ndarray,  # scalar i32: absolute position of the query token
    key_start: Optional[jnp.ndarray],  # [B] i32 or None
    *,
    window: int,  # static: attend cache slots [0, window)
    k_scale: Optional[jnp.ndarray] = None,  # [L, B, H, n_ctx, 1] f32
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, H, dh]
    B, H, dh = q.shape
    L, _, _, n_ctx, _ = k_all.shape
    W = min(window, n_ctx)
    if key_start is None:
        key_start = jnp.zeros((B,), jnp.int32)

    # free reshapes: [L,B,H,ctx,dh] -> [L,B,1,H,ctx,dh] gives the kernel one
    # contiguous (H, W, dh) tile per (layer, row); trailing-1 scale squeeze
    kv_shape = (L, B, 1, H, n_ctx, dh)
    k6 = k_all.reshape(kv_shape)
    v6 = v_all.reshape(kv_shape)
    kv_spec = pl.BlockSpec(
        (1, 1, 1, H, W, dh), lambda b, l, p, s: (l[0], b, 0, 0, 0, 0)
    )

    quant = k_scale is not None
    if quant:
        scale_spec = pl.BlockSpec(
            (1, 1, H, W), lambda b, l, p, s: (l[0], b, 0, 0)
        )
        in_specs = [kv_spec, kv_spec, scale_spec, scale_spec]
        extra = (
            k_scale.reshape(L, B, H, n_ctx),
            v_scale.reshape(L, B, H, n_ctx),
        )
        kernel = _self_attn_kernel
    else:
        in_specs = [kv_spec, kv_spec]
        extra = ()
        kernel = functools.partial(
            _kernel_no_scales, _self_attn_kernel, n_scalars=3
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, dh), lambda b, l, p, s: (b, 0, 0)),
            *in_specs,
        ],
        out_specs=pl.BlockSpec((1, H, dh), lambda b, l, p, s: (b, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, dh), q.dtype),
        interpret=interpret,
    )(
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        jnp.reshape(q_pos, (1,)).astype(jnp.int32),
        key_start.astype(jnp.int32),
        q,
        k6,
        v6,
        *extra,
    )


def _kernel_no_scales(kernel, *refs, n_scalars: int):
    """Adapter: invoke a scale-aware kernel with scale refs = None."""
    scalars = refs[:n_scalars]
    q_ref, k_ref, v_ref, o_ref = refs[n_scalars:]
    kernel(*scalars, q_ref, k_ref, v_ref, None, None, o_ref)


# ---------------------------------------------------------------------------
# cross-attention against per-audio encoder K/V (G group rows share one K/V)
# ---------------------------------------------------------------------------


def _cross_attn_kernel(
    l_ref,  # [1]
    q_ref,  # [1, 1, G, dh]
    k_ref,  # [1, 1, 1, Tk, dh]
    v_ref,
    ks_scale_ref,  # [1, 1, H, Tk] f32 or None (whole-audio block; row h)
    vs_scale_ref,
    o_ref,  # [1, 1, G, dh]
):
    h = pl.program_id(1)
    Tk = k_ref.shape[3]
    q = q_ref[0, 0]  # [G, dh], compute dtype
    k = k_ref[0, 0, 0]  # [Tk, dh]
    if k_ref.dtype == jnp.int8:
        k = k.astype(q_ref.dtype)

    qk = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, Tk]
    if ks_scale_ref is not None:
        qk = qk * _row(ks_scale_ref[0, 0], h)

    m = jnp.max(qk, axis=-1, keepdims=True)
    e = jnp.exp(qk - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    if vs_scale_ref is not None:
        w = w * _row(vs_scale_ref[0, 0], h)

    v = v_ref[0, 0, 0]
    if v_ref.dtype == jnp.int8:
        w = w.astype(jnp.float32)
        v = v.astype(jnp.float32)
    else:
        w = w.astype(v_ref.dtype)
    out = jax.lax.dot_general(
        w, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def cross_attention_step(
    q: jnp.ndarray,  # [A, G, H, dh], pre-scaled
    k_all: jnp.ndarray,  # [L, A, H, Tk, dh]
    v_all: jnp.ndarray,
    layer: jnp.ndarray,  # scalar i32
    *,
    k_scale: Optional[jnp.ndarray] = None,  # [L, A, H, Tk, 1] f32
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:  # [A, G, H, dh]
    A, G, H, dh = q.shape
    L, _, _, Tk, _ = k_all.shape
    # query laid out [A, H, G, dh] so the (a, h) block is contiguous
    q_t = q.transpose(0, 2, 1, 3)

    kv_spec = pl.BlockSpec(
        (1, 1, 1, Tk, dh), lambda a, h, l: (l[0], a, h, 0, 0)
    )
    quant = k_scale is not None
    if quant:
        # whole [H, Tk] scale block per audio (revisited across h steps)
        scale_spec = pl.BlockSpec(
            (1, 1, H, Tk), lambda a, h, l: (l[0], a, 0, 0)
        )
        in_specs = [kv_spec, kv_spec, scale_spec, scale_spec]
        extra = (
            k_scale.reshape(L, A, H, Tk),
            v_scale.reshape(L, A, H, Tk),
        )
        kernel = _cross_attn_kernel
    else:
        in_specs = [kv_spec, kv_spec]
        extra = ()
        kernel = functools.partial(
            _kernel_no_scales, _cross_attn_kernel, n_scalars=1
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A, H),
        in_specs=[
            pl.BlockSpec((1, 1, G, dh), lambda a, h, l: (a, h, 0, 0)),
            *in_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, G, dh), lambda a, h, l: (a, h, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, H, G, dh), q.dtype),
        interpret=interpret,
    )(
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        q_t,
        k_all,
        v_all,
        *extra,
    )
    return out.transpose(0, 2, 1, 3)  # [A, G, H, dh]
