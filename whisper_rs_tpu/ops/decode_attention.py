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

Mosaic constraints + perf findings shaping the design (see ROADMAP):
  * the SELF kernel computes all heads at once on the VPU
    (broadcast-multiply + reduce over dh) — per-head MXU matvecs are
    latency-bound; its f32 upcasts are per-row tiles so VMEM stays small;
  * the CROSS kernel uses per-head MXU dots: with the pre-transposed K
    ([dh, Tk]) the dot is the native MXU form, and measured ~1.5x the HBM
    roofline vs 2.3x for the XLA einsum path (scan-xs copy + transpose)
    and ~2.4x for a VPU formulation (compute-bound at Tk=1500);
  * dynamic sublane slices must be 8-aligned -> heads are never sliced
    dynamically (leading-dim static indices are free);
  * blocks with a trailing length-1 lane dim pad 1 -> 128 in VMEM, so the
    per-position int8 scales are passed squeezed to 4-D;
  * the VPU self kernel upcasts to f32 BEFORE the multiply so its
    reduction matches the MXU's f32 accumulation.

Reference seam being accelerated: the per-step decoder attention of
model.rs:186-206 driven from decode/mod.rs:236-244.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # finite mask value (NaN-free, matches decode loop's BIG_NEG)


def _row(block2d: jnp.ndarray, h: int) -> jnp.ndarray:
    """Row h of a [H, N] block as [1, N] via masked reduction (Mosaic-safe
    for sublane offsets that aren't 8-aligned)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, block2d.shape, 0)
    zero = jnp.zeros((), block2d.dtype)
    return jnp.sum(jnp.where(rows == h, block2d, zero), axis=0, keepdims=True)


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
    k_ref,  # [1, 1, 1, H, dh, W]  (transposed cache viewed [L,B,1,H,dh,ctx])
    v_ref,  # [1, 1, 1, H, W, dh]
    ks_scale_ref,  # [1, 1, H, W] f32 or None
    vs_scale_ref,
    o_ref,  # [1, H, dh]
):
    b = pl.program_id(0)
    _, H, dh = q_ref.shape
    W = k_ref.shape[5]

    q = q_ref[0].astype(jnp.float32)  # [H, dh]
    k = k_ref[0, 0, 0].astype(jnp.float32)  # [H, dh, W]
    qk = jnp.sum(q[:, :, None] * k, axis=1)  # [H, W] f32, all heads on VPU
    if ks_scale_ref is not None:
        qk = qk * ks_scale_ref[0, 0]  # [H, W]

    ids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    visible = (ids <= pos_ref[0]) & (ids >= ks_ref[b])
    qk = jnp.where(visible, qk, NEG)

    m = jnp.max(qk, axis=-1, keepdims=True)
    e = jnp.exp(qk - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # [H, W] f32
    if vs_scale_ref is not None:
        w = w * vs_scale_ref[0, 0]

    v = v_ref[0, 0, 0].astype(jnp.float32)  # [H, W, dh]
    out = jnp.sum(w[:, :, None] * v, axis=1)  # [H, dh]
    o_ref[0] = out.astype(o_ref.dtype)


def self_attention_step(
    q: jnp.ndarray,  # [B, H, dh], pre-scaled
    k_all: jnp.ndarray,  # [L, B, H, dh, n_ctx] (transposed, see KVCache)
    v_all: jnp.ndarray,  # [L, B, H, n_ctx, dh]
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
    n_ctx = v_all.shape[3]
    L = k_all.shape[0]
    W = min(window, n_ctx)
    # transposed-K blocks put W on the lane axis: round up to a Mosaic-legal
    # width (multiple of 128, or the full context) — the mask hides the rest
    if W % 128:
        W = min(-(-W // 128) * 128, n_ctx)
    if key_start is None:
        key_start = jnp.zeros((B,), jnp.int32)

    # free reshapes: a dummy axis gives the kernel one contiguous per-row
    # tile per (layer, row); trailing-1 scale squeeze
    k6 = k_all.reshape(L, B, 1, H, dh, n_ctx)
    v6 = v_all.reshape(L, B, 1, H, n_ctx, dh)
    k_spec = pl.BlockSpec(
        (1, 1, 1, H, dh, W), lambda b, l, p, s: (l[0], b, 0, 0, 0, 0)
    )
    v_spec = pl.BlockSpec(
        (1, 1, 1, H, W, dh), lambda b, l, p, s: (l[0], b, 0, 0, 0, 0)
    )

    quant = k_scale is not None
    if quant:
        scale_spec = pl.BlockSpec(
            (1, 1, H, W), lambda b, l, p, s: (l[0], b, 0, 0)
        )
        in_specs = [k_spec, v_spec, scale_spec, scale_spec]
        extra = (
            k_scale.reshape(L, B, H, n_ctx),
            v_scale.reshape(L, B, H, n_ctx),
        )
        kernel = _self_attn_kernel
    else:
        in_specs = [k_spec, v_spec]
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
# fused-plane self-attention (greedy incremental step)
# ---------------------------------------------------------------------------


def _self_fused_kernel(l_ref, pos_ref, ks_ref, q_ref, k_ref, v_ref, o_ref):
    b = pl.program_id(0)
    _, H, dh = q_ref.shape
    W = k_ref.shape[-2]

    q = q_ref[0].astype(jnp.float32)  # [H, dh]
    k = k_ref[0, 0].astype(jnp.float32)  # [H, W, dh] (ctx-major)
    qk = jnp.sum(q[:, None, :] * k, axis=2)  # [H, W] f32, all heads on VPU

    ids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    visible = (ids <= pos_ref[0]) & (ids >= ks_ref[b])
    qk = jnp.where(visible, qk, NEG)

    m = jnp.max(qk, axis=-1, keepdims=True)
    e = jnp.exp(qk - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # [H, W]

    v = v_ref[0, 0].astype(jnp.float32)  # [H, W, dh] (ctx-major)
    out = jnp.sum(w[:, :, None] * v, axis=1)  # [H, dh]
    o_ref[0] = out.astype(o_ref.dtype)


def self_attention_fused_step(
    q: jnp.ndarray,  # [B, H, dh], pre-scaled
    k_all: jnp.ndarray,  # [L, B, H, n_ctx, dh] — K CTX-MAJOR (V's layout)
    v_all: jnp.ndarray,  # [L, B, H, n_ctx, dh]
    layer: jnp.ndarray,  # scalar i32
    q_pos: jnp.ndarray,  # scalar i32
    key_start: Optional[jnp.ndarray],  # [B] i32 or None
    *,
    window: int,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, H, dh]
    """Greedy-step self-attention over a ctx-major cache (both planes in
    V's [.., n_ctx, dh] layout).

    Design constraints that picked this layout (device traces, large-v3
    b12 W=448, r4):

      * XLA lowers the [1,64]x[64,W] qk/pv cache dots as kLoop fusions
        that read at ~240 GB/s — 114 us/layer is the bar to beat;
      * a Pallas kernel over the transposed [.., dh, ctx] planes reads at
        ~634 GB/s (43 us/layer) — but ANY lane-column cache write whose
        buffer feeds an opaque pallas consumer copy-lowers into a full
        per-layer cache copy (+54 us per plane, measured; the megakernel
        round hit the same wall, ROADMAP), eating the entire win;
      * ctx-major makes the per-step column writes SUBLANE writes — the
        form that fuses in place with the projection producers even with
        a pallas consumer — at a ~13% DMA tax for half-empty [W, dh=64]
        tiles (megakernel finding).  Net: ~50 vs 114 us/layer.

    The decode loop flips K to ctx-major once per window after prefill
    (decode/loop.py), exactly like the megakernel path."""
    B, H, dh = q.shape
    n_ctx = k_all.shape[-2]
    W = min(window, n_ctx)
    if W % 8:
        W = min(-(-W // 8) * 8, n_ctx)
    if key_start is None:
        key_start = jnp.zeros((B,), jnp.int32)

    # VMEM: double-buffered [H, W, dh] blocks (x2 streams) + the f32
    # upcasts/products of the all-heads VPU math (NOT stack-reused —
    # budget every live intermediate): ~4 f32 copies of one plane
    block_bytes = 2 * H * dh * W * k_all.dtype.itemsize
    temps = 4 * H * dh * W * 4
    need = 2 * (block_bytes + temps)
    vmem = (
        None
        if need <= 14 * 1024 * 1024
        else min(-(-need // (1 << 20)) * (1 << 20), 100 * 1024 * 1024)
    )

    plane_spec = pl.BlockSpec(
        (1, 1, H, W, dh), lambda b, l, p, s: (l[0], b, 0, 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, dh), lambda b, l, p, s: (b, 0, 0)),
            plane_spec,
            plane_spec,
        ],
        out_specs=pl.BlockSpec((1, H, dh), lambda b, l, p, s: (b, 0, 0)),
    )
    kwargs = {}
    if vmem:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem
        )
    return pl.pallas_call(
        _self_fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, dh), q.dtype),
        interpret=interpret,
        **kwargs,
    )(
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        jnp.reshape(q_pos, (1,)).astype(jnp.int32),
        key_start.astype(jnp.int32),
        q,
        k_all,
        v_all,
    )


# ---------------------------------------------------------------------------
# append+attend self-attention: in-kernel column write, transposed planes
# ---------------------------------------------------------------------------


def _self_append_kernel(
    # scalar prefetch
    l_ref,  # [1] layer index
    pos_ref,  # [1] absolute query position
    ks_ref,  # [B] first valid cache slot per row
    # tensor operands
    q_ref,  # [1, H, dh] VMEM block (pre-scaled)
    knew_ref,  # [1, H, dh] VMEM block — this step's K projection
    vnew_ref,  # [1, H, dh]
    kc_any,  # [L, B, H, dh, ctx_pad] HBM — aliased with kc_out
    vc_any,  # [L, B, H, dh, ctx_pad] HBM — V TRANSPOSED TOO (aliased)
    # outputs
    o_ref,  # [1, H, dh] VMEM block
    kc_out,  # HBM alias of kc_any
    vc_out,  # HBM alias of vc_any
    # scratch
    k_vmem,  # [2, H, dh, Wr] cache dtype — double-buffered across programs
    v_vmem,
    rd_sems,  # DMA semaphores [2 slots, 2 planes]
    wr_sems,
    *,
    window: int,  # Wr: static read width, multiple of 128
):
    b = pl.program_id(0)
    B = pl.num_programs(0)
    _, H, dh = q_ref.shape
    Wr = window
    l = l_ref[0]
    p = pos_ref[0]
    slot = lax.rem(b, 2)
    nxt = 1 - slot

    # Manual cross-program double buffering: program b's plane reads are
    # issued by program b-1 (b==0 self-issues), so the dominant DMAs
    # overlap the previous program's splice/compute/write-back.  Scratch
    # and semaphores persist across the sequential grid.
    def start_reads(row, sl):
        pltpu.make_async_copy(
            kc_any.at[l, row, :, :, pl.ds(0, Wr)], k_vmem.at[sl],
            rd_sems.at[sl, 0],
        ).start()
        pltpu.make_async_copy(
            vc_any.at[l, row, :, :, pl.ds(0, Wr)], v_vmem.at[sl],
            rd_sems.at[sl, 1],
        ).start()

    def wait_writes(sl):
        pltpu.make_async_copy(
            k_vmem.at[sl, :, :, pl.ds(0, 128)],
            kc_out.at[l, 0, :, :, pl.ds(0, 128)],
            wr_sems.at[sl, 0],
        ).wait()
        pltpu.make_async_copy(
            v_vmem.at[sl, :, :, pl.ds(0, 128)],
            vc_out.at[l, 0, :, :, pl.ds(0, 128)],
            wr_sems.at[sl, 1],
        ).wait()

    @pl.when(b == 0)
    def _():
        start_reads(0, 0)

    @pl.when(b + 1 < B)
    def _():
        # slot `nxt` was read+written by program b-1: its write-back must
        # land before the next read overwrites the buffer
        @pl.when(b >= 1)
        def _():
            wait_writes(nxt)

        start_reads(b + 1, nxt)

    pltpu.make_async_copy(
        kc_any.at[l, b, :, :, pl.ds(0, Wr)], k_vmem.at[slot],
        rd_sems.at[slot, 0],
    ).wait()
    pltpu.make_async_copy(
        vc_any.at[l, b, :, :, pl.ds(0, Wr)], v_vmem.at[slot],
        rd_sems.at[slot, 1],
    ).wait()

    # splice the fresh column into the VMEM copy, then write back ONLY the
    # 128-wide lane block containing it (the write never exists at the XLA
    # level, so there is no lane-column dynamic_update_slice to copy-lower
    # — the +54 us/plane wall that ate the transposed-read win in r4).  A
    # raw [H, dh, 1] column DMA is illegal (1-lane slice of a (8,128)-tiled
    # memref, HBM included — r5 on-chip finding), so the write rides the
    # aligned block.
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, dh, Wr), 2)
    kf = jnp.where(
        lane == p,
        knew_ref[0].astype(jnp.float32)[:, :, None],
        k_vmem[slot].astype(jnp.float32),
    )
    vf = jnp.where(
        lane == p,
        vnew_ref[0].astype(jnp.float32)[:, :, None],
        v_vmem[slot].astype(jnp.float32),
    )
    k_vmem[slot] = kf.astype(k_vmem.dtype)
    v_vmem[slot] = vf.astype(v_vmem.dtype)
    pw = (p // 128) * 128  # 128-aligned block containing column p
    pltpu.make_async_copy(
        k_vmem.at[slot, :, :, pl.ds(pw, 128)],
        kc_out.at[l, b, :, :, pl.ds(pw, 128)],
        wr_sems.at[slot, 0],
    ).start()
    pltpu.make_async_copy(
        v_vmem.at[slot, :, :, pl.ds(pw, 128)],
        vc_out.at[l, b, :, :, pl.ds(pw, 128)],
        wr_sems.at[slot, 1],
    ).start()

    # attention over the spliced planes (fresh column included, so the
    # standard <= pos mask applies), overlapping both neighbours' DMAs
    q = q_ref[0].astype(jnp.float32)  # [H, dh]
    qk = jnp.sum(q[:, :, None] * kf, axis=1)  # [H, Wr] f32, all heads VPU

    ids = jax.lax.broadcasted_iota(jnp.int32, (1, Wr), 1)
    visible = (ids <= p) & (ids >= ks_ref[b])
    qk = jnp.where(visible, qk, NEG)

    m = jnp.max(qk, axis=-1, keepdims=True)
    e = jnp.exp(qk - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # [H, Wr]
    out = jnp.sum(w[:, None, :] * vf, axis=2)  # [H, dh]
    o_ref[0] = out.astype(o_ref.dtype)

    # drain: the final program owns the last two outstanding write-backs
    @pl.when(b == B - 1)
    def _():
        @pl.when(B >= 2)
        def _():
            wait_writes(nxt)

        wait_writes(slot)


def append_ctx_pad(n_ctx: int) -> int:
    """Lane padding of the append-mode cache planes: DMA slice widths on
    tiled memrefs must be 128-multiples, so the planes carry n_ctx rounded
    up (448 -> 512).  The pad region is zero-filled and never attended."""
    return -(-n_ctx // 128) * 128


def self_attention_append_step(
    q: jnp.ndarray,  # [B, H, dh], pre-scaled
    k_new: jnp.ndarray,  # [B, H, dh] — this step's K projection (unwritten)
    v_new: jnp.ndarray,  # [B, H, dh]
    k_all: jnp.ndarray,  # [L, B, H, dh, ctx_pad] — TRANSPOSED (KVCache layout)
    v_all: jnp.ndarray,  # [L, B, H, dh, ctx_pad] — V transposed too
    layer: jnp.ndarray,  # scalar i32
    q_pos: jnp.ndarray,  # scalar i32
    key_start: Optional[jnp.ndarray],  # [B] i32 or None
    *,
    window: int,
    interpret: bool = False,
) -> tuple:  # (out [B, H, dh], k_all', v_all')
    """Greedy-step self-attention that APPENDS the step's K/V column inside
    the kernel (manual DMA into the aliased HBM cache) and reads both
    planes in the fast transposed [.., dh, ctx] layout.

    Why this shape (r4 device traces, large-v3 b12 W=448):

      * transposed-plane Pallas reads run at ~634 GB/s (43 us/layer) vs
        ~300 GB/s ctx-major (92 us) and ~240 GB/s for XLA's cache dots
        (114 us) — but an XLA-level lane-column cache write feeding an
        opaque pallas consumer copy-lowers into a full per-layer cache
        copy (+54 us/plane), which is why r4 shipped the slower ctx-major
        kernel (in-place sublane writes) instead;
      * moving the write INSIDE the kernel (VERDICT r4 #2) removes the
        XLA write entirely: the caches ride input_output_aliases and the
        kernel splices the fresh column into its VMEM copy and DMAs the
        128-wide aligned lane block back (Mosaic rejects 1-lane slices of
        tiled memrefs, in HBM too — r5 on-chip finding; the aligned-block
        write-back costs ~0.33 MB/plane/row/layer, ~28%% of the read
        stream, all overlapped with compute).

    The caller flips V to the transposed layout and lane-pads both planes
    to ``append_ctx_pad`` once per window after prefill."""
    B, H, dh = q.shape
    ctx_pad = k_all.shape[-1]
    assert ctx_pad % 128 == 0, "append cache planes must be lane-padded"
    # static read width: multiple of 128 covering the live window
    Wr = min(-(-window // 128) * 128, ctx_pad)
    if key_start is None:
        key_start = jnp.zeros((B,), jnp.int32)

    dt = k_all.dtype
    # VMEM: double-buffered read scratch (2 slots x 2 planes) + the f32
    # spliced copies + products of the all-heads VPU math (NOT
    # stack-reused — budget every live f32)
    need = 4 * H * dh * Wr * dt.itemsize + 6 * H * dh * Wr * 4
    vmem = (
        None
        if need <= 14 * 1024 * 1024
        else min(-(-need // (1 << 20)) * (1 << 20), 110 * 1024 * 1024)
    )

    row_spec = pl.BlockSpec((1, H, dh), lambda b, l, p, s: (b, 0, 0))
    # HBM-pinned (not ANY): with ANY, a small-enough cache lands in VMEM
    # where the block write-back's dynamic lane slicing is not supported
    # for every shape; production caches could never live in VMEM anyway.
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[row_spec, row_spec, row_spec, any_spec, any_spec],
        out_specs=[row_spec, any_spec, any_spec],
        scratch_shapes=[
            pltpu.VMEM((2, H, dh, Wr), dt),
            pltpu.VMEM((2, H, dh, Wr), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kwargs = {}
    if vmem:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=vmem)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_self_append_kernel, window=Wr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, dh), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        # +3 for the scalar-prefetch operands: input_output_aliases counts
        # ALL pallas_call operands, scalars included
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
        **kwargs,
    )(
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        jnp.reshape(q_pos, (1,)).astype(jnp.int32),
        key_start.astype(jnp.int32),
        q,
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out, k_out, v_out


# ---------------------------------------------------------------------------
# cross-attention against per-audio encoder K/V (G group rows share one K/V)
# ---------------------------------------------------------------------------


def _cross_attn_kernel(
    l_ref,  # [1]
    q_ref,  # [ac, hc, G, dh]
    kv_ref,  # [1, ac, hc, 2, dh, Tk]  (fused K^T/V^T planes, see CrossKV —
    #   ONE array so the pipeline issues ONE DMA stream per grid step:
    #   measured 540 vs 446 GB/s for two interleaved arrays on v5e)
    ks_scale_ref,  # [1, ac, hc, Tk] f32 or None
    vs_scale_ref,
    o_ref,  # [ac, hc, G, dh]
):
    ac, hc, G, dh = q_ref.shape
    Tk = kv_ref.shape[5]

    # MXU dots per head: [G, dh] @ [dh, Tk] is the native MXU form thanks
    # to the pre-transposed K; the value matmul contracts V^T's last axis
    # ([dh, Tk] x [G, Tk] -> [dh, G]).  ac, G and hc are tiny static ints;
    # the audio-block loop amortizes per-program overhead over ac audios.
    for a in range(ac):
        outs = []
        for h in range(hc):
            q = q_ref[a, h]  # [G, dh] (leading-dim static index: free)
            k = kv_ref[0, a, h, 0]  # [dh, Tk]
            if kv_ref.dtype == jnp.int8:
                k = k.astype(q_ref.dtype)
            qk = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, Tk]
            if ks_scale_ref is not None:
                qk = qk * _row(ks_scale_ref[0, a], h)
            m = jnp.max(qk, axis=-1, keepdims=True)
            e = jnp.exp(qk - m)
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            if vs_scale_ref is not None:
                w = w * _row(vs_scale_ref[0, a], h)
            v_t = kv_ref[0, a, h, 1]  # [dh, Tk]
            if kv_ref.dtype == jnp.int8:
                w = w.astype(jnp.float32)
                v_t = v_t.astype(jnp.float32)
            else:
                w = w.astype(kv_ref.dtype)
            ov = jax.lax.dot_general(
                w, v_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, dh]
            outs.append(ov[:, None, :])  # [G, 1, dh]
        out = outs[0] if hc == 1 else jnp.concatenate(outs, axis=1)
        o_ref[a] = out.transpose(1, 0, 2).astype(o_ref.dtype)  # [hc, G, dh]


def _cross_kernel_no_scales(l_ref, q_ref, kv_ref, o_ref):
    _cross_attn_kernel(l_ref, q_ref, kv_ref, None, None, o_ref)


def _cross_vmem_per_chunk(
    hc: int, Tk: int, dh: int, itemsize: int, ac: int = 1
) -> int:
    """Estimated VMEM: K+V blocks double-buffered + per-head dot temps
    (an int8->compute upcast of one [Tk, dh] tile at a time)."""
    blocks = 2 * 2 * ac * hc * Tk * dh * itemsize
    temps = 2 * Tk * dh * 4
    return blocks + temps


_CROSS_VMEM_BUDGET = 10 * 1024 * 1024  # default scoped VMEM is 16 MB
# (the unrolled head loop keeps ~hc f32 [G, Tk] qk/softmax temps live on
# top of the double-buffered blocks, so the margin must be generous)


def _cross_env():
    """Tuning knobs: WHISPER_CROSS_HC (head chunk), WHISPER_CROSS_AC
    (audio-block chunk), WHISPER_CROSS_VMEM_MB (scoped-VMEM budget; values
    above 16 are passed to Mosaic via vmem_limit_bytes — v5e has 128 MB of
    VMEM, so bigger double-buffered blocks = fewer, better-amortized grid
    programs for the HBM-bound cross stream)."""
    import os

    hc = os.environ.get("WHISPER_CROSS_HC")
    ac = os.environ.get("WHISPER_CROSS_AC")
    mb = os.environ.get("WHISPER_CROSS_VMEM_MB")
    return (
        int(hc) if hc else None,
        int(ac) if ac else None,
        int(mb) * 1024 * 1024 if mb else _CROSS_VMEM_BUDGET,
    )


def _cross_chunks(
    A: int, H: int, Tk: int, dh: int, itemsize: int
) -> tuple:
    """(audio-chunk, head-chunk, vmem_limit) for the cross kernel grid.

    Prefers whole-H head chunks first (one output tile per audio), then
    grows the audio chunk while the double-buffered blocks fit the budget.
    """
    env_hc, env_ac, budget = _cross_env()
    if env_hc is not None and H % env_hc == 0:
        hc = env_hc
    else:
        hc = 1
        for cand in range(H, 0, -1):
            if H % cand == 0 and _cross_vmem_per_chunk(
                cand, Tk, dh, itemsize
            ) <= budget:
                hc = cand
                break
    # measured (base.en b32, v5e): ac>1 is SLOWER at every size (2.045 ->
    # 2.061/2.088/2.232 ms/step for ac=1/2/4/8) — per-program overhead is
    # not the bottleneck and coarser blocks pipeline worse.  Default 1;
    # the env knob remains for re-testing on other chip generations.
    ac = env_ac if (env_ac is not None and A % env_ac == 0) else 1
    return ac, hc, _cross_vmem_limit(hc, Tk, dh, itemsize, ac)


def _cross_vmem_limit(hc, Tk, dh, itemsize, ac):
    """Mosaic vmem_limit_bytes for the chosen chunks, or None for the
    default 16 MB window.  Measured: actual scoped allocation runs ~1.4x
    the double-buffered-block estimate (output/q blocks + unrolled-loop
    temps) — budget 2x and round up to whole MB."""
    need = 2 * _cross_vmem_per_chunk(hc, Tk, dh, itemsize, ac)
    if need <= 14 * 1024 * 1024:
        return None
    return min(-(-need // (1024 * 1024)) * 1024 * 1024, 100 * 1024 * 1024)


def cross_attention_pallas_ok(
    H: int, Tk: int, dh: int, itemsize: int, quant: bool
) -> bool:
    """Whether the cross kernel supports this shape.  The quantized path
    needs whole-H blocks (per-position scale BlockSpecs can't head-chunk
    without violating Mosaic's second-minor alignment), which must then fit
    VMEM; callers fall back to the XLA path otherwise."""
    if not quant:
        return True
    return _cross_vmem_per_chunk(H, Tk, dh, itemsize) <= _CROSS_VMEM_BUDGET


def cross_attention_step(
    q: jnp.ndarray,  # [A, G, H, dh], pre-scaled
    kv_all: jnp.ndarray,  # [L, A, H, 2, dh, Tk] (fused K^T/V^T, see CrossKV)
    layer: jnp.ndarray,  # scalar i32
    *,
    k_scale: Optional[jnp.ndarray] = None,  # [L, A, H, Tk, 1] f32
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:  # [A, G, H, dh]
    A, G, H, dh = q.shape
    Tk = kv_all.shape[-1]
    # query laid out [A, H, G, dh] so the (a, head-chunk) block is contiguous
    q_t = q.transpose(0, 2, 1, 3)

    quant = k_scale is not None
    if quant:
        # int8 K/V blocks are small enough for whole-H blocks, which the
        # scale BlockSpec needs anyway (chunked scale blocks would violate
        # Mosaic's second-minor-dim alignment for non-multiple-of-8 chunks)
        env_hc, env_ac, budget = _cross_env()
        hc = H
        ac = env_ac if (env_ac and A % env_ac == 0) else 1  # see _cross_chunks
        vmem_limit = _cross_vmem_limit(hc, Tk, dh, kv_all.dtype.itemsize, ac)
    else:
        ac, hc, vmem_limit = _cross_chunks(A, H, Tk, dh, kv_all.dtype.itemsize)
    kv_spec = pl.BlockSpec(
        (1, ac, hc, 2, dh, Tk), lambda a, hj, l: (l[0], a, hj, 0, 0, 0)
    )
    L = kv_all.shape[0]
    if quant:
        scale_spec = pl.BlockSpec(
            (1, ac, hc, Tk), lambda a, hj, l: (l[0], a, hj, 0)
        )
        in_specs = [kv_spec, scale_spec, scale_spec]
        extra = (
            k_scale.reshape(L, A, H, Tk),
            v_scale.reshape(L, A, H, Tk),
        )
        kernel = _cross_attn_kernel
    else:
        in_specs = [kv_spec]
        extra = ()
        kernel = _cross_kernel_no_scales

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // ac, H // hc),
        in_specs=[
            pl.BlockSpec((ac, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
            *in_specs,
        ],
        out_specs=pl.BlockSpec((ac, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, H, G, dh), q.dtype),
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
            if vmem_limit
            else None
        ),
    )(
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        q_t,
        kv_all,
        *extra,
    )
    return out.transpose(0, 2, 1, 3)  # [A, G, H, dh]


# ---------------------------------------------------------------------------
# beam self-attention with in-kernel ancestor resolution (gather-at-read)
# ---------------------------------------------------------------------------


def _beam_self_kernel(
    # scalar prefetch
    l_ref,  # [1] layer index
    pos_ref,  # [1] absolute query position
    ks_ref,  # [B] first valid cache slot per row
    # tensor blocks
    q_ref,  # [1, hc, G, dh]
    k_ref,  # [1, 1, G, hc, dh, W]  (cache viewed [L, A, G, H, dh, ctx])
    v_ref,  # [1, 1, G, hc, W, dh]
    ks_scale_ref,  # [1, 1, G, H, W] f32 or None (int8 mode; WHOLE-H block —
    #   a head-chunked scale block would put hc on the second-minor dim,
    #   which Mosaic only allows 8-aligned; rows are selected in-kernel)
    vs_scale_ref,
    anc_ref,  # [1, G, W] i32: LOCAL ancestor beam per (query beam, position)
    o_ref,  # [1, hc, G, dh]
):
    a = pl.program_id(0)
    hj = pl.program_id(1)
    _, hc, G, dh = q_ref.shape
    W = k_ref.shape[5]

    q = q_ref[0].astype(jnp.float32)  # [hc, G, dh]
    anc = anc_ref[0]  # [G, W]

    def scale_rows(sref, gp):
        """Heads [hj*hc, hj*hc+hc) of the whole-H scale block for source
        beam gp, as [hc, W] (masked-reduce row select: dynamic sublane
        offsets need not be 8-aligned this way)."""
        block = sref[0, 0, gp]  # [H, W]
        rows = [_row(block, hj * hc + i) for i in range(hc)]
        return rows[0] if hc == 1 else jnp.concatenate(rows, axis=0)

    # all-pairs qk on the VPU, then select each (beam, position)'s ancestor
    # row — the G-fold compute blowup rides otherwise-idle VPU lanes, and
    # every K/V byte is read exactly once (no permuted cache copy, no
    # XLA-level resolved-gather materialization).
    qk = jnp.full((hc, G, W), NEG, jnp.float32)
    for gp in range(G):
        kgp = k_ref[0, 0, gp].astype(jnp.float32)  # [hc, dh, W]
        qk_gp = jnp.sum(q[:, :, :, None] * kgp[:, None, :, :], axis=2)
        if ks_scale_ref is not None:
            qk_gp = qk_gp * scale_rows(ks_scale_ref, gp)[:, None, :]
        qk = jnp.where(anc[None] == gp, qk_gp, qk)

    ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    visible = (ids <= pos_ref[0]) & (ids >= ks_ref[a * G])
    qk = jnp.where(visible, qk, NEG)

    m = jnp.max(qk, axis=-1, keepdims=True)
    e = jnp.exp(qk - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # [hc, G, W] f32

    out = jnp.zeros((hc, G, dh), jnp.float32)
    for gp in range(G):
        vgp = v_ref[0, 0, gp].astype(jnp.float32)  # [hc, W, dh]
        w_gp = jnp.where(anc[None] == gp, w, 0.0)
        if vs_scale_ref is not None:
            w_gp = w_gp * scale_rows(vs_scale_ref, gp)[:, None, :]
        out = out + jnp.sum(w_gp[:, :, :, None] * vgp[:, None, :, :], axis=2)
    o_ref[0] = out.astype(o_ref.dtype)


def _beam_kernel_no_scales(l_ref, pos_ref, ks_ref, q, k, v, anc, o):
    _beam_self_kernel(l_ref, pos_ref, ks_ref, q, k, v, None, None, anc, o)


def _beam_head_chunk(
    H: int, G: int, W: int, dh: int, itemsize: int, quant: bool = False
) -> int:
    """Largest divisor of H fitting the VMEM budget.  Mosaic keeps the
    f32 [hc, G, dh, W] product of EVERY unrolled source-beam iteration
    live simultaneously (observed: no stack reuse across the static G
    loop), so the intermediate term scales with 2*G.  The int8 mode adds
    whole-H f32 scale blocks (independent of hc)."""
    budget = 10 * 1024 * 1024
    scales = 2 * 2 * G * H * W * 4 if quant else 0
    for hc in range(H, 0, -1):
        blocks = 2 * 2 * G * hc * W * dh * itemsize
        inter = 2 * G * hc * G * dh * W * 4
        if H % hc == 0 and blocks + inter + scales <= budget:
            return hc
    return 1


def beam_self_attention_step(
    q: jnp.ndarray,  # [B, H, dh], pre-scaled (B = A*G, beams interleaved)
    k_all: jnp.ndarray,  # [L, B, H, dh, n_ctx] (transposed, see KVCache)
    v_all: jnp.ndarray,  # [L, B, H, n_ctx, dh]
    layer: jnp.ndarray,
    q_pos: jnp.ndarray,
    key_start: Optional[jnp.ndarray],  # [B] i32 or None
    anc_local: jnp.ndarray,  # [B, n_ctx] i32, values in [0, G)
    group: int,
    *,
    window: int,
    k_scale: Optional[jnp.ndarray] = None,  # [L, B, H, n_ctx, 1] f32 (int8)
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, H, dh]
    B, H, dh = q.shape
    n_ctx = v_all.shape[3]
    L = k_all.shape[0]
    G = group
    A = B // G
    W = min(window, n_ctx)
    if W % 128:
        W = min(-(-W // 128) * 128, n_ctx)
    if key_start is None:
        key_start = jnp.zeros((B,), jnp.int32)

    q_t = q.reshape(A, G, H, dh).transpose(0, 2, 1, 3)  # [A, H, G, dh]
    k6 = k_all.reshape(L, A, G, H, dh, n_ctx)
    v6 = v_all.reshape(L, A, G, H, n_ctx, dh)
    anc3 = anc_local.reshape(A, G, n_ctx)

    quant = k_scale is not None
    hc = _beam_head_chunk(H, G, W, dh, k_all.dtype.itemsize, quant)

    k_spec = pl.BlockSpec(
        (1, 1, G, hc, dh, W), lambda a, hj, l, p, s: (l[0], a, 0, hj, 0, 0)
    )
    v_spec = pl.BlockSpec(
        (1, 1, G, hc, W, dh), lambda a, hj, l, p, s: (l[0], a, 0, hj, 0, 0)
    )
    if quant:
        # whole-H scale blocks (see kernel docstring); squeeze trailing 1
        scale_spec = pl.BlockSpec(
            (1, 1, G, H, W), lambda a, hj, l, p, s: (l[0], a, 0, 0, 0)
        )
        in_specs = [k_spec, v_spec, scale_spec, scale_spec]
        extra = (
            k_scale.reshape(L, A, G, H, n_ctx),
            v_scale.reshape(L, A, G, H, n_ctx),
        )
        kernel = _beam_self_kernel
    else:
        in_specs = [k_spec, v_spec]
        extra = ()
        kernel = _beam_kernel_no_scales

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A, H // hc),
        in_specs=[
            pl.BlockSpec((1, hc, G, dh), lambda a, hj, l, p, s: (a, hj, 0, 0)),
            *in_specs,
            pl.BlockSpec((1, G, W), lambda a, hj, l, p, s: (a, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, hc, G, dh), lambda a, hj, l, p, s: (a, hj, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, H, G, dh), q.dtype),
        interpret=interpret,
    )(
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        jnp.reshape(q_pos, (1,)).astype(jnp.int32),
        key_start.astype(jnp.int32),
        q_t,
        k6,
        v6,
        *extra,
        anc3.astype(jnp.int32),
    )
    return out.transpose(0, 2, 1, 3).reshape(B, H, dh)
