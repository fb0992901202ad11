"""Whole-decoder-step Pallas megakernel: every layer, one kernel call.

The incremental decode step (T==1) spends its time in two places (device
trace, tools/profile_trace.py, base.en b32 full-W): the cross-attention
K/V DMA and ~0.65 ms of XLA ops — self-attention cache reads at ~2.2x
their bandwidth roofline plus ~70 small per-step dispatches (LNs,
projections, MLP, residuals, cache updates).  The two streams run
strictly serialized: XLA cannot overlap its fusions with a pallas_call.

This kernel runs the ENTIRE layer stack in one pallas_call per decode
step with grid (layer, phase, audio-chunk):

  * per-layer weights stream as ONE packed [L, 2, n, 8n] array — plane 0
    holds the six [n, n] attention/cross projections, plane 1 the MLP
    (w1 | w2^T) — whose BlockSpec index depends only on (layer, phase):
    each plane is fetched once per layer and prefetched during the
    previous phase's compute.  Packing matters twice: with the same bytes
    split across 20 arrays the pipeline runs at 442 GB/s vs ~650 packed
    (one wide stream beats many interleaved ones, v5e), and splitting the
    pack into two phase planes halves its double-buffered VMEM — which is
    what lets medium-class models (n=1024: 29 MB of weights per layer)
    fit the 128 MB VMEM at all;
  * the phase dimension runs the layer in two pieces — phase 0:
    self-attention + cross-attention (plane 0), phase 1: MLP (plane 1) —
    with the cross-K/V and cache block indices PINNED to their last
    phase-0 block during phase 1, so those streams are fetched exactly
    once per layer;
  * the fused cross-K/V ([L, A, H, 2, dh, Tk], see models.whisper.CrossKV)
    and the self-cache tiles stream per grid step, double-buffered, so
    the dominant DMA overlaps compute (DMA-only ablation == full-compute
    step time: the math hides entirely);
  * the residual stream x lives in a VMEM scratch ([nA, rows, n]) carried
    across grid steps — the TPU grid executes sequentially
    (dimension_semantics "arbitrary");
  * the current token's K/V are computed in-kernel and returned as
    [L, B, n] columns; the caller scatter-writes them into the cache at
    the query position with ONE dynamic_update_slice per buffer.  The
    megakernel path keeps K in V's CTX-MAJOR [L, B, H, ctx, dh] layout
    (the greedy loop flips it once after prefill): a lane-column update
    into the hybrid path's transposed [*, dh, ctx] K copy-lowers on TPU
    (~312 us/step at base.en b32 — tile-granular lane writes only fuse in
    place with their producer, and a pallas_call is opaque), while the
    ctx-major sublane write is in place (~27 us).  The caches are aliased
    through the kernel as passthrough outputs (gmm-style tiny partial
    writes) so those updates apply to buffers XLA owns exclusively.

Semantics match the XLA block math of models.whisper.decoder_forward
(reference seam: model.rs:186-206 + the residual block at model.rs:234-342)
with f32 LayerNorm/softmax/accumulation and bf16 storage:

  x += self_attn(ln1(x))       (cache window + in-register current token)
  x += cross_attn(ln2(x))      (per-audio K/V shared by G group rows)
  x += mlp(ln3(x))             (GELU: tanh approximation in bf16, like
                                models.whisper.gelu)

Greedy/sampling path only: beam ancestors and int8 K/V fall back to the
dedicated kernels in ops/decode_attention.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # finite mask value (NaN-free), matches ops/decode_attention.py

# rows of the packed small-params array [L, 16, 4n]
_ROW_LN1W, _ROW_LN1B, _ROW_BQ, _ROW_BV, _ROW_BO = 0, 1, 2, 3, 4
_ROW_LN2W, _ROW_LN2B, _ROW_BCQ, _ROW_BCO = 5, 6, 7, 8
_ROW_LN3W, _ROW_LN3B, _ROW_B2, _ROW_B1 = 9, 10, 11, 12  # b1 row is 4n wide


def _ln(xf: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """f32 LayerNorm over the last axis (models.whisper.layer_norm)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(out_dtype)


def _dot(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[r, k] @ [k, m] with f32 accumulation, result in a.dtype."""
    out = jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(a.dtype)


def _dot_t(a: jnp.ndarray, wt: jnp.ndarray) -> jnp.ndarray:
    """[r, k] @ [m, k]^T (weight stored transposed).  The smaller operand
    goes first — Mosaic's bf16 lowering of last-dim/last-dim contractions
    fails with the larger operand first (see ROADMAP hard-won facts)."""
    out = jax.lax.dot_general(
        a, wt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(a.dtype)


from .kernel_math import kernel_gelu as _gelu  # noqa: E402 — see kernel_math

def _decoder_step_kernel(
    # scalar prefetch
    pos_ref,  # [1] absolute query position
    ks_ref,  # [B] first valid cache slot per row
    # tensor blocks (per grid step (l, ph, aj))
    x_ref,  # [1, r, n] current token activations (read at l==0, ph==0)
    w_ref,  # [1, 1, n, 8n]: ph0 plane = wq|wk|wv|wo|wcq|wco|pad(2n);
    #   ph1 plane = w1 (4n) | w2^T (4n)
    sp_ref,  # [1, 16, 4n]: biases + LN params (row map above; n-wide rows
    #   use lanes [0, n), the b1 row is full-width — a lane-concat of rows
    #   at different sublane offsets is not lowerable on Mosaic)
    kv_ref,  # [1, ac, H, 2, dh, Tk] fused cross K^T/V^T (pinned at ph1)
    kc_ref,  # [1, 1, r, H, W, dh] self-cache K, CTX-MAJOR (pinned at ph1)
    vc_ref,  # [1, 1, r, H, W, dh] self-cache V (pinned at ph1)
    # outputs
    xo_ref,  # [1, r, n] final activations (every grid step writes;
    #   layer L-1 phase 1 wins)
    ko_ref,  # [1, 1, r, n] this layer's new K column (flat head-major)
    vo_ref,  # [1, 1, r, n] this layer's new V column
    kp_ref,  # [1, 1, r, H, 8, dh] K-cache passthrough (aliased)
    vp_ref,  # [1, 1, r, H, 8, dh] V-cache passthrough (aliased)
    # scratch
    xs_ref,  # VMEM [nA, r, n] residual stream across layers
    *,
    n_head: int,
    group: int,
    scale: float,
    dma_only: bool = False,
):
    l = pl.program_id(0)
    ph = pl.program_id(1)
    aj = pl.program_id(2)
    _, r, n = x_ref.shape
    if dma_only:
        # perf-debug mode (WHISPER_LAYER_DMAONLY=1): touch every stream
        # lightly, skip the math — measures the pipeline's pure-DMA ceiling
        t = (
            jnp.sum(kv_ref[0, 0, 0, 0, :8].astype(jnp.float32))
            + jnp.sum(kc_ref[0, 0, 0, 0, :8].astype(jnp.float32))
            + jnp.sum(vc_ref[0, 0, 0, 0, :8].astype(jnp.float32))
            + jnp.sum(w_ref[0, 0, :8].astype(jnp.float32))
            + jnp.sum(sp_ref[0, :8].astype(jnp.float32))
        )
        xo_ref[0] = x_ref[0] + t.astype(x_ref.dtype)
        ko_ref[0, 0] = x_ref[0]
        vo_ref[0, 0] = x_ref[0]
        kp_ref[0, 0] = kc_ref[0, 0, :, :, :8]
        vp_ref[0, 0] = vc_ref[0, 0, :, :, :8]
        return
    dh = n // n_head
    H = n_head
    G = group
    ac = r // G
    W = kc_ref.shape[4]
    dt = x_ref.dtype

    w = w_ref[0, 0]  # [n, 8n] (current phase's plane)
    sp = sp_ref[0]  # [16, 4n]

    def wcol(i: int, width: int = 1):
        return w[:, i * n:(i + width) * n]

    def row(i: int):
        return sp[i:i + 1, :n]  # [1, n]

    @pl.when((l == 0) & (ph == 0))
    def _():
        xs_ref[aj] = x_ref[0]

    @pl.when(ph == 0)
    def _attention_phase():
        x = xs_ref[aj]  # [r, n]

        # -- self-attention over the cache window + current token ----------
        h = _ln(x.astype(jnp.float32), row(_ROW_LN1W), row(_ROW_LN1B), dt)
        q = (_dot(h, wcol(0)) + row(_ROW_BQ)) * scale  # [r, n]
        k_new = _dot(h, wcol(1))
        v_new = _dot(h, wcol(2)) + row(_ROW_BV)
        ko_ref[0, 0] = k_new
        vo_ref[0, 0] = v_new

        # per-row visibility over the cache window: slots [key_start, pos)
        # (the current token's K/V are in-register, an extra column)
        ids = jax.lax.broadcasted_iota(jnp.int32, (r, W), 1)
        pos = pos_ref[0]
        ks_rows = jnp.concatenate(
            [
                jnp.full((1, W), ks_ref[aj * r + r0], jnp.int32)
                for r0 in range(r)
            ],
            axis=0,
        ) if r > 1 else jnp.full((1, W), ks_ref[aj * r], jnp.int32)
        visible = (ids < pos) & (ids >= ks_rows)  # [r, W]

        # head-major self-attention on the VPU: all static lane slices, no
        # vector reshapes (Mosaic cannot shape-cast [r, n] -> [r, H, dh];
        # bf16 expand-dims is an unsupported shape cast too, so broadcast
        # operands are upcast to f32 first)
        head_attn = []
        for hh in range(H):
            sl = slice(hh * dh, (hh + 1) * dh)
            q_h = q[:, sl].astype(jnp.float32)  # [r, dh]
            k_h = kc_ref[0, 0, :, hh].astype(jnp.float32)  # [r, W, dh]
            qk = jnp.sum(q_h[:, None, :] * k_h, axis=2)  # [r, W]
            qk = jnp.where(visible, qk, NEG)
            kn_h = k_new[:, sl].astype(jnp.float32)
            vn_h = v_new[:, sl].astype(jnp.float32)
            qk_cur = jnp.sum(q_h * kn_h, axis=-1, keepdims=True)  # [r, 1]
            m = jnp.maximum(jnp.max(qk, axis=-1, keepdims=True), qk_cur)
            e = jnp.exp(qk - m)  # [r, W]
            e_cur = jnp.exp(qk_cur - m)  # [r, 1]
            denom = jnp.sum(e, axis=-1, keepdims=True) + e_cur
            v_h = vc_ref[0, 0, :, hh].astype(jnp.float32)  # [r, W, dh]
            out_h = jnp.sum(e[:, :, None] * v_h, axis=1) + e_cur * vn_h
            head_attn.append((out_h / denom).astype(dt))  # [r, dh]
        attn = head_attn[0] if H == 1 else jnp.concatenate(head_attn, axis=1)
        x = x + (_dot(attn, wcol(3)) + row(_ROW_BO))

        # -- cross-attention against the fused per-audio K^T/V^T -----------
        h = _ln(x.astype(jnp.float32), row(_ROW_LN2W), row(_ROW_LN2B), dt)
        qx = (_dot(h, wcol(4)) + row(_ROW_BCQ)) * scale  # [r, n]
        audio_outs = []
        for a in range(ac):
            head_outs = []
            for hh in range(H):
                q_gh = qx[a * G:(a + 1) * G, hh * dh:(hh + 1) * dh]  # [G, dh]
                k_t = kv_ref[0, a, hh, 0]  # [dh, Tk]
                qk = jax.lax.dot_general(
                    q_gh, k_t, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, Tk]
                m = jnp.max(qk, axis=-1, keepdims=True)
                e = jnp.exp(qk - m)
                wsm = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
                v_t = kv_ref[0, a, hh, 1]  # [dh, Tk]
                ov = jax.lax.dot_general(
                    wsm, v_t, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, dh]
                head_outs.append(ov.astype(dt))
            audio_outs.append(
                head_outs[0] if H == 1 else jnp.concatenate(head_outs, axis=1)
            )  # [G, n]
        cross = audio_outs[0] if ac == 1 else jnp.concatenate(audio_outs, axis=0)
        x = x + (_dot(cross, wcol(5)) + row(_ROW_BCO))
        xs_ref[aj] = x

        # cache passthrough (aliased buffers; see module docstring)
        kp_ref[0, 0] = kc_ref[0, 0, :, :, :8]
        vp_ref[0, 0] = vc_ref[0, 0, :, :, :8]

    @pl.when(ph == 1)
    def _mlp_phase():
        x = xs_ref[aj]
        b1 = sp[_ROW_B1:_ROW_B1 + 1]  # [1, 4n] (full-width row)
        h = _ln(x.astype(jnp.float32), row(_ROW_LN3W), row(_ROW_LN3B), dt)
        hid = _gelu(_dot(h, w[:, : 4 * n]) + b1)  # [r, 4n]
        x = x + (_dot_t(hid, w[:, 4 * n:]) + row(_ROW_B2))
        xs_ref[aj] = x

    xo_ref[0] = xs_ref[aj]


def _vmem_estimate(
    n: int, H: int, dh: int, r: int, ac: int, W: int, Tk: int,
    bpe: int = 2,
) -> int:
    """Double-buffered block bytes + rows-unrolled f32 attention temps.
    ``bpe``: bytes per element of the streamed blocks (2 bf16 production;
    the f32 hardware-parity runs pass 4 — the r5 on-chip suite caught a
    16.39M-vs-16M scoped-VMEM OOM when the estimate assumed bf16)."""
    weights = (8 * n * n + 16 * 4 * n) * bpe  # one [n, 8n] plane + small
    cross = ac * H * 2 * dh * Tk * bpe
    cache = 2 * r * H * dh * W * bpe
    blocks = 2 * (weights + cross + cache)
    temps = r * 4 * H * dh * W * 4  # k/v f32 upcasts + products per row
    return blocks + temps


def _budget() -> int:
    """VMEM block budget (MB via WHISPER_LAYER_VMEM_MB).  Default leaves
    headroom below the 128 MB physical VMEM — measured actual allocation
    runs well above the double-buffered-block estimate (~1.6x at base.en:
    82 MB estimated, 131 MB actual before the phase split)."""
    env = os.environ.get("WHISPER_LAYER_VMEM_MB")
    return (int(env) if env else 64) * 1024 * 1024


def layer_fused_ok(
    dims, B: int, G: int, W: int, Tk: int, quantized: bool
) -> bool:
    """Shape gate for the megakernel (greedy/sampling, bf16 K/V only)."""
    if quantized:
        return False
    n = dims.n_text_state
    H = dims.n_text_head
    dh = dims.head_dim
    if n % 128 or dh % 8 or B % G:
        return False
    A = B // G
    # smallest viable chunk must fit
    return _vmem_estimate(n, H, dh, G, 1, W, Tk) <= _budget() and A >= 1


def _pick_ac(n: int, H: int, dh: int, A: int, G: int, W: int, Tk: int) -> int:
    env = os.environ.get("WHISPER_LAYER_AC")
    if env and A % int(env) == 0:
        return int(env)
    best = 1
    for ac in range(1, A + 1):
        if A % ac:
            continue
        if _vmem_estimate(n, H, dh, ac * G, ac, W, Tk) <= _budget():
            best = ac
    return best


def pack_block_params(blocks: dict) -> tuple:
    """(big [L, 2, n, 8n], small [L, 16, 4n]) packed per-layer weights.

    One wide array per stream class: the Pallas pipeline runs ~1.5x faster
    when the per-layer weight fetch is one DMA instead of twenty (v5e,
    measured).  Plane 0 = the six attention/cross [n, n] projections
    (zero-padded to 8n); plane 1 = w1 | w2^T.  Splitting into two
    phase-indexed planes halves the pack's double-buffered VMEM, which is
    what admits n=1024 models.  Called inside jit from the decode loop,
    OUTSIDE the while loop (in-loop packing costs a per-step copy)."""
    at, ct, mlp = blocks["attn"], blocks["cross_attn"], blocks["mlp"]
    wq = at["query"]["w"]
    L, _, n = wq.shape
    plane0 = jnp.concatenate(
        [
            wq, at["key"]["w"], at["value"]["w"], at["out"]["w"],
            ct["query"]["w"], ct["out"]["w"],
            jnp.zeros((L, n, 2 * n), wq.dtype),
        ],
        axis=2,
    )
    plane1 = jnp.concatenate(
        [mlp["fc1"]["w"], mlp["fc2"]["w"].swapaxes(1, 2)], axis=2
    )
    big = jnp.stack([plane0, plane1], axis=1)  # [L, 2, n, 8n]
    rows = [
        blocks["attn_ln"]["scale"], blocks["attn_ln"]["bias"],
        at["query"]["b"], at["value"]["b"], at["out"]["b"],
        blocks["cross_attn_ln"]["scale"], blocks["cross_attn_ln"]["bias"],
        ct["query"]["b"], ct["out"]["b"],
        blocks["mlp_ln"]["scale"], blocks["mlp_ln"]["bias"],
        mlp["fc2"]["b"],
    ]
    # n-wide rows are padded to 4n so b1 fits as ONE full-width row (the
    # kernel cannot lane-concat rows at different sublane offsets)
    pad = jnp.zeros((L, 1, 3 * n), rows[0].dtype)
    small = jnp.concatenate(
        [
            jnp.concatenate([r[:, None, :], pad], axis=2) for r in rows
        ]
        + [mlp["fc1"]["b"][:, None, :]]
        + [jnp.zeros((L, 3, 4 * n), rows[0].dtype)],
        axis=1,
    )
    return big, small


def decoder_step_fused(
    x: jnp.ndarray,  # [B, n] post-embedding activations for this step
    blocks: dict,  # stacked per-layer decoder params (leaves [L, ...])
    kv_cross: jnp.ndarray,  # [L, A, H, 2, dh, Tk]
    k_cache: jnp.ndarray,  # [L, B, H, n_ctx, dh] — CTX-MAJOR (caller
    #   transposes the hybrid layout once after prefill; see decode loop)
    v_cache: jnp.ndarray,  # [L, B, H, n_ctx, dh]
    pos: jnp.ndarray,  # scalar i32 absolute position of the query token
    key_start: Optional[jnp.ndarray],  # [B] i32 or None
    *,
    n_head: int,
    group: int,
    window: int,  # static: attend cache slots [0, window)
    interpret: bool = False,
    packed: Optional[tuple] = None,  # (big, small) from pack_block_params
) -> tuple:
    """Run all decoder layers for one token.  Returns (x_out [B, n],
    k_cols [L, B, H, dh], v_cols [L, B, H, dh], k_buf, v_buf) — the caller
    writes the columns into k_buf/v_buf at ``pos`` (one dynamic_update_slice
    each).  k_buf/v_buf are the cache buffers ALIASED through the kernel
    (donated), so those updates fuse in place."""
    B, n = x.shape
    L = k_cache.shape[0]
    H = n_head
    dh = n // H
    G = group
    A = B // G
    n_ctx = v_cache.shape[3]
    assert k_cache.shape == v_cache.shape, (
        "megakernel expects ctx-major K (same layout as V)"
    )
    Tk = kv_cross.shape[-1]
    scale = dh**-0.5

    W = min(window, n_ctx)
    if W % 128:
        W = min(-(-W // 128) * 128, n_ctx)
    if key_start is None:
        key_start = jnp.zeros((B,), jnp.int32)

    ac = _pick_ac(n, H, dh, A, G, W, Tk)
    r = ac * G
    nA = A // ac

    kc6 = k_cache.reshape(L, nA, r, H, n_ctx, dh)
    vc6 = v_cache.reshape(L, nA, r, H, n_ctx, dh)
    if packed is not None:
        # pre-packed outside the jitted decode loop — avoids relying on
        # XLA LICM to hoist the packing concats out of the while loop
        big, small = packed
    else:
        big, small = pack_block_params(blocks)

    def pin(aj, ph):
        # during the MLP phase the cross/cache streams keep their LAST
        # phase-0 block resident (index unchanged => no refetch): each is
        # fetched exactly once per layer
        return (1 - ph) * aj + ph * (nA - 1)

    in_specs = [
        pl.BlockSpec(
            (1, r, n), lambda l, ph, aj, p, s: (pin(aj, ph), 0, 0)
        ),  # x
        pl.BlockSpec(
            (1, 1, n, 8 * n), lambda l, ph, aj, p, s: (l, ph, 0, 0)
        ),  # packed weights (per-phase plane)
        pl.BlockSpec((1, 16, 4 * n), lambda l, ph, aj, p, s: (l, 0, 0)),
        pl.BlockSpec(
            (1, ac, H, 2, dh, Tk),
            lambda l, ph, aj, p, s: (l, pin(aj, ph), 0, 0, 0, 0),
        ),  # cross kv
        pl.BlockSpec(
            (1, 1, r, H, W, dh),
            lambda l, ph, aj, p, s: (l, pin(aj, ph), 0, 0, 0, 0),
        ),  # k cache (ctx-major)
        pl.BlockSpec(
            (1, 1, r, H, W, dh),
            lambda l, ph, aj, p, s: (l, pin(aj, ph), 0, 0, 0, 0),
        ),  # v cache
    ]
    out_specs = [
        pl.BlockSpec(
            (1, r, n), lambda l, ph, aj, p, s: (aj, 0, 0)
        ),  # x_out (the final value lands at layer L-1, phase 1)
        pl.BlockSpec(
            (1, 1, r, n), lambda l, ph, aj, p, s: (l, pin(aj, ph), 0, 0)
        ),  # k col
        pl.BlockSpec(
            (1, 1, r, n), lambda l, ph, aj, p, s: (l, pin(aj, ph), 0, 0)
        ),  # v col
        # cache passthroughs: aliased with the cache inputs (same HBM
        # buffer); only a tiny corner block is written back per grid step,
        # the rest of the buffer persists untouched (gmm-style partial
        # in-place output)
        pl.BlockSpec(
            (1, 1, r, H, 8, dh),
            lambda l, ph, aj, p, s: (l, pin(aj, ph), 0, 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, r, H, 8, dh),
            lambda l, ph, aj, p, s: (l, pin(aj, ph), 0, 0, 0, 0),
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, 2, nA),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((nA, r, n), x.dtype)],
    )
    vmem_need = _vmem_estimate(n, H, dh, r, ac, W, Tk, bpe=x.dtype.itemsize)
    vmem_limit = None
    if vmem_need > 9 * 1024 * 1024:
        # the scoped cap can approach the 128 MB physical VMEM; medium.en
        # actually allocates ~107 MB (estimate x1.9 — Mosaic keeps every
        # unrolled head iteration's f32 temps live)
        vmem_limit = min(
            -(-(23 * vmem_need // 10) // (1024 * 1024)) * 1024 * 1024,
            118 * 1024 * 1024,
        )

    kernel = functools.partial(
        _decoder_step_kernel, n_head=H, group=G, scale=scale,
        dma_only=os.environ.get("WHISPER_LAYER_DMAONLY") == "1",
    )
    x_out, k_cols, v_cols, k_buf, v_buf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nA, r, n), x.dtype),
            jax.ShapeDtypeStruct((L, nA, r, n), x.dtype),
            jax.ShapeDtypeStruct((L, nA, r, n), x.dtype),
            jax.ShapeDtypeStruct(kc6.shape, kc6.dtype),
            jax.ShapeDtypeStruct(vc6.shape, vc6.dtype),
        ],
        # flat input indices incl. the 2 scalar-prefetch args: kc6 is
        # input 6, vc6 input 7 (pos, ks, x, big, small, kv come first)
        input_output_aliases={6: 3, 7: 4},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
    )(
        jnp.reshape(pos, (1,)).astype(jnp.int32),
        key_start.astype(jnp.int32),
        x.reshape(nA, r, n),
        big,
        small,
        kv_cross,
        kc6,
        vc6,
    )
    return (
        x_out.reshape(B, n),
        k_cols.reshape(L, B, H, dh),
        v_cols.reshape(L, B, H, dh),
        k_buf.reshape(L, B, H, n_ctx, dh),
        v_buf.reshape(L, B, H, n_ctx, dh),
    )
