"""Functional Whisper model: audio encoder + KV-cached text decoder.

Same architecture/math as the reference (``/root/reference/src/model.rs``)
but redesigned for XLA/TPU instead of translated:

  * **Pure functions over a params pytree** — no modules, no interior
    mutability.  The reference's ``Cached<T>`` ``Cell``-based concat-grow KV
    cache (model.rs:37-98) becomes an explicit, static-shape
    ``[L, 2, B, H, n_ctx, dh]`` buffer written with
    ``lax.dynamic_update_slice`` — concat would retrace under jit.
  * **Stacked layers + lax.scan** — per-layer weights are stacked along a
    leading ``L`` axis and the block loop is a ``lax.scan``, keeping compile
    time flat in depth (32 layers for large-v3).
  * **Cross-attention K/V precomputed once per window** — the reference
    achieves this with a threshold trick in the cache (model.rs:84-90); here
    it is explicit: ``precompute_cross_kv`` runs once after the encoder.
  * **Unified causal masking** — a query at absolute position ``p`` attends
    cache keys ``<= p``.  This subsumes both the reference's triangular
    prefill mask (model.rs:474-476) and its unmasked incremental step
    (model.rs:194-196 slices the mask to ``[..1, ..1]``), while also hiding
    the static cache's not-yet-written slots.

Numerics match the reference: LayerNorm computed in f32 (model.rs:14-18),
q/k each scaled by ``head_dim**-0.25`` (model.rs:169-182), softmax in f32
then cast (model.rs:200), exact (erf) GELU (model.rs:229-231 ``gelu("none")``),
logits via the tied token embedding (model.rs:521).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import ModelDims


def _pallas_decode_mode() -> tuple:
    """(use_self, use_cross, interpret) for the incremental decode step's
    fused Pallas attention kernels (ops/decode_attention.py).

    Measured on v5e (tools/ablate_step.py, base.en b32): the cross kernel
    beats the XLA einsum path ~1.5x-vs-2.3x-of-roofline (the scan-xs copy
    plus a dot transpose), while both Pallas self-attention variants LOSE
    to XLA's fused attention at these cache sizes — so "auto" (default)
    enables only the cross kernel on TPU and nothing on CPU.  Env
    WHISPER_PALLAS_DECODE: "0" none, "cross"/"self"/"1"(both) force
    components, "interpret" = both kernels in interpreter mode (CPU parity
    tests).  Read at trace time.
    """
    env = os.environ.get("WHISPER_PALLAS_DECODE", "auto")
    if env == "interpret":
        return True, True, True
    if env == "1":
        return True, True, False
    if env == "self":
        return True, False, False
    if env == "cross":
        return False, True, False
    if env in ("auto", "layer"):  # "layer" falls back to the cross kernel
        # where the megakernel doesn't apply (prefill/beam) — TPU only
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        return False, on_tpu, False
    return False, False, False


def decode_kernels_profitable(dims: ModelDims, batch_rows: int) -> bool:
    """Shape gate for the r4 fused-MLP decode kernel, measured on v5e
    (tools/bench_step.py A/B): neutral-to-winning only in the large-model
    small-batch matvec regime (large-v3 b12); at bigger batches XLA
    batches the streams efficiently and per-row Pallas grid overhead
    dominates.  WHISPER_PALLAS_MLP=1 forces it anywhere."""
    return batch_rows <= 16 and dims.n_text_state >= 1280 and dims.n_text_layer >= 32


def fused_self_profitable(dims: ModelDims, batch_rows: int) -> bool:
    """Shape gate for the r5 append self-attention kernel (pipelined
    in-kernel-write transposed-plane reads), measured on v5e
    (tools/bench_step.py A/B, ms/step append vs XLA, full-W 224 steps):

      large-v3 b12:  9.14 vs 11.15  -> +18% WIN
      turbo b64:     4.60 vs  5.08  -> +9%  WIN
      medium.en b32: 11.33 vs 12.40 -> +9%  WIN
      small.en b64:  7.92 vs  8.76  -> +10% WIN
      base.en b8:    0.55 vs  0.63  -> +12% WIN
      base.en b32:   1.51 vs  1.65  -> +8%  WIN
      base.en b64:   2.73 vs  2.97  -> +8%  WIN
      base.en b96:   3.96 vs  3.81  -> -4%
      base.en b128:  5.21 vs  4.66  -> -12%

    The kernel wins everywhere except small-state models at very large
    batch (base.en cliff between b64 and b96), where XLA's batched cache
    dots amortize and the per-row grid serialization dominates.  The
    untested corner (state 768-1024 above b64) stays conservative."""
    return batch_rows <= 64 or dims.n_text_state >= 1024


def _pallas_fused_self_mode() -> tuple:
    """(mode, interpret) for the greedy decode step's fused self-attention
    kernel.  mode is one of:

      "append" — ops/decode_attention.py::self_attention_append_step: BOTH
        cache planes transposed [.., dh, ctx] (the ~634 GB/s read layout),
        the per-step K/V column written INSIDE the kernel by manual DMA
        into the aliased HBM cache (r5; VERDICT r4 #2 — no XLA lane-column
        write to copy-lower);
      "ctx" — self_attention_fused_step: ctx-major planes, XLA in-place
        sublane column writes, ~300 GB/s reads (the r4 kernel — fallback);
      "off".

    WHISPER_FUSED_SELF: "auto" (default — "append" on TPU where
    decode_kernels_profitable says so), "append", "1"/"ctx" (the r4
    kernel), "interpret"/"append-interpret" (CPU parity), "0"."""
    env = os.environ.get("WHISPER_FUSED_SELF", "auto")
    if env == "interpret":
        return "ctx", True
    if env == "append-interpret":
        return "append", True
    if env in ("1", "ctx"):
        return "ctx", False
    if env == "append":
        return "append", False
    if env == "auto":
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        return ("append" if on_tpu else "off"), False
    return "off", False


def _pallas_mlp_mode() -> tuple:
    """(use_mlp_kernel, interpret) for the decode-step fused MLP kernel
    (ops/decoder_mlp_fused.py — fc1+fc2 as ONE packed HBM stream).
    WHISPER_PALLAS_MLP: "auto" (default — on on TPU where
    decode_kernels_profitable says so), "1" force (compiled), "interpret"
    (CPU parity tests), "0" off."""
    env = os.environ.get("WHISPER_PALLAS_MLP", "auto")
    if env == "interpret":
        return True, True
    if env == "1":
        return True, False
    if env == "auto":
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        return on_tpu, False
    return False, False


def decode_kernel_modes(dims: ModelDims, batch_rows: int) -> tuple:
    """Resolved (use_mlp, mlp_interpret, fs_mode, fs_interpret) for the
    decode loops and bench tools: "auto" modes additionally pass the
    decode_kernels_profitable shape gate; forced modes ("1"/"interpret"/
    "append") engage unconditionally.  fs_mode: "off" | "ctx" | "append"
    (see _pallas_fused_self_mode)."""
    use_mlp, mlp_interp = _pallas_mlp_mode()
    if use_mlp and os.environ.get("WHISPER_PALLAS_MLP", "auto") == "auto":
        use_mlp = decode_kernels_profitable(dims, batch_rows)
    fs_mode, fs_interp = _pallas_fused_self_mode()
    if fs_mode != "off" and os.environ.get("WHISPER_FUSED_SELF", "auto") == "auto":
        if not fused_self_profitable(dims, batch_rows):
            fs_mode = "off"
    return use_mlp, mlp_interp, fs_mode, fs_interp


def _pallas_layer_mode() -> tuple:
    """(use_layer_kernel, interpret) for the whole-decoder-step megakernel
    (ops/decoder_layer_fused.py).  WHISPER_PALLAS_DECODE="layer" enables it
    (interpret-mode off-TPU, for CPU parity tests); any other mode disables
    it.  NOT part of "auto" yet — pending hardware validation/bench."""
    env = os.environ.get("WHISPER_PALLAS_DECODE", "auto")
    if env != "layer":
        return False, False
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    return True, not on_tpu


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in f32, cast back to x.dtype (model.rs:14-18)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _int8_matmul_enabled() -> bool:
    """WHISPER_INT8_MATMUL=1: run int8-weight linears as int8×int8 MXU
    matmuls (dynamic per-row activation quantization) instead of casting
    the weights up to bf16.  The v5e MXU runs s8×s8→s32 at 2× its bf16
    rate (~394 vs ~197 TOPs), so compute-bound encoder matmuls (fc1/fc2/
    projections) can double their roofline.  Default OFF pending the
    real-weights accuracy gate (tools/validate_checkpoint.py --quant-gate,
    same contract as int8-KV)."""
    import os

    return os.environ.get("WHISPER_INT8_MATMUL", "0") == "1"


def _quantize_rows(x: jnp.ndarray):
    """Dynamic per-row int8 activation quantization: (x_q, s_x) with
    s_x = amax(|row|)/127.  The amax reduce + round is one full pass over
    the activation tensor, so callers with several int8 matmuls on the SAME
    input (the q/k/v projections) should quantize once and share."""
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    return xq, s_x


def _int8_dot(xq: jnp.ndarray, s_x: jnp.ndarray, p: dict, out_dtype) -> jnp.ndarray:
    """s8×s8→s32 MXU dot on pre-quantized activations; scales fold into
    the f32 epilogue."""
    acc = lax.dot_general(
        xq,
        p["w"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * p["s"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def _linear_int8_act(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """int8×int8 matmul with dynamic per-row activation scales.

    y = (q(x) @ w_q) * s_x * s_w + b, where q(x) rounds each row of x to
    int8 at scale s_x = amax(|row|)/127.  The s8×s8 dot accumulates in
    int32 on the MXU; both scales fold into the f32 epilogue.  Reference
    MLP seam: model.rs:279-292."""
    xq, s_x = _quantize_rows(x)
    return _int8_dot(xq, s_x, p, x.dtype)


def _int8_qkv(x_ln: jnp.ndarray, p: dict):
    """q/k/v projections as three int8 dots sharing ONE activation
    quantization of x_ln (saves two full amax+round passes per layer), or
    None when the int8x8 path does not apply to these params."""
    if not (
        _int8_matmul_enabled()
        and all(
            name in p and "s" in p[name] and p[name]["w"].ndim == 2
            for name in ("query", "key", "value")
        )
    ):
        return None
    xq, s_x = _quantize_rows(x_ln)
    return tuple(
        _int8_dot(xq, s_x, p[name], x_ln.dtype)
        for name in ("query", "key", "value")
    )


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """x @ W (+ b); weights cast to x.dtype (model.rs:25-33).

    int8 weight-only quantization (models/quantize.py) adds a per-output-
    channel scale leaf ``"s"``: the weight is stored int8 (half the HBM
    stream of bf16) and dequantized in the matmul epilogue.  With
    WHISPER_INT8_MATMUL=1 the activations are ALSO quantized (per row,
    dynamic) and the dot runs s8×s8→s32 on the MXU at 2× the bf16 rate."""
    if "s" in p and p["w"].ndim == 2 and _int8_matmul_enabled():
        return _linear_int8_act(x, p)
    y = x @ p["w"].astype(x.dtype)
    if "s" in p:
        y = y * p["s"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GELU in f32 (torch.nn.GELU parity); tanh approximation in
    half precision.  The tanh form's max error (~2e-3 absolute near |x|=2)
    is below bf16's own resolution (~7.8e-3 relative), so it is numerically
    invisible there — while erf costs ~0.9 ms per encoder MLP activation
    tensor on v5e and tanh is free (fuses into the matmul epilogue)."""
    exact = x.dtype in (jnp.float32, jnp.float64)
    return jax.nn.gelu(x, approximate=not exact)


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Sin/cos positional table, concat not interleave (model.rs:100-112)."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """[B, T, D] -> [B, H, T, dh]"""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, dh] -> [B, T, D]"""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attend(
    q: jnp.ndarray,  # [B, H, Tq, dh], already scaled
    k: jnp.ndarray,  # [B, H, dh, Tk] — TRANSPOSED (see KVCache)
    v: jnp.ndarray,  # [B, H, Tk, dh]
    mask: Optional[jnp.ndarray],  # broadcastable to [B, H, Tq, Tk], additive
    k_scale: Optional[jnp.ndarray] = None,  # [B, H, Tk, 1] (int8 K/V mode)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    qk = jnp.einsum(
        "bhqd,bhdk->bhqk", q, k.astype(q.dtype), preferred_element_type=jnp.float32
    )
    if k_scale is not None:
        qk = qk * k_scale[:, :, :, 0][:, :, None, :]
    if mask is not None:
        qk = qk + mask
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        w = w * v_scale[:, :, :, 0][:, :, None, :]
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v.astype(q.dtype))


def _attend_grouped(
    q: jnp.ndarray,  # [A*G, H, Tq, dh], already scaled
    k: jnp.ndarray,  # [A, H, dh, Tk] — TRANSPOSED, shared by the G group rows
    v_t: jnp.ndarray,  # [A, H, dh, Tk] — V TRANSPOSED too (CrossKV fused kv)
    group: int,
    k_scale: Optional[jnp.ndarray] = None,  # [A, H, Tk, 1] (int8 K/V)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross-attention where G beams/samples per audio share one K/V.

    Beam search repeats each utterance group_size times along batch
    (decode/mod.rs:307-313); replicating the 1500-frame encoder K/V with it
    would multiply both HBM footprint and per-step read traffic by G, so the
    K/V stays per-audio and the einsum carries the group axis.  K is stored
    PRE-TRANSPOSED ([.., dh, Tk], done once per window in
    precompute_cross_kv): both qk operands then contract MXU-natively, where
    the [.., Tk, dh] layout made XLA re-transpose the 1500-frame K every
    layer every step — the single largest decode-step HBM stream after the
    reads themselves.  Handles group==1 (plain batch-shared K/V) and
    int8-quantized K/V with per-position scales (k scale applied to the
    logits, v scale folded into the softmax weights)."""
    AG, H, Tq, dh = q.shape
    A = k.shape[0]
    qg = q.reshape(A, AG // A, H, Tq, dh)
    qk = jnp.einsum(
        "aghqd,ahdk->aghqk", qg, k.astype(q.dtype), preferred_element_type=jnp.float32
    )
    if k_scale is not None:
        qk = qk * k_scale[:, None, :, :, 0][:, :, :, None, :]
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        w = w * v_scale[:, None, :, :, 0][:, :, :, None, :]
    w = w.astype(q.dtype)
    out = jnp.einsum("aghqk,ahdk->aghqd", w, v_t.astype(q.dtype))
    return out.reshape(AG, H, Tq, dh)


def mha_self(
    x_ln: jnp.ndarray, p: dict, n_head: int, mask, n_valid: Optional[int] = None
) -> jnp.ndarray:
    """Full (non-cached) self-attention — encoder path (model.rs:158-206).

    The reference scales q AND k by head_dim**-0.25 each (model.rs:169-182);
    we fold both into q (s^2 = head_dim**-0.5) so K is never rewritten —
    the qk product is identical up to f32 rounding, and in the decode path
    this avoids materializing a scaled copy of the whole K cache per step.

    Unmasked calls (the encoder's full 1500-frame attention) route through
    the flash kernel on TPU (ops/encoder_attention.py) so scores are never
    materialized.
    """
    d_head = x_ln.shape[-1] // n_head
    scale = d_head**-0.5
    qkv = _int8_qkv(x_ln, p)  # shared activation quantization (int8x8 mode)
    if mask is None:
        from ..ops.encoder_attention import encoder_pallas_mode

        use_attn, _, interp = encoder_pallas_mode()
        if use_attn and d_head == 64 and n_head % 2 == 0:
            # merged-layout kernel: q/k/v straight from the projections
            # and output straight into the out-projection — no
            # [B,T,D] <-> [B,H,T,dh] head split/merge copies (3 × ~1.2
            # ms/layer at large-v3-turbo b64, device trace r3)
            from ..ops.encoder_attention_pallas import (
                encoder_attention_merged,
            )

            qm, km, vm = qkv if qkv is not None else (
                linear(x_ln, p["query"]),
                linear(x_ln, p["key"]),
                linear(x_ln, p["value"]),
            )
            out = encoder_attention_merged(
                qm, km, vm, n_head, scale, n_valid=n_valid, interpret=interp,
            )
            return linear(out, p["out"])
    if qkv is not None:
        q, k, v = (_split_heads(t, n_head) for t in qkv)
    else:
        q = _split_heads(linear(x_ln, p["query"]), n_head)
        k = _split_heads(linear(x_ln, p["key"]), n_head)
        v = _split_heads(linear(x_ln, p["value"]), n_head)
    if mask is None:
        from ..ops.encoder_attention import encoder_attention

        out = encoder_attention(q, k, v, scale, n_valid=n_valid)
    else:
        out = _attend(q * scale, k.swapaxes(-1, -2), v, mask)
    return linear(_merge_heads(out), p["out"])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _conv1d(x: jnp.ndarray, p: dict, stride: int) -> jnp.ndarray:
    """x: [B, C_in, T]; weight [C_out, C_in, K]; padding=1 (model.rs:363-383)."""
    w = p["w"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + p["b"].astype(x.dtype)[None, :, None]


def _conv1d_mm(x_nlc: jnp.ndarray, p: dict, stride: int) -> jnp.ndarray:
    """k=3/pad=1 conv1d expressed as three shifted matmuls (MXU path).

    x_nlc: [B, T, C_in]; weight [C_out, C_in, 3] -> y [B, T//stride, C_out].
    Feature-last layout + explicit matmuls sidestep slow TPU conv lowerings
    for this thin-channel stem; each tap j contributes
    ``shift(x, j-1) @ W[:, :, j].T``.
    """
    w = p["w"].astype(x_nlc.dtype)  # [C_out, C_in, 3]
    B, T, Cin = x_nlc.shape
    xp = jnp.pad(x_nlc, ((0, 0), (1, 1), (0, 0)))  # [B, T+2, C]
    T_out = T // stride
    y = None
    for j in range(3):
        xj = lax.slice_in_dim(xp, j, j + T, axis=1)  # shift by j-1
        if stride > 1:
            xj = xj[:, ::stride]
        part = xj[:, :T_out] @ w[:, :, j].T  # [B, T_out, C_out]
        y = part if y is None else y + part
    return y + p["b"].astype(x_nlc.dtype)


def encoder_pad_once(x: jnp.ndarray, T: int):
    """Pad the [B, T, D] activation ONCE to the flash kernel's 128-multiple
    instead of per layer: pad/unpad of three [B, T, D] tensors inside every
    block costs ~7 ms per base.en b32 forward on v5e.  Pad rows stay
    isolated — LN/MLP are row-local and the flash kernel segment-masks them
    (n_valid) — and are sliced off at the end.  Returns (x, n_valid, Tp)."""
    from ..ops.encoder_attention import flash_pad_to

    Tp = flash_pad_to(T)
    n_valid = T if Tp != T else None
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    return x, n_valid, Tp


def encoder_block_fn(n_head: int, n_valid: Optional[int]):
    """The encoder residual block (model.rs:384-394) as a shared
    ``block(x, bp) -> x`` closure — used by BOTH encoder_forward's scan and
    the pipeline-parallel stage (parallel/pipeline.py), so PP runs
    line-for-line the same kernels (fused residual/LN + merged-layout
    attention with pad-once masking) as the single-device encoder."""
    from ..ops.encoder_attention import encoder_pallas_mode

    _, use_fused_ln, ln_interp = encoder_pallas_mode()
    if use_fused_ln:
        # Fused residual+LN Pallas kernels: XLA lowers the per-block
        # residual/LN chain as separate fusions that re-materialize
        # [B, T, D] f32 intermediates (~2.3 ms/layer vs a ~0.3 ms traffic
        # roofline at large-v3-turbo b16 — device trace r3).
        from ..ops.encoder_fused import ln_fused, residual_ln

        def block(x, bp):
            a = ln_fused(
                x, bp["attn_ln"]["scale"], bp["attn_ln"]["bias"],
                interpret=ln_interp,
            )
            attn = mha_self(a, bp["attn"], n_head, None, n_valid=n_valid)
            x, h = residual_ln(
                x, attn, bp["mlp_ln"]["scale"], bp["mlp_ln"]["bias"],
                interpret=ln_interp,
            )
            return x + linear(gelu(linear(h, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])
    else:
        def block(x, bp):
            x = x + mha_self(
                layer_norm(x, bp["attn_ln"]), bp["attn"], n_head, None,
                n_valid=n_valid,
            )
            h = layer_norm(x, bp["mlp_ln"])
            return x + linear(gelu(linear(h, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])

    return block


def encoder_forward(params: dict, mel: jnp.ndarray, dims: ModelDims) -> jnp.ndarray:
    """[B, n_mels, 3000] log-mel -> [B, 1500, n_state] audio features.

    conv1(k3,p1)+gelu, conv2(k3,s2,p1)+gelu, +sinusoid pos-emb, N self-attn
    blocks, post-LN (model.rs:417-441).
    """
    enc = params["encoder"]
    # feature-last layout + conv-as-matmul stem (MXU path; see _conv1d_mm)
    x = mel.transpose(0, 2, 1)  # [B, 3000, n_mels]
    x = gelu(_conv1d_mm(x, enc["conv1"], stride=1))
    x = gelu(_conv1d_mm(x, enc["conv2"], stride=2))  # [B, 1500, D]
    pos = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state), dtype=x.dtype)
    x = x + pos

    T = dims.n_audio_ctx
    x, n_valid, Tp = encoder_pad_once(x, T)
    block = encoder_block_fn(dims.n_audio_head, n_valid)

    x, _ = lax.scan(lambda c, bp: (block(c, bp), None), x, enc["blocks"])
    if Tp != T:
        x = x[:, :T]
    return layer_norm(x, enc["ln_post"])


# ---------------------------------------------------------------------------
# decoder with static-shape KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Static-shape self-attention cache.

    k: [L, B, H, dh, n_text_ctx] — TRANSPOSED so the per-step qk einsum
    contracts MXU-natively (the [.., W, dh] layout made XLA re-transpose the
    attended cache window every layer every step).
    v: [L, B, H, n_text_ctx, dh] (the weighted-sum einsum is already native).
    Replaces the reference's concat-grow ``Cached`` cells (model.rs:77-98).
    Beam reorder = gather along B (model.rs:53-62 ``update_cache``).

    Optional int8 mode (``KVCache.init(..., quantize=True)``): k/v stored
    int8 with per-position scales ([L, B, H, n_text_ctx, 1]) — halves both
    the per-step attention reads and the beam-reorder gather stream.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def init(
        dims: ModelDims, batch: int, dtype=jnp.float32, quantize: bool = False
    ) -> "KVCache":
        shape = (
            dims.n_text_layer,
            batch,
            dims.n_text_head,
            dims.n_text_ctx,
            dims.head_dim,
        )
        kshape = shape[:-2] + (dims.head_dim, dims.n_text_ctx)
        if not quantize:
            return KVCache(jnp.zeros(kshape, dtype), jnp.zeros(shape, dtype))
        sshape = shape[:-1] + (1,)
        return KVCache(
            jnp.zeros(kshape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.ones(sshape, jnp.float32),
            jnp.ones(sshape, jnp.float32),
        )

    def reorder(self, source_indices: jnp.ndarray, window: Optional[int] = None) -> "KVCache":
        """Beam-search cache permutation along the batch axis.

        Equivalent of the reference's ``model.update_cache(source_indices)``
        fan-out (beam_search.rs:111-114 -> model.rs:53-62), as a pure gather.
        With data-parallel sharding over utterances the indices are
        batch-local, so this stays free of cross-chip traffic.

        ``window`` restricts the gather to cache slots ``[0, window)`` — the
        only rows that hold live data while the decode position is below
        ``window``.  The full-width gather is the dominant per-step HBM
        stream of beam search, so the decode loop phases the window up
        (e.g. 256 -> n_ctx) as the position grows.
        """

        def gather(buf, ctx_axis):
            if buf is None:
                return None
            if window is None or window >= buf.shape[ctx_axis]:
                return jnp.take(buf, source_indices, axis=1)
            sl = [slice(None)] * buf.ndim
            sl[ctx_axis] = slice(0, window)
            w = jnp.take(buf[tuple(sl)], source_indices, axis=1)
            return lax.dynamic_update_slice(buf, w, (0,) * buf.ndim)

        return KVCache(
            gather(self.k, 4),  # k: positions on the minor axis
            gather(self.v, 3),
            gather(self.k_scale, 3),
            gather(self.v_scale, 3),
        )


class CrossKV(NamedTuple):
    """Per-window cross-attention K/V computed once from encoder output
    (the reference's cache "threshold" reset trick, model.rs:84-90, made
    explicit).

    K and V live FUSED in one array ``kv: [L, B, H, 2, dh, n_audio_ctx]``
    (``kv[..., 0, :, :]`` = K pre-transposed for an MXU-native qk
    contraction, ``kv[..., 1, :, :]`` = V transposed the same way, consumed
    via a contraction over its last axis).  Measured on v5e: the Pallas
    pipeline streams ONE array ~20% faster than two interleaved K/V arrays
    (540 vs 446 GB/s, tools/bench_cross.py) — and this stream dominates
    per-step decode HBM traffic at production batch sizes.

    When ``k_scale``/``v_scale`` are set, kv is stored int8 with
    per-position scales ([L, B, H, n_audio_ctx, 1]) — int8 halves the
    stream.  The K scale folds into the attention logits
    (``(q·k_q[pos]) * s_k[pos]``); the V scale folds into the softmax
    weights before the value matmul."""

    kv: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def k(self) -> jnp.ndarray:  # [L, B, H, dh, Tk] (lazy slice)
        return self.kv[:, :, :, 0]

    @property
    def v_t(self) -> jnp.ndarray:  # [L, B, H, dh, Tk] (V transposed)
        return self.kv[:, :, :, 1]


def _quantize_kv(x: jnp.ndarray):
    """[..., dh] -> (int8 values, per-position f32 scale [..., 1])."""
    amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-8)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def precompute_cross_kv(
    params: dict, xa: jnp.ndarray, dims: ModelDims, *, quantize: bool = False
) -> CrossKV:
    """xa: [B, 1500, D] -> stacked K/V projections for every decoder layer."""
    n_head = dims.n_text_head

    def per_layer(bp):
        ca = bp["cross_attn"]
        k = _split_heads(linear(xa, ca["key"]), n_head)  # [B, H, Tk, dh]
        v = _split_heads(linear(xa, ca["value"]), n_head)
        return k, v

    k, v = jax.vmap(per_layer)(params["decoder"]["blocks"])
    if not quantize:
        kv = jnp.stack([k.swapaxes(-1, -2), v.swapaxes(-1, -2)], axis=3)
        return CrossKV(kv)
    kq, ks = _quantize_kv(k)  # per-position scales before the transpose
    vq, vs = _quantize_kv(v)
    kv = jnp.stack([kq.swapaxes(-1, -2), vq.swapaxes(-1, -2)], axis=3)
    return CrossKV(kv, ks, vs)


def decoder_forward(
    params: dict,
    tokens: jnp.ndarray,  # [B, T] int32 (T static: prefill width or 1)
    pos_offset: jnp.ndarray,  # scalar int32: absolute position of tokens[:, 0]
    cross_kv: CrossKV,
    cache: KVCache,
    dims: ModelDims,
    *,
    key_start: Optional[jnp.ndarray] = None,  # [B] first valid cache slot
    logit_positions: Optional[jnp.ndarray] = None,  # [K] rows of T to project
    cross_group: int = 1,  # beams/samples per audio sharing one cross-K/V
    ctx_window: Optional[int] = None,  # static cap on attended cache slots
    ancestors: Optional[jnp.ndarray] = None,  # [B, n_ctx] global source rows
    logits_dtype=jnp.float32,
    packed: Optional[tuple] = None,  # pre-packed megakernel weights
    k_ctx_major: bool = False,  # cache.k flipped to [L, B, H, ctx, dh]
    # (megakernel path only; set by the greedy decode loop after prefill)
    packed_mlp: Optional[tuple] = None,  # (w_pack, b1) from pack_mlp_params
    # — incremental step only; routes the per-layer MLP through the fused
    # single-stream Pallas kernel (ops/decoder_mlp_fused.py)
    mlp_interpret: bool = False,
    kv_fused="off",  # "ctx": cache.k flipped CTX-MAJOR (V's [L,B,H,ctx,dh]
    # layout), self-attention via self_attention_fused_step; "append":
    # BOTH planes transposed [L,B,H,dh,ctx], column writes done IN-KERNEL
    # (self_attention_append_step).  Set by the greedy loop after prefill.
    # Legacy bool values accepted (True == "ctx").
    fused_self_interpret: bool = False,
) -> tuple:
    """One decoder pass (prefill if T>1, incremental if T==1).

    Returns (logits [B, T, n_vocab] — or [B, K, n_vocab] when
    ``logit_positions`` selects K rows — and the updated cache).  Token +
    positional embedding sliced at offset (model.rs:503-506); N blocks with
    self- and cross-attention; final LN; logits via tied embedding
    (model.rs:518-521).  ``logit_positions`` skips the vocab projection for
    prefill rows whose logits are never read (only the SOT row and the last
    prompt row matter), saving a [P, n_vocab] matmul per window.

    ``key_start`` supports end-aligned per-row prompts of different lengths
    (the batched transcribe driver): cache slots below it are masked out of
    attention, and each row's positional-embedding index is shifted so its
    first real token sits at position 0 — identical semantics to an
    unpadded row.
    """
    dec = params["decoder"]
    B, T = tokens.shape
    if T != 1:
        packed_mlp = None  # incremental-step kernel only (prefill is XLA)
    # normalize legacy bool values (True == the r4 ctx-major kernel)
    if kv_fused is True:
        kv_fused = "ctx"
    elif not kv_fused:
        kv_fused = "off"
    if kv_fused != "off":
        assert T == 1 and ancestors is None, (
            "fused-plane self cache: greedy incremental step only"
        )
        assert not cache.quantized, "fused-plane self cache: bf16/f32 only"
    n_head = dims.n_text_head
    d_head = dims.head_dim
    scale = d_head**-0.5  # folded q·k scale (see mha_self docstring)

    # absolute positions of the T query tokens and the causal key mask:
    # query at abs pos p sees cache slots <= p (hides unwritten slots too).
    # ctx_window statically restricts attention (and its HBM reads) to the
    # cache prefix that can hold data yet — callers guarantee
    # pos_offset + T <= ctx_window.
    W = dims.n_text_ctx if ctx_window is None else min(ctx_window, dims.n_text_ctx)
    q_pos = pos_offset + jnp.arange(T)  # [T]
    key_idx = jnp.arange(W)  # [W]
    neg = jnp.asarray(-jnp.inf, dtype=jnp.float32)
    visible = key_idx[None, :] <= q_pos[:, None]  # [T, n_ctx]

    tok_emb = dec["token_emb"]
    if key_start is not None:
        # per-row logical positions (clipped to 0 inside the pad region,
        # whose outputs/K/V are never attended)
        pos_idx = jnp.maximum(q_pos[None, :] - key_start[:, None], 0)  # [B, T]
        pos = dec["pos_emb"][pos_idx]  # [B, T, D]
        # Pad-region queries (q_pos < key_start) would otherwise see an
        # EMPTY key set -> all-(-inf) softmax row -> NaN, and those NaN
        # outputs poison later layers' K/V (NaN qk survives the additive
        # mask and wrecks every row's softmax).  Let each pad query attend
        # its own slot: a no-op for real queries (self is already visible)
        # that keeps pad outputs finite-garbage instead of NaN.
        visible = visible[None] & (
            (key_idx[None, None, :] >= key_start[:, None, None])
            | (key_idx[None, :] == q_pos[:, None])[None]
        )
        self_mask = jnp.where(visible, 0.0, neg)[:, None]  # [B, 1, T, n_ctx]
    else:
        pos = lax.dynamic_slice_in_dim(dec["pos_emb"], pos_offset, T, axis=0)
        self_mask = jnp.where(visible, 0.0, neg)[None, None]  # [1, 1, T, n_ctx]

    x_dtype = dec["pos_emb"].dtype  # compute dtype (cache may be int8)
    emb = tok_emb[tokens].astype(x_dtype)
    if "token_emb_scale" in dec:  # int8-quantized embedding (quantize.py)
        emb = emb * dec["token_emb_scale"][tokens][..., None].astype(x_dtype)
    x = emb + pos.astype(x_dtype)

    # The full stacked cache rides the scan CARRY (not ys): ys would
    # materialize a fresh [L, B, H, n_ctx, dh] copy every decode step, while
    # a carry is buffer-aliased by XLA so each step writes only the one
    # [B, H, T, dh] slot that changed.  Per-layer weights and cross-K/V
    # stream through xs as before.
    n_ctx = dims.n_text_ctx

    quantized_cross = cross_kv.k_scale is not None
    quantized_self = cache.quantized

    # Fused Pallas attention for the incremental step (T==1): K/V tiles are
    # DMA'd straight from the stacked HBM arrays (layer index as a
    # scalar-prefetch block coordinate), skipping the per-layer
    # dynamic-slice copies of the cache and the scan-xs copies of the
    # cross-K/V — the two streams that dominated the round-1 step cost.
    # key_start support rides through the kernel's mask; batched per-row
    # prompts therefore work identically.
    if T == 1:
        pallas_self, pallas_cross, pallas_interpret = _pallas_decode_mode()
    else:
        pallas_self = pallas_cross = pallas_interpret = False

    # Whole-decoder-step megakernel (all layers in ONE pallas_call: the
    # cross-K/V DMA overlaps self-attention/MLP compute and the ~12 XLA ops
    # per layer collapse away).  Greedy/sampling incremental step only;
    # beam ancestors and int8 K/V use the dedicated kernels below.
    # ``k_ctx_major`` marks that the CALLER flipped cache.k into V's
    # [L, B, H, ctx, dh] layout after prefill (decode/loop.py) — required
    # here because a per-step lane-column write into the hybrid path's
    # transposed K copy-lowers on TPU (~312 us/step), while the ctx-major
    # sublane write is in-place.
    if (
        T == 1
        and k_ctx_major
        and ancestors is None
        and not quantized_self
        and not quantized_cross
        and "s" not in params["decoder"]["blocks"]["attn"]["query"]
    ):
        from ..ops.decoder_layer_fused import decoder_step_fused, layer_fused_ok

        use_layer, layer_interpret = _pallas_layer_mode()
        if use_layer and layer_fused_ok(
            dims, B, cross_group, dims.n_text_ctx, cross_kv.kv.shape[-1], False
        ):
            x1, k_cols, v_cols, k_buf, v_buf = decoder_step_fused(
                x[:, 0, :],
                dec["blocks"],
                cross_kv.kv,
                cache.k,
                cache.v,
                pos_offset,
                key_start,
                n_head=n_head,
                group=cross_group,
                window=W,
                interpret=layer_interpret,
                packed=packed,
            )
            # k_buf/v_buf are the cache buffers aliased through the kernel
            # (donated), so these sublane column writes fuse in place
            new_k = lax.dynamic_update_slice(
                k_buf, k_cols[:, :, :, None, :], (0, 0, 0, pos_offset, 0)
            )
            new_v = lax.dynamic_update_slice(
                v_buf, v_cols[:, :, :, None, :], (0, 0, 0, pos_offset, 0)
            )
            x = x1[:, None, :]
            if logit_positions is not None:
                x = jnp.take(x, logit_positions, axis=1)
            x = layer_norm(x, dec["ln"])
            logits = jnp.einsum(
                "btd,vd->btv",
                x.astype(logits_dtype),
                tok_emb.astype(logits_dtype),
                preferred_element_type=logits_dtype,
            )
            return logits, KVCache(new_k, new_v, None, None)
    if k_ctx_major:
        # the caller flipped K for the megakernel; reaching the scan path
        # with that layout would silently corrupt attention
        raise ValueError(
            "k_ctx_major cache passed but the fused layer kernel did not "
            "engage (check WHISPER_PALLAS_DECODE / layer_fused_ok gating)"
        )
    # ancestor-resolved reads (beam gather-at-read) use the dedicated beam
    # kernel when any Pallas mode is on; the plain self kernel never sees
    # ancestors.  int8 self-cache rides the same kernel with whole-H
    # per-position scale blocks.
    pallas_beam = (pallas_self or pallas_cross) and ancestors is not None
    pallas_self = pallas_self and ancestors is None
    if pallas_self or pallas_cross or pallas_beam:
        from ..ops.decode_attention import (
            beam_self_attention_step,
            cross_attention_pallas_ok,
            cross_attention_step,
            self_attention_step,
        )

        ks_arg = key_start if key_start is not None else jnp.zeros((B,), jnp.int32)
        n_groups = B // cross_group
        pallas_cross = pallas_cross and cross_attention_pallas_ok(
            n_head, cross_kv.kv.shape[-1], d_head, cross_kv.kv.dtype.itemsize,
            quantized_cross,
        )
        if pallas_beam:
            # global source rows -> beam-local ancestor indices
            anc_local = ancestors - (
                (jnp.arange(B) // cross_group) * cross_group
            )[:, None]

    def block(carry, layer_in):
        if quantized_self:
            x, k_all, v_all, ks_all, vs_all = carry
        else:
            # kv_fused: k_all is ctx-major (V's layout); same carry
            # structure either way
            x, k_all, v_all = carry
            ks_all = vs_all = None
        if pallas_cross:
            bp, l = layer_in
            ckv = ck_s = cv_s = None
        elif quantized_cross:
            bp, ckv, ck_s, cv_s, l = layer_in
        else:
            bp, ckv, l = layer_in
            ck_s = cv_s = None

        # -- self-attention over the static cache --------------------------
        h = layer_norm(x, bp["attn_ln"])
        q = _split_heads(linear(h, bp["attn"]["query"]), n_head) * scale
        k_new = _split_heads(linear(h, bp["attn"]["key"]), n_head)
        v_new = _split_heads(linear(h, bp["attn"]["value"]), n_head)
        if quantized_self:
            k_new, k_new_s = _quantize_kv(k_new)
            v_new, v_new_s = _quantize_kv(v_new)
            ks_all = lax.dynamic_update_slice(
                ks_all, k_new_s[None], (l, 0, 0, pos_offset, 0)
            )
            vs_all = lax.dynamic_update_slice(
                vs_all, v_new_s[None], (l, 0, 0, pos_offset, 0)
            )
        if kv_fused == "append":
            # Both planes transposed [.., dh, ctx]: NO XLA cache writes at
            # all — the kernel DMAs the fresh [H, dh, 1] column into the
            # aliased HBM cache itself and reads at the transposed-layout
            # rate (~634 vs ~300 GB/s ctx-major; VERDICT r4 #2).  The
            # caches chain in-place through the aliased pallas_calls.
            pass
        elif kv_fused == "ctx":
            # K flipped to ctx-major (V's layout): the column write is a
            # SUBLANE write, which fuses in place with its projection
            # producer even though the buffer feeds an opaque pallas
            # consumer (a lane-column write there copy-lowers into a full
            # per-layer cache copy — device trace r4 / megakernel ROADMAP)
            k_all = lax.dynamic_update_slice(
                k_all, k_new[None], (l, 0, 0, pos_offset, 0)
            )
        else:
            k_all = lax.dynamic_update_slice(
                k_all, k_new.swapaxes(-1, -2)[None], (l, 0, 0, 0, pos_offset)
            )  # [L, B, H, dh, n_ctx] — transposed layout (see KVCache)
        if kv_fused != "append":
            v_all = lax.dynamic_update_slice(
                v_all, v_new[None], (l, 0, 0, pos_offset, 0)
            )

        if kv_fused == "append":
            from ..ops.decode_attention import self_attention_append_step

            attn, k_all, v_all = self_attention_append_step(
                q[:, :, 0, :],
                k_new[:, :, 0, :],
                v_new[:, :, 0, :],
                k_all,
                v_all,
                l,
                pos_offset,
                key_start,
                window=W,
                interpret=fused_self_interpret,
            )
            attn = attn[:, :, None, :]
        elif kv_fused == "ctx":
            from ..ops.decode_attention import self_attention_fused_step

            attn = self_attention_fused_step(
                q[:, :, 0, :],
                k_all,
                v_all,
                l,
                pos_offset,
                key_start,
                window=W,
                interpret=fused_self_interpret,
            )[:, :, None, :]
        elif pallas_beam:
            attn = beam_self_attention_step(
                q[:, :, 0, :],
                k_all,
                v_all,
                l,
                pos_offset,
                ks_arg,
                anc_local,
                cross_group,
                window=W,
                k_scale=ks_all,
                v_scale=vs_all,
                interpret=pallas_interpret,
            )[:, :, None, :]
        elif pallas_self:
            attn = self_attention_step(
                q[:, :, 0, :],
                k_all,
                v_all,
                l,
                pos_offset,
                ks_arg,
                window=W,
                k_scale=ks_all,
                v_scale=vs_all,
                interpret=pallas_interpret,
            )[:, :, None, :]
        else:

            def layer_slice(buf, last, k_layout=False):
                if buf is None:
                    return None
                sizes = (
                    (1, B, n_head, d_head, W)
                    if k_layout
                    else (1, B, n_head, W, last)
                )
                return lax.dynamic_slice(buf, (l, 0, 0, 0, 0), sizes)[0]

            def resolve(buf, k_layout=False):
                # beam gather-at-read: element (b, .., j) comes from the
                # batch row holding beam b's key at position j (the
                # ancestor table replaces the reference's physical
                # update_cache permutation, model.rs:53-62) — the cache
                # itself never moves.
                if buf is None or ancestors is None:
                    return buf
                idx = ancestors[:, :W]  # [B, W] global source rows
                idx = idx[:, None, None, :] if k_layout else (
                    idx[:, None, :, None]
                )
                # mode="clip": indices are in-bounds by construction; the
                # default "fill" lowering adds a select that has shown
                # instability on the TPU runtime at scale
                return jnp.take_along_axis(
                    buf, jnp.broadcast_to(idx, buf.shape), axis=0, mode="clip"
                )

            attn = _attend(
                q,
                resolve(layer_slice(k_all, d_head, k_layout=True), True),
                resolve(layer_slice(v_all, d_head)),
                self_mask,
                resolve(layer_slice(ks_all, 1)),
                resolve(layer_slice(vs_all, 1)),
            )
        x = x + linear(_merge_heads(attn), bp["attn"]["out"])

        # -- cross-attention against precomputed encoder K/V ---------------
        h = layer_norm(x, bp["cross_attn_ln"])
        qx = _split_heads(linear(h, bp["cross_attn"]["query"]), n_head) * scale
        if pallas_cross:
            attn = cross_attention_step(
                qx[:, :, 0, :].reshape(n_groups, cross_group, n_head, d_head),
                cross_kv.kv,
                l,
                k_scale=cross_kv.k_scale,
                v_scale=cross_kv.v_scale,
                interpret=pallas_interpret,
            ).reshape(B, n_head, 1, d_head)
        else:
            attn = _attend_grouped(
                qx, ckv[:, :, 0], ckv[:, :, 1], cross_group, ck_s, cv_s
            )
        x = x + linear(_merge_heads(attn), bp["cross_attn"]["out"])

        # -- MLP ------------------------------------------------------------
        h = layer_norm(x, bp["mlp_ln"])
        if packed_mlp is not None:
            from ..ops.decoder_mlp_fused import decoder_mlp_step

            out = decoder_mlp_step(
                h[:, 0, :], packed_mlp[0], packed_mlp[1], l,
                interpret=mlp_interpret,
            )
            x = x + (
                out + bp["mlp"]["fc2"]["b"].astype(out.dtype)
            )[:, None, :]
        else:
            x = x + linear(gelu(linear(h, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])
        if quantized_self:
            return (x, k_all, v_all, ks_all, vs_all), None
        return (x, k_all, v_all), None

    blocks_xs = dec["blocks"]
    if packed_mlp is not None:
        # the fused MLP kernel reads fc1/fc2 straight from the packed HBM
        # array — strip the big weight leaves from the scan xs so they are
        # not ALSO streamed (XLA does not reliably DCE unused xs slices)
        dummy = jnp.zeros((dims.n_text_layer, 1, 1), jnp.int8)
        mlp_xs = dict(blocks_xs["mlp"])
        mlp_xs["fc1"] = {**blocks_xs["mlp"]["fc1"], "w": dummy}
        mlp_xs["fc2"] = {**blocks_xs["mlp"]["fc2"], "w": dummy}
        blocks_xs = {**blocks_xs, "mlp": mlp_xs}
    if pallas_cross:
        # fused cross-K/V read inside the kernel straight from HBM — keep it
        # out of the scan xs (xs slicing would copy [B, H, 2, dh, Tk] per
        # layer)
        layer_xs = (blocks_xs, jnp.arange(dims.n_text_layer))
    else:
        layer_xs = (blocks_xs, cross_kv.kv)
        if quantized_cross:
            layer_xs = layer_xs + (cross_kv.k_scale, cross_kv.v_scale)
        layer_xs = layer_xs + (jnp.arange(dims.n_text_layer),)
    if quantized_self:
        carry0 = (x, cache.k, cache.v, cache.k_scale, cache.v_scale)
        (x, new_k, new_v, new_ks, new_vs), _ = lax.scan(block, carry0, layer_xs)
    else:
        (x, new_k, new_v), _ = lax.scan(block, (x, cache.k, cache.v), layer_xs)
        new_ks = new_vs = None

    if logit_positions is not None:
        x = jnp.take(x, logit_positions, axis=1)
    x = layer_norm(x, dec["ln"])
    logits = jnp.einsum(
        "btd,vd->btv",
        x.astype(logits_dtype),
        tok_emb.astype(logits_dtype),
        preferred_element_type=logits_dtype,
    )
    if "token_emb_scale" in dec:
        logits = logits * dec["token_emb_scale"].astype(logits_dtype)[None, None, :]
    return logits, KVCache(new_k, new_v, new_ks, new_vs)


def model_forward(
    params: dict, mel: jnp.ndarray, tokens: jnp.ndarray, dims: ModelDims
) -> jnp.ndarray:
    """Whole-model convenience forward (reference ``Whisper::forward_ext``,
    model.rs:586-589): encoder + full-prompt decoder pass at offset 0."""
    xa = encoder_forward(params, mel, dims)
    cross_kv = precompute_cross_kv(params, xa, dims)
    cache = KVCache.init(dims, tokens.shape[0], dtype=xa.dtype)
    logits, _ = decoder_forward(
        params, tokens, jnp.int32(0), cross_kv, cache, dims
    )
    return logits
