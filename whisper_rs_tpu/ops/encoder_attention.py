"""Encoder self-attention: flash kernel on TPU, einsum fallback elsewhere.

The encoder's 1500-frame self-attention materializes [B, H, 1500, 1500]
score tensors in the naive formulation (~576 MB f32 per base.en layer at
batch 8) — the dominant encoder cost.  On TPU we use JAX's Pallas flash-
attention kernel (jax.experimental.pallas.ops.tpu.flash_attention), which
streams K/V blocks through VMEM and never materializes the scores.

Whisper's audio context (1500) is not a multiple of the kernel's block
sizes, so sequences are padded to 1536 with segment-id masking (pad
positions form their own segment; real queries never attend them).  The
encoder pads ONCE up front and passes ``n_valid`` (see
``models/whisper.py::encoder_forward``) — per-layer pad/unpad of q/k/v
costs ~7 ms per base.en b32 forward on v5e.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


_PAD_TO = 128


def _flash_available() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def encoder_pallas_mode() -> tuple:
    """(use_custom_attention, use_fused_ln, interpret) for the encoder.

    WHISPER_PALLAS_ENCODER: "auto" (default — both custom kernels on TPU,
    nothing elsewhere), "attn"/"ln" (one component), "1" (both anywhere,
    compiled), "0"/"flash" (stock flash attention + XLA LN),
    "interpret" (both kernels interpreted — CPU parity tests)."""
    env = os.environ.get("WHISPER_PALLAS_ENCODER", "auto")
    if env == "interpret":
        return True, True, True
    if env == "1":
        return True, True, False
    if env == "attn":
        return True, False, False
    if env == "ln":
        return False, True, False
    if env in ("0", "flash"):
        return False, False, False
    on_tpu = _flash_available()
    return on_tpu, on_tpu, False


def flash_pad_to(T: int) -> int:
    """Sequence length the encoder should pad to so every layer's attention
    hits the flash kernel without per-layer padding (T unchanged off-TPU)."""
    if not _flash_available():
        return T
    return T + ((-T) % _PAD_TO)


def _segment_ids(B: int, T_total: int, n_valid: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    # pad positions get segment 1; real tokens segment 0 — cross-segment
    # attention is masked, so pads never leak into real outputs
    seg = jnp.concatenate(
        [
            jnp.zeros((B, n_valid), jnp.int32),
            jnp.ones((B, T_total - n_valid), jnp.int32),
        ],
        axis=1,
    )
    return SegmentIds(q=seg, kv=seg)


def encoder_attention(
    q: jnp.ndarray,  # [B, H, T, dh] (unscaled)
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float,
    n_valid: Optional[int] = None,  # set when T is pre-padded; masks the tail
) -> jnp.ndarray:
    """softmax(q k^T * sm_scale) v without materializing scores in HBM.

    Routing: the custom single-pass kernel (encoder_attention_pallas.py)
    by default on TPU — measured ~5% faster than the stock flash kernel
    at whisper shapes and free of the flash streaming machinery; stock
    flash via WHISPER_PALLAS_ENCODER=flash; plain einsum elsewhere."""
    use_attn, _, interp = encoder_pallas_mode()
    if use_attn and (q.shape[2] % 128 == 0 or interp):
        from .encoder_attention_pallas import encoder_attention_pallas

        return encoder_attention_pallas(
            q, k, v, sm_scale, n_valid=n_valid, interpret=interp
        )
    if not _flash_available():
        if n_valid is not None and n_valid < q.shape[2]:
            # mask the pad tail so results match the segment-masked kernel
            neg = jnp.finfo(jnp.float32).min
            key_mask = jnp.arange(q.shape[2]) >= n_valid
            bias = jnp.where(key_mask, neg, 0.0)[None, None, None, :]
        else:
            bias = 0.0
        qk = jnp.einsum(
            "bhqd,bhkd->bhqk", q * sm_scale, k, preferred_element_type=jnp.float32
        )
        w = jax.nn.softmax(qk.astype(jnp.float32) + bias, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, T, dh = q.shape
    pad = (-T) % _PAD_TO
    if pad:
        # caller didn't pre-pad: pad/unpad locally (legacy path)
        padding = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        segment_ids = _segment_ids(B, T + pad, T)
    elif n_valid is not None and n_valid < T:
        segment_ids = _segment_ids(B, T, n_valid)
    else:
        segment_ids = None

    Tp = q.shape[2]
    block_sizes = BlockSizes(
        block_q=min(512, Tp),
        block_k_major=Tp,
        block_k=Tp,
        block_b=1,
        block_q_major_dkv=min(512, Tp),
        block_k_major_dkv=min(512, Tp),
        block_k_dkv=min(512, Tp),
        block_q_dkv=min(512, Tp),
        block_k_major_dq=min(512, Tp),
        block_k_dq=min(512, Tp),
        block_q_dq=min(512, Tp),
    )
    out = flash_attention(
        q, k, v, segment_ids=segment_ids, causal=False, sm_scale=sm_scale,
        block_sizes=block_sizes,
    )
    return out[:, :, :T] if pad else out
