"""Encoder self-attention: flash kernel on TPU, einsum fallback elsewhere.

The encoder's 1500-frame self-attention materializes [B, H, 1500, 1500]
score tensors in the naive formulation (~576 MB f32 per base.en layer at
batch 8) — the dominant encoder cost.  On TPU we use JAX's Pallas flash-
attention kernel (jax.experimental.pallas.ops.tpu.flash_attention), which
streams K/V blocks through VMEM and never materializes the scores.

Whisper's audio context (1500) is not a multiple of the kernel's block
sizes, so sequences are padded to 1536 with segment-id masking (pad
positions form their own segment; real queries never attend them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_PAD_TO = 128


def _flash_available() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def encoder_attention(
    q: jnp.ndarray,  # [B, H, T, dh] (unscaled)
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float,
) -> jnp.ndarray:
    """softmax(q k^T * sm_scale) v without materializing scores on TPU."""
    if not _flash_available():
        qk = jnp.einsum(
            "bhqd,bhkd->bhqk", q * sm_scale, k, preferred_element_type=jnp.float32
        )
        w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, T, dh = q.shape
    pad = (-T) % _PAD_TO
    if pad:
        padding = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        # pad positions get segment 1; real tokens segment 0 — cross-segment
        # attention is masked, so pads never leak into real outputs
        seg = jnp.concatenate(
            [jnp.zeros((B, T), jnp.int32), jnp.ones((B, pad), jnp.int32)], axis=1
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    Tp = q.shape[2]
    block_sizes = BlockSizes(
        block_q=512,
        block_k_major=Tp,
        block_k=Tp,
        block_b=1,
        block_q_major_dkv=512,
        block_k_major_dkv=512,
        block_k_dkv=512,
        block_q_dkv=512,
        block_k_major_dq=512,
        block_k_dq=512,
        block_q_dq=512,
    )
    out = flash_attention(
        q, k, v, segment_ids=segment_ids, causal=False, sm_scale=sm_scale,
        block_sizes=block_sizes,
    )
    return out[:, :, :T] if pad else out
