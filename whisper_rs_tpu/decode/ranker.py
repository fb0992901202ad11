"""Sequence ranking (reference: decode/sequencer/, max_likelihood.rs).

Picks the best candidate per audio by cumulative logprob with optional
Google-NMT length penalty ``((5+len)/6)**p`` (max_likelihood.rs:22-27), run
on device over the fixed-capacity candidate buffers.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .loop import BIG_NEG, DecodeResult


def candidate_lengths(
    candidates: jnp.ndarray, sample_begin: jnp.ndarray, eot: int
) -> jnp.ndarray:
    """[n_audio, C] sampled-token count per candidate: first EOT index minus
    sample_begin (the [sample_begin..EOT) slice of decode/mod.rs:355-370)."""
    n_ctx = candidates.shape[-1]
    is_eot = candidates == eot
    # first EOT position (n_ctx if none — finalize guarantees one)
    idx = jnp.where(is_eot, jnp.arange(n_ctx)[None, None, :], n_ctx)
    first_eot = jnp.min(idx, axis=-1)
    return first_eot - sample_begin


def rank_max_likelihood(
    result: DecodeResult,
    sample_begin: jnp.ndarray,
    eot: int,
    length_penalty: Optional[float],
):
    """Returns (selected [n_audio] i32, avg_logprob [n_audio] f32,
    lengths [n_audio, C] i32)."""
    lengths = candidate_lengths(result.candidates, sample_begin, eot)
    safe_len = jnp.maximum(lengths, 1).astype(jnp.float32)
    if length_penalty is None:
        penalty = safe_len  # simple length normalization
    else:
        penalty = ((5.0 + safe_len) / 6.0) ** length_penalty
    score = result.scores / penalty
    score = jnp.where(result.scores <= BIG_NEG / 2, -jnp.inf, score)
    selected = jnp.argmax(score, axis=-1).astype(jnp.int32)

    sel_score = jnp.take_along_axis(result.scores, selected[:, None], axis=1)[:, 0]
    sel_len = jnp.take_along_axis(lengths, selected[:, None], axis=1)[:, 0]
    # avg_logprob = cum / (len + 1)  (decode/mod.rs:389-397)
    avg_logprob = sel_score / (sel_len.astype(jnp.float32) + 1.0)
    return selected, avg_logprob, lengths
