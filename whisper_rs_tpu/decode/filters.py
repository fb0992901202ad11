"""Vectorized, on-device logit filters.

The reference models filters as a trait mutating logits in place, applied in
sequence each step (``decode/mod.rs:261-264``; trait at
``decode/filter/mod.rs:12-14``).  Its TimestampTokens filter iterates batch
rows on the host with scalar tensor reads (``timestamp_tokens.rs:47-96``) —
a device-sync per row per step.  Here every filter is a pure
``logits -> logits`` function over the whole ``[B, vocab]`` batch built from
broadcast masks, so the entire stack lives inside the jitted decode loop.

Filter order matches the reference assembly (decode/mod.rs:156-190):
SuppressBlank, SuppressTokens, TimestampRules.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    """Static (trace-time) filter configuration.

    Assembled once per DecodeTask from DecodeOptions + tokenizer IDs —
    the equivalent of the reference's filter-list construction
    (decode/mod.rs:156-190).
    """

    n_vocab: int
    token_id_eot: int
    token_id_space: int
    token_id_ts_begin: int
    token_id_no_timestamps: int
    suppress_blank: bool = True
    timestamps: bool = True
    # user list ∪ non-speech tokens (decode/mod.rs:166-174); empty = off
    suppress_ids: Tuple[int, ...] = ()
    # round(max_initial_timestamp / 0.02) or None (decode/mod.rs:176-189)
    max_initial_timestamp_index: Optional[int] = None

    def suppress_mask(self) -> np.ndarray:
        """Additive [vocab] mask, -inf at suppressed IDs (suppress_tokens.rs:21-24)."""
        m = np.zeros((self.n_vocab,), np.float32)
        if self.suppress_ids:
            m[np.asarray(self.suppress_ids, np.int64)] = NEG_INF
        return m


def apply_filters(
    cfg: FilterConfig,
    logits: jnp.ndarray,  # [B, vocab] f32 — last-position logits
    tokens: jnp.ndarray,  # [B, n_ctx] i32 — full token buffer
    pos: jnp.ndarray,  # scalar i32 — number of tokens so far (next write slot)
    sample_begin: jnp.ndarray,  # scalar i32
) -> jnp.ndarray:
    """Run the configured filter stack for one decode step."""
    B, V = logits.shape
    col = jnp.arange(V)
    n_sampled = pos - sample_begin  # 0 at the first sampled position
    at_begin = n_sampled == 0

    # -- SuppressBlank (suppress_blanks.rs:52-57): at the first sampled
    # position only, ban {" ", eot}.
    if cfg.suppress_blank:
        blank = (col == cfg.token_id_space) | (col == cfg.token_id_eot)
        logits = jnp.where(at_begin & blank[None, :], NEG_INF, logits)

    # -- SuppressTokens (suppress_tokens.rs:21-24): fixed ID list, always.
    if cfg.suppress_ids:
        logits = logits + jnp.asarray(cfg.suppress_mask())[None, :]

    # -- Timestamp rules (timestamp_tokens.rs:34-96)
    if cfg.timestamps:
        ts_begin = cfg.token_id_ts_begin
        is_ts = col >= ts_begin
        is_text = col < cfg.token_id_eot  # "normal text tokens" incl. nothing special

        # always ban <|notimestamps|> (timestamp_tokens.rs:37-41)
        logits = jnp.where((col == cfg.token_id_no_timestamps)[None, :], NEG_INF, logits)

        # pairing rule per row (timestamp_tokens.rs:47-66):
        # look at the last two *sampled* tokens.
        last = jnp.take_along_axis(
            tokens, jnp.maximum(pos - 1, 0)[None, None].repeat(B, 0), axis=1
        )[:, 0]
        second_last = jnp.take_along_axis(
            tokens, jnp.maximum(pos - 2, 0)[None, None].repeat(B, 0), axis=1
        )[:, 0]
        last_was_ts = (n_sampled >= 1) & (last >= ts_begin)
        second_last_was_ts = (n_sampled < 2) | (second_last >= ts_begin)

        ban_ts = last_was_ts & second_last_was_ts  # ts pair complete -> text next
        ban_text = last_was_ts & ~second_last_was_ts  # need closing ts

        logits = jnp.where(ban_ts[:, None] & is_ts[None, :], NEG_INF, logits)
        logits = jnp.where(ban_text[:, None] & is_text[None, :], NEG_INF, logits)

        # first sampled position: force a timestamp, optionally capped
        # (timestamp_tokens.rs:68-78)
        logits = jnp.where(at_begin & ~is_ts[None, :], NEG_INF, logits)
        if cfg.max_initial_timestamp_index is not None:
            last_allowed = ts_begin + cfg.max_initial_timestamp_index
            logits = jnp.where(at_begin & (col > last_allowed)[None, :], NEG_INF, logits)

        # if P(any timestamp) > max P(text token), force timestamp
        # (timestamp_tokens.rs:82-96)
        logprobs = _log_softmax(logits)
        ts_logprob = logsumexp(
            jnp.where(is_ts[None, :], logprobs, NEG_INF), axis=-1
        )
        max_text = jnp.max(
            jnp.where(is_ts[None, :], NEG_INF, logprobs), axis=-1
        )
        force_ts = ts_logprob > max_text
        logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], NEG_INF, logits)

    return logits


def _log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    """log_softmax that tolerates fully -inf rows without NaN."""
    m = jnp.max(x, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    shifted = x - m
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))
