"""Decode prompt construction (reference ``DecodePrompt``, decode/mod.rs:40-92).

Initial token sequence is ``[<|startofprev|>] + prompt + sot_sequence`` when a
prompt is given, else just the sot sequence.  ``sample_begin`` is the length
of that sequence; ``sot_idx`` the position of ``<|startoftranscript|>``.

Deviation from the reference (documented): the prompt is truncated to the
last ``n_text_ctx // 2 - 1`` tokens, as OpenAI Whisper does — the reference
passes the whole transcript-so-far, which overflows the 448-token context on
long audio.  Truncation also bounds ``sample_begin`` so one static prefill
bucket can serve every window.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class DecodePrompt:
    initial_tokens: np.ndarray  # [sample_begin] int32
    sample_begin: int
    sot_idx: int

    @staticmethod
    def build(
        prompt: Optional[Sequence[int]],
        sot_sequence: Sequence[int],
        token_id_sot: int,
        token_id_startofprev: int,
        n_text_ctx: int = 448,
    ) -> "DecodePrompt":
        sot_sequence = list(sot_sequence)
        if prompt is not None and len(prompt) > 0:
            max_prompt = n_text_ctx // 2 - 1
            prompt = list(prompt)[-max_prompt:]
            initial = [token_id_startofprev] + prompt + sot_sequence
        else:
            initial = sot_sequence
        initial = np.asarray(initial, np.int32)
        sot_idx = int(np.nonzero(initial == token_id_sot)[0][0])
        return DecodePrompt(
            initial_tokens=initial,
            sample_begin=len(initial),
            sot_idx=sot_idx,
        )


# Static prefill bucket widths: smallest ≥ sample_begin is chosen, and the
# prompt is zero-padded up to it.  Garbage K/V written at padded positions is
# never attended: the causal mask hides slots > query position, and decode
# steps overwrite slot p before querying it.
PREFILL_BUCKETS = (8, 64, 128, 232)


def prefill_bucket(sample_begin: int) -> int:
    for b in PREFILL_BUCKETS:
        if sample_begin <= b:
            return b
    raise ValueError(f"prompt too long: sample_begin={sample_begin}")


def pad_initial_tokens(prompt: DecodePrompt, batch: int) -> np.ndarray:
    """[batch, bucket] int32, prompt left-aligned, zero tail."""
    b = prefill_bucket(prompt.sample_begin)
    row = np.zeros((b,), np.int32)
    row[: prompt.sample_begin] = prompt.initial_tokens
    return np.tile(row[None, :], (batch, 1))


def build_batch_prompts(
    prompts,  # list[Optional[Sequence[int]]], one per utterance
    sot_sequence: Sequence[int],
    token_id_sot: int,
    token_id_startofprev: int,
    n_text_ctx: int = 448,
):
    """Per-row prompts of different lengths, packed END-aligned into one
    static bucket.

    Every row's prompt is right-aligned so generation starts at the shared
    ``sample_begin`` (= the bucket width); rows shorter than the bucket get
    zero left-padding masked out of attention via ``key_start``.

    Returns (tokens [B, P] int32, key_start [B] int32, sample_begin=P,
    sot_idx) — sot_idx is the same for every row because the sot sequence
    sits at the end.
    """
    sot_sequence = list(sot_sequence)
    rows = []
    for p in prompts:
        if p is not None and len(p) > 0:
            max_prompt = n_text_ctx // 2 - 1
            rows.append([token_id_startofprev] + list(p)[-max_prompt:] + sot_sequence)
        else:
            rows.append(list(sot_sequence))
    P = prefill_bucket(max(len(r) for r in rows))
    tokens = np.zeros((len(rows), P), np.int32)
    key_start = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        tokens[i, P - len(r) :] = r
        key_start[i] = P - len(r)
    sot_idx = P - len(sot_sequence)  # sot position, shared across rows
    return tokens, key_start, P, sot_idx
