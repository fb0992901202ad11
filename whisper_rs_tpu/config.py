"""Model/configuration registry for the TPU-native Whisper framework.

The reference carries one hand-rolled ``ModelDims`` struct
(``/root/reference/src/model.rs:547-557``) hardcoded to base.en in its example
(``/root/reference/examples/transcribe.rs:25-35``).  Here the dims are a frozen
dataclass plus a registry covering every released Whisper size (tiny ->
large-v3), because the TPU build must scale past base.en (BASELINE configs
#1-#5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelDims:
    """Architecture hyperparameters (reference: ``model.rs:547-557``)."""

    n_mels: int
    n_vocab: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int

    @property
    def head_dim(self) -> int:
        assert self.n_audio_state % self.n_audio_head == 0
        return self.n_audio_state // self.n_audio_head

    @property
    def sample_len_default(self) -> int:
        # reference: decode/mod.rs:129-131 (n_text_ctxs / 2)
        return self.n_text_ctx // 2


def _dims(n_mels, n_vocab, state, head, layer, text_layer=None) -> ModelDims:
    return ModelDims(
        n_mels=n_mels,
        n_vocab=n_vocab,
        n_audio_ctx=1500,
        n_audio_state=state,
        n_audio_head=head,
        n_audio_layer=layer,
        n_text_ctx=448,
        n_text_state=state,
        n_text_head=head,
        n_text_layer=layer if text_layer is None else text_layer,
    )


# English-only checkpoints use a 51864-token vocab, multilingual 51865,
# large-v3 51866 (adds <|yue|>).  large-v3 also moves to 128 mel bins.
MODEL_REGISTRY = {
    "tiny.en": _dims(80, 51864, 384, 6, 4),
    "tiny": _dims(80, 51865, 384, 6, 4),
    "base.en": _dims(80, 51864, 512, 8, 6),
    "base": _dims(80, 51865, 512, 8, 6),
    "small.en": _dims(80, 51864, 768, 12, 12),
    "small": _dims(80, 51865, 768, 12, 12),
    "medium.en": _dims(80, 51864, 1024, 16, 24),
    "medium": _dims(80, 51865, 1024, 16, 24),
    "large-v1": _dims(80, 51865, 1280, 20, 32),
    "large-v2": _dims(80, 51865, 1280, 20, 32),
    "large-v3": _dims(128, 51866, 1280, 20, 32),
    "large-v3-turbo": _dims(128, 51866, 1280, 20, 32, text_layer=4),
    # distil-whisper family (same encoders, shallow decoders — the shapes
    # serving deployments actually run; checkpoints load via the same
    # OpenAI-format converter)
    "distil-small.en": _dims(80, 51864, 768, 12, 12, text_layer=4),
    "distil-medium.en": _dims(80, 51864, 1024, 16, 24, text_layer=2),
    "distil-large-v2": _dims(80, 51865, 1280, 20, 32, text_layer=2),
    "distil-large-v3": _dims(128, 51866, 1280, 20, 32, text_layer=2),
}


def dims_for(name: str) -> ModelDims:
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}"
        ) from None


@dataclasses.dataclass(frozen=True)
class GreedyMode:
    """Greedy token extraction (reference: extractor/mod.rs:13-15; the
    reference left greedy unfinished — greedy.rs:60 todo!() — we implement it
    fully)."""

    group_size: int = 1
    temperature: float = 0.0


@dataclasses.dataclass(frozen=True)
class BeamSearchMode:
    """Beam-search token extraction (reference: extractor/mod.rs:16,
    beam_search.rs)."""

    beam_size: int = 5
    patience: float = 1.0


TokenExtractMode = object  # union tag: GreedyMode | BeamSearchMode


@dataclasses.dataclass(frozen=True)
class DecodeOptions:
    """Single-window decode options (reference: decode/mod.rs:95-106).

    Defaults mirror the reference example (examples/transcribe.rs:46-55).
    """

    sample_len: Optional[int] = None
    mode: object = BeamSearchMode(beam_size=5, patience=1.0)
    length_penalty: Optional[float] = None
    max_initial_timestamp: Optional[float] = 1.0
    timestamps: bool = True
    suppress_blank: bool = True
    suppress_non_speech: bool = True
    suppress_tokens: Optional[Tuple[int, ...]] = None


@dataclasses.dataclass(frozen=True)
class TranscribeOptions:
    """Long-audio transcription options (reference: transcribe.rs:32-50)."""

    decode: DecodeOptions = DecodeOptions()
    # TranscribePrompt::{Pretokenized, Text, None{condition_on_prev_text}}
    # (reference: transcribe.rs:25-29) flattened into two optional fields.
    initial_prompt_tokens: Optional[Tuple[int, ...]] = None
    initial_prompt_text: Optional[str] = None
    condition_on_prev_text: bool = True
    # No-speech window skipping: the reference computes no_speech_prob but
    # leaves the skip as a TODO (transcribe.rs:165).  When set, a window
    # with no_speech_prob > no_speech_threshold AND avg_logprob <
    # logprob_threshold is treated as silence (OpenAI semantics).  Default
    # None = reference behavior (never skip).
    no_speech_threshold: Optional[float] = None
    logprob_threshold: float = -1.0
    # Temperature fallback ladder (OpenAI transcribe semantics; absent from
    # the reference, whose sampling path is unimplemented): when set, a
    # window whose decode fails quality checks (compression_ratio >
    # compression_ratio_threshold, or avg_logprob < logprob_threshold) is
    # retried at the next temperature.  e.g. (0.0, 0.2, 0.4, 0.6, 0.8, 1.0).
    # Default None = reference behavior (single decode per window).
    temperatures: Optional[Tuple[float, ...]] = None
    compression_ratio_threshold: float = 2.4
    # Word-level timestamps via cross-attention DTW alignment
    # (decode/align.py; absent from the reference): one extra
    # teacher-forced decoder pass per window.  ``alignment_heads`` is an
    # optional model-specific list of (layer, head) pairs; default = every
    # head of the upper half of the decoder layers.
    word_timestamps: bool = False
    alignment_heads: Optional[Tuple[Tuple[int, int], ...]] = None
