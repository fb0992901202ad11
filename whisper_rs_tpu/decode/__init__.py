from .filters import FilterConfig, apply_filters
from .language import detect_language
from .loop import DecodeResult, decode_beam, decode_greedy
from .prompt import (
    DecodePrompt,
    build_batch_prompts,
    pad_initial_tokens,
    prefill_bucket,
)
from .ranker import candidate_lengths, rank_max_likelihood
from .task import DecodeOutput, DecodeTask

__all__ = [
    "DecodeOutput",
    "DecodePrompt",
    "DecodeResult",
    "DecodeTask",
    "FilterConfig",
    "apply_filters",
    "build_batch_prompts",
    "candidate_lengths",
    "decode_beam",
    "decode_greedy",
    "detect_language",
    "pad_initial_tokens",
    "prefill_bucket",
    "rank_max_likelihood",
]
