"""Long-audio transcription: 30s-window seek loop with prompt conditioning
and timestamp-guided segmentation.

Reference: ``TranscribeTask`` (/root/reference/src/transcribe.rs).  The
segmentation rules are replicated exactly — they define output correctness:

  * consecutive-timestamp-pair splitting (transcribe.rs:167-210), with seek
    advanced to the last pair's timestamp;
  * single-window fallback with lone-trailing-timestamp duration trim
    (transcribe.rs:211-233), advancing a full window;
  * prompt conditioning: all tokens so far fed as ``<|startofprev|>`` prompt
    when ``condition_on_prev_text`` (transcribe.rs:155-158).

Documented deviation: segment ``start_token``/``end_token`` are global token
indices in *both* branches (the reference uses global offsets in the
consecutive branch but window-relative ones in the fallback branch,
transcribe.rs:222-227 — an upstream inconsistency).

The mel for the whole file is computed once up front (transcribe.rs:111-112)
— on TPU via the fused Pallas frontend when available.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .audio import HOP_LENGTH, N_FRAMES, SAMPLE_RATE, log_mel_file, pad_or_trim
from .config import ModelDims, TranscribeOptions
from .decode import DecodeTask
from .tokenize import Tokenizer

# smallest time unit discernible by the model (transcribe.rs:117)
QUANTUM = HOP_LENGTH / SAMPLE_RATE  # 0.01 s


@dataclasses.dataclass
class TranscribeSegment:
    """reference TranscribeOutputSegment (transcribe.rs:59-67).

    ``words`` (beyond the reference): per-word timings from
    cross-attention DTW alignment when
    ``TranscribeOptions.word_timestamps`` is on (decode/align.py)."""

    seek: int
    start_time: float
    end_time: float
    start_token: int
    end_token: int
    text: str
    words: Optional[list] = None  # List[decode.align.WordTiming]


@dataclasses.dataclass
class TranscribeOutput:
    """reference TranscribeOutput (transcribe.rs:52-57)."""

    tokens: np.ndarray
    text: str
    segments: List[TranscribeSegment]
    # carried per-window quality metrics (decode/mod.rs computes these; the
    # reference surfaces but never consumes them — transcribe.rs:165 TODO)
    avg_logprobs: List[float] = dataclasses.field(default_factory=list)
    no_speech_probs: List[float] = dataclasses.field(default_factory=list)


def compression_ratio(text: str) -> float:
    """zlib compression ratio of the text — high values flag degenerate
    repetition loops (OpenAI quality heuristic)."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def needs_fallback(
    opts: TranscribeOptions,
    text: str,
    avg_logprob: float,
    no_speech_prob: Optional[float] = None,
) -> bool:
    """Temperature-ladder retry rule (OpenAI decode_with_fallback semantics).

    The silence short-circuit comes last and overrides both failure
    conditions: a window the model confidently flags as non-speech is
    accepted as-is (and then skipped by ``should_skip_no_speech``) rather
    than climbing the ladder — re-decoding silence at higher temperatures
    just manufactures hallucinations at 6x the cost."""
    fallback = False
    if compression_ratio(text) > opts.compression_ratio_threshold:
        fallback = True  # degenerate repetition
    if avg_logprob < opts.logprob_threshold:
        fallback = True  # low confidence
    if (
        no_speech_prob is not None
        and opts.no_speech_threshold is not None
        and no_speech_prob > opts.no_speech_threshold
    ):
        fallback = False  # confident silence: accept (then skip) the window
    return fallback


def should_skip_no_speech(
    opts: TranscribeOptions, no_speech_prob: float, avg_logprob: float
) -> bool:
    """No-speech window skip (closes the reference TODO at transcribe.rs:165;
    OpenAI semantics: silence only when the no-speech signal is strong AND
    the decode is low-confidence)."""
    return (
        opts.no_speech_threshold is not None
        and no_speech_prob > opts.no_speech_threshold
        and avg_logprob < opts.logprob_threshold
    )


def assign_words(segments: List["TranscribeSegment"], words) -> None:
    """Attach aligned words to the window's segments by time: each word
    goes to the segment whose span contains its midpoint (nearest span
    otherwise).  Word and segment order are both monotone, so assignment
    preserves reading order."""
    if not segments or not words:
        return
    for s in segments:
        s.words = []
    for w in words:
        mid = (w.start + w.end) / 2.0
        target = None
        for s in segments:
            if s.start_time - 1e-6 <= mid <= s.end_time + 1e-6:
                target = s
                break
        if target is None:
            target = min(
                segments,
                key=lambda s: min(
                    abs(s.start_time - mid), abs(s.end_time - mid)
                ),
            )
        target.words.append(w)


def process_window_result(
    tokens: List[int],
    segments: List[TranscribeSegment],
    segment_tokens: np.ndarray,
    result_text: str,
    seek: int,
    ts_begin: int,
    input_stride: int,
    time_precision: float,
    decode_fn,
) -> int:
    """Apply one decoded window to the running transcription state.

    Implements both segmentation branches (transcribe.rs:167-233) and
    returns the new seek.  Mutates ``tokens`` and ``segments``.
    ``decode_fn``: token-ids -> text (for per-segment text).
    """
    ts_offset = seek * QUANTUM
    is_ts = segment_tokens >= ts_begin
    consecutive = np.nonzero(is_ts[:-1] & is_ts[1:])[0] + 1
    token_offset = len(tokens)

    if consecutive.size > 0:
        last_slice = 0
        for current_slice in consecutive:
            sliced = segment_tokens[last_slice:current_slice]
            start_ts = int(sliced[0]) - ts_begin
            end_ts = int(sliced[-1]) - ts_begin
            segments.append(
                TranscribeSegment(
                    seek=seek,
                    start_time=ts_offset + start_ts * time_precision,
                    end_time=ts_offset + end_ts * time_precision,
                    start_token=token_offset + last_slice + 1,
                    end_token=token_offset + int(current_slice),
                    text=decode_fn(sliced),
                )
            )
            last_slice = int(current_slice)

        last_ts = int(segment_tokens[last_slice - 1]) - ts_begin
        if last_ts <= 0:
            # degenerate <|0.00|><|0.00|> pair would advance the seek by 0
            # frames and loop forever (the reference shares this hazard,
            # transcribe.rs:205-206); fall back to a full-window advance
            seek += N_FRAMES
        else:
            seek += last_ts * input_stride
        tokens.extend(int(t) for t in segment_tokens[: last_slice + 1])
    else:
        segment_duration = 30.0
        ts_positions = segment_tokens[is_ts]
        if ts_positions.size > 0 and int(ts_positions[-1]) != ts_begin:
            # lone trailing timestamp: trim duration to it
            segment_duration = (int(ts_positions[-1]) - ts_begin) * time_precision

        segments.append(
            TranscribeSegment(
                seek=seek,
                start_time=ts_offset,
                end_time=ts_offset + segment_duration,
                start_token=token_offset,
                end_token=token_offset + len(segment_tokens),
                text=result_text,
            )
        )
        seek += N_FRAMES
        tokens.extend(int(t) for t in segment_tokens)
    return seek


class TranscribeTask:
    def __init__(
        self,
        params,
        dims: ModelDims,
        tokenizer: Tokenizer,
        options: TranscribeOptions = TranscribeOptions(),
        compute_dtype=jnp.float32,
        encoder_fn=None,
    ):
        self.dims = dims
        self.tokenizer = tokenizer
        self.options = options
        self._params = params
        self._compute_dtype = compute_dtype
        self._encoder_fn = encoder_fn
        self.decode_task = DecodeTask(
            params, dims, tokenizer, options.decode, compute_dtype=compute_dtype,
            keep_audio_features=options.word_timestamps,
            encoder_fn=encoder_fn,
        )
        self._fallback_tasks: dict = {}
        self._aligner = None
        if options.word_timestamps:
            from .decode.align import WordAligner

            self._aligner = WordAligner(
                params, dims, tokenizer, compute_dtype=compute_dtype,
                alignment_heads=options.alignment_heads,
            )

    def _sampling_task(self) -> DecodeTask:
        """Shared decode task for every t>0 rung of the temperature ladder:
        best-of-N sampling (OpenAI semantics — beam search is not defined at
        temperature).  ONE task/executable serves all rungs: the temperature
        is a traced scalar passed at run time (run_batch(temperature=t)),
        so the ladder costs one compile, not one per rung."""
        import dataclasses as _dc

        from .config import BeamSearchMode, GreedyMode

        if "sampling" not in self._fallback_tasks:
            base_mode = self.options.decode.mode
            n = (
                base_mode.beam_size
                if isinstance(base_mode, BeamSearchMode)
                else getattr(base_mode, "group_size", 1) or 1
            )
            opts = _dc.replace(
                self.options.decode, mode=GreedyMode(group_size=max(n, 1))
            )
            self._fallback_tasks["sampling"] = DecodeTask(
                self._params,
                self.dims,
                self.tokenizer,
                opts,
                compute_dtype=self._compute_dtype,
                keep_audio_features=self.options.word_timestamps,
                encoder_fn=self._encoder_fn,
            )
            # inherit post-construction toggles set on the primary task
            # (eval_wer.py sets decode_task.quantize_kv directly) so the
            # t>0 rungs decode with the same cache dtype — keeps the
            # sequential and batch drivers bit-identical (parallel/batch.py
            # does the same)
            if getattr(self.decode_task, "quantize_kv", False):
                self._fallback_tasks["sampling"].quantize_kv = True
        return self._fallback_tasks["sampling"]

    def run(self, audio, mel: Optional[np.ndarray] = None) -> TranscribeOutput:
        """audio: [n_samples] f32 at 16 kHz (or pass a precomputed
        ``mel`` [n_mels, n_frames])."""
        if mel is None:
            mel = log_mel_file(audio, self.dims.n_mels)
        mel = jnp.asarray(mel)
        n_frames = mel.shape[-1]

        # mel frames per output token (=2) and seconds per timestamp
        # position (=0.02) — transcribe.rs:117-122
        input_stride = N_FRAMES // self.dims.n_audio_ctx
        time_precision = input_stride * QUANTUM

        opts = self.options
        if opts.initial_prompt_tokens is not None:
            tokens: List[int] = list(opts.initial_prompt_tokens)
            condition = True
        elif opts.initial_prompt_text is not None:
            tokens = list(self.tokenizer.encode(opts.initial_prompt_text))
            condition = True
        else:
            tokens = []
            condition = opts.condition_on_prev_text

        ts_begin = self.tokenizer.token_id_ts_begin
        segments: List[TranscribeSegment] = []
        avg_logprobs: List[float] = []
        no_speech_probs: List[float] = []

        seek = 0
        while seek < n_frames:
            window = pad_or_trim(mel[:, seek:], N_FRAMES)

            # temperature fallback ladder (None = single pass, reference
            # behavior)
            ladder = opts.temperatures or (0.0,)
            result = None
            for idx, t in enumerate(ladder):
                if opts.temperatures is None or t == 0.0:
                    task, temp = self.decode_task, None
                else:
                    task, temp = self._sampling_task(), t
                if condition:
                    task.set_prompt(tokens)
                result = task.run(window, temperature=temp)[0]
                if idx == len(ladder) - 1 or opts.temperatures is None:
                    break
                if not needs_fallback(
                    opts, result.text, result.avg_logprob, result.no_speech_prob
                ):
                    break
            segment_tokens = np.asarray(result.tokens, np.int64)
            avg_logprobs.append(result.avg_logprob)
            no_speech_probs.append(result.no_speech_prob)

            if should_skip_no_speech(
                opts, result.no_speech_prob, result.avg_logprob
            ):
                seek += N_FRAMES
                continue

            n_segs_before = len(segments)
            n_tokens_before = len(tokens)
            seek_before = seek
            seek = process_window_result(
                tokens,
                segments,
                segment_tokens,
                result.text,
                seek,
                ts_begin,
                input_stride,
                time_precision,
                self.tokenizer.decode,
            )
            aligner = getattr(self, "_aligner", None)  # tolerate stub tasks
            if aligner is not None and result.audio_features is not None:
                content = max(
                    1, min(n_frames - seek_before, N_FRAMES) // input_stride
                )
                # align only the tokens this window actually consumed —
                # the tail past the last consecutive-timestamp pair is
                # re-decoded (and re-aligned) by the next window
                words = aligner.align_window(
                    tokens[n_tokens_before:],
                    result.audio_features,
                    seek_before * QUANTUM,
                    content,
                )
                assign_words(segments[n_segs_before:], words)

        tokens_arr = np.asarray(tokens, np.int64)
        return TranscribeOutput(
            tokens=tokens_arr,
            text=self.tokenizer.decode(tokens_arr),
            segments=segments,
            avg_logprobs=avg_logprobs,
            no_speech_probs=no_speech_probs,
        )
