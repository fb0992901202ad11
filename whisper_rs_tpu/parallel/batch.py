"""Data-parallel batched transcription driver.

The reference transcribes one window at a time on one device
(transcribe.rs:151-234).  Here N utterances stream through the decoder in
lockstep: every iteration gathers the next 30s window from each unfinished
utterance, batches them (padding the batch with repeats to keep shapes
static), decodes them in ONE jitted call (optionally sharded over a
('data','model') mesh), and advances each utterance's seek/segment state
independently — per-utterance prompt conditioning included (per-row prompts
via DecodeTask.run_batch).

This is the backbone of BASELINE configs #2/#4/#5: batched windows are the
data-parallel unit, and utterances of different lengths retire from the
batch as they finish (per-utterance error isolation: one bad utterance
cannot take down the batch).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..audio import N_FRAMES, log_mel_file, pad_or_trim
from ..config import ModelDims, TranscribeOptions
from ..decode import DecodeTask
from ..tokenize import Tokenizer
from ..transcribe import (
    QUANTUM,
    TranscribeOutput,
    TranscribeSegment,
    needs_fallback,
    process_window_result,
    should_skip_no_speech,
)


@dataclasses.dataclass
class _UttState:
    mel: np.ndarray  # [n_mels, n_frames]
    seek: int = 0
    tokens: List[int] = dataclasses.field(default_factory=list)
    segments: List[TranscribeSegment] = dataclasses.field(default_factory=list)
    avg_logprobs: List[float] = dataclasses.field(default_factory=list)
    no_speech_probs: List[float] = dataclasses.field(default_factory=list)
    # current temperature-ladder rung: a window failing needs_fallback is
    # re-decoded at the next rung with the seek held (serve.py:_advance)
    temp_idx: int = 0
    error: Optional[Exception] = None

    @property
    def done(self) -> bool:
        return self.error is not None or self.seek >= self.mel.shape[-1]


class BatchTranscriber:
    def __init__(
        self,
        params,
        dims: ModelDims,
        tokenizer: Tokenizer,
        options: TranscribeOptions = TranscribeOptions(),
        batch_size: int = 8,
        compute_dtype=jnp.float32,
        encoder_fn=None,
    ):
        self.dims = dims
        self.tokenizer = tokenizer
        self.options = options
        self.batch_size = batch_size
        self._params = params
        self._compute_dtype = compute_dtype
        self._encoder_fn = encoder_fn
        self.decode_task = DecodeTask(
            params, dims, tokenizer, options.decode, compute_dtype=compute_dtype,
            keep_audio_features=options.word_timestamps,
            encoder_fn=encoder_fn,
        )
        self._sampling_task_cache: Optional[DecodeTask] = None
        self._aligner = None
        if options.word_timestamps:
            from ..decode.align import WordAligner

            self._aligner = WordAligner(
                params, dims, tokenizer, compute_dtype=compute_dtype,
                alignment_heads=options.alignment_heads,
            )

    def _sampling_task(self) -> DecodeTask:
        """Shared best-of-N sampling task for every t>0 rung of the
        temperature ladder (one executable; the temperature is a traced
        scalar passed at run time — transcribe.py:_sampling_task)."""
        if self._sampling_task_cache is None:
            from ..config import BeamSearchMode, GreedyMode

            base_mode = self.options.decode.mode
            n = (
                base_mode.beam_size
                if isinstance(base_mode, BeamSearchMode)
                else getattr(base_mode, "group_size", 1) or 1
            )
            opts = dataclasses.replace(
                self.options.decode, mode=GreedyMode(group_size=max(n, 1))
            )
            task = DecodeTask(
                self._params,
                self.dims,
                self.tokenizer,
                opts,
                compute_dtype=self._compute_dtype,
                keep_audio_features=self.options.word_timestamps,
                encoder_fn=self._encoder_fn,
            )
            # inherit post-construction toggles set on the primary task
            # (eval_wer.py sets decode_task.quantize_kv directly)
            if getattr(self.decode_task, "quantize_kv", False):
                task.quantize_kv = True
            self._sampling_task_cache = task
        return self._sampling_task_cache

    def run(
        self, audios: Sequence[np.ndarray], raise_on_error: bool = True
    ) -> List[Optional[TranscribeOutput]]:
        """audios: list of [n_samples] float32 16 kHz arrays.

        With ``raise_on_error=False``, failed utterances yield ``None`` in
        the output list instead of aborting the batch."""
        opts = self.options
        input_stride = N_FRAMES // self.dims.n_audio_ctx
        time_precision = input_stride * QUANTUM
        ts_begin = self.tokenizer.token_id_ts_begin

        if opts.initial_prompt_tokens is not None:
            init_tokens = list(opts.initial_prompt_tokens)
            condition = True
        elif opts.initial_prompt_text is not None:
            init_tokens = list(self.tokenizer.encode(opts.initial_prompt_text))
            condition = True
        else:
            init_tokens = []
            condition = opts.condition_on_prev_text

        states = []
        for audio in audios:
            mel = np.asarray(log_mel_file(audio, self.dims.n_mels))
            states.append(_UttState(mel=mel, tokens=list(init_tokens)))

        ladder = opts.temperatures or (0.0,)
        while True:
            active = [i for i, s in enumerate(states) if not s.done]
            if not active:
                break
            chunk = active[: self.batch_size]

            # group rows by their current temperature-ladder rung — rows at
            # different rungs cannot share a decode call because the
            # temperature is one traced scalar per batch (serve.py:
            # _decode_round).  With no ladder everything lands in one group
            # and this is the plain lockstep round.
            groups: dict = {}  # temp key (None = primary task) -> [utt idx]
            for i in chunk:
                t = ladder[min(states[i].temp_idx, len(ladder) - 1)]
                key = (
                    None
                    if (opts.temperatures is None or t == 0.0)
                    else float(t)
                )
                groups.setdefault(key, []).append(i)

            results_by_utt: dict = {}
            for key, group in groups.items():
                task = self.decode_task if key is None else self._sampling_task()
                windows = []
                prompts: List[Optional[List[int]]] = []
                for i in group:
                    s = states[i]
                    windows.append(
                        np.asarray(
                            pad_or_trim(jnp.asarray(s.mel[:, s.seek :]), N_FRAMES)
                        )
                    )
                    prompts.append(s.tokens if condition else None)

                # pad the batch with repeats to the static batch size so the
                # decode graph compiles once: as utterances retire
                # (8->5->3->1) shapes stay [batch_size, ...]; padded rows
                # are dropped below because results are indexed by group.
                # Cost note: each temperature-rung GROUP pays a full-batch
                # decode, so a round with k distinct rungs costs k
                # full-batch decodes even when a rung holds one row.  With
                # the default ladder rungs are rare (most windows accept at
                # t=0) and the silence short-circuit in needs_fallback
                # keeps silent windows off the ladder entirely; making the
                # temperature per-row (traced [B] vector) would let mixed
                # t>0 rungs share one call if this ever shows up in traces.
                n_real = len(windows)
                while len(windows) < self.batch_size:
                    windows.append(windows[-1])
                    prompts.append(prompts[-1])

                try:
                    results = task.run_batch(
                        np.stack(windows, axis=0), prompts, temperature=key
                    )
                except Exception:
                    # batch failed: retry each utterance alone so one
                    # poisoned input can't take down its batchmates
                    # (per-utterance error isolation — the reference aborts
                    # the whole run on any error, SURVEY §5
                    # failure-detection row)
                    results = []
                    for w, p in zip(windows[:n_real], prompts[:n_real]):
                        try:
                            results.append(
                                task.run_batch(
                                    w[None], [p], temperature=key
                                )[0]
                            )
                        except Exception as e:
                            results.append(e)
                for i, r in zip(group, results):
                    results_by_utt[i] = r

            for i in chunk:
                s = states[i]
                r = results_by_utt[i]
                if isinstance(r, Exception):
                    s.error = r
                    continue
                if (
                    opts.temperatures is not None
                    and s.temp_idx < len(ladder) - 1
                    and needs_fallback(
                        opts, r.text, r.avg_logprob, r.no_speech_prob
                    )
                ):
                    # retry the SAME window at the next rung next round;
                    # the seek does not advance and nothing is recorded
                    # for this attempt (serve.py:_advance)
                    s.temp_idx += 1
                    continue
                s.temp_idx = 0
                s.avg_logprobs.append(r.avg_logprob)
                s.no_speech_probs.append(r.no_speech_prob)
                if should_skip_no_speech(opts, r.no_speech_prob, r.avg_logprob):
                    s.seek += N_FRAMES
                    continue
                n_segs_before = len(s.segments)
                n_tokens_before = len(s.tokens)
                seek_before = s.seek
                s.seek = process_window_result(
                    s.tokens,
                    s.segments,
                    np.asarray(r.tokens, np.int64),
                    r.text,
                    s.seek,
                    ts_begin,
                    input_stride,
                    time_precision,
                    self.tokenizer.decode,
                )
                if self._aligner is not None and r.audio_features is not None:
                    from ..transcribe import assign_words

                    content = max(
                        1,
                        min(s.mel.shape[-1] - seek_before, N_FRAMES)
                        // input_stride,
                    )
                    # align only the tokens this window actually consumed —
                    # the tail past the last consecutive-timestamp pair is
                    # re-decoded (and re-aligned) by the next window
                    words = self._aligner.align_window(
                        s.tokens[n_tokens_before:],
                        r.audio_features,
                        seek_before * QUANTUM,
                        content,
                    )
                    assign_words(s.segments[n_segs_before:], words)

        outputs = []
        for s in states:
            if s.error is not None:
                if raise_on_error:
                    raise s.error
                outputs.append(None)
                continue
            arr = np.asarray(s.tokens, np.int64)
            outputs.append(
                TranscribeOutput(
                    tokens=arr,
                    text=self.tokenizer.decode(arr),
                    segments=s.segments,
                    avg_logprobs=s.avg_logprobs,
                    no_speech_probs=s.no_speech_probs,
                )
            )
        return outputs
