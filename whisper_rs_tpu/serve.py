"""Serving engine: continuous batching of transcription requests.

The reference is a one-shot CLI-style library (one utterance, one window at
a time, ``transcribe.rs:151-234``); it has no serving story.  This module
adds the production-serving layer the TPU build is meant for: a
long-running engine that accepts requests asynchronously and keeps the
chip's decode batch full by **continuous batching at 30s-window
granularity** — the natural quantum for Whisper, where every decode call
is one fixed-shape window batch and utterances are chains of windows with
prompt conditioning between them.

How it maps to the hardware/runtime model:
  * The decode graph is compiled ONCE for the static ``[batch_size, ...]``
    window shape (DecodeTask prompt buckets); continuous batching never
    changes shapes, it only swaps which utterance owns a batch row.
  * A finished utterance releases its row at the next window boundary and
    a queued request is admitted into it immediately — no drain barrier,
    so short requests are not serialized behind long ones (the classic
    continuous-batching win over static batching).
  * Per-utterance prompt conditioning, segmentation, seek advance, the
    no-speech skip, the temperature-fallback ladder, and word-timestamp
    alignment are all per-row state on the host; rows are independent in
    the jitted program (per-row end-aligned prompts), so batch
    composition cannot change any row's tokens — serving output is
    bit-identical to the sequential ``TranscribeTask`` for the FULL
    ``TranscribeOptions`` contract.
  * Temperature fallback: a row whose window fails ``needs_fallback``
    holds its seek and is re-decoded next round at the next rung; rows
    are grouped per round by rung (the temperature is one traced scalar
    per call) so a retry never blocks its batchmates.
  * Per-utterance error isolation mirrors parallel/batch.py: a poisoned
    input fails only its own request.

Usage:
    engine = ServingEngine(params, dims, tokenizer, batch_size=8)
    handle = engine.submit(audio)          # non-blocking
    out = handle.result(timeout=600)       # TranscribeOutput
    engine.stats()                         # counters + latency percentiles
    engine.close()
"""

from __future__ import annotations

import collections
import threading
import time
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .audio import N_FRAMES, log_mel_file, pad_or_trim
from .config import ModelDims, TranscribeOptions
from .decode import DecodeTask
from .tokenize import Tokenizer
from .transcribe import (
    QUANTUM,
    TranscribeOutput,
    TranscribeSegment,
    assign_words,
    needs_fallback,
    process_window_result,
    should_skip_no_speech,
)


class RequestHandle:
    """Future-like handle for one submitted utterance.

    ``result()`` blocks until the utterance finishes (raising its error if
    it failed); ``segments_so_far()`` snapshots partial output for
    progress/streaming consumers while decoding is still in flight.
    """

    def __init__(self, request_id: int, audio_seconds: float):
        self.request_id = request_id
        self.audio_seconds = audio_seconds
        self.submitted_at = time.monotonic()
        self.started_at: Optional[float] = None
        self.finished_at: Optional[float] = None
        self._done = threading.Event()
        self._lock = threading.Lock()
        self._output: Optional[TranscribeOutput] = None
        self._error: Optional[Exception] = None
        self._segments: List[TranscribeSegment] = []

    # -- consumer side ------------------------------------------------------

    def done(self) -> bool:
        return self._done.is_set()

    def result(self, timeout: Optional[float] = None) -> TranscribeOutput:
        if not self._done.wait(timeout):
            raise TimeoutError(
                f"request {self.request_id} not finished within {timeout}s"
            )
        if self._error is not None:
            raise self._error
        return self._output

    def segments_so_far(self) -> List[TranscribeSegment]:
        with self._lock:
            return list(self._segments)

    @property
    def latency(self) -> Optional[float]:
        if self.finished_at is None:
            return None
        return self.finished_at - self.submitted_at

    # -- engine side --------------------------------------------------------

    def _publish_segments(self, segments: List[TranscribeSegment]) -> None:
        with self._lock:
            self._segments = list(segments)

    def _resolve(self, output: TranscribeOutput) -> None:
        self.finished_at = time.monotonic()
        self._output = output
        self._done.set()

    def _reject(self, error: Exception) -> None:
        self.finished_at = time.monotonic()
        self._error = error
        self._done.set()


class _Job:
    """Engine-internal per-utterance decode state (one batch row)."""

    def __init__(self, handle: RequestHandle, mel: np.ndarray,
                 init_tokens: List[int]):
        self.handle = handle
        self.mel = mel
        self.seek = 0
        self.tokens: List[int] = list(init_tokens)
        self.segments: List[TranscribeSegment] = []
        self.avg_logprobs: List[float] = []
        self.no_speech_probs: List[float] = []
        # current temperature-ladder rung for the in-flight window; a
        # window that fails ``needs_fallback`` is re-decoded at the next
        # rung before the seek advances (transcribe.py ladder semantics)
        self.temp_idx = 0

    @property
    def done(self) -> bool:
        return self.seek >= self.mel.shape[-1]


class ServingEngine:
    """Continuously-batched transcription server over one DecodeTask.

    ``batch_size`` rows are compiled once (call ``warmup()`` ahead of
    traffic to AOT-compile); requests beyond the active batch wait in a
    FIFO queue and are admitted the moment a row frees up.
    """

    def __init__(
        self,
        params,
        dims: ModelDims,
        tokenizer: Tokenizer,
        options: TranscribeOptions = TranscribeOptions(),
        batch_size: int = 8,
        compute_dtype=jnp.float32,
        max_queue: int = 1024,
        encoder_fn=None,
    ):
        self.dims = dims
        self.tokenizer = tokenizer
        self.options = options
        self.batch_size = batch_size
        self.max_queue = max_queue
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
            from .decode.align import WordAligner

            self._aligner = WordAligner(
                params, dims, tokenizer, compute_dtype=compute_dtype,
                alignment_heads=options.alignment_heads,
            )

        if options.initial_prompt_tokens is not None:
            self._init_tokens = list(options.initial_prompt_tokens)
            self._condition = True
        elif options.initial_prompt_text is not None:
            self._init_tokens = list(tokenizer.encode(options.initial_prompt_text))
            self._condition = True
        else:
            self._init_tokens = []
            self._condition = options.condition_on_prev_text

        self._lock = threading.Lock()
        self._wakeup = threading.Condition(self._lock)
        self._queue: collections.deque = collections.deque()
        self._active: List[Optional[_Job]] = [None] * batch_size
        self._closed = False
        self._next_id = 0

        # counters (under _lock)
        self._n_submitted = 0
        self._n_completed = 0
        self._n_failed = 0
        self._n_window_batches = 0
        self._n_windows_real = 0
        self._n_windows_padded = 0
        self._audio_seconds_done = 0.0
        self._decode_seconds = 0.0
        self._latencies: collections.deque = collections.deque(maxlen=1024)
        self._started_at = time.monotonic()

        self._thread = threading.Thread(
            target=self._loop, name="whisper-serve", daemon=True
        )
        self._thread.start()

    # -- public API ----------------------------------------------------------

    def warmup(self) -> None:
        """AOT-compile the window executables for the serving batch shape
        before traffic arrives (DecodeTask.warmup)."""
        self.decode_task.warmup(
            batch_sizes=(self.batch_size,), with_prompts=self._condition
        )

    def submit(self, audio: np.ndarray) -> RequestHandle:
        """Enqueue one utterance ([n_samples] float32 @ 16 kHz).

        Mel extraction runs on the caller's thread (so N submitting clients
        parallelize their own frontends); the handle resolves when the
        utterance's last window is decoded.
        """
        audio = np.asarray(audio)
        handle = RequestHandle(
            request_id=self._alloc_id(),
            audio_seconds=float(audio.shape[-1]) / 16000.0,
        )
        try:
            mel = np.asarray(log_mel_file(audio, self.dims.n_mels))
        except Exception as e:  # bad audio: fail just this request
            handle._reject(e)
            with self._lock:
                self._n_submitted += 1
                self._n_failed += 1
            return handle
        job = _Job(handle, mel, self._init_tokens)
        with self._lock:
            if self._closed:
                raise RuntimeError("ServingEngine is closed")
            if len(self._queue) >= self.max_queue:
                raise RuntimeError(f"queue full ({self.max_queue})")
            self._queue.append(job)
            self._n_submitted += 1
            self._wakeup.notify()
        return handle

    def drain(self, timeout: Optional[float] = None) -> bool:
        """Block until every submitted request has resolved."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._lock:
            while self._queue or any(j is not None for j in self._active):
                remaining = None
                if deadline is not None:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        return False
                self._wakeup.wait(remaining)
        return True

    def close(self, timeout: float = 60.0) -> None:
        """Stop accepting requests, finish in-flight work, join the thread."""
        with self._lock:
            self._closed = True
            self._wakeup.notify_all()
        self._thread.join(timeout)

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            rows = self._n_windows_real + self._n_windows_padded
            return {
                "submitted": self._n_submitted,
                "completed": self._n_completed,
                "failed": self._n_failed,
                "queued": len(self._queue),
                "active": sum(j is not None for j in self._active),
                "window_batches": self._n_window_batches,
                "windows_decoded": self._n_windows_real,
                "batch_utilization": (
                    self._n_windows_real / rows if rows else 0.0
                ),
                "audio_seconds_done": self._audio_seconds_done,
                "decode_seconds": self._decode_seconds,
                "throughput_audio_s_per_s": (
                    self._audio_seconds_done / self._decode_seconds
                    if self._decode_seconds
                    else 0.0
                ),
                "latency_p50": lat[len(lat) // 2] if lat else None,
                "latency_p95": lat[int(len(lat) * 0.95)] if lat else None,
                "uptime": time.monotonic() - self._started_at,
            }

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- engine loop ----------------------------------------------------------

    def _alloc_id(self) -> int:
        with self._lock:
            self._next_id += 1
            return self._next_id

    def _admit_locked(self) -> None:
        """Fill free batch rows from the queue (continuous batching)."""
        for slot in range(self.batch_size):
            if self._active[slot] is None and self._queue:
                job = self._queue.popleft()
                job.handle.started_at = time.monotonic()
                self._active[slot] = job

    def _loop(self) -> None:
        while True:
            with self._lock:
                self._admit_locked()
                jobs = [(i, j) for i, j in enumerate(self._active) if j is not None]
                if not jobs:
                    if self._closed:
                        return
                    self._wakeup.wait(0.05)
                    continue
            self._decode_round(jobs)

    def _sampling_task(self) -> DecodeTask:
        """Shared best-of-N sampling task for every t>0 rung of the
        temperature ladder (one executable; the temperature is a traced
        scalar passed at run time — transcribe.py:_sampling_task)."""
        if self._sampling_task_cache is None:
            import dataclasses as _dc

            from .config import BeamSearchMode, GreedyMode

            base_mode = self.options.decode.mode
            n = (
                base_mode.beam_size
                if isinstance(base_mode, BeamSearchMode)
                else getattr(base_mode, "group_size", 1) or 1
            )
            opts = _dc.replace(
                self.options.decode, mode=GreedyMode(group_size=max(n, 1))
            )
            self._sampling_task_cache = DecodeTask(
                self._params,
                self.dims,
                self.tokenizer,
                opts,
                compute_dtype=self._compute_dtype,
                keep_audio_features=self.options.word_timestamps,
                encoder_fn=self._encoder_fn,
            )
        return self._sampling_task_cache

    def _decode_round(self, jobs) -> None:
        """One serving round: group active rows by their current
        temperature-ladder rung (rows at different rungs cannot share a
        call — the temperature is one traced scalar per batch), decode
        each group as a full-shape window batch, advance each row."""
        ladder = self.options.temperatures or (0.0,)
        groups: dict = {}  # temp key (None = primary task) -> [(slot, job)]
        for slot, job in jobs:
            t = ladder[min(job.temp_idx, len(ladder) - 1)]
            key = None if (self.options.temperatures is None or t == 0.0) else float(t)
            groups.setdefault(key, []).append((slot, job))

        results_by_slot: dict = {}
        n_calls = 0
        n_padded = 0
        t0 = time.monotonic()
        for key, group in groups.items():
            task = self.decode_task if key is None else self._sampling_task()
            windows, prompts = [], []
            for _, job in group:
                windows.append(
                    np.asarray(
                        pad_or_trim(jnp.asarray(job.mel[:, job.seek:]), N_FRAMES)
                    )
                )
                prompts.append(job.tokens if self._condition else None)
            n_real = len(windows)
            while len(windows) < self.batch_size:  # static shape: pad w/ repeats
                windows.append(windows[-1])
                prompts.append(prompts[-1])
            n_calls += 1
            n_padded += self.batch_size - n_real
            try:
                results = task.run_batch(
                    np.stack(windows), prompts, temperature=key
                )
            except Exception:
                # isolate: retry each active row alone (parallel/batch.py)
                results = []
                for w, p in zip(windows[:n_real], prompts[:n_real]):
                    try:
                        results.append(
                            task.run_batch(w[None], [p], temperature=key)[0]
                        )
                    except Exception as e:
                        results.append(e)
            for (slot, _), r in zip(group, results):
                results_by_slot[slot] = r
        dt = time.monotonic() - t0

        # advance rows OUTSIDE the lock (jobs are engine-thread-owned;
        # word alignment does device work and must not block submit())
        finished: List[_Job] = []
        failed: List[Tuple[int, _Job, Exception]] = []
        advanced: List[Tuple[int, _Job]] = []
        for slot, job in jobs:
            r = results_by_slot[slot]
            if isinstance(r, Exception):
                failed.append((slot, job, r))
                continue
            self._advance(job, r)
            advanced.append((slot, job))

        with self._lock:
            self._n_window_batches += n_calls
            self._n_windows_real += len(jobs)
            self._n_windows_padded += n_padded
            self._decode_seconds += dt
            for slot, job, err in failed:
                self._active[slot] = None
                self._n_failed += 1
                job.handle._reject(err)
            for slot, job in advanced:
                if job.done:
                    self._active[slot] = None
                    finished.append(job)
            self._wakeup.notify_all()

        for job in finished:
            self._finish(job)

    def _advance(self, job: _Job, r) -> None:
        opts = self.options
        ladder = opts.temperatures
        if (
            ladder is not None
            and job.temp_idx < len(ladder) - 1
            and needs_fallback(opts, r.text, r.avg_logprob, r.no_speech_prob)
        ):
            # retry the SAME window at the next rung next round; the seek
            # does not advance and nothing is recorded for this attempt
            job.temp_idx += 1
            return
        job.temp_idx = 0

        input_stride = N_FRAMES // self.dims.n_audio_ctx
        job.avg_logprobs.append(r.avg_logprob)
        job.no_speech_probs.append(r.no_speech_prob)
        if should_skip_no_speech(self.options, r.no_speech_prob, r.avg_logprob):
            job.seek += N_FRAMES
        else:
            n_segs_before = len(job.segments)
            n_tokens_before = len(job.tokens)
            seek_before = job.seek
            job.seek = process_window_result(
                job.tokens,
                job.segments,
                np.asarray(r.tokens, np.int64),
                r.text,
                job.seek,
                self.tokenizer.token_id_ts_begin,
                input_stride,
                input_stride * QUANTUM,
                self.tokenizer.decode,
            )
            if (
                self._aligner is not None
                and getattr(r, "audio_features", None) is not None
            ):
                content = max(
                    1,
                    min(job.mel.shape[-1] - seek_before, N_FRAMES)
                    // input_stride,
                )
                words = self._aligner.align_window(
                    job.tokens[n_tokens_before:],
                    r.audio_features,
                    seek_before * QUANTUM,
                    content,
                )
                assign_words(job.segments[n_segs_before:], words)
        job.handle._publish_segments(job.segments)

    def _finish(self, job: _Job) -> None:
        arr = np.asarray(job.tokens, np.int64)
        out = TranscribeOutput(
            tokens=arr,
            text=self.tokenizer.decode(arr),
            segments=job.segments,
            avg_logprobs=job.avg_logprobs,
            no_speech_probs=job.no_speech_probs,
        )
        with self._lock:
            self._n_completed += 1
            self._audio_seconds_done += job.handle.audio_seconds
        job.handle._resolve(out)
        with self._lock:
            if job.handle.latency is not None:
                self._latencies.append(job.handle.latency)
