"""DecodeTask: single-30s-window decode orchestration.

Reference equivalent: ``DecodeTask`` (decode/mod.rs:121-419).  Differences by
design:

  * the whole window — encoder, prefill, decode loop, filters, extraction,
    ranking — is ONE jitted function; the host only builds the prompt and
    detokenizes the result;
  * prompts are padded into a small set of static prefill buckets
    (prompt.py) so prompt-conditioned windows don't recompile
    (``sample_begin`` is a traced scalar);
  * batching over utterances is first-class (the reference unsqueezes a
    single mel, decode/mod.rs:288).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeOptions, GreedyMode, ModelDims
from ..tokenize import Tokenizer
from .filters import FilterConfig
from .loop import decode_beam, decode_greedy
from .prompt import build_batch_prompts
from .ranker import rank_max_likelihood


@dataclasses.dataclass
class DecodeOutput:
    """Per-audio result (reference DecodeOutput, decode/mod.rs:109-119)."""

    tokens: np.ndarray  # sampled tokens, [sample_begin..EOT) slice
    text: str
    avg_logprob: float
    no_speech_prob: float
    audio_features: Optional[np.ndarray] = None


class DecodeTask:
    def __init__(
        self,
        params,
        dims: ModelDims,
        tokenizer: Tokenizer,
        options: DecodeOptions = DecodeOptions(),
        compute_dtype=jnp.float32,
        keep_audio_features: bool = False,
        quantize_kv: bool = False,
        encoder_fn=None,
    ):
        self.params = params
        self.dims = dims
        self.tokenizer = tokenizer
        self.options = options
        self.compute_dtype = compute_dtype
        self.keep_audio_features = keep_audio_features
        self.quantize_kv = quantize_kv
        # optional (params, mel, dims) -> xa override: routes the window
        # program's encoder through e.g. the PP pipeline
        # (parallel.pipeline.pp_encoder_fn)
        self.encoder_fn = encoder_fn

        # filter assembly (decode/mod.rs:156-190)
        suppress: tuple = tuple(options.suppress_tokens or ())
        if options.suppress_non_speech:
            suppress = tuple(sorted(set(suppress) | set(tokenizer.non_speech_tokens())))

        max_initial_ts_index = None
        if options.timestamps and options.max_initial_timestamp is not None:
            # precision = 30s / 1500 = 0.02s (decode/mod.rs:176-181)
            precision = 30.0 / dims.n_audio_ctx
            max_initial_ts_index = int(round(options.max_initial_timestamp / precision))

        self.filter_cfg = FilterConfig(
            n_vocab=dims.n_vocab,
            token_id_eot=tokenizer.token_id_eot,
            token_id_space=tokenizer.token_id_space,
            token_id_ts_begin=tokenizer.token_id_ts_begin,
            token_id_no_timestamps=tokenizer.token_id_no_timestamps,
            suppress_blank=options.suppress_blank,
            timestamps=options.timestamps,
            suppress_ids=suppress,
            max_initial_timestamp_index=max_initial_ts_index,
        )
        self.sample_len = (
            options.sample_len
            if options.sample_len is not None
            else dims.sample_len_default
        )
        self._prompt_tokens: Optional[Sequence[int]] = None
        self._compiled = {}

    # -- prompt handling (decode/mod.rs:206-218) ----------------------------

    def set_prompt(self, prompt: Optional[Sequence[int]]) -> None:
        if prompt is not None and len(prompt) == 0:
            prompt = None
        self._prompt_tokens = list(prompt) if prompt is not None else None

    # -- compiled window function ------------------------------------------

    def _window_fn(
        self,
        n_audio: int,
        prefill_width: int,
        with_key_start: bool = False,
        with_temperature: bool = False,
    ):
        key = (n_audio, prefill_width, with_key_start, with_temperature)
        if key in self._compiled:
            return self._compiled[key]

        mode = self.options.mode
        dims, cfg = self.dims, self.filter_cfg
        sample_len = self.sample_len
        no_speech_id = self.tokenizer.token_id_no_speech
        eot = self.tokenizer.token_id_eot
        length_penalty = self.options.length_penalty
        compute_dtype = self.compute_dtype
        quantize_kv = self.quantize_kv
        encoder_fn = self.encoder_fn

        decode_fn = decode_greedy if isinstance(mode, GreedyMode) else decode_beam

        def run(params, mel, initial_tokens, sample_begin, sot_idx,
                key_start=None, temperature=None):
            result = decode_fn(
                params,
                mel,
                initial_tokens,
                sample_begin,
                sot_idx,
                dims,
                cfg,
                mode,
                sample_len,
                no_speech_id,
                compute_dtype,
                key_start=key_start,
                quantize_kv=quantize_kv,
                temperature=temperature,
                encoder_fn=encoder_fn,
            )
            selected, avg_logprob, lengths = rank_max_likelihood(
                result, sample_begin, eot, length_penalty
            )
            return result, selected, avg_logprob, lengths

        fn = jax.jit(run)
        self._compiled[key] = fn
        return fn

    def warmup(self, batch_sizes=(1,), with_prompts: bool = True) -> None:
        """AOT-precompile the window executables for the given batch sizes
        (serving: avoids first-request compile latency).  Compiles the
        no-prompt bucket and, with ``with_prompts``, the largest prompt
        bucket (the two shapes long-audio transcription alternates
        between)."""
        from .prompt import PREFILL_BUCKETS

        buckets = [PREFILL_BUCKETS[0]]
        if with_prompts:
            buckets.append(PREFILL_BUCKETS[-1])
        s32 = jax.ShapeDtypeStruct((), jnp.int32)
        for n_audio in batch_sizes:
            for b in buckets:
                fn = self._window_fn(n_audio, b, with_key_start=True)
                fn.lower(
                    self.params,
                    jax.ShapeDtypeStruct(
                        (n_audio, self.dims.n_mels, 3000), self.compute_dtype
                    ),
                    jax.ShapeDtypeStruct((n_audio, b), jnp.int32),
                    s32,
                    s32,
                    jax.ShapeDtypeStruct((n_audio,), jnp.int32),
                ).compile()

    # -- run ---------------------------------------------------------------

    def run(self, mel, temperature: Optional[float] = None) -> List[DecodeOutput]:
        """mel: [n_mels, 3000] or [n_audio, n_mels, 3000] -> one DecodeOutput
        per audio (reference run/run_inner, decode/mod.rs:284-418).  The
        current prompt (set_prompt) applies to every row; delegates to the
        unified end-aligned batch path."""
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        return self.run_batch(
            mel, [self._prompt_tokens] * mel.shape[0], temperature=temperature
        )

    def run_batch(
        self, mel, prompts, temperature: Optional[float] = None
    ) -> List[DecodeOutput]:
        """Batched decode with PER-UTTERANCE prompts.

        mel: [n_audio, n_mels, 3000]; prompts: list of per-utterance token
        sequences (None/empty for unprompted rows).  Prompts are end-aligned
        into one static prefill bucket with per-row attention masking
        (prompt.build_batch_prompts), so mixed prompt lengths batch into a
        single jitted call — the backbone of the data-parallel transcribe
        driver.

        ``temperature`` overrides GreedyMode's static temperature as a
        TRACED scalar: all rungs of a fallback ladder then share one
        compiled executable (0.0 still means pure argmax, selected
        on-device).
        """
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        n_audio = mel.shape[0]
        assert len(prompts) == n_audio

        tokens, key_start, sample_begin, sot_idx = build_batch_prompts(
            prompts,
            self.tokenizer.sequence_sot(),
            self.tokenizer.token_id_sot,
            self.tokenizer.token_id_startofprev,
            self.dims.n_text_ctx,
        )
        with_temp = temperature is not None
        if with_temp:
            assert isinstance(self.options.mode, GreedyMode), (
                "temperature override only applies to greedy/sampling mode"
            )
        fn = self._window_fn(
            n_audio, tokens.shape[1], with_key_start=True,
            with_temperature=with_temp,
        )
        args = [
            self.params,
            mel,
            jnp.asarray(tokens),
            jnp.int32(sample_begin),
            jnp.int32(sot_idx),
            jnp.asarray(key_start),
        ]
        if with_temp:
            args.append(jnp.float32(temperature))
        result, selected, avg_logprob, lengths = fn(*args)
        return self._assemble(result, selected, avg_logprob, lengths,
                              sample_begin, n_audio)

    def _assemble(self, result, selected, avg_logprob, lengths, sample_begin,
                  n_audio) -> List[DecodeOutput]:
        candidates = np.asarray(result.candidates)
        selected = np.asarray(selected)
        avg_logprob = np.asarray(avg_logprob)
        lengths = np.asarray(lengths)
        no_speech = np.asarray(result.no_speech_probs)

        outputs = []
        for i in range(n_audio):
            sel = int(selected[i])
            length = int(lengths[i, sel])
            toks = candidates[i, sel, sample_begin : sample_begin + length]
            outputs.append(
                DecodeOutput(
                    tokens=toks,
                    text=self.tokenizer.decode(toks),
                    avg_logprob=float(avg_logprob[i]),
                    no_speech_prob=float(no_speech[i]),
                    audio_features=(
                        np.asarray(result.audio_features[i])
                        if self.keep_audio_features
                        else None
                    ),
                )
            )
        return outputs
