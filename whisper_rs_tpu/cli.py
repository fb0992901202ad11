"""Command-line transcription entry point.

Reference equivalent: examples/transcribe.rs (the example binary doubling as
the app layer).  Defaults mirror it: beam=5, patience=1.0, timestamps on,
suppress blank+non-speech, max_initial_timestamp=1.0s.

Usage:
  python -m whisper_rs_tpu.cli AUDIO.wav --checkpoint base.en.pt \
      [--model-name base.en] [--greedy] [--beam 5] [--json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="whisper_rs_tpu", description=__doc__)
    p.add_argument("audio", nargs="+", help="audio file(s): wav (mp3 via native runtime)")
    p.add_argument("--checkpoint", required=True, help="OpenAI whisper .pt file or HF transformers checkpoint dir")
    p.add_argument("--tokenizer", default=None, help="tokenizer json (gpt2)")
    p.add_argument(
        "--language", default="en",
        help="ISO code, or 'auto' to detect per file (multilingual models)",
    )
    p.add_argument("--task", default="transcribe", choices=["transcribe", "translate"])
    p.add_argument("--greedy", action="store_true", help="greedy decode instead of beam")
    p.add_argument("--sample-len", type=int, default=None, help="max tokens per window")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--patience", type=float, default=1.0)
    p.add_argument("--length-penalty", type=float, default=None)
    p.add_argument("--max-initial-timestamp", type=float, default=1.0)
    p.add_argument("--no-timestamps", action="store_true")
    p.add_argument(
        "--word-timestamps", action="store_true",
        help="per-word timings via cross-attention DTW alignment (one "
        "extra decoder pass per 30s window)",
    )
    p.add_argument("--no-condition-on-prev-text", action="store_true")
    p.add_argument("--initial-prompt", default=None)
    p.add_argument(
        "--temperatures", default=None,
        help="comma-separated temperature fallback ladder (OpenAI recipe: "
        "0,0.2,0.4,0.6,0.8,1.0); a window failing the quality checks "
        "(compression ratio / avg logprob) is retried at the next rung. "
        "Default: single pass at t=0 (reference behavior)",
    )
    p.add_argument(
        "--no-speech-threshold", type=float, default=None,
        help="skip a window as silence when no_speech_prob exceeds this "
        "AND avg_logprob < --logprob-threshold (OpenAI recipe: 0.6). "
        "Default: never skip (reference behavior)",
    )
    p.add_argument(
        "--logprob-threshold", type=float, default=-1.0,
        help="avg-logprob quality floor used by the temperature ladder "
        "and the no-speech skip (OpenAI recipe: -1.0)",
    )
    p.add_argument(
        "--compression-ratio-threshold", type=float, default=2.4,
        help="zlib compression-ratio ceiling for the temperature ladder "
        "(degenerate-repetition detector; OpenAI recipe: 2.4)",
    )
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument(
        "--quant", default=None, choices=["int8"],
        help="weight-only quantization (halves weight HBM traffic)",
    )
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel chips")
    p.add_argument(
        "--pp", type=int, default=1,
        help="pipeline-parallel stages over the encoder block stack "
        "(composes with --tp: mesh is stage x data x model)",
    )
    p.add_argument(
        "--batch", type=int, default=1,
        help="transcribe files through the data-parallel batch driver, N "
        "windows per device step (throughput mode for many files; "
        "requires an explicit --language)",
    )
    p.add_argument("--json", action="store_true", help="emit JSON output")
    p.add_argument(
        "--format", default=None, choices=["srt", "vtt", "txt"],
        help="subtitle/transcript output format (overrides default listing)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from .audio.io import load_audio
    from .config import BeamSearchMode, DecodeOptions, GreedyMode, TranscribeOptions
    from .models import load_checkpoint
    from .tokenize import Task, Tokenizer
    from .transcribe import TranscribeTask
    from .utils.debug import log, step_timer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    with step_timer("load checkpoint"):
        params, dims = load_checkpoint(args.checkpoint, dtype=dtype)

    if args.quant == "int8":
        from .models.quantize import quantize_params

        params = quantize_params(params)

    encoder_fn = None
    if args.tp > 1 or args.pp > 1:
        from .parallel import make_mesh, shard_params

        mesh = make_mesh(n_model=args.tp, n_stage=args.pp)
        params = shard_params(mesh, params)
        log.info("sharded params over mesh %s", mesh)
        if args.pp > 1:
            from .parallel.pipeline import pp_encoder_fn

            encoder_fn = pp_encoder_fn(mesh)

    detect = args.language == "auto"
    tokenizer = Tokenizer.for_dims(
        dims,
        Task.TRANSLATE if args.task == "translate" else Task.TRANSCRIBE,
        tokenizer_json=args.tokenizer,
        language="en" if detect else args.language,
    )
    if detect and not tokenizer.is_multilingual:
        print(
            "--language auto requires a multilingual checkpoint",
            file=sys.stderr,
        )
        return 2

    mode = (
        GreedyMode()
        if args.greedy
        else BeamSearchMode(beam_size=args.beam, patience=args.patience)
    )
    temperatures = None
    if args.temperatures:
        temperatures = tuple(
            float(t) for t in args.temperatures.split(",") if t.strip()
        )
        if temperatures == (0.0,):
            # single t=0 pass == reference behavior; None keeps the
            # primary (beam-capable) task as the only executable
            temperatures = None
    options = TranscribeOptions(
        decode=DecodeOptions(
            mode=mode,
            sample_len=args.sample_len,
            length_penalty=args.length_penalty,
            max_initial_timestamp=args.max_initial_timestamp,
            timestamps=not args.no_timestamps,
        ),
        initial_prompt_text=args.initial_prompt,
        condition_on_prev_text=not args.no_condition_on_prev_text,
        word_timestamps=args.word_timestamps,
        temperatures=temperatures,
        no_speech_threshold=args.no_speech_threshold,
        logprob_threshold=args.logprob_threshold,
        compression_ratio_threshold=args.compression_ratio_threshold,
    )

    def emit(path, out, detected):
        if args.format:
            from .utils.formats import to_srt, to_text, to_vtt

            fmt = {"srt": to_srt, "vtt": to_vtt, "txt": to_text}[args.format]
            print(fmt(out.segments))
        elif args.json:
            print(
                json.dumps(
                    {
                        "file": path,
                        "language": detected or args.language,
                        "text": out.text,
                        "segments": [
                            {
                                "start": s.start_time,
                                "end": s.end_time,
                                "text": s.text,
                                **(
                                    {
                                        "words": [
                                            {
                                                "word": w.word,
                                                "start": w.start,
                                                "end": w.end,
                                            }
                                            for w in s.words
                                        ]
                                    }
                                    if s.words is not None
                                    else {}
                                ),
                            }
                            for s in out.segments
                        ],
                    }
                )
            )
        else:
            print(f"== {path}")
            for s in out.segments:
                print(f"[{s.start_time:7.2f} -> {s.end_time:7.2f}] {s.text}")

    if args.batch > 1:
        # throughput mode: N windows stream through the decoder in
        # lockstep (parallel/batch.py), utterances retiring independently
        # with per-utterance error isolation
        if detect:
            print(
                "--batch requires an explicit --language (one decode "
                "config is shared by the whole batch)",
                file=sys.stderr,
            )
            return 2
        from .parallel.batch import BatchTranscriber

        rc = 0
        paths, audios = [], []
        for path in args.audio:
            try:
                audios.append(load_audio(path))
                paths.append(path)
            except Exception as e:
                print(f"{path}: failed to load: {e}", file=sys.stderr)
                rc = 1
        if not paths:
            return rc
        bt = BatchTranscriber(
            params, dims, tokenizer, options,
            batch_size=args.batch, compute_dtype=dtype,
            encoder_fn=encoder_fn,
        )
        secs = sum(len(a) for a in audios) / 16000.0
        with step_timer(f"batch transcribe {len(paths)} files", audio_seconds=secs):
            outs = bt.run(audios, raise_on_error=False)
        for path, out in zip(paths, outs):
            if out is None:
                print(f"{path}: transcription failed", file=sys.stderr)
                rc = 1
            else:
                emit(path, out, None)
        return rc

    task = TranscribeTask(
        params, dims, tokenizer, options, compute_dtype=dtype,
        encoder_fn=encoder_fn,
    )

    rc = 0
    for path in args.audio:
        try:
            audio = load_audio(path)
        except Exception as e:
            print(f"{path}: failed to load: {e}", file=sys.stderr)
            rc = 1
            continue
        detected = None
        if detect:
            # per-file language ID from the first 30s window (OpenAI
            # semantics; the reference declares Task::LanguageId but never
            # implements it, tokenize.rs:135,143-147).  Same-length sot
            # sequences mean no recompile when the language changes.
            from .audio import N_FRAMES, log_mel_file, pad_or_trim
            from .decode.language import detect_language

            mel = pad_or_trim(
                jnp.asarray(log_mel_file(audio, dims.n_mels)),
                N_FRAMES,
            )
            probs = detect_language(params, mel.astype(dtype), dims, tokenizer)[0]
            detected = max(probs, key=probs.get)
            tokenizer.language = detected
            log.info(
                "detected language %s (p=%.2f) for %s",
                detected, probs[detected], path,
            )
        secs = len(audio) / 16000.0
        with step_timer(f"transcribe {path}", audio_seconds=secs):
            out = task.run(audio)
        emit(path, out, detected)
    return rc


def entrypoint() -> None:
    """console_scripts hook (pyproject [project.scripts])."""
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()
