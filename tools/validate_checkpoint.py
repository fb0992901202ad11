"""One-command checkpoint-drop validation (VERDICT r2 item #6).

The moment real weights become reachable, every accuracy claim that has
been blocked on them should fall in minutes, not a round:

  python tools/validate_checkpoint.py --checkpoint base.en.pt \
      --librispeech /data/LibriSpeech/test-clean [--limit 100] \
      [--batch 8] [--dtype bfloat16] [--wer-gate 0.06] [--quant-gate 0.005]

Runs, against any OpenAI `.pt` or HF checkpoint (auto-detected):

  1. LibriSpeech WER at the compute dtype (the BASELINE headline);
  2. int8 weight-only WER, int8-KV WER, and int8x8-matmul WER
     (WHISPER_INT8_MATMUL=1, dynamic activation quantization) — the ΔWER
     numbers are THE gate for defaulting quantization on (README quotes
     int8 throughput with accuracy unvalidated until this passes);
  3. word-timestamp alignment sanity on a real utterance (words present,
     non-empty, monotone, inside the audio span);
  4. language-ID smoke (multilingual checkpoints only): top language +
     probability on the first utterance.

Emits ONE JSON line on stdout:
  {"ok": bool, "wer": ..., "wer_int8": ..., "delta_wer_int8": ...,
   "wer_int8_kv": ..., "delta_wer_int8_kv": ..., "int8_ok": bool,
   "int8_kv_ok": bool, "word_timing": {...}, "language_id": {...}, ...}

Smoke-tested end to end with a seeded synthetic checkpoint + synthetic
LibriSpeech layout in tests/test_validate_checkpoint.py, so the command is
proven runnable before any real checkpoint exists.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _run_wer(params, dims, tokenizer, options, pairs, batch, dtype,
             quantize_kv=False, int8_matmul=False):
    import os

    from whisper_rs_tpu.audio.io import load_audio
    from whisper_rs_tpu.parallel.batch import BatchTranscriber
    from whisper_rs_tpu.utils import wer

    if int8_matmul:
        # s8xs8 MXU matmuls (dynamic activation quantization): read at
        # trace time by models.whisper.linear — the fresh BatchTranscriber
        # below traces under it
        os.environ["WHISPER_INT8_MATMUL"] = "1"
    try:
        return _run_wer_inner(
            params, dims, tokenizer, options, pairs, batch, dtype,
            quantize_kv,
        )
    finally:
        if int8_matmul:
            os.environ.pop("WHISPER_INT8_MATMUL", None)


def _run_wer_inner(params, dims, tokenizer, options, pairs, batch, dtype,
                   quantize_kv=False):
    import time

    from whisper_rs_tpu.audio.io import load_audio
    from whisper_rs_tpu.parallel.batch import BatchTranscriber
    from whisper_rs_tpu.utils import wer

    transcriber = BatchTranscriber(
        params, dims, tokenizer, options, batch_size=batch,
        compute_dtype=dtype,
    )
    if quantize_kv:
        transcriber.decode_task.quantize_kv = True

    refs, hyps = [], []
    total_audio_s = 0.0
    t0 = time.perf_counter()
    for i in range(0, len(pairs), batch):
        chunk = pairs[i : i + batch]
        audios = [load_audio(p) for p, _ in chunk]
        total_audio_s += sum(len(a) / 16000.0 for a in audios)
        outs = transcriber.run(audios, raise_on_error=False)
        for (_, ref), out in zip(chunk, outs):
            refs.append(ref)
            hyps.append(out.text if out is not None else "")
    dt = time.perf_counter() - t0
    return float(wer(refs, hyps)), total_audio_s / dt


def _word_timing_sanity(params, dims, tokenizer, options, audio_path, dtype):
    """Transcribe one utterance with word timestamps and check structural
    invariants (alignment-head sanity: real checkpoints whose alignment
    heads are wrong produce empty/garbage/non-monotone words)."""
    import dataclasses

    import numpy as np

    from whisper_rs_tpu.audio.io import load_audio
    from whisper_rs_tpu.transcribe import TranscribeTask

    audio = load_audio(audio_path)
    opts = dataclasses.replace(options, word_timestamps=True)
    out = TranscribeTask(params, dims, tokenizer, opts, compute_dtype=dtype).run(
        np.asarray(audio)
    )
    words = [w for s in out.segments for w in (s.words or [])]
    audio_s = len(audio) / 16000.0
    checks = {
        "n_segments": len(out.segments),
        "n_words": len(words),
        "has_words": bool(words),
        "words_nonempty": all(w.word.strip() for w in words),
        "monotone": all(
            a.start <= b.start + 1e-9 for a, b in zip(words, words[1:])
        ),
        "spans_valid": all(0.0 <= w.start <= w.end for w in words),
        "inside_audio": all(w.start <= audio_s + 30.0 for w in words),
    }
    checks["ok"] = bool(
        checks["has_words"]
        and checks["words_nonempty"]
        and checks["monotone"]
        and checks["spans_valid"]
        and checks["inside_audio"]
    )
    return checks


def _language_id_smoke(params, dims, tokenizer, audio_path, dtype):
    import jax.numpy as jnp

    from whisper_rs_tpu.audio import N_FRAMES, log_mel_file, pad_or_trim
    from whisper_rs_tpu.audio.io import load_audio
    from whisper_rs_tpu.decode.language import detect_language

    if not tokenizer.is_multilingual:
        return {"skipped": "english-only checkpoint"}
    audio = load_audio(audio_path)
    mel = pad_or_trim(jnp.asarray(log_mel_file(audio, dims.n_mels)), N_FRAMES)
    probs = detect_language(params, mel.astype(dtype), dims, tokenizer)[0]
    top = max(probs, key=probs.get)
    return {
        "top": top,
        "p": round(float(probs[top]), 4),
        "ok": bool(probs[top] > 0.0),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="OpenAI .pt or HF checkpoint (auto-detected)")
    ap.add_argument("--librispeech", required=True,
                    help="extracted LibriSpeech split dir")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--sample-len", type=int, default=None,
                    help="max tokens per window (smoke-test hook)")
    ap.add_argument("--language", default="en")
    ap.add_argument("--wer-gate", type=float, default=0.06,
                    help="absolute WER above which the verdict fails")
    ap.add_argument("--quant-gate", type=float, default=0.005,
                    help="max ΔWER for int8 / int8-KV to pass (the gate "
                    "for defaulting quantization on)")
    ap.add_argument("--skip-quant", action="store_true")
    # OpenAI robustness recipe — ON by default so the headline WER is
    # comparable with OpenAI's published numbers
    ap.add_argument(
        "--no-recipe", action="store_true",
        help="disable the OpenAI recipe (temperature ladder "
        "(0,.2,.4,.6,.8,1.0) + no_speech_threshold=0.6)",
    )
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from whisper_rs_tpu import (
        BeamSearchMode,
        DecodeOptions,
        GreedyMode,
        Task,
        Tokenizer,
        TranscribeOptions,
    )
    from whisper_rs_tpu.models import load_checkpoint
    from whisper_rs_tpu.utils import iter_librispeech

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, dims = load_checkpoint(args.checkpoint, dtype=dtype)
    tokenizer = Tokenizer.for_dims(dims, Task.TRANSCRIBE, language=args.language)

    mode = GreedyMode() if args.greedy else BeamSearchMode(beam_size=args.beam)
    recipe = {}
    if not args.no_recipe:
        recipe = dict(
            temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
            no_speech_threshold=0.6,
        )
    options = TranscribeOptions(
        decode=DecodeOptions(mode=mode, sample_len=args.sample_len), **recipe
    )

    pairs = list(iter_librispeech(args.librispeech))
    if args.limit:
        pairs = pairs[: args.limit]
    if not pairs:
        print("no utterances found", file=sys.stderr)
        return 1

    verdict = {
        "checkpoint": args.checkpoint,
        "model_dims": {
            "n_audio_layer": dims.n_audio_layer,
            "n_text_layer": dims.n_text_layer,
            "n_audio_state": dims.n_audio_state,
            "n_vocab": dims.n_vocab,
        },
        "n_utterances": len(pairs),
        "decode": "greedy" if args.greedy else f"beam{args.beam}",
        "dtype": args.dtype,
        "recipe": "openai" if not args.no_recipe else "single-pass",
    }

    def progress(msg):
        print(msg, file=sys.stderr)

    progress(f"[1/4] WER ({args.dtype}) over {len(pairs)} utterances ...")
    wer0, thr = _run_wer(params, dims, tokenizer, options, pairs, args.batch, dtype)
    verdict["wer"] = round(wer0, 4)
    verdict["audio_s_per_s"] = round(thr, 1)
    verdict["wer_ok"] = wer0 <= args.wer_gate

    if args.skip_quant:
        verdict["int8_ok"] = verdict["int8_kv_ok"] = None
        verdict["int8_matmul_ok"] = None
    else:
        from whisper_rs_tpu.models.quantize import quantize_params

        qparams = quantize_params(params)
        progress("[2/4] WER int8 weights ...")
        wer_q, _ = _run_wer(
            qparams, dims, tokenizer, options, pairs, args.batch, dtype
        )
        verdict["wer_int8"] = round(wer_q, 4)
        verdict["delta_wer_int8"] = round(wer_q - wer0, 4)
        verdict["int8_ok"] = (wer_q - wer0) <= args.quant_gate

        progress("[2/4] WER int8 weights + int8 KV ...")
        wer_qkv, _ = _run_wer(
            qparams, dims, tokenizer, options, pairs, args.batch, dtype,
            quantize_kv=True,
        )
        verdict["wer_int8_kv"] = round(wer_qkv, 4)
        verdict["delta_wer_int8_kv"] = round(wer_qkv - wer0, 4)
        verdict["int8_kv_ok"] = (wer_qkv - wer0) <= args.quant_gate

        progress("[2/4] WER int8x8 matmuls (WHISPER_INT8_MATMUL=1) ...")
        wer_mm, _ = _run_wer(
            qparams, dims, tokenizer, options, pairs, args.batch, dtype,
            int8_matmul=True,
        )
        verdict["wer_int8_matmul"] = round(wer_mm, 4)
        verdict["delta_wer_int8_matmul"] = round(wer_mm - wer0, 4)
        verdict["int8_matmul_ok"] = (wer_mm - wer0) <= args.quant_gate

    progress("[3/4] word-timestamp alignment sanity ...")
    verdict["word_timing"] = _word_timing_sanity(
        params, dims, tokenizer, options, pairs[0][0], dtype
    )

    progress("[4/4] language-ID smoke ...")
    verdict["language_id"] = _language_id_smoke(
        params, dims, tokenizer, pairs[0][0], dtype
    )

    gates = [verdict["wer_ok"], verdict["word_timing"]["ok"]]
    if verdict.get("int8_ok") is not None:
        gates += [
            verdict["int8_ok"],
            verdict["int8_kv_ok"],
            verdict["int8_matmul_ok"],
        ]
    if "ok" in verdict["language_id"]:
        gates.append(verdict["language_id"]["ok"])
    verdict["ok"] = all(gates)

    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 3


if __name__ == "__main__":
    sys.exit(main())
