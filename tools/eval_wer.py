"""LibriSpeech WER evaluation (BASELINE's quality headline).

  python tools/eval_wer.py --checkpoint base.en.pt \
      --librispeech /data/LibriSpeech/test-clean [--limit 100] \
      [--greedy | --beam 5] [--batch 8] [--quant int8|kv|int8kv]

Requires an OpenAI whisper checkpoint and an extracted LibriSpeech split
(neither ships in this zero-egress image — the harness is ready for when
they are reachable).  Uses the batched DP transcriber; prints corpus WER
and audio-seconds/s.
"""

import argparse
import sys
import time

import jax.numpy as jnp


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--librispeech", required=True)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quant", default=None, choices=["int8", "kv", "int8kv"])
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    # OpenAI robustness recipe — ON by default so the headline WER is
    # comparable with OpenAI's published numbers (temperature fallback
    # ladder + no-speech skip); --no-recipe reverts to the reference's
    # single-pass behavior
    ap.add_argument(
        "--no-recipe", action="store_true",
        help="disable the OpenAI recipe (temperature ladder "
        "(0,.2,.4,.6,.8,1.0) + no_speech_threshold=0.6)",
    )
    args = ap.parse_args(argv)

    from whisper_rs_tpu import (
        BeamSearchMode,
        DecodeOptions,
        GreedyMode,
        Task,
        Tokenizer,
        TranscribeOptions,
        load_openai_checkpoint,
    )
    from whisper_rs_tpu.audio.io import load_audio
    from whisper_rs_tpu.parallel.batch import BatchTranscriber
    from whisper_rs_tpu.utils import iter_librispeech, wer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, dims = load_openai_checkpoint(args.checkpoint, dtype=dtype)
    if args.quant and "int8" in args.quant:
        from whisper_rs_tpu.models.quantize import quantize_params

        params = quantize_params(params)

    tokenizer = Tokenizer(Task.TRANSCRIBE)
    mode = GreedyMode() if args.greedy else BeamSearchMode(beam_size=args.beam)
    recipe = {}
    if not args.no_recipe:
        recipe = dict(
            temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
            no_speech_threshold=0.6,
        )
    options = TranscribeOptions(decode=DecodeOptions(mode=mode), **recipe)

    transcriber = BatchTranscriber(
        params, dims, tokenizer, options, batch_size=args.batch,
        compute_dtype=dtype,
    )
    # KV quantization is a DecodeTask flag
    if args.quant and "kv" in args.quant:
        transcriber.decode_task.quantize_kv = True

    pairs = list(iter_librispeech(args.librispeech))
    if args.limit:
        pairs = pairs[: args.limit]
    if not pairs:
        print("no utterances found", file=sys.stderr)
        return 1

    refs, hyps = [], []
    total_audio_s = 0.0
    t0 = time.perf_counter()
    for i in range(0, len(pairs), args.batch):
        chunk = pairs[i : i + args.batch]
        audios = [load_audio(p) for p, _ in chunk]
        total_audio_s += sum(len(a) / 16000.0 for a in audios)
        outs = transcriber.run(audios, raise_on_error=False)
        for (_, ref), out in zip(chunk, outs):
            refs.append(ref)
            hyps.append(out.text if out is not None else "")
        done = min(i + args.batch, len(pairs))
        print(
            f"[{done}/{len(pairs)}] running WER: {wer(refs, hyps):.4f}",
            file=sys.stderr,
        )
    dt = time.perf_counter() - t0

    print(
        f"WER: {wer(refs, hyps):.4f} over {len(refs)} utterances "
        f"({total_audio_s:.0f} audio-s in {dt:.1f}s = "
        f"{total_audio_s/dt:.1f} audio-s/s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
