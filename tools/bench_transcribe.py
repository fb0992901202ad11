"""End-to-end batched transcription throughput (config #2/#4 realism).

Unlike bench.py (single jitted window), this drives the full
BatchTranscriber: per-utterance seek loops in lockstep, prompt-conditioned
windows (per-row prompts + key_start masking), host-side segmentation —
i.e. what a serving deployment actually runs.

  python tools/bench_transcribe.py [model] [n_utts] [utt_seconds]
  env: BT_QUANT=int8|kv|int8kv  BT_MODE=greedy|beam  BT_SAMPLE_LEN=N
"""

import os
import sys
import time

import jax.numpy as jnp
import numpy as np


class _BenchTok:
    """Vocab-true fake tokenizer (no gpt2.json dependency on the TPU box)."""

    token_id_sot = 50257
    token_id_eot = 50256
    token_id_no_speech = 50361
    token_id_startofprev = 50360
    token_id_no_timestamps = 50362
    token_id_ts_begin = 50363
    token_id_space = 220

    def decode(self, toks):
        return " ".join(str(int(t)) for t in toks if int(t) < 50256)

    def encode(self, text):
        return [min(50000, len(text))]

    def sequence_sot(self):
        return [self.token_id_sot]

    def non_speech_tokens(self):
        return (1, 2, 7)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    n_utts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    utt_s = int(sys.argv[3]) if len(sys.argv) > 3 else 65

    from whisper_rs_tpu.config import (
        BeamSearchMode,
        DecodeOptions,
        GreedyMode,
        TranscribeOptions,
        dims_for,
    )
    from whisper_rs_tpu.models import init_params
    from whisper_rs_tpu.parallel.batch import BatchTranscriber

    dims = dims_for(model)
    dtype = jnp.bfloat16
    params = init_params(__import__("jax").random.PRNGKey(0), dims, dtype=dtype)

    quant = os.environ.get("BT_QUANT", "")
    if "int8" in quant:
        from whisper_rs_tpu.models.quantize import quantize_params

        params = quantize_params(params)

    sample_len = int(os.environ.get("BT_SAMPLE_LEN", "64"))
    mode = (
        BeamSearchMode(beam_size=5)
        if os.environ.get("BT_MODE") == "beam"
        else GreedyMode()
    )
    options = TranscribeOptions(
        decode=DecodeOptions(mode=mode, sample_len=sample_len),
        condition_on_prev_text=True,
    )

    bt = BatchTranscriber(
        params, dims, _BenchTok(), options, batch_size=n_utts,
        compute_dtype=dtype,
    )
    if "kv" in quant:
        bt.decode_task.quantize_kv = True

    rng = np.random.default_rng(0)
    audios = [
        (rng.standard_normal(16000 * utt_s) * 0.1).astype(np.float32)
        for _ in range(n_utts)
    ]
    total_audio = sum(len(a) / 16000 for a in audios)

    # warm (compiles all window shapes), then timed run on fresh audio
    bt.run(audios, raise_on_error=False)
    audios2 = [
        (rng.standard_normal(16000 * utt_s) * 0.1).astype(np.float32)
        for _ in range(n_utts)
    ]
    t0 = time.perf_counter()
    outs = bt.run(audios2, raise_on_error=False)
    dt = time.perf_counter() - t0

    n_segments = sum(len(o.segments) for o in outs if o)
    print(
        f"{model} x{n_utts} utts of {utt_s}s (sample_len={sample_len}, "
        f"{'beam' if os.environ.get('BT_MODE')=='beam' else 'greedy'}"
        f"{'+'+quant if quant else ''}): "
        f"{total_audio/dt:.1f} audio-s/s end-to-end "
        f"({dt:.2f}s, {n_segments} segments)"
    )


if __name__ == "__main__":
    main()
