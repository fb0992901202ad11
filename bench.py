"""Throughput benchmark: audio-seconds/s per chip.

Runs the full single-window pipeline (mel -> encoder -> greedy decode with
filters, full 224-step budget — a conservative worst case: real decode
terminates at EOT) on whatever accelerator JAX_PLATFORMS provides (the real
TPU chip under the driver).  Prints ONE JSON line.

``vs_baseline`` is the real-time factor (audio-seconds transcribed per
wall-clock second; 1.0 = real time).  The reference publishes no benchmark
numbers at all (BASELINE.md), so real-time rate is the meaningful anchor.

Env knobs:
  BENCH_MODEL  (default base.en)   BENCH_BATCH (default 128: throughput
               saturates by b96-b128 on v5e — b32 2771, b96 3349, b128
               3385 audio-s/s — as the encoder + per-step overheads
               amortize across rows; all fits comfortably in 16 GB HBM)
  BENCH_MODE   greedy|beam (default greedy)   BENCH_BEAM (default 5)
  BENCH_STEPS  decode steps (default: full sample_len 224)
  BENCH_ITERS  timed iterations (default 3)
  BENCH_QUANT  int8|kv|int8kv -> weight-only / cross-KV / both quantized
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    model_name = os.environ.get("BENCH_MODEL", "base.en")
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    from whisper_rs_tpu.config import BeamSearchMode, GreedyMode, dims_for
    from whisper_rs_tpu.decode import FilterConfig, decode_beam, decode_greedy
    from whisper_rs_tpu.models import init_params
    from whisper_rs_tpu.ops.mel_pallas import log_mel_frontend

    dims = dims_for(model_name)
    steps = int(os.environ.get("BENCH_STEPS", str(dims.sample_len_default)))

    # bf16 params/compute on accelerators, f32 on CPU
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    quant = os.environ.get("BENCH_QUANT", "")
    if "int8" in quant:
        from whisper_rs_tpu.models.quantize import quantize_params

        params = quantize_params(params)
    quantize_kv = "kv" in quant

    cfg = FilterConfig(
        n_vocab=dims.n_vocab,
        token_id_eot=50256,
        token_id_space=220,
        token_id_ts_begin=50363,
        token_id_no_timestamps=50362,
        suppress_blank=True,
        timestamps=True,
        suppress_ids=(1, 2, 7),
        max_initial_timestamp_index=50,
    )

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.1
    initial = np.asarray([[50257]] * batch, np.int32)

    bench_mode = os.environ.get("BENCH_MODE", "greedy")
    if bench_mode == "beam":
        mode = BeamSearchMode(
            beam_size=int(os.environ.get("BENCH_BEAM", "5")), patience=1.0
        )
        decode_fn = decode_beam
    else:
        mode = GreedyMode()
        decode_fn = decode_greedy

    @jax.jit
    def pipeline(params, audio, initial_tokens):
        mel = log_mel_frontend(audio, dims.n_mels, dtype=dtype)
        return decode_fn(
            params,
            mel,
            initial_tokens,
            jnp.int32(1),
            jnp.int32(0),
            dims,
            cfg,
            mode,
            steps,
            no_speech_id=50361,
            compute_dtype=dtype,
            quantize_kv=quantize_kv,
        )

    # distinct input buffers per iteration (identical repeats can be
    # short-circuited by the remote runtime) and a forced host transfer so
    # the timing covers real end-to-end execution.
    audios = [jnp.asarray(audio + 0.001 * i) for i in range(iters + 1)]
    init_j = jnp.asarray(initial)

    # warmup / compile
    np.asarray(pipeline(params, audios[0], init_j).candidates)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        res = pipeline(params, audios[i + 1], init_j)
        np.asarray(res.candidates)
        times.append(time.perf_counter() - t0)

    best = min(times)
    audio_seconds = batch * 30.0
    throughput = audio_seconds / best

    mode_desc = (
        f"beam={mode.beam_size}" if bench_mode == "beam" else "greedy"
    )
    if quant:
        mode_desc += f", {quant}"
    print(
        json.dumps(
            {
                "metric": f"audio-seconds/s per chip ({model_name}, {mode_desc}, "
                f"batch={batch}, {steps} decode steps)",
                "value": round(throughput, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(throughput, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
