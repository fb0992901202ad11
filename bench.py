"""Throughput benchmark: audio-seconds/s per chip.

Runs the full single-window pipeline (mel -> encoder -> greedy decode with
filters, full 224-step budget — a conservative worst case: real decode
terminates at EOT) on whatever accelerator JAX_PLATFORMS provides (the real
TPU chip under the driver).  Prints the headline config as the FIRST JSON
line (the driver contract), then optional extra rows (one JSON line each)
so cross-round progress on non-headline configs is machine-checkable.

``vs_baseline`` is the real-time factor (audio-seconds transcribed per
wall-clock second; 1.0 = real time).  The reference publishes no benchmark
numbers at all (BASELINE.md), so real-time rate is the meaningful anchor.

Env knobs:
  BENCH_MODEL  (default base.en)   BENCH_BATCH (default 128: throughput
               saturates by b96-b128 on v5e — b32 2771, b96 3349, b128
               3385 audio-s/s — as the encoder + per-step overheads
               amortize across rows; all fits comfortably in 16 GB HBM)
  BENCH_MODE   greedy|beam (default greedy)   BENCH_BEAM (default 5)
  BENCH_STEPS  decode steps (default: full sample_len 224, capped by the
               context left after the prompt in prompted mode)
  BENCH_ITERS  timed iterations (default 3)
  BENCH_QUANT  int8|kv|int8kv -> weight-only / cross-KV / both quantized
  BENCH_PROMPTED=1 -> condition every window on a realistic long-audio
               prompt (per-row prompts filling the 232-wide prefill
               bucket via build_batch_prompts, so decode runs the
               production phases 232->448 with per-row key_start — the
               regime transcribe.py's prompt conditioning actually hits)
  BENCH_EXTRA  extra JSON rows after the headline (default "large" on
               accelerators: the large-v3 b12 flagship row; "0" disables,
               "large,prompted" also adds the prompted base.en row)
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_config(
    model_name: str,
    batch: int,
    bench_mode: str,
    beam: int,
    steps_env,
    quant: str,
    prompted: bool,
    iters: int,
    dtype,
):
    """Measure one config; returns (throughput, desc, steps)."""
    from whisper_rs_tpu.config import BeamSearchMode, GreedyMode, dims_for
    from whisper_rs_tpu.decode import FilterConfig, decode_beam, decode_greedy
    from whisper_rs_tpu.models import init_params
    from whisper_rs_tpu.ops.mel_pallas import log_mel_frontend

    dims = dims_for(model_name)
    steps = int(steps_env) if steps_env else dims.sample_len_default

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
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

    key_start = None
    if prompted:
        # realistic long-audio conditioning: per-row token prompts long
        # enough to fill the 232-wide prefill bucket (the bucket
        # transcribe.py's truncated-prompt rule lands in on long audio),
        # so decode runs the production phases 232 -> 448
        from whisper_rs_tpu.decode import build_batch_prompts

        prompts = [
            rng.integers(300, 40_000, size=int(200 + (i % 4) * 7)).tolist()
            for i in range(batch)
        ]
        initial, ks, sample_begin, sot_idx = build_batch_prompts(
            prompts, sot_sequence=[50257], token_id_sot=50257,
            token_id_startofprev=50360, n_text_ctx=dims.n_text_ctx,
        )
        assert sample_begin == 232, sample_begin
        key_start = jnp.asarray(ks)
        steps = min(steps, dims.n_text_ctx - sample_begin)
    else:
        initial = np.asarray([[50257]] * batch, np.int32)
        sample_begin, sot_idx = 1, 0

    if bench_mode == "beam":
        mode = BeamSearchMode(beam_size=beam, patience=1.0)
        decode_fn = decode_beam
    else:
        mode = GreedyMode()
        decode_fn = decode_greedy

    @jax.jit
    def pipeline(params, audio, initial_tokens):
        mel = log_mel_frontend(audio, dims.n_mels, dtype=dtype)
        kwargs = dict(
            no_speech_id=50361, compute_dtype=dtype, quantize_kv=quantize_kv,
        )
        if key_start is not None:
            kwargs["key_start"] = key_start
        return decode_fn(
            params,
            mel,
            initial_tokens,
            jnp.int32(sample_begin),
            jnp.int32(sot_idx),
            dims,
            cfg,
            mode,
            steps,
            **kwargs,
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
    throughput = batch * 30.0 / best

    desc = f"beam={beam}" if bench_mode == "beam" else "greedy"
    if quant:
        desc += f", {quant}"
    if prompted:
        desc += ", prompted-232"
    return throughput, desc, steps


def emit(model_name, batch, steps, desc, throughput):
    print(
        json.dumps(
            {
                "metric": f"audio-seconds/s per chip ({model_name}, {desc}, "
                f"batch={batch}, {steps} decode steps)",
                "value": round(throughput, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(throughput, 2),
            }
        ),
        flush=True,
    )


def main():
    model_name = os.environ.get("BENCH_MODEL", "base.en")
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    bench_mode = os.environ.get("BENCH_MODE", "greedy")
    beam = int(os.environ.get("BENCH_BEAM", "5"))
    quant = os.environ.get("BENCH_QUANT", "")
    prompted = os.environ.get("BENCH_PROMPTED", "") == "1"

    # bf16 params/compute on accelerators, f32 on CPU
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16

    throughput, desc, steps = run_config(
        model_name, batch, bench_mode, beam,
        os.environ.get("BENCH_STEPS"), quant, prompted, iters, dtype,
    )
    emit(model_name, batch, steps, desc, throughput)

    # extra (non-headline) rows: flagship large-v3 so r3/r4-class decode
    # kernel work is visible to the driver-recorded metric history
    extra = os.environ.get("BENCH_EXTRA", "0" if on_cpu else "large")
    if extra and extra != "0":
        jobs = []
        if "large" in extra and model_name != "large-v3":
            jobs.append(("large-v3", 12, bench_mode, beam, quant, False))
        if "prompted" in extra and not prompted:
            jobs.append((model_name, batch, bench_mode, beam, quant, True))
        for m, b, md, bm, q, pr in jobs:
            tput, d, st = run_config(
                m, b, md, bm, os.environ.get("BENCH_STEPS"), q, pr, iters,
                dtype,
            )
            emit(m, b, st, d, tput)


if __name__ == "__main__":
    main()
