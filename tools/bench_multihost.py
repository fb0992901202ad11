"""Multi-host data-parallel throughput harness (BASELINE config #5).

Run ON EVERY HOST of a TPU pod slice:

  JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
      python tools/bench_multihost.py [model] [per-host-batch]

Each host ingests its own shard of synthetic 30s windows, the global batch
is assembled from per-host shards (jax.make_array_from_process_local_data),
and one jitted greedy decode runs data-parallel over all chips.  Prints
audio-seconds/s for the whole slice and per chip from process 0.

(Single-process invocation degrades to the one-host benchmark — the
bootstrap is a no-op, matching bench.py numbers.)

The global batch (per-host-batch x hosts) must be divisible by the total
chip count.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_rs_tpu.config import GreedyMode, dims_for
from whisper_rs_tpu.decode import FilterConfig, decode_greedy
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.ops.mel_pallas import log_mel_frontend
from whisper_rs_tpu.parallel import (
    batch_sharding,
    initialize_multihost,
    make_mesh,
    shard_params,
)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    per_host = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    initialize_multihost()
    n_proc = jax.process_count()
    dims = dims_for(model)
    dtype = jnp.bfloat16

    mesh = make_mesh(n_model=1)  # pure DP across the slice
    global_batch = per_host * n_proc

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    with jax.set_mesh(mesh):
        params = shard_params(mesh, params)  # replicated across DP

        rng = np.random.default_rng(jax.process_index())
        local_audio = (rng.standard_normal((per_host, 480_000)) * 0.1).astype(
            np.float32
        )
        audio = jax.make_array_from_process_local_data(
            batch_sharding(mesh, 2), local_audio, (global_batch, 480_000)
        )
        initial = jax.make_array_from_process_local_data(
            batch_sharding(mesh, 2),
            np.asarray([[50257]] * per_host, np.int32),
            (global_batch, 1),
        )

        cfg = FilterConfig(
            n_vocab=dims.n_vocab,
            token_id_eot=50256,
            token_id_space=220,
            token_id_ts_begin=50363,
            token_id_no_timestamps=50362,
        )

        @jax.jit
        def pipeline(params, audio, initial_tokens):
            mel = log_mel_frontend(audio, dims.n_mels, dtype=dtype)
            return decode_greedy(
                params, mel, initial_tokens, jnp.int32(1), jnp.int32(0),
                dims, cfg, GreedyMode(), dims.sample_len_default,
                no_speech_id=50361, compute_dtype=dtype,
            )

        jax.block_until_ready(pipeline(params, audio, initial))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(params, audio, initial))
        dt = time.perf_counter() - t0

    if jax.process_index() == 0:
        audio_s = global_batch * 30.0
        n_chips = jax.device_count()
        print(
            f"{model}: {audio_s/dt:.1f} audio-s/s over {n_chips} chips "
            f"({n_proc} hosts) = {audio_s/dt/n_chips:.1f} per chip"
        )


if __name__ == "__main__":
    main()
