"""Decode hot-path profiling: per-step cost slope + component breakdown.

Run on the real TPU (default env) to see where window time goes:
  python tools/profile_decode.py [model] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_rs_tpu.audio import log_mel_spectrogram
from whisper_rs_tpu.config import GreedyMode, dims_for
from whisper_rs_tpu.decode import FilterConfig, decode_greedy
from whisper_rs_tpu.models import (
    KVCache,
    decoder_forward,
    encoder_forward,
    init_params,
    precompute_cross_kv,
)


def _sync(x):
    """Force a real device->host sync (block_until_ready can return early on
    remote-tunnel runtimes); reduce to a scalar first."""
    return float(jax.tree.reduce(lambda a, b: a + b, jax.tree.map(lambda v: jnp.sum(v.astype(jnp.float32)), x)))


def timeit(fn, args_list, n=3):
    _sync(fn(*args_list[0]))  # compile + warm
    ts = []
    for i in range(n):
        a = args_list[(i + 1) % len(args_list)]  # avoid repeating warm input
        t0 = time.perf_counter()
        _sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dims = dims_for(model)
    dtype = jnp.bfloat16

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    rng = np.random.default_rng(0)
    mels = [
        jnp.asarray(
            (rng.standard_normal((B, dims.n_mels, 3000)) * 0.3).astype(np.float32)
        ).astype(dtype)
        for _ in range(4)
    ]
    for m in mels:
        m.block_until_ready()

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
    initial = jnp.asarray(np.asarray([[50257]] * B, np.int32))

    # encoder only
    enc = jax.jit(lambda p, m: encoder_forward(p, m, dims))
    t_enc = timeit(enc, [(params, m) for m in mels])
    print(f"encoder: {t_enc*1000:.1f} ms")

    # encoder + cross-kv
    enc_kv = jax.jit(
        lambda p, m: precompute_cross_kv(p, encoder_forward(p, m, dims), dims)
    )
    t_kv = timeit(enc_kv, [(params, m) for m in mels])
    print(f"encoder+crosskv: {t_kv*1000:.1f} ms")

    # full greedy at several step counts -> slope
    results = {}
    for steps in (8, 64, 224):
        fn = jax.jit(
            lambda p, m, t, s=steps: decode_greedy(
                p, m, t, jnp.int32(1), jnp.int32(0), dims, cfg, GreedyMode(),
                s, no_speech_id=50361, compute_dtype=dtype,
            ).candidates.sum()
        )
        t_full = timeit(fn, [(params, m, initial) for m in mels])
        results[steps] = t_full
        print(f"greedy {steps:4d} steps: {t_full*1000:.1f} ms")

    slope = (results[224] - results[8]) / (224 - 8)
    print(f"per-step cost: {slope*1000:.3f} ms; fixed: {(results[8]-8*slope)*1000:.1f} ms")
    audio_s = B * 30.0
    print(f"audio-s/s at 224 steps: {audio_s/results[224]:.1f}")


if __name__ == "__main__":
    main()
