"""A/B the encoder forward: bf16 weights vs int8 weights vs int8x8 matmuls.

  python -m tools.bench_encoder_int8 [model] [batch] [reps]

Timing rules (ROADMAP): operands stay device-resident, every timed call is
perturbed by a fresh scalar on device (axon dedup), completion fenced by a
small host transfer.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_rs_tpu.config import dims_for
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.models.quantize import quantize_params


def bench(tag, params, dims, mel, reps):
    from whisper_rs_tpu.models.whisper import encoder_forward

    fn = jax.jit(
        lambda p, m, s: encoder_forward(p, m + s.astype(m.dtype), dims)
    )
    np.asarray(fn(params, mel, jnp.float32(99))[0, 0, :8])  # compile+warm
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(params, mel, jnp.float32(r * 1e-6))[0, 0, :8])
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:.1f} ms/fwd (batch {mel.shape[0]})")
    return best


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3-turbo"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    dims = dims_for(model)

    params = init_params(jax.random.PRNGKey(0), dims, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        (rng.standard_normal((B, dims.n_mels, 3000)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)

    t_bf16 = bench("bf16 weights", params, dims, mel, reps)
    qparams = quantize_params(params)
    t_w8 = bench("int8 weights (bf16 matmul)", qparams, dims, mel, reps)
    os.environ["WHISPER_INT8_MATMUL"] = "1"
    t_i8 = bench("int8x8 matmul", qparams, dims, mel, reps)
    print(
        f"int8x8 vs bf16: {t_bf16/t_i8:.2f}x | vs int8-weight: {t_w8/t_i8:.2f}x"
    )


if __name__ == "__main__":
    main()
