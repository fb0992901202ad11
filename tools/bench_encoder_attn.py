"""Isolated encoder-attention kernel bench: stock flash vs custom Pallas.

  python -m tools.bench_encoder_attn [B] [H] [reps]

Runs both kernels at Whisper encoder shapes (T=1536, dh=64) in a fori_loop
of ``reps`` chained calls (axon dedupes identical executions — inputs are
perturbed per iteration), reports ms/call, and cross-checks outputs.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    T, dh = 1536, 64
    n_valid = 1500
    scale = dh**-0.5

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, dh)), jnp.bfloat16) * 0.3
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)), jnp.bfloat16) * 0.3
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)), jnp.bfloat16) * 0.3

    from whisper_rs_tpu.ops.encoder_attention import encoder_attention
    from whisper_rs_tpu.ops.encoder_attention_pallas import (
        encoder_attention_pallas,
    )

    def bench(fn, name):
        @jax.jit
        def loop(q, k, v):
            def body(i, acc):
                out = fn(q + acc * 1e-6, k, v)
                return acc + out[0, 0, 0, 0].astype(jnp.float32)

            return lax.fori_loop(0, reps, body, jnp.float32(0))

        float(loop(q, k, v))  # compile
        t0 = time.perf_counter()
        float(loop(q, k, v))
        dt = time.perf_counter() - t0
        print(f"{name:>14}: {dt / reps * 1e3:8.3f} ms/call")
        return dt / reps

    def flash(q, k, v):
        return encoder_attention(q, k, v, scale, n_valid=n_valid)

    def custom(q, k, v):
        return encoder_attention_pallas(q, k, v, scale, n_valid=n_valid)

    # parity first
    a = np.asarray(flash(q, k, v), np.float32)
    b = np.asarray(custom(q, k, v), np.float32)
    err = np.abs(a - b)[:, :, :n_valid].max()
    print(f"max |flash - custom| over valid rows: {err:.5f}")

    t_flash = bench(flash, "stock flash")
    t_custom = bench(custom, "custom pallas")
    print(f"speedup: {t_flash / t_custom:.2f}x")

    # roofline context: qk dot contracts dh=64 (50% MXU), wv contracts T
    flops = 4 * B * H * T * T * dh
    print(
        f"MXU bound (qk@50% + wv@100%): "
        f"{(flops / 2 / (197e12 / 2) + flops / 2 / 197e12) * 1e3:.3f} ms"
    )


if __name__ == "__main__":
    main()
