"""Time ONE decode-step config: 224-iteration fori_loop in one jit.

Minimal A/B harness for kernel tuning knobs (WHISPER_CROSS_AC/HC/VMEM_MB,
WHISPER_PALLAS_DECODE, ...) — run once per env setting:

  WHISPER_CROSS_AC=4 WHISPER_CROSS_VMEM_MB=48 \
      python -m tools.bench_step base.en 32

Prints ms/step for the full model step (cache update + attention + MLP +
logits), no filters/extractor — the same "full" row as tools/ablate_step.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from whisper_rs_tpu.config import dims_for
from whisper_rs_tpu.models import KVCache, init_params, precompute_cross_kv
from whisper_rs_tpu.models.whisper import decoder_forward

STEPS = 224


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dims = dims_for(model)
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    xas = [
        jnp.asarray(
            (rng.standard_normal((B, dims.n_audio_ctx, dims.n_audio_state))
             * 0.3).astype(np.float32)
        ).astype(dtype)
        for _ in range(4)
    ]

    from whisper_rs_tpu.models.whisper import _pallas_layer_mode

    @jax.jit
    def run(params, xa):
        cross_kv = precompute_cross_kv(params, xa, dims)
        cache = KVCache.init(dims, B, dtype=dtype)
        tokens = jnp.zeros((B, 1), jnp.int32)

        packed = None
        fused = _pallas_layer_mode()[0]
        if fused:
            from whisper_rs_tpu.ops.decoder_layer_fused import pack_block_params

            packed = pack_block_params(params["decoder"]["blocks"])
            cache = cache._replace(k=cache.k.swapaxes(-1, -2))

        from whisper_rs_tpu.models.whisper import decode_kernel_modes

        use_mlp, mlp_interp, fs_mode, fs_interp = decode_kernel_modes(
            dims, B
        )
        packed_mlp = None
        if use_mlp and not fused:
            from whisper_rs_tpu.ops.decoder_mlp_fused import pack_mlp_params

            packed_mlp = pack_mlp_params(params["decoder"]["blocks"])

        kv_fused = "off" if fused else fs_mode
        if kv_fused == "ctx":
            cache = cache._replace(k=cache.k.swapaxes(-1, -2))
        elif kv_fused == "append":
            from whisper_rs_tpu.ops.decode_attention import append_ctx_pad

            pad = append_ctx_pad(cache.k.shape[-1]) - cache.k.shape[-1]
            cache = cache._replace(
                k=jnp.pad(cache.k, ((0, 0),) * 4 + ((0, pad),)),
                v=jnp.pad(
                    cache.v.swapaxes(-1, -2), ((0, 0),) * 4 + ((0, pad),)
                ),
            )

        def body(i, state):
            tokens, cache, acc = state
            logits, cache = decoder_forward(
                params, tokens, i, cross_kv, cache, dims, packed=packed,
                k_ctx_major=fused, packed_mlp=packed_mlp,
                mlp_interpret=mlp_interp, kv_fused=kv_fused,
                fused_self_interpret=fs_interp,
            )
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return nxt[:, None] % dims.n_vocab, cache, acc + jnp.sum(logits[:, 0, :8])

        _, _, acc = lax.fori_loop(0, STEPS, body, (tokens, cache, jnp.float32(0)))
        return acc

    float(run(params, xas[0]))  # compile + warm
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(run(params, xas[(i + 1) % len(xas)]))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{model} b{B}: {best / STEPS * 1000:.3f} ms/step ({best * 1000:.0f} ms / {STEPS} steps)")


if __name__ == "__main__":
    main()
