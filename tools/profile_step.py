"""Isolate decode-step costs: model step vs filters vs extractor update.

Runs 224-iteration fori_loops of increasing composition inside single jits
(so the ~30ms tunnel dispatch floor amortizes) and reports per-step ms.

  python tools/profile_step.py [model] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from whisper_rs_tpu.config import dims_for
from whisper_rs_tpu.decode import FilterConfig, apply_filters
from whisper_rs_tpu.decode.filters import _log_softmax
from whisper_rs_tpu.models import (
    KVCache,
    decoder_forward,
    init_params,
    precompute_cross_kv,
)

STEPS = 224


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, inputs, n=3):
    _sync(fn(*inputs[0]))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        _sync(fn(*inputs[(i + 1) % len(inputs)]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dims = dims_for(model)
    dtype = jnp.bfloat16

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    rng = np.random.default_rng(0)
    xas = [
        jnp.asarray(
            (rng.standard_normal((B, dims.n_audio_ctx, dims.n_audio_state)) * 0.3
             ).astype(np.float32)
        ).astype(dtype)
        for _ in range(4)
    ]
    for x in xas:
        x.block_until_ready()

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

    from whisper_rs_tpu.models.whisper import decode_kernel_modes

    use_mlp, mlp_interp, _, _ = decode_kernel_modes(dims, B)

    def make_loop(with_filters: bool, with_update: bool):
        def run(params, xa):
            cross_kv = precompute_cross_kv(params, xa, dims)
            cache = KVCache.init(dims, B, dtype=dtype)
            tokens = jnp.zeros((B, dims.n_text_ctx), jnp.int32)

            packed_mlp = None
            if use_mlp:
                from whisper_rs_tpu.ops.decoder_mlp_fused import pack_mlp_params

                packed_mlp = pack_mlp_params(params["decoder"]["blocks"])

            def body(i, state):
                tokens, cache, acc = state
                tok_in = lax.dynamic_slice(tokens, (0, i), (B, 1))
                logits, cache = decoder_forward(
                    params, tok_in, i, cross_kv, cache, dims,
                    packed_mlp=packed_mlp, mlp_interpret=mlp_interp,
                )
                lg = logits[:, 0].astype(jnp.float32)
                if with_filters:
                    lg = apply_filters(cfg, lg, tokens, i + 1, jnp.int32(1))
                if with_update:
                    nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                    lp = _log_softmax(lg)
                    acc = acc + jnp.take_along_axis(lp, nxt[:, None], axis=1)[:, 0]
                    tokens = lax.dynamic_update_slice(
                        tokens, nxt[:, None] % 400, (0, i + 1)
                    )
                else:
                    acc = acc + lg[:, 0]
                return tokens, cache, acc

            _, _, acc = lax.fori_loop(
                0, STEPS, body, (tokens, cache, jnp.zeros((B,), jnp.float32))
            )
            return acc

        return jax.jit(run)

    base = timed(make_loop(False, False), [(params, x) for x in xas])
    print(f"model step only:      {base/STEPS*1000:.3f} ms/step ({base*1000:.0f} ms total)")
    f = timed(make_loop(True, False), [(params, x) for x in xas])
    print(f"+ filters:            {f/STEPS*1000:.3f} ms/step (+{(f-base)/STEPS*1000:.3f})")
    u = timed(make_loop(True, True), [(params, x) for x in xas])
    print(f"+ greedy update:      {u/STEPS*1000:.3f} ms/step (+{(u-f)/STEPS*1000:.3f})")


if __name__ == "__main__":
    main()
