"""Ablate decode-step cost sources: cache width, cache writes, cross-attn.

Each variant runs a 224-iteration fori_loop in one jit (amortizing the
~30 ms tunnel dispatch floor) and reports ms/step.

  python tools/ablate_step.py [model] [batch]
"""

import dataclasses
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
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    base_dims = dims_for(model)
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def make_loop(dims, ctx_window=None, update_cache=True, tiny_cross=False):
        params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
        n_cross = 8 if tiny_cross else dims.n_audio_ctx
        xas = [
            jnp.asarray(
                (rng.standard_normal((B, n_cross, dims.n_audio_state)) * 0.3
                 ).astype(np.float32)
            ).astype(dtype)
            for _ in range(4)
        ]

        def run(params, xa):
            cross_kv = precompute_cross_kv(params, xa, dims)
            cache = KVCache.init(dims, B, dtype=dtype)
            tokens = jnp.zeros((B, dims.n_text_ctx), jnp.int32)

            def body(i, state):
                tokens, cache, acc = state
                tok_in = lax.dynamic_slice(tokens, (0, i % 100), (B, 1))
                logits, new_cache = decoder_forward(
                    params, tok_in, i % 100, cross_kv, cache, dims,
                    ctx_window=ctx_window,
                )
                if update_cache:
                    cache = new_cache
                acc = acc + logits[:, 0, 0].astype(jnp.float32)
                return tokens, cache, acc

            _, _, acc = lax.fori_loop(
                0, STEPS, body, (tokens, cache, jnp.zeros((B,), jnp.float32))
            )
            return acc

        return jax.jit(run), [(params, x) for x in xas]

    variants = [
        ("full (W=448)", dict()),
        ("ctx_window=112", dict(ctx_window=112)),
        ("no cache carry-through", dict(update_cache=False)),
        ("cross ctx 1500->8", dict(tiny_cross=True)),
        ("small text ctx (n_ctx=112)",
         dict(dims_override=dataclasses.replace(base_dims, n_text_ctx=112))),
    ]
    for name, kw in variants:
        dims = kw.pop("dims_override", base_dims)
        fn, inputs = make_loop(dims, **kw)
        t = timed(fn, inputs)
        print(f"{name:32s} {t/STEPS*1000:.3f} ms/step")


if __name__ == "__main__":
    main()
