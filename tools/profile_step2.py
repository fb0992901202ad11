"""Decode-step component breakdown: self-attn vs cross-attn vs MLP vs
logits, each as a 224-iteration fori_loop in its own jit.

  python tools/profile_step2.py [model] [batch] [component]
component: self|cross|mlp|logits|all (default all)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from whisper_rs_tpu.config import dims_for
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.models.whisper import (
    _attend,
    _attend_grouped,
    _merge_heads,
    _split_heads,
    gelu,
    layer_norm,
    linear,
)

STEPS = 32


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, inputs, n=3):
    _sync(fn(*inputs[0]))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        _sync(fn(*inputs[(i + 1) % len(inputs)]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS * 1000  # ms/step


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dims = dims_for(model)
    dtype = jnp.bfloat16
    H, dh, D, L = dims.n_text_head, dims.head_dim, dims.n_text_state, dims.n_text_layer
    scale = dh**-0.5

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    blocks = params["decoder"]["blocks"]
    rng = np.random.default_rng(0)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(dtype)

    xs = [mk(B, 1, D) for _ in range(4)]
    kc = mk(L, B, H, dims.n_text_ctx, dh)
    vc = mk(L, B, H, dims.n_text_ctx, dh)
    ck = mk(L, B, H, dims.n_audio_ctx, dh)
    cv = mk(L, B, H, dims.n_audio_ctx, dh)
    for a in (kc, vc, ck, cv):
        a.block_until_ready()
    mask = jnp.zeros((1, 1, 1, dims.n_text_ctx), jnp.float32)

    def loop(body):
        def run(x):
            def f(i, acc):
                return acc + body(x + acc[:, :1, :1] * 0)[..., :1, :1]
            return lax.fori_loop(0, STEPS, f, jnp.zeros((B, 1, 1), dtype))
        return jax.jit(run)

    # self-attention sublayer (all L layers, scan-free unrolled via python)
    def self_attn(x):
        out = x
        for l in range(L):
            bp = jax.tree.map(lambda a, l=l: a[l], blocks)
            h = layer_norm(out, bp["attn_ln"])
            q = _split_heads(linear(h, bp["attn"]["query"]), H) * scale
            _k = _split_heads(linear(h, bp["attn"]["key"]), H)
            _v = _split_heads(linear(h, bp["attn"]["value"]), H)
            att = _attend(q, kc[l], vc[l], mask)
            out = out + linear(_merge_heads(att), bp["attn"]["out"])
        return out

    def cross_attn(x):
        out = x
        for l in range(L):
            bp = jax.tree.map(lambda a, l=l: a[l], blocks)
            h = layer_norm(out, bp["cross_attn_ln"])
            q = _split_heads(linear(h, bp["cross_attn"]["query"]), H) * scale
            att = _attend(q, ck[l], cv[l], None)
            out = out + linear(_merge_heads(att), bp["cross_attn"]["out"])
        return out

    def mlp(x):
        out = x
        for l in range(L):
            bp = jax.tree.map(lambda a, l=l: a[l], blocks)
            h = layer_norm(out, bp["mlp_ln"])
            out = out + linear(gelu(linear(h, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])
        return out

    tok_emb = params["decoder"]["token_emb"]

    def logits(x):
        lg = jnp.einsum(
            "btd,vd->btv", x.astype(jnp.float32), tok_emb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return lg[..., :1].astype(dtype)

    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    table = {
        "self": ("self-attn x L", self_attn),
        "cross": ("cross-attn x L", cross_attn),
        "mlp": ("mlp x L", mlp),
        "logits": ("logits", logits),
    }
    items = table.values() if which == "all" else [table[which]]
    for name, body in items:
        print(f"{name:16s} {timed(loop(body), [(x,) for x in xs]):.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
