"""Device-op-level decode-step profile via jax.profiler (VERDICT r1 #10).

Runs a 224-step decode loop under jax.profiler.trace and aggregates the
DEVICE-side op durations from the Perfetto trace — the tunneled axon
runtime does forward device events, so this is the real per-op breakdown
(not host-side guessing).

  python tools/profile_trace.py [model] [batch] [top_n]
"""

import collections
import glob
import gzip
import json
import sys
import tempfile

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
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    dims = dims_for(model)
    dtype = jnp.bfloat16

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        (rng.standard_normal((B, dims.n_audio_ctx, dims.n_audio_state)) * 0.3
         ).astype(np.float32)
    ).astype(dtype)

    from whisper_rs_tpu.models.whisper import _pallas_layer_mode

    @jax.jit
    def run(params, xa):
        cross_kv = precompute_cross_kv(params, xa, dims)
        cache = KVCache.init(dims, B, dtype=dtype)
        tokens = jnp.zeros((B, dims.n_text_ctx), jnp.int32)

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
        if use_mlp:
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
            cache, acc = state
            tok_in = lax.dynamic_slice(tokens, (0, i % 100), (B, 1))
            logits, cache = decoder_forward(
                params, tok_in, i % 100, cross_kv, cache, dims,
                packed=packed, k_ctx_major=fused,
                packed_mlp=packed_mlp, mlp_interpret=mlp_interp,
                kv_fused=kv_fused, fused_self_interpret=fs_interp,
            )
            return cache, acc + logits[:, 0, 0].astype(jnp.float32)

        _, acc = lax.fori_loop(0, STEPS, body, (cache, jnp.zeros((B,), jnp.float32)))
        return acc

    float(jnp.sum(run(params, xa)))  # warm up / compile
    tracedir = tempfile.mkdtemp(prefix="jaxtrace_")
    xa2 = xa * 1.001  # vary inputs (runtime dedupes identical executions)
    with jax.profiler.trace(tracedir):
        float(jnp.sum(run(params, xa2)))

    traces = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace produced under {tracedir}"
    with gzip.open(traces[0]) as f:
        data = json.load(f)

    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    per_op = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if not pids.get(e.get("pid"), "").startswith("/device:"):
            continue
        name = e["name"].split("(")[0]
        dur = float(e.get("dur", 0.0))
        per_op[name] += dur
        counts[name] += 1
        total += dur

    print(f"# device op breakdown: {model} b{B}, {STEPS} steps "
          f"(total device time {total/1000:.1f} ms, {total/1000/STEPS:.3f} ms/step)")
    print(f"{'op':<52}{'ms':>10}{'%':>7}{'count':>8}{'us/call':>9}")
    for name, dur in per_op.most_common(top_n):
        print(
            f"{name[:50]:<52}{dur/1000:>10.2f}{100*dur/total:>6.1f}%"
            f"{counts[name]:>8}{dur/counts[name]:>9.1f}"
        )


if __name__ == "__main__":
    main()
