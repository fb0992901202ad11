"""Isolate the cross-attention decode kernel's achieved HBM bandwidth.

Runs ONLY the per-layer cross kernel, chained L times per step like the
real layer scan but with everything else removed, 224 steps in one jit.
Compares against the pure stream ideal (K+V bytes / 800 GB/s) to separate
kernel inefficiency from scheduling/overlap losses in the full step.

  python -m tools.bench_cross [model] [batch]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_rs_tpu.config import dims_for
from whisper_rs_tpu.ops.decode_attention import cross_attention_step

STEPS = 224


def _dma_only_kernel(l_ref, q_ref, k_ref, v_ref, o_ref):
    """Touch a sliver of each fetched block; the pipeline DMAs the whole
    block regardless — isolates pure stream rate through the same specs."""
    _, hc, G, dh = q_ref.shape
    k_part = k_ref[0, 0, :, :, :G].astype(jnp.float32)  # [hc, dh, G]
    v_part = v_ref[0, 0, :, :G, :].astype(jnp.float32)  # [hc, G, dh]
    o_ref[0] = (k_part.transpose(0, 2, 1) + v_part).astype(o_ref.dtype)


def dma_only_step(q, k_all, v_all, layer):
    A, G, H, dh = q.shape
    Tk = k_all.shape[-1]
    hc = H
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A, 1),
        in_specs=[
            pl.BlockSpec((1, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
            pl.BlockSpec((1, 1, hc, dh, Tk), lambda a, hj, l: (l[0], a, hj, 0, 0)),
            pl.BlockSpec((1, 1, hc, Tk, dh), lambda a, hj, l: (l[0], a, hj, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
    )
    return pl.pallas_call(
        _dma_only_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, H, G, dh), q.dtype),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q.transpose(0, 2, 1, 3),
      k_all, v_all).transpose(0, 2, 1, 3)


def _dma_kv_kernel(l_ref, q_ref, kv_ref, o_ref):
    """Fused-array variant: the single [1,1,hc,2,dh,Tk] block rides the
    pipeline; touch a sliver so the block isn't DCE'd."""
    _, hc, G, dh = q_ref.shape
    part = kv_ref[0, 0, :, 0, :, :G].astype(jnp.float32)  # [hc, dh, G]
    o_ref[0] = part.transpose(0, 2, 1).astype(o_ref.dtype)


def dma_kv_only_step(q, kv_all, layer):
    A, G, H, dh = q.shape
    Tk = kv_all.shape[-1]
    hc = H
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A, 1),
        in_specs=[
            pl.BlockSpec((1, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
            pl.BlockSpec(
                (1, 1, hc, 2, dh, Tk), lambda a, hj, l: (l[0], a, hj, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
    )
    return pl.pallas_call(
        _dma_kv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, H, G, dh), q.dtype),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q.transpose(0, 2, 1, 3),
      kv_all).transpose(0, 2, 1, 3)


def _dma_k_kernel(l_ref, q_ref, k_ref, o_ref):
    _, hc, G, dh = q_ref.shape
    o_ref[0] = k_ref[0, 0, :, :, :G].astype(jnp.float32).transpose(0, 2, 1).astype(o_ref.dtype)


def dma_k_only_step(q, k_all, layer):
    """Single-stream variant: only the K array rides the pipeline."""
    A, G, H, dh = q.shape
    Tk = k_all.shape[-1]
    hc = H
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A, 1),
        in_specs=[
            pl.BlockSpec((1, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
            pl.BlockSpec((1, 1, hc, dh, Tk), lambda a, hj, l: (l[0], a, hj, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hc, G, dh), lambda a, hj, l: (a, hj, 0, 0)),
    )
    return pl.pallas_call(
        _dma_k_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, H, G, dh), q.dtype),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q.transpose(0, 2, 1, 3),
      k_all).transpose(0, 2, 1, 3)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dims = dims_for(model)
    dtype = jnp.bfloat16
    L, H, dh, Tk = (
        dims.n_text_layer, dims.n_text_head, dims.head_dim, dims.n_audio_ctx
    )
    rng = np.random.default_rng(0)

    ks = [
        jnp.asarray(rng.standard_normal((L, B, H, dh, Tk)).astype(np.float32) * 0.1).astype(dtype)
        for _ in range(2)
    ]
    vs = [
        jnp.asarray(rng.standard_normal((L, B, H, Tk, dh)).astype(np.float32) * 0.1).astype(dtype)
        for _ in range(2)
    ]
    # fused CrossKV layout for the real kernel: [L, B, H, 2, dh, Tk]
    kvs = [
        jnp.stack([k, v.swapaxes(-1, -2)], axis=3) for k, v in zip(ks, vs)
    ]
    for kv in kvs:
        kv.block_until_ready()

    mode = sys.argv[3] if len(sys.argv) > 3 else "kernel"

    @jax.jit
    def run(k_all, v_all, kv_all, q0):
        def step(i, q):
            def layer(q, l):
                if mode == "dma":
                    out = dma_only_step(q[:, None], k_all, v_all, l)[:, 0]
                elif mode == "dmakv":
                    out = dma_kv_only_step(q[:, None], kv_all, l)[:, 0]
                elif mode == "dmak":
                    out = dma_k_only_step(q[:, None], k_all, l)[:, 0]
                elif mode == "xla":
                    # pure XLA streaming reduce of the same per-layer slices
                    ksum = jnp.sum(
                        lax.dynamic_index_in_dim(k_all, l, 0, False).astype(jnp.float32),
                        axis=(2, 3),
                    )  # [B, H]
                    vsum = jnp.sum(
                        lax.dynamic_index_in_dim(v_all, l, 0, False).astype(jnp.float32),
                        axis=(2, 3),
                    )
                    out = q + (ksum + vsum)[:, :, None].astype(q.dtype)
                else:
                    out = cross_attention_step(q[:, None], kv_all, l)[:, 0]
                return out.astype(q.dtype), None

            q, _ = lax.scan(layer, q, jnp.arange(L))
            return q

        return jnp.sum(lax.fori_loop(0, STEPS, step, q0).astype(jnp.float32))

    q0 = jnp.asarray(rng.standard_normal((B, H, dh)).astype(np.float32)).astype(dtype)
    float(run(ks[0], vs[0], kvs[0], q0))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(run(ks[i % 2], vs[i % 2], kvs[i % 2], q0))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    per_step = best / STEPS
    n_streams = 1 if mode == "dmak" else 2
    bytes_per_step = n_streams * L * B * H * dh * Tk * np.dtype(np.float16).itemsize
    print(
        f"{model} b{B}: cross-only {per_step * 1e3:.3f} ms/step; "
        f"stream {bytes_per_step / 1e6:.0f} MB/step -> "
        f"{bytes_per_step / per_step / 1e9:.0f} GB/s achieved "
        f"(ideal ~800 GB/s => {bytes_per_step / 800e9 * 1e3:.3f} ms)"
    )


if __name__ == "__main__":
    main()
