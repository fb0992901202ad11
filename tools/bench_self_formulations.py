"""A/B formulations of the greedy decode self-attention cache dots.

At large-v3 b12 the XLA einsum qk/pv pair runs at only ~220-270 GB/s
(device trace r4): 240 independent [1,64]x[64,448] MXU micro-dots are
dispatch-latency-bound, not bandwidth-bound.  Candidates:

  einsum     — current _attend formulation (MXU micro-dots)
  vpu        — broadcast-multiply + reduce (elementwise loop fusion)

  python -m tools.bench_self_formulations [B] [H] [dh] [W] [L]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dh = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 448
    L = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    iters = 224
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((L, B, H, dh, W)), dtype)  # K^T layout
    v = jnp.asarray(rng.standard_normal((L, B, H, W, dh)), dtype)
    mask = jnp.zeros((1, 1, 1, W), jnp.float32)

    def attend_einsum(q, kl, vl):
        qk = jnp.einsum("bhqd,bhdk->bhqk", q, kl.astype(q.dtype),
                        preferred_element_type=jnp.float32) + mask
        w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), vl.astype(q.dtype))

    def attend_vpu(q, kl, vl):
        # q [B,H,1,dh]; kl [B,H,dh,W]; vl [B,H,W,dh] — elementwise
        # broadcast-multiply + reduce: one loop fusion per dot, streaming
        # the cache at full rate instead of 240 latency-bound micro-dots
        qk = jnp.sum(
            q[:, :, 0, :, None].astype(jnp.float32) * kl.astype(jnp.float32),
            axis=2,
        )[:, :, None, :] + mask  # [B,H,1,W]
        w = jax.nn.softmax(qk, axis=-1)
        out = jnp.sum(
            w[:, :, 0, :, None] * vl.astype(jnp.float32), axis=2
        )
        return out[:, :, None, :].astype(q.dtype)

    def loop(attend):
        def run(k, v, s):
            def body(i, acc):
                l = i % L
                kl = lax.dynamic_slice(k, (l, 0, 0, 0, 0), (1, B, H, dh, W))[0]
                vl = lax.dynamic_slice(v, (l, 0, 0, 0, 0), (1, B, H, W, dh))[0]
                q = (acc[:, :, None, :] + s).astype(dtype)
                o = attend(q, kl, vl)
                return o[:, :, 0, :].astype(jnp.float32)

            q0 = jnp.broadcast_to(
                s.astype(jnp.float32), (B, H, dh)
            )
            return lax.fori_loop(0, iters * 2, body, q0)

        return jax.jit(run)

    bytes_per_iter = (k.nbytes + v.nbytes) / L
    for name, fn in (("einsum", loop(attend_einsum)), ("vpu", loop(attend_vpu))):
        np.asarray(fn(k, v, jnp.float32(0.5))[0, 0, :4])
        best = np.inf
        for r in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(k, v, jnp.float32(r) * 1e-3)[0, 0, :4])
            best = min(best, time.perf_counter() - t0)
        per = best / (iters * 2)
        print(
            f"{name}: {per*1e6:.1f} us/layer-step "
            f"({bytes_per_iter/per/1e9:.0f} GB/s cache stream)"
        )


if __name__ == "__main__":
    main()
