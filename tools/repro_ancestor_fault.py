"""Standalone repro for the pure-XLA beam-ancestor-resolve TPU fault.

Round-2 finding (ROADMAP / decode/loop.py:505): with gather-at-read beam
ancestors implemented as ``jnp.take_along_axis`` over the cache window
(the pure-XLA path, WHISPER_BEAM_ANCESTOR=1 + WHISPER_PALLAS_DECODE=0),
repeated production-scale executions nondeterministically CRASH the
tunneled TPU worker ("TPU worker process crashed or restarted"), while
fresh single runs pass.  The Pallas beam kernel with in-kernel ancestor
resolution is stable, so "auto" gates ancestors on a Pallas mode.

This script reproduces the fault in isolation:

  python -m tools.repro_ancestor_fault --mode beam       # real decode_beam
  python -m tools.repro_ancestor_fault --mode synthetic  # minimal gather loop
  (add --runs N --batch B --beam K to scale)

``beam`` drives the actual decode_beam repeatedly at medium.en-like scale.
``synthetic`` strips everything but the suspect pattern: a while_loop that
per step gathers a [B,H,dh,W] cache slice with take_along_axis over axis 0
inside a lax.scan over layers, then writes one new cache column.  If
``synthetic`` faults, the bug is the gather lowering itself; if only
``beam`` faults, the trigger needs the full decode graph.  If neither
faults on a given runtime build, record that in ROADMAP and flip the
ancestor default.

Exit code: 0 = all runs completed, 2 = TPU runtime fault reproduced.
"""

import argparse
import sys
import time


def run_beam(args) -> bool:
    import os

    os.environ["WHISPER_BEAM_ANCESTOR"] = "1"   # force pure-XLA ancestors
    os.environ["WHISPER_PALLAS_DECODE"] = "0"   # no Pallas kernels

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_rs_tpu.config import BeamSearchMode, ModelDims, dims_for
    from whisper_rs_tpu.decode import FilterConfig, decode_beam
    from whisper_rs_tpu.models import init_params

    dims = dims_for(args.model)
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    cfg = FilterConfig(
        n_vocab=dims.n_vocab, token_id_eot=50256, token_id_space=220,
        token_id_ts_begin=50363, token_id_no_timestamps=50362,
    )
    mode = BeamSearchMode(beam_size=args.beam, patience=1.0)
    rng = np.random.default_rng(0)

    fn = jax.jit(
        lambda p, m, t: decode_beam(
            p, m, t, jnp.int32(1), jnp.int32(0), dims, cfg, mode,
            sample_len=args.steps, no_speech_id=50361,
            compute_dtype=dtype,
        )
    )
    for i in range(args.runs):
        mel = jnp.asarray(
            rng.standard_normal((args.batch, dims.n_mels, 3000)) * 0.3, dtype
        )
        tok = jnp.full((args.batch, 1), 50257, jnp.int32)
        t0 = time.perf_counter()
        out = fn(params, mel, tok)
        # host transfer = the only reliable completion fence on the
        # tunneled runtime (block_until_ready returns early there), and
        # the only way a worker crash surfaces as an exception HERE
        np.asarray(out.candidates[:, 0, :4])
        print(f"run {i + 1}/{args.runs} ok ({time.perf_counter() - t0:.1f}s)",
              flush=True)
    return True


def run_synthetic(args) -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    L, B, H, dh, ctx = 24, args.batch * args.beam, 16, 64, 448
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.standard_normal((L, B, H, dh, ctx)), dtype)
    v0 = jnp.asarray(rng.standard_normal((L, B, H, ctx, dh)), dtype)

    def step(carry):
        pos, anc, k, v, acc = carry
        # fake beam reorder: rotate source rows within each beam group
        src = (jnp.arange(B) // args.beam) * args.beam + (
            (jnp.arange(B) + pos) % args.beam
        )
        anc = jnp.take_along_axis(anc, jnp.broadcast_to(src[:, None], anc.shape), 0)
        anc = lax.dynamic_update_slice(
            anc, jnp.arange(B, dtype=jnp.int32)[:, None], (0, pos)
        )

        def layer(carry_x, kv):
            kl, vl = kv  # [B,H,dh,ctx] / [B,H,ctx,dh]
            idx = anc[:, None, None, :]
            kr = jnp.take_along_axis(
                kl, jnp.broadcast_to(idx, kl.shape), axis=0, mode="clip"
            )
            idxv = anc[:, None, :, None]
            vr = jnp.take_along_axis(
                vl, jnp.broadcast_to(idxv, vl.shape), axis=0, mode="clip"
            )
            q = carry_x  # [B, H, 1, dh]
            s = jnp.einsum("bhqd,bhdk->bhqk", q, kr.astype(q.dtype),
                           preferred_element_type=jnp.float32)
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", w, vr.astype(q.dtype))
            return o, None

        q0 = jnp.mean(v, axis=(0, 3)).reshape(B, H, 1, dh).astype(dtype)
        o, _ = lax.scan(layer, q0, (k, v))
        newcol = o[:, :, 0, :].astype(k.dtype)  # [B, H, dh]
        k = lax.dynamic_update_slice(
            k, jnp.broadcast_to(newcol[None, :, :, :, None], (L, B, H, dh, 1)),
            (0, 0, 0, 0, pos),
        )
        acc = acc + jnp.sum(o.astype(jnp.float32))
        return pos + 1, anc, k, v, acc

    def run(k, v):
        anc0 = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, ctx)
        )
        carry = (jnp.int32(1), anc0, k, v, jnp.float32(0))
        carry = lax.while_loop(lambda c: c[0] < args.steps, step, carry)
        return carry[4]

    fn = jax.jit(run)
    for i in range(args.runs):
        kk = k0 * (1.0 + i * 1e-3)
        t0 = time.perf_counter()
        out = fn(kk, v0)
        float(out)  # host transfer: reliable completion fence (see run_beam)
        print(f"run {i + 1}/{args.runs} ok ({time.perf_counter() - t0:.1f}s)",
              flush=True)
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["beam", "synthetic"], default="beam")
    ap.add_argument("--model", default="medium.en")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=224)
    ap.add_argument("--runs", type=int, default=6)
    args = ap.parse_args(argv)
    try:
        ok = run_beam(args) if args.mode == "beam" else run_synthetic(args)
    except Exception as e:
        msg = str(e)
        if "crashed or restarted" in msg or "UNAVAILABLE" in msg:
            print(f"REPRODUCED: TPU runtime fault: {msg[:200]}", flush=True)
            return 2
        raise
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
