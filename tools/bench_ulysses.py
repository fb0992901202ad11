"""Ulysses sequence-parallel encoder bench hook (VERDICT r4 #6).

  python -m tools.bench_ulysses [model] [B] [n_model] [reps] [--cpu8]

Times the single-device encoder forward vs the Ulysses SP forward over an
(n_data, n_model) mesh built from the available devices, and checks the
outputs agree.  On the current 1-chip image a real >1 n_model mesh is
impossible — pass ``--cpu8`` to demonstrate on the fake 8-device CPU mesh
(correctness + plumbing; the perf numbers then mean nothing).  On a real
slice this is the hook that answers "does head-scatter/seq-gather SP beat
DP-only for the latency regime" (SURVEY §2.3 SP row).
"""

import sys
import time

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    model = args[0] if len(args) > 0 else "base.en"
    B = int(args[1]) if len(args) > 1 else 8
    n_model = int(args[2]) if len(args) > 2 else 2
    reps = int(args[3]) if len(args) > 3 else 8

    import jax

    if "--cpu8" in flags:
        jax.config.update("jax_platforms", "cpu")
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax.numpy as jnp

    from whisper_rs_tpu.config import dims_for
    from whisper_rs_tpu.models import encoder_forward, init_params
    from whisper_rs_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_params,
    )
    from whisper_rs_tpu.parallel.ulysses import encoder_forward_ulysses

    devs = jax.devices()
    if len(devs) % n_model:
        raise SystemExit(f"{len(devs)} devices not divisible by n_model={n_model}")
    n_data = len(devs) // n_model
    dims = dims_for(model)
    dtype = jnp.bfloat16 if devs[0].platform == "tpu" else jnp.float32

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((B, dims.n_mels, 3000)) * 0.3, dtype
    )

    def bench(fn, *inputs):
        out = jax.block_until_ready(fn(*inputs))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(fn(*inputs))
        return (time.perf_counter() - t0) / reps * 1e3, out

    single_fn = jax.jit(lambda p, m: encoder_forward(p, m, dims))
    t_single, out_single = bench(single_fn, params, mel)
    print(f"single-device encoder: {t_single:8.2f} ms/fwd  ({model} b{B})")

    mesh = make_mesh(n_model=n_model, n_data=n_data)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(mel, batch_sharding(mesh, 3))
        uly_fn = jax.jit(
            lambda p, m: encoder_forward_ulysses(p, m, dims, mesh)
        )
        t_uly, out_uly = bench(uly_fn, sp, mel_s)
    print(
        f"ulysses  n_model={n_model} n_data={n_data}: {t_uly:8.2f} ms/fwd  "
        f"({t_single / t_uly:.2f}x)"
    )
    err = float(
        jnp.max(jnp.abs(out_single.astype(jnp.float32) - out_uly.astype(jnp.float32)))
    )
    print(f"max |delta| vs single-device: {err:.3e}")


if __name__ == "__main__":
    main()
