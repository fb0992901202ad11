"""Measure the v5e MXU s8xs8->s32 rate vs bf16 (the int8x8 encoder lever).

Chained matmuls inside one jit (each iteration's input depends on the
previous output — immune to the axon runtime's identical-execution dedup,
ROADMAP "hard-won facts"), fresh operands per timed call.

  python -m tools.bench_int8_mxu [size] [iters] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    flops = 2 * n * n * n * iters

    @jax.jit
    def run_bf16(x, w, s):
        # s: fresh scalar per call — perturbs the chain on device so no two
        # timed executions are identical (axon dedup) without re-uploading
        # a 33 MB operand over the ~25 MB/s tunnel
        x = x + s.astype(jnp.bfloat16)

        def body(i, x):
            y = x @ w
            return (y * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)

        return lax.fori_loop(0, iters, body, x)

    @jax.jit
    def run_int8(x, w, s):
        x = (x + s.astype(jnp.int8)).astype(jnp.int8)

        def body(i, x):
            y = lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requantize: shift down and saturate back to int8 (elementwise,
            # negligible vs the 2n^3 matmul at n=4096)
            return jnp.clip(y // 1024, -127, 127).astype(jnp.int8)

        return lax.fori_loop(0, iters, body, x)

    rng = np.random.default_rng(0)

    for name, fn, dtype in (
        ("bf16", run_bf16, jnp.bfloat16),
        ("int8", run_int8, jnp.int8),
    ):
        w = jnp.asarray(rng.integers(-3, 4, (n, n)), dtype)
        x = jnp.asarray(rng.integers(-3, 4, (n, n)), dtype)  # resident
        np.asarray(fn(x, w, jnp.int32(99))[0, :8])
        best = np.inf
        for r in range(reps):
            t0 = time.perf_counter()
            # host transfer of a slice: the only reliable completion fence
            # on the tunneled runtime (block_until_ready returns early)
            np.asarray(fn(x, w, jnp.int32(r))[0, :8])
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(
                f"{name} rep{r}: {dt*1e3:.1f} ms -> {flops/dt/1e12:.1f} T{'OP' if name=='int8' else 'FLOP'}/s"
            )
        print(f"{name} best: {flops/best/1e12:.1f} Tops/s ({best/iters*1e3:.3f} ms/matmul)")


if __name__ == "__main__":
    main()
