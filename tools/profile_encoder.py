"""Device-op-level ENCODER profile via jax.profiler.

Aggregates device-side op durations for N encoder forwards in one jit:
  python -m tools.profile_encoder [model] [batch] [top_n]
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
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.models.whisper import encoder_forward

REPS = 8


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "base.en"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    dims = dims_for(model)
    dtype = jnp.bfloat16

    params = init_params(jax.random.PRNGKey(0), dims, dtype=dtype)
    if "int8" in sys.argv[4:]:
        from whisper_rs_tpu.models.quantize import quantize_params

        params = quantize_params(params)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        (rng.standard_normal((B, dims.n_mels, 3000)) * 0.3).astype(np.float32)
    ).astype(dtype)

    @jax.jit
    def run(params, mel):
        def body(i, acc):
            feats = encoder_forward(
                params, mel + acc[None, None, None].astype(dtype) * 1e-6, dims
            )
            return acc + jnp.sum(feats[:, 0, 0].astype(jnp.float32))

        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(run(params, mel))  # warm up / compile
    tracedir = tempfile.mkdtemp(prefix="jaxtrace_")
    mel2 = mel * 1.001
    with jax.profiler.trace(tracedir):
        float(run(params, mel2))

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

    print(f"# encoder device op breakdown: {model} b{B}, {REPS} forwards "
          f"(total device {total/1000:.1f} ms, {total/1000/REPS:.2f} ms/forward)")
    print(f"{'op':<52}{'ms':>10}{'%':>7}{'count':>8}{'us/call':>9}")
    for name, dur in per_op.most_common(top_n):
        print(
            f"{name[:50]:<52}{dur/1000:>10.2f}{100*dur/total:>6.1f}%"
            f"{counts[name]:>8}{dur/counts[name]:>9.1f}"
        )


if __name__ == "__main__":
    main()
