"""Worker process for the two-process multi-host test (test_multihost.py).

Each process plays one "host": it bootstraps `initialize_multihost`
(jax.distributed over a localhost coordinator), ingests its OWN audio shard,
contributes it to a global data-parallel batch via
`make_array_from_process_local_data`, runs the jitted encoder forward over
the global ('data','model') mesh, and cross-checks a psum over hosts.
Process 0 additionally verifies the sharded result against a locally
computed single-process reference (it knows every host's seed).

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

coordinator, num_processes, process_id = (
    sys.argv[1],
    int(sys.argv[2]),
    int(sys.argv[3]),
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from whisper_rs_tpu.parallel.distributed import initialize_multihost  # noqa: E402

initialize_multihost(coordinator, num_processes, process_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from whisper_rs_tpu.config import ModelDims  # noqa: E402
from whisper_rs_tpu.models import encoder_forward, init_params  # noqa: E402
from whisper_rs_tpu.parallel import make_mesh  # noqa: E402

assert jax.process_count() == num_processes, jax.process_count()
assert len(jax.devices()) == 2 * num_processes, len(jax.devices())

DIMS = ModelDims(
    n_mels=80, n_vocab=1024, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)

# identical params on every host (same seed), like a broadcast checkpoint load
params = init_params(jax.random.PRNGKey(0), DIMS)

# per-host ingest: each host "loads" its own utterances
local = (
    np.random.default_rng(100 + process_id)
    .standard_normal((2, 80, 3000))
    .astype(np.float32)
    * 0.3
)

mesh = make_mesh(n_model=1)  # pure DP over all 2*num_processes devices
sharding = NamedSharding(mesh, P("data", None, None))
global_mel = jax.make_array_from_process_local_data(sharding, local)
assert global_mel.shape[0] == 2 * num_processes

fwd = jax.jit(lambda p, m: encoder_forward(p, m, DIMS))
out = fwd(params, global_mel)

# cross-host collective sanity: psum of per-host marker over the data axis
marker = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.full((2,), float(process_id + 1), np.float32),
)
total = jax.jit(lambda x: jnp.sum(x))(marker)
expect_total = sum(2.0 * (p + 1) for p in range(num_processes))
assert float(total) == expect_total, (float(total), expect_total)

# verify against the single-process reference (process 0 reconstructs the
# full global batch from every host's deterministic seed)
if process_id == 0:
    full = np.concatenate(
        [
            np.random.default_rng(100 + p)
            .standard_normal((2, 80, 3000))
            .astype(np.float32)
            * 0.3
            for p in range(num_processes)
        ]
    )
    ref = np.asarray(encoder_forward(params, jnp.asarray(full), DIMS))
    got_local = np.concatenate(
        [np.asarray(s.data) for s in out.addressable_shards]
    )
    np.testing.assert_allclose(got_local, ref[: got_local.shape[0]], rtol=1e-4, atol=1e-4)

print(f"OK {process_id}", flush=True)
