"""The communication layer's one manual collective (parallel/collectives.py)
on the fake 8-device mesh.  The r1 wrapper inventory (psum/all_gather/
ppermute/row-parallel-matmul helpers) was deleted in round 5 — GSPMD
provides those patterns on the annotated paths (see the module docstring);
only the Ulysses all_to_all has a manual call site."""

import jax
import pytest

if len(jax.devices()) < 8:
    pytest.skip(
        "needs the 8-device fake CPU mesh (single real chip run)",
        allow_module_level=True,
    )


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_rs_tpu.parallel import make_mesh
from whisper_rs_tpu.parallel.collectives import all_to_all_model


def test_all_to_all_roundtrip():
    mesh = make_mesh(n_model=4, n_data=2)
    x = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("model", None)))

    def body(x_local):
        y = all_to_all_model(x_local, split_axis=1, concat_axis=0)
        return all_to_all_model(y, split_axis=0, concat_axis=1)

    out = jax.shard_map(
        body, mesh=mesh, in_specs=(P("model", None),),
        out_specs=P("model", None),
    )(xs)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_all_to_all_head_seq_reshard():
    """The exact Ulysses exchange: [B, H, T/n, dh] -> [B, H/n, T, dh] and
    back, value-exact."""
    mesh = make_mesh(n_model=4, n_data=2)
    B, H, T, dh = 2, 8, 16, 3
    x = np.arange(B * H * T * dh, dtype=np.float32).reshape(B, H, T, dh)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, None, "model", None))
    )

    def body(x_local):  # [B, H, T/n, dh]
        y = all_to_all_model(x_local, split_axis=1, concat_axis=2)
        assert y.shape == (B, H // 4, T, dh)
        back = all_to_all_model(y, split_axis=2, concat_axis=1)
        assert back.shape == (B, H, T // 4, dh)
        return back

    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "model", None),),
        out_specs=P(None, None, "model", None),
    )(xs)
    np.testing.assert_array_equal(np.asarray(out), x)
