"""Explicit collective wrappers on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_rs_tpu.parallel import make_mesh
from whisper_rs_tpu.parallel.collectives import (
    all_gather_model,
    all_to_all_model,
    ppermute_model,
    psum_model,
    shard_map_over,
    tp_row_parallel_matmul,
)


def test_tp_row_parallel_matmul():
    mesh = make_mesh(n_model=4, n_data=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    w = rng.standard_normal((16, 32)).astype(np.float32)

    w_sharded = jax.device_put(w, NamedSharding(mesh, P("model", None)))
    got = np.asarray(tp_row_parallel_matmul(mesh, jnp.asarray(x), w_sharded))
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)


def test_all_gather_and_psum():
    mesh = make_mesh(n_model=4, n_data=2)
    x = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 16)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "model")))

    def body(x_local):
        g = all_gather_model(x_local, axis=1)  # reassemble full row
        s = psum_model(jnp.sum(x_local))  # global sum
        return g, s

    g, s = shard_map_over(
        mesh, body, in_specs=(P(None, "model"),), out_specs=(P(None, "model"), P())
    )(xs)
    # after tiled all_gather each shard holds the full row; spec still
    # declares model sharding, so values must reassemble to 4x repetition
    assert g.shape == (2, 64)
    np.testing.assert_allclose(float(s), x.sum(), rtol=1e-6)


def test_all_to_all_roundtrip():
    mesh = make_mesh(n_model=4, n_data=2)
    x = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("model", None)))

    def body(x_local):
        y = all_to_all_model(x_local, split_axis=1, concat_axis=0)
        return all_to_all_model(y, split_axis=0, concat_axis=1)

    out = shard_map_over(
        mesh, body, in_specs=(P("model", None),), out_specs=P("model", None)
    )(xs)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_ppermute_ring():
    mesh = make_mesh(n_model=4, n_data=2)
    x = np.arange(4, dtype=np.float32).reshape(4, 1)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("model", None)))

    def body(x_local):
        n = 4
        perm = [(i, (i + 1) % n) for i in range(n)]
        return ppermute_model(x_local, perm)

    out = np.asarray(
        shard_map_over(
            mesh, body, in_specs=(P("model", None),), out_specs=P("model", None)
        )(xs)
    )
    # ring shift: shard i's value moved to shard i+1
    np.testing.assert_array_equal(out[:, 0], np.roll(x[:, 0], 1))
