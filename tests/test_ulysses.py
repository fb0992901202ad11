"""Ulysses sequence-parallel encoder (parallel/ulysses.py) on the fake
8-device mesh: exact-match vs the single-device encoder, composition with
DP, the Pallas-kernel (interpret) path inside the shard, end-to-end greedy
decode through the ``encoder_fn`` seam, and the divisibility guard.
Covers VERDICT r4 #6 — the SURVEY §2.3 SP/CP candidate as a real opt-in
path."""

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
import pytest

from whisper_rs_tpu.config import GreedyMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig
from whisper_rs_tpu.models import encoder_forward, init_params
from whisper_rs_tpu.parallel import batch_sharding, make_mesh, shard_params
from whisper_rs_tpu.parallel.ulysses import (
    encoder_forward_ulysses,
    ulysses_encoder_fn,
)

DIMS = ModelDims(
    n_mels=80, n_vocab=1000, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=4, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8
    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((8, 80, 3000)).astype(np.float32) * 0.3)
    return params, mel


@pytest.mark.parametrize("n_model,n_data", [(2, 4), (4, 2)])
def test_ulysses_matches_single_device(setup, n_model, n_data):
    params, mel = setup
    expect = np.asarray(encoder_forward(params, mel, DIMS))
    mesh = make_mesh(n_model=n_model, n_data=n_data)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(mel, batch_sharding(mesh, 3))
        got = np.asarray(encoder_forward_ulysses(sp, mel_s, DIMS, mesh))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_ulysses_kernel_path_interpret(setup):
    """The attention inside the Ulysses shard routes through the same
    encoder_attention dispatcher as the single-device path; interpret mode
    exercises the Pallas kernel inside the shard_map on the CPU mesh."""
    import os

    params, mel = setup
    old = os.environ.get("WHISPER_PALLAS_ENCODER")
    try:
        os.environ["WHISPER_PALLAS_ENCODER"] = "0"
        want = np.asarray(encoder_forward(params, mel, DIMS))
        os.environ["WHISPER_PALLAS_ENCODER"] = "interpret"
        mesh = make_mesh(n_model=2, n_data=4)
        with jax.set_mesh(mesh):
            got = np.asarray(encoder_forward_ulysses(params, mel, DIMS, mesh))
    finally:
        if old is None:
            os.environ.pop("WHISPER_PALLAS_ENCODER", None)
        else:
            os.environ["WHISPER_PALLAS_ENCODER"] = old
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ulysses_e2e_greedy_exact_match(setup):
    """Full greedy decode with the Ulysses encoder injected through the
    encoder_fn seam must produce token-for-token the single-device
    decode."""
    from whisper_rs_tpu.decode import decode_greedy

    params, mel = setup
    cfg = FilterConfig(
        n_vocab=1000, token_id_eot=500, token_id_space=7,
        token_id_ts_begin=600, token_id_no_timestamps=599,
    )
    mode = GreedyMode()
    initial = jnp.asarray([[501]] * mel.shape[0], jnp.int32)

    def run(encoder_fn, p, m, t):
        return decode_greedy(
            p, m, t, jnp.int32(1), jnp.int32(0), DIMS, cfg, mode,
            sample_len=8, no_speech_id=502, encoder_fn=encoder_fn,
        )

    want = run(None, params, mel, initial)
    mesh = make_mesh(n_model=2, n_data=4)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(mel, batch_sharding(mesh, 3))
        init_s = jax.device_put(initial, batch_sharding(mesh, 2))
        got = jax.jit(
            lambda p, m, t: run(ulysses_encoder_fn(mesh), p, m, t)
        )(sp, mel_s, init_s)
    np.testing.assert_array_equal(
        np.asarray(got.candidates), np.asarray(want.candidates)
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=1e-4, atol=1e-4
    )


def test_ulysses_rejects_indivisible_heads(setup):
    params, mel = setup
    mesh = make_mesh(n_model=8, n_data=1)  # 4 heads % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        with jax.set_mesh(mesh):
            encoder_forward_ulysses(params, mel, DIMS, mesh)
