"""Fake-mesh distributed tests (8 virtual CPU devices via conftest).

Verifies: TP param shardings apply and the sharded forward matches the
single-device forward; DP+TP full decode runs under a 4x2 mesh; the beam
KV reorder stays correct when batch is sharded."""

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
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_rs_tpu.config import BeamSearchMode, GreedyMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig, decode_beam, decode_greedy
from whisper_rs_tpu.models import encoder_forward, init_params, model_forward
from whisper_rs_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)

DIMS = ModelDims(
    n_mels=80,
    n_vocab=1024,
    n_audio_ctx=1500,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_text_ctx=448,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)

CFG = FilterConfig(
    n_vocab=1024,
    token_id_eot=500,
    token_id_space=7,
    token_id_ts_begin=600,
    token_id_no_timestamps=599,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.3
    return params, mel


def test_tp_param_shardings_structure(setup):
    params, _ = setup
    mesh = make_mesh(n_model=2)
    shardings = param_shardings(mesh, params)
    blk = shardings["decoder"]["blocks"]
    # stacked leaves: leading L axis unsharded
    assert blk["attn"]["query"]["w"].spec == P(None, None, "model")
    assert blk["attn"]["out"]["w"].spec == P(None, "model", None)
    assert blk["mlp"]["fc1"]["w"].spec == P(None, None, "model")
    assert blk["mlp"]["fc2"]["w"].spec == P(None, "model", None)
    assert blk["attn_ln"]["scale"].spec == P(None, None)
    # vocab-row sharded tied embedding + split conv stem (round-2: VERDICT #6)
    assert shardings["decoder"]["token_emb"].spec == P("model", None)
    assert shardings["decoder"]["pos_emb"].spec == P(None, None)
    assert shardings["encoder"]["conv1"]["w"].spec == P("model", None, None)
    assert shardings["encoder"]["conv1"]["b"].spec == P("model")
    assert shardings["encoder"]["conv2"]["w"].spec == P(None, "model", None)
    assert shardings["encoder"]["conv2"]["b"].spec == P(None)


def test_tp_vocab_sharding_cuts_per_chip_bytes(setup):
    """The embedding table is physically split: each chip holds V/mp rows."""
    params, _ = setup
    mesh = make_mesh(n_model=2)
    sp = shard_params(mesh, params)
    emb = sp["decoder"]["token_emb"]
    full = emb.nbytes
    shard = emb.addressable_shards[0].data.nbytes
    assert shard <= full // 2 + emb.shape[1] * emb.dtype.itemsize  # pad slack
    c1 = sp["encoder"]["conv1"]["w"]
    assert c1.addressable_shards[0].data.shape[0] == c1.shape[0] // 2


def test_tp_forward_matches_single_device(setup):
    params, mel = setup
    tokens = np.asarray([[501, 601, 17, 23]] * 4, np.int32)

    expect = np.asarray(model_forward(params, jnp.asarray(mel), jnp.asarray(tokens), DIMS))

    mesh = make_mesh(n_model=2)  # 4 data x 2 model
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 3))
        tok_s = jax.device_put(jnp.asarray(tokens), batch_sharding(mesh, 2))
        got = np.asarray(
            jax.jit(lambda p, m, t: model_forward(p, m, t, DIMS))(sp, mel_s, tok_s)
        )
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_dp_tp_greedy_decode(setup):
    params, mel = setup
    initial = np.asarray([[501]] * 4, np.int32)

    single = decode_greedy(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1), jnp.int32(0),
        DIMS, CFG, GreedyMode(), 6, no_speech_id=502,
    )

    mesh = make_mesh(n_model=2)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 3))
        init_s = jax.device_put(jnp.asarray(initial), batch_sharding(mesh, 2))

        fn = jax.jit(
            lambda p, m, t: decode_greedy(
                p, m, t, jnp.int32(1), jnp.int32(0), DIMS, CFG, GreedyMode(), 6,
                no_speech_id=502,
            )
        )
        sharded = fn(sp, mel_s, init_s)

    np.testing.assert_array_equal(
        np.asarray(sharded.candidates), np.asarray(single.candidates)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), rtol=1e-3, atol=1e-3
    )


def test_dp_tp_beam_decode(setup):
    """Beam search under DP+TP: the KV reorder gather must stay batch-local
    and produce identical candidates to single-device."""
    params, mel = setup
    initial = np.asarray([[501]] * 4, np.int32)
    mode = BeamSearchMode(beam_size=2, patience=1.0)

    single = decode_beam(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1), jnp.int32(0),
        DIMS, CFG, mode, 5, no_speech_id=502,
    )

    mesh = make_mesh(n_model=2)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 3))
        init_s = jax.device_put(jnp.asarray(initial), batch_sharding(mesh, 2))
        fn = jax.jit(
            lambda p, m, t: decode_beam(
                p, m, t, jnp.int32(1), jnp.int32(0), DIMS, CFG, mode, 5,
                no_speech_id=502,
            )
        )
        sharded = fn(sp, mel_s, init_s)

    np.testing.assert_array_equal(
        np.asarray(sharded.candidates), np.asarray(single.candidates)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.scores), np.asarray(single.scores), rtol=1e-3, atol=1e-3
    )


def test_encoder_dp_only(setup):
    params, mel = setup
    mesh = make_mesh(n_model=1)  # pure DP over 8
    mel8 = np.concatenate([mel, mel], axis=0)
    expect = np.asarray(encoder_forward(params, jnp.asarray(mel8), DIMS))
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(jnp.asarray(mel8), batch_sharding(mesh, 3))
        got = np.asarray(jax.jit(lambda p, m: encoder_forward(p, m, DIMS))(sp, mel_s))
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_sharded_batch_transcriber_e2e(setup):
    """Config #4 wiring: TP-sharded params + DP batch driver running the full
    chunked, prompt-conditioned transcription on the fake mesh."""
    from whisper_rs_tpu.config import (
        DecodeOptions,
        GreedyMode,
        TranscribeOptions,
    )
    from whisper_rs_tpu.parallel.batch import BatchTranscriber

    class SmallTok:
        token_id_sot = 501
        token_id_eot = 500
        token_id_no_speech = 502
        token_id_startofprev = 503
        token_id_no_timestamps = 599
        token_id_ts_begin = 600
        token_id_space = 7

        def decode(self, toks):
            return "".join(f"<{int(t)}>" for t in toks if int(t) < 500)

        def sequence_sot(self):
            return [self.token_id_sot]

        def non_speech_tokens(self):
            return (3, 5)

    params, _ = setup
    opts = TranscribeOptions(
        decode=DecodeOptions(mode=GreedyMode(), sample_len=6),
        condition_on_prev_text=True,
    )
    rng = np.random.default_rng(11)
    audios = [
        (rng.standard_normal(16000 * 35) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 * 20) * 0.1).astype(np.float32),
    ]

    # unsharded baseline
    base = BatchTranscriber(params, DIMS, SmallTok(), opts, batch_size=2)
    want = base.run(audios)

    # TP=2 x DP=4 mesh, sharded params
    mesh = make_mesh(n_model=2)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        sharded = BatchTranscriber(sp, DIMS, SmallTok(), opts, batch_size=2)
        got = sharded.run(audios)

    for w, g in zip(want, got):
        assert w.text == g.text
        np.testing.assert_array_equal(w.tokens, g.tokens)
