"""int8 weight-only quantization: numeric closeness + full decode runs."""

import jax
import jax.numpy as jnp
import numpy as np

from whisper_rs_tpu.config import GreedyMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig, decode_greedy
from whisper_rs_tpu.models import encoder_forward, init_params, model_forward
from whisper_rs_tpu.models.quantize import quantize_params
from whisper_rs_tpu.models.whisper import linear

DIMS = ModelDims(80, 1000, 1500, 64, 4, 2, 448, 64, 4, 2)


def test_linear_dequant_epilogue():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 16)).astype(np.float32) * 0.3
    x = rng.standard_normal((4, 32)).astype(np.float32)
    from whisper_rs_tpu.models.quantize import _quantize_linear

    q = _quantize_linear({"w": jnp.asarray(w), "b": jnp.zeros(16)})
    assert q["w"].dtype == jnp.int8
    got = np.asarray(linear(jnp.asarray(x), q))
    np.testing.assert_allclose(got, x @ w, rtol=0.02, atol=0.02)


def test_linear_int8_act_matmul(monkeypatch):
    """WHISPER_INT8_MATMUL=1: the s8×s8→s32 path (dynamic per-row
    activation scales) tracks the float matmul and the weight-only path."""
    monkeypatch.setenv("WHISPER_INT8_MATMUL", "1")
    rng = np.random.default_rng(7)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.3
    b = rng.standard_normal(48).astype(np.float32) * 0.1
    x = rng.standard_normal((3, 5, 64)).astype(np.float32)
    from whisper_rs_tpu.models.quantize import _quantize_linear

    q = _quantize_linear({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    got = np.asarray(linear(jnp.asarray(x), q))
    want = x @ w + b
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)

    # row with extreme dynamic range: per-row scales keep small rows exact-ish
    x2 = x.copy()
    x2[0, 0] *= 100.0
    got2 = np.asarray(linear(jnp.asarray(x2), q))
    want2 = x2 @ w + b
    np.testing.assert_allclose(
        got2[1:], want2[1:], rtol=0.05, atol=0.05
    )  # other rows unaffected by row 0's range


def test_int8_matmul_encoder_close(monkeypatch):
    """Full encoder with int8×int8 matmuls vs the weight-only int8 path:
    activation quantization adds only per-row rounding noise."""
    params = init_params(jax.random.PRNGKey(3), DIMS)
    qparams = quantize_params(params)
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.3)

    w8 = np.asarray(encoder_forward(qparams, mel, DIMS))
    monkeypatch.setenv("WHISPER_INT8_MATMUL", "1")
    i8 = np.asarray(encoder_forward(qparams, mel, DIMS))
    denom = np.maximum(np.abs(w8).max(), 1e-3)
    assert np.abs(i8 - w8).max() / denom < 0.1


def test_int8_matmul_sharded_compose(monkeypatch):
    """int8×int8 matmuls compose with TP=2 sharding on the fake mesh:
    the quantize scales shard with their output channels and the sharded
    encoder matches the unsharded int8-act encoder."""
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs the 8-device fake mesh (single real chip)")
    from whisper_rs_tpu.parallel import batch_sharding, make_mesh, shard_params

    monkeypatch.setenv("WHISPER_INT8_MATMUL", "1")
    qparams = quantize_params(init_params(jax.random.PRNGKey(12), DIMS))
    rng = np.random.default_rng(13)
    mel = jnp.asarray(rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.3)

    single = np.asarray(encoder_forward(qparams, mel, DIMS))
    mesh = make_mesh(n_model=2)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, qparams)
        mel_s = jax.device_put(mel, batch_sharding(mesh, 3))
        sharded = np.asarray(
            jax.jit(lambda p, m: encoder_forward(p, m, DIMS))(sp, mel_s)
        )
    # not bit-exact: TP changes f32 summation order, and activations near
    # a rounding boundary flip a whole int8 step (~1/127) — so a small
    # fraction of elements moves by one quantization step while the rest
    # match tightly
    close = np.isclose(sharded, single, rtol=2e-4, atol=2e-4)
    assert close.mean() > 0.97, close.mean()
    np.testing.assert_allclose(sharded, single, rtol=0.05, atol=0.05)


def test_quantized_forward_close():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    qparams = quantize_params(params)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.3
    tokens = np.asarray([[501, 601, 17]], np.int32)

    ref = np.asarray(model_forward(params, jnp.asarray(mel), jnp.asarray(tokens), DIMS))
    got = np.asarray(model_forward(qparams, jnp.asarray(mel), jnp.asarray(tokens), DIMS))
    # int8 weights: logits track within a few percent of the f32 model
    denom = np.maximum(np.abs(ref).max(), 1e-3)
    assert np.abs(got - ref).max() / denom < 0.15
    # top-1 argmax agreement on most positions
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 2 / 3


def test_quantized_decode_runs():
    params = quantize_params(init_params(jax.random.PRNGKey(0), DIMS))
    cfg = FilterConfig(
        n_vocab=1000,
        token_id_eot=500,
        token_id_space=7,
        token_id_ts_begin=600,
        token_id_no_timestamps=599,
    )
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3
    initial = np.asarray([[501]] * 2, np.int32)
    out = decode_greedy(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1),
        jnp.int32(0), DIMS, cfg, GreedyMode(), 6, no_speech_id=502,
    )
    c = np.asarray(out.candidates)
    assert c.shape == (2, 1, 448)
    assert (c[:, 0, 1] >= 600).all()  # forced initial timestamp still applies


def test_quantized_cross_kv_close():
    """int8 KV (cross + self): decode output tracks the fp path closely."""
    params = init_params(jax.random.PRNGKey(4), DIMS)
    cfg = FilterConfig(
        n_vocab=1000,
        token_id_eot=500,
        token_id_space=7,
        token_id_ts_begin=600,
        token_id_no_timestamps=599,
    )
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3
    initial = np.asarray([[501]] * 2, np.int32)

    ref = decode_greedy(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1),
        jnp.int32(0), DIMS, cfg, GreedyMode(), 6, no_speech_id=502,
    )
    q = decode_greedy(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1),
        jnp.int32(0), DIMS, cfg, GreedyMode(), 6, no_speech_id=502,
        quantize_kv=True,
    )
    # scores close; token trajectories may diverge after rounding but the
    # first (forced-timestamp) token and EOT termination invariants hold
    c = np.asarray(q.candidates)
    assert (c[:, 0, 1] >= 600).all()
    np.testing.assert_allclose(
        np.asarray(q.scores), np.asarray(ref.scores), rtol=0.3, atol=1.0
    )


def test_quantize_kv_roundtrip_error():
    from whisper_rs_tpu.models.whisper import _quantize_kv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 4, 100, 64)).astype(np.float32))
    q, s = _quantize_kv(x)
    assert q.dtype == jnp.int8
    recon = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(recon - np.asarray(x)) / np.abs(np.asarray(x)).max()
    assert err.max() < 0.01  # int8 per-position: <1% of range


def test_quantized_sharded_compose():
    """int8 weights + int8 KV + TP=2/DP=4 sharding compose: decode runs on
    the fake mesh and matches the unsharded quantized decode exactly."""
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs the 8-device fake mesh (single real chip)")
    from whisper_rs_tpu.parallel import batch_sharding, make_mesh, shard_params

    params = quantize_params(init_params(jax.random.PRNGKey(8), DIMS))
    cfg = FilterConfig(
        n_vocab=1000,
        token_id_eot=500,
        token_id_space=7,
        token_id_ts_begin=600,
        token_id_no_timestamps=599,
    )
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.3
    initial = np.asarray([[501]] * 4, np.int32)

    def run(p, m, t):
        return decode_greedy(
            p, m, t, jnp.int32(1), jnp.int32(0), DIMS, cfg, GreedyMode(), 5,
            no_speech_id=502, quantize_kv=True,
        )

    single = run(params, jnp.asarray(mel), jnp.asarray(initial))

    mesh = make_mesh(n_model=2)
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        mel_s = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 3))
        init_s = jax.device_put(jnp.asarray(initial), batch_sharding(mesh, 2))
        sharded = jax.jit(run)(sp, mel_s, init_s)

    np.testing.assert_array_equal(
        np.asarray(sharded.candidates), np.asarray(single.candidates)
    )
