"""Whole-decoder-step Pallas megakernel (ops/decoder_layer_fused.py) vs the
XLA scan path, interpret mode on CPU.

Uses dims with n_text_state=128 / head_dim=64 (the megakernel's shape gate
requires n % 128 == 0, the real-model head size) — small enough for CPU,
same geometry class as the production models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_rs_tpu.config import GreedyMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig, decode_greedy
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.models.whisper import (
    KVCache,
    decoder_forward,
    encoder_forward,
    precompute_cross_kv,
)

DIMS = ModelDims(
    n_mels=80, n_vocab=1000, n_audio_ctx=1500, n_audio_state=128,
    n_audio_head=2, n_audio_layer=2, n_text_ctx=448, n_text_state=128,
    n_text_head=2, n_text_layer=3,
)


def _setup(group: int, batch: int, prompt: int, seed: int = 0):
    params = init_params(jax.random.PRNGKey(seed), DIMS)
    rng = np.random.default_rng(seed)
    n_audio = batch // group
    mel = jnp.asarray(
        rng.standard_normal((n_audio, 80, 3000)).astype(np.float32) * 0.3
    )
    xa = encoder_forward(params, mel, DIMS)
    ckv = precompute_cross_kv(params, xa, DIMS)
    cache = KVCache.init(DIMS, batch, dtype=xa.dtype)
    toks = jnp.asarray(rng.integers(0, 900, (batch, prompt)), jnp.int32)
    _, cache = decoder_forward(
        params, toks, jnp.int32(0), ckv, cache, DIMS, cross_group=group
    )
    tok1 = jnp.asarray(rng.integers(0, 900, (batch, 1)), jnp.int32)
    return params, ckv, cache, tok1, rng


@pytest.mark.parametrize("group,window", [(1, 128), (2, None)])
def test_megakernel_step_matches_xla(group, window, monkeypatch):
    batch, prompt = 4, 5
    params, ckv, cache, tok1, _ = _setup(group, batch, prompt)
    ks = jnp.asarray([0, 1, 2, 0][:batch], jnp.int32)

    def step(fused: bool):
        # the megakernel contract: the caller flips K ctx-major (the
        # greedy decode loop does this once after prefill)
        c = cache._replace(k=cache.k.swapaxes(-1, -2)) if fused else cache
        return decoder_forward(
            params, tok1, jnp.int32(prompt), ckv, c, DIMS,
            key_start=ks, cross_group=group, ctx_window=window,
            k_ctx_major=fused,
        )

    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "0")
    ref, ref_cache = step(False)
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "layer")
    got, got_cache = step(True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # the fused path writes the same K/V column the scan path writes
    # (fused K comes back ctx-major)
    np.testing.assert_allclose(
        np.asarray(got_cache.k.swapaxes(-1, -2)), np.asarray(ref_cache.k),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_cache.v), np.asarray(ref_cache.v), rtol=1e-5, atol=1e-5
    )


def test_megakernel_no_keystart_matches_xla(monkeypatch):
    params, ckv, cache, tok1, _ = _setup(1, 2, 3)

    def step(fused: bool):
        c = cache._replace(k=cache.k.swapaxes(-1, -2)) if fused else cache
        return decoder_forward(
            params, tok1, jnp.int32(3), ckv, c, DIMS, cross_group=1,
            k_ctx_major=fused,
        )

    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "0")
    ref, _ = step(False)
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "layer")
    got, _ = step(True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_greedy_decode_with_megakernel(monkeypatch):
    """Whole jitted greedy window decode with the megakernel active matches
    the XLA path token for token (prefill stays on the scan path; every
    incremental step runs the fused kernel)."""
    cfg = FilterConfig(
        n_vocab=1000, token_id_eot=500, token_id_space=7,
        token_id_ts_begin=600, token_id_no_timestamps=599,
        suppress_blank=True, timestamps=True, suppress_ids=(3, 5),
        max_initial_timestamp_index=50,
    )
    params = init_params(jax.random.PRNGKey(42), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3)
    initial = jnp.asarray([[501]] * 2, jnp.int32)

    def run():
        return decode_greedy(
            params, mel, initial, jnp.int32(1), jnp.int32(0), DIMS, cfg,
            GreedyMode(), 8, no_speech_id=502,
        )

    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "0")
    ref = run()
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "layer")
    got = run()
    np.testing.assert_array_equal(
        np.asarray(got.candidates), np.asarray(ref.candidates)
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-4, atol=1e-4
    )
