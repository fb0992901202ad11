"""Fused Pallas decode-step attention kernels vs the XLA reference path.

Runs the kernels in interpreter mode on CPU (same harness as the mel
kernel tests): raw-kernel math vs a NumPy oracle, then the integrated
decoder_forward step (WHISPER_PALLAS_DECODE=interpret) vs the XLA path,
bf16/f32 and int8-K/V variants, and a full greedy decode loop.
"""

import os

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
from whisper_rs_tpu.ops.decode_attention import (
    cross_attention_step,
    self_attention_step,
)

DIMS = ModelDims(
    n_mels=80, n_vocab=1000, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


def test_self_attention_kernel_oracle():
    rng = np.random.default_rng(0)
    L, B, H, W, dh = 3, 4, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, B, H, W, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, B, H, W, dh)).astype(np.float32))
    pos, lyr = 10, 1
    ks = np.asarray([0, 2, 0, 5], np.int32)

    got = np.asarray(
        self_attention_step(
            # K cache is stored pre-transposed [L, B, H, dh, W] (KVCache)
            q, k.swapaxes(-1, -2), v, jnp.int32(lyr), jnp.int32(pos),
            jnp.asarray(ks), window=W, interpret=True,
        )
    )

    ids = np.arange(W)
    for b in range(B):
        vis = (ids <= pos) & (ids >= ks[b])
        for h in range(H):
            qk = np.asarray(q[b, h]) @ np.asarray(k[lyr, b, h]).T
            qk = np.where(vis, qk, -1e9)
            e = np.exp(qk - qk.max())
            w = e / e.sum()
            np.testing.assert_allclose(
                got[b, h], w @ np.asarray(v[lyr, b, h]), rtol=1e-5, atol=1e-5
            )


def test_self_attention_fused_kernel_oracle():
    """Ctx-major fused-self kernel (both planes in V's layout) vs a NumPy
    oracle — the r4 greedy-step kernel whose cache column writes stay
    in-place sublane writes."""
    from whisper_rs_tpu.ops.decode_attention import self_attention_fused_step

    rng = np.random.default_rng(3)
    L, B, H, W, dh = 3, 4, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, B, H, W, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, B, H, W, dh)).astype(np.float32))
    pos, lyr = 10, 2
    ks = np.asarray([0, 2, 0, 5], np.int32)

    got = np.asarray(
        self_attention_fused_step(
            q, k, v, jnp.int32(lyr), jnp.int32(pos), jnp.asarray(ks),
            window=W, interpret=True,
        )
    )
    ids = np.arange(W)
    for b in range(B):
        vis = (ids <= pos) & (ids >= ks[b])
        for h in range(H):
            qk = np.asarray(q[b, h]) @ np.asarray(k[lyr, b, h]).T
            qk = np.where(vis, qk, -1e9)
            e = np.exp(qk - qk.max())
            w = e / e.sum()
            np.testing.assert_allclose(
                got[b, h], w @ np.asarray(v[lyr, b, h]), rtol=1e-5, atol=1e-5
            )


import pytest as _pytest


def test_self_attention_append_kernel_oracle():
    """self_attention_append_step (r5, VERDICT r4 #2): in-kernel column
    write + transposed-plane reads + fresh-column contribution must equal
    write-then-attend reference math, and both cache planes must come back
    with the new column written."""
    from whisper_rs_tpu.ops.decode_attention import self_attention_append_step

    rng = np.random.default_rng(0)
    L, B, H, dh, ctx = 3, 4, 8, 64, 512  # lane-padded planes (append_ctx_pad)
    p, W, lyr = 130, 256, 1
    ks = np.array([0, 3, 5, 0], np.int32)

    k_all = rng.standard_normal((L, B, H, dh, ctx)).astype(np.float32) * 0.3
    v_all = rng.standard_normal((L, B, H, dh, ctx)).astype(np.float32) * 0.3
    q = rng.standard_normal((B, H, dh)).astype(np.float32) * 0.3
    k_new = rng.standard_normal((B, H, dh)).astype(np.float32) * 0.3
    v_new = rng.standard_normal((B, H, dh)).astype(np.float32) * 0.3

    out, k_out, v_out = self_attention_append_step(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_all), jnp.asarray(v_all),
        jnp.int32(lyr), jnp.int32(p), jnp.asarray(ks),
        window=W, interpret=True,
    )
    out, k_out, v_out = map(np.asarray, (out, k_out, v_out))

    k_ref = k_all.copy(); v_ref = v_all.copy()
    k_ref[lyr, :, :, :, p] = k_new
    v_ref[lyr, :, :, :, p] = v_new
    ids = np.arange(ctx)
    for b in range(B):
        vis = (ids <= p) & (ids >= ks[b])
        for h in range(H):
            qk = np.where(vis, q[b, h] @ k_ref[lyr, b, h], -1e9)
            w = np.exp(qk - qk.max()); w /= w.sum()
            np.testing.assert_allclose(
                out[b, h], v_ref[lyr, b, h] @ w, rtol=1e-5, atol=1e-5
            )
    np.testing.assert_array_equal(k_out, k_ref)
    np.testing.assert_array_equal(v_out, v_ref)


def test_self_attention_append_kernel_single_row():
    """B=1 edge of the cross-program double buffering: program 0 is both
    the pipeline head (self-issues its reads) and the drain program (must
    await only its own slot's write-backs — the B>=2 neighbour drain is
    gated off).  Also pins p on a 128-block boundary (write-back block
    starts exactly at p)."""
    from whisper_rs_tpu.ops.decode_attention import self_attention_append_step

    rng = np.random.default_rng(1)
    L, B, H, dh, ctx = 2, 1, 4, 64, 256
    p, W, lyr = 128, 256, 0  # p % 128 == 0: aligned write-back block

    k_all = rng.standard_normal((L, B, H, dh, ctx)).astype(np.float32) * 0.3
    v_all = rng.standard_normal((L, B, H, dh, ctx)).astype(np.float32) * 0.3
    q = rng.standard_normal((B, H, dh)).astype(np.float32) * 0.3
    k_new = rng.standard_normal((B, H, dh)).astype(np.float32) * 0.3
    v_new = rng.standard_normal((B, H, dh)).astype(np.float32) * 0.3

    out, k_out, v_out = self_attention_append_step(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_all), jnp.asarray(v_all),
        jnp.int32(lyr), jnp.int32(p), None,
        window=W, interpret=True,
    )
    out, k_out, v_out = map(np.asarray, (out, k_out, v_out))

    k_ref = k_all.copy(); v_ref = v_all.copy()
    k_ref[lyr, :, :, :, p] = k_new
    v_ref[lyr, :, :, :, p] = v_new
    vis = np.arange(ctx) <= p
    for h in range(H):
        qk = np.where(vis, q[0, h] @ k_ref[lyr, 0, h], -1e9)
        w = np.exp(qk - qk.max()); w /= w.sum()
        np.testing.assert_allclose(
            out[0, h], v_ref[lyr, 0, h] @ w, rtol=1e-5, atol=1e-5
        )
    np.testing.assert_array_equal(k_out, k_ref)
    np.testing.assert_array_equal(v_out, v_ref)


@_pytest.mark.parametrize("mode", ["interpret", "append-interpret"])
def test_greedy_decode_fused_self_exact(monkeypatch, mode):
    """Full greedy decode with the fused self-attention kernels (ctx-major
    r4 kernel and the r5 in-kernel-append kernel) produces bit-identical
    tokens to the XLA path — prompted rows (key_start) included."""
    params = init_params(jax.random.PRNGKey(0), DIMS)
    cfg = FilterConfig(
        n_vocab=1000, token_id_eot=500, token_id_space=7,
        token_id_ts_begin=600, token_id_no_timestamps=599,
    )
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3)
    # end-aligned per-row prompts: row 0 unprompted (key_start 2), row 1
    # prompted
    initial = jnp.asarray([[0, 0, 501], [503, 9, 501]], np.int32)
    key_start = jnp.asarray([2, 0], np.int32)

    def run():
        return np.asarray(
            decode_greedy(
                params, mel, initial, jnp.int32(3), jnp.int32(2), DIMS, cfg,
                GreedyMode(), 8, no_speech_id=502,
                key_start=key_start,
            ).candidates
        )

    monkeypatch.setenv("WHISPER_FUSED_SELF", "0")
    ref = run()
    monkeypatch.setenv("WHISPER_FUSED_SELF", mode)
    got = run()
    np.testing.assert_array_equal(got, ref)


def test_cross_attention_kernel_oracle_int8():
    rng = np.random.default_rng(1)
    L, A, G, H, Tk, dh = 2, 2, 3, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((A, G, H, dh)).astype(np.float32))
    kf = rng.standard_normal((L, A, H, Tk, dh)).astype(np.float32)
    vf = rng.standard_normal((L, A, H, Tk, dh)).astype(np.float32)

    def quant(x):
        amax = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 1e-8)
        s = (amax / 127.0).astype(np.float32)
        return np.clip(np.round(x / s), -127, 127).astype(np.int8), s

    kq, kqs = quant(kf)
    vq, vqs = quant(vf)
    lyr = 1
    # fused CrossKV layout: [L, A, H, 2, dh, Tk], K and V both transposed
    kv = jnp.stack(
        [jnp.asarray(kq).swapaxes(-1, -2), jnp.asarray(vq).swapaxes(-1, -2)],
        axis=3,
    )
    got = np.asarray(
        cross_attention_step(
            q, kv, jnp.int32(lyr),
            k_scale=jnp.asarray(kqs), v_scale=jnp.asarray(vqs), interpret=True,
        )
    )
    for a in range(A):
        for g in range(G):
            for h in range(H):
                qk = (
                    np.asarray(q[a, g, h]) @ kq[lyr, a, h].astype(np.float32).T
                ) * kqs[lyr, a, h, :, 0]
                e = np.exp(qk - qk.max())
                w = e / e.sum()
                ref = (w * vqs[lyr, a, h, :, 0]) @ vq[lyr, a, h].astype(np.float32)
                np.testing.assert_allclose(got[a, g, h], ref, rtol=1e-4, atol=1e-4)


@pytest.fixture()
def pallas_interpret_env(monkeypatch):
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "interpret")


@pytest.mark.parametrize("quant", [False, True])
def test_decoder_step_matches_xla(quant, monkeypatch):
    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.3)
    xa = encoder_forward(params, mel, DIMS)

    ckv = precompute_cross_kv(params, xa, DIMS, quantize=quant)
    cache = KVCache.init(DIMS, 8, dtype=xa.dtype, quantize=quant)
    toks = jnp.asarray(rng.integers(0, 900, (8, 5)), jnp.int32)
    _, cache = decoder_forward(
        params, toks, jnp.int32(0), ckv, cache, DIMS, cross_group=2
    )
    tok1 = jnp.asarray(rng.integers(0, 900, (8, 1)), jnp.int32)
    ks = jnp.asarray([0, 0, 1, 1, 2, 2, 0, 0], jnp.int32)

    def step():
        return decoder_forward(
            params, tok1, jnp.int32(5), ckv, cache, DIMS,
            key_start=ks, cross_group=2, ctx_window=128,
        )

    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "0")
    ref, ref_cache = step()
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "interpret")
    got, got_cache = step()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_cache.k), np.asarray(ref_cache.k), rtol=1e-6, atol=1e-6
    )


def test_greedy_decode_with_pallas_kernels(monkeypatch):
    """Whole jitted greedy window decode with the kernels active matches the
    XLA path token for token."""
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
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "interpret")
    got = run()
    np.testing.assert_array_equal(
        np.asarray(got.candidates), np.asarray(ref.candidates)
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("quant", [False, True])
def test_beam_decode_ancestor_kernel_matches_reorder(quant, monkeypatch):
    """Full beam decode with the ancestor-resolving Pallas kernel (interpret
    mode) matches the physical-reorder XLA path candidate-for-candidate —
    bf16 and int8-KV (whole-H per-position scale blocks) variants."""
    from whisper_rs_tpu.config import BeamSearchMode
    from whisper_rs_tpu.decode import decode_beam

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
        return decode_beam(
            params, mel, initial, jnp.int32(1), jnp.int32(0), DIMS, cfg,
            BeamSearchMode(beam_size=3), 10, no_speech_id=502,
            quantize_kv=quant,
        )

    monkeypatch.setenv("WHISPER_BEAM_ANCESTOR", "0")
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "0")
    ref = run()
    monkeypatch.setenv("WHISPER_BEAM_ANCESTOR", "1")
    monkeypatch.setenv("WHISPER_PALLAS_DECODE", "interpret")
    got = run()
    np.testing.assert_array_equal(
        np.asarray(got.candidates), np.asarray(ref.candidates)
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-4, atol=1e-4
    )
