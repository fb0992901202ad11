"""Activation parity: JAX model vs torch oracle at f32, plus
incremental-decode == full-prefill consistency (the KV-cache contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_rs_tpu.config import ModelDims
from whisper_rs_tpu.models import (
    KVCache,
    decoder_forward,
    encoder_forward,
    init_params,
    params_from_state_dict,
    precompute_cross_kv,
)

TINY = ModelDims(
    n_mels=80,
    n_vocab=1000,
    n_audio_ctx=1500,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_text_ctx=448,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def oracle_setup():
    torch = pytest.importorskip("torch")
    from torch_oracle import make_random_state_dict

    sd = make_random_state_dict(TINY, seed=0)
    params = params_from_state_dict({k: v.numpy() for k, v in sd.items()}, TINY)
    return sd, params


def test_encoder_parity(oracle_setup):
    import torch
    import torch_oracle

    sd, params = oracle_setup
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)

    ours = np.asarray(encoder_forward(params, jnp.asarray(mel), TINY))
    theirs = torch_oracle.encoder_forward(sd, torch.from_numpy(mel), TINY).numpy()

    assert ours.shape == theirs.shape == (2, 1500, 64)
    # f32 accumulation-order differences (XLA vs torch); abs error ~1e-4
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=5e-4)


def test_decoder_parity_full_prompt(oracle_setup):
    import torch
    import torch_oracle

    sd, params = oracle_setup
    rng = np.random.default_rng(1)
    xa = rng.standard_normal((2, 1500, 64)).astype(np.float32)
    tokens = rng.integers(0, 1000, (2, 7)).astype(np.int64)

    cross_kv = precompute_cross_kv(params, jnp.asarray(xa), TINY)
    cache = KVCache.init(TINY, 2)
    ours, _ = decoder_forward(
        params, jnp.asarray(tokens, jnp.int32), jnp.int32(0), cross_kv, cache, TINY
    )
    theirs = torch_oracle.decoder_forward(
        sd, torch.from_numpy(tokens), torch.from_numpy(xa), TINY
    ).numpy()

    assert np.asarray(ours).shape == theirs.shape == (2, 7, 1000)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_incremental_matches_prefill(oracle_setup):
    """Token-by-token decode through the static KV cache must reproduce the
    full-prompt forward logits (the Cached-concat semantics of model.rs:77-98
    re-expressed with dynamic_update_slice)."""
    _, params = oracle_setup
    rng = np.random.default_rng(2)
    xa = rng.standard_normal((1, 1500, 64)).astype(np.float32)
    tokens = rng.integers(0, 1000, (1, 6)).astype(np.int32)

    cross_kv = precompute_cross_kv(params, jnp.asarray(xa), TINY)

    # full prefill
    full_logits, _ = decoder_forward(
        params, jnp.asarray(tokens), jnp.int32(0), cross_kv, KVCache.init(TINY, 1), TINY
    )

    # incremental, one token at a time
    cache = KVCache.init(TINY, 1)
    inc_logits = []
    for t in range(6):
        lg, cache = decoder_forward(
            params,
            jnp.asarray(tokens[:, t : t + 1]),
            jnp.int32(t),
            cross_kv,
            cache,
            TINY,
        )
        inc_logits.append(np.asarray(lg)[:, 0])
    inc_logits = np.stack(inc_logits, axis=1)

    np.testing.assert_allclose(
        np.asarray(full_logits), inc_logits, rtol=1e-4, atol=1e-4
    )


def test_prefill_then_steps_matches_full():
    """Prefill a 3-token prompt then step 3 more tokens: logits at every
    position must match a single 6-token prefill."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(3)
    xa = rng.standard_normal((1, 1500, 64)).astype(np.float32)
    tokens = rng.integers(0, 1000, (1, 6)).astype(np.int32)

    cross_kv = precompute_cross_kv(params, jnp.asarray(xa), TINY)

    full_logits, _ = decoder_forward(
        params, jnp.asarray(tokens), jnp.int32(0), cross_kv, KVCache.init(TINY, 1), TINY
    )

    cache = KVCache.init(TINY, 1)
    pre_logits, cache = decoder_forward(
        params, jnp.asarray(tokens[:, :3]), jnp.int32(0), cross_kv, cache, TINY
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits)[:, :3], rtol=1e-4, atol=1e-4
    )
    for t in range(3, 6):
        lg, cache = decoder_forward(
            params,
            jnp.asarray(tokens[:, t : t + 1]),
            jnp.int32(t),
            cross_kv,
            cache,
            TINY,
        )
        np.testing.assert_allclose(
            np.asarray(lg)[:, 0],
            np.asarray(full_logits)[:, t],
            rtol=1e-4,
            atol=1e-4,
        )


def test_cache_reorder():
    """KV reorder (beam permutation) gathers batch rows — model.rs:53-62."""
    cache = KVCache(
        k=jnp.arange(2 * 3 * 1 * 4 * 2, dtype=jnp.float32).reshape(2, 3, 1, 4, 2),
        v=jnp.zeros((2, 3, 1, 4, 2)),
    )
    out = cache.reorder(jnp.asarray([2, 0, 0]))
    np.testing.assert_array_equal(
        np.asarray(out.k[:, 0]), np.asarray(cache.k[:, 2])
    )
    np.testing.assert_array_equal(
        np.asarray(out.k[:, 1]), np.asarray(cache.k[:, 0])
    )


def test_encoder_attention_n_valid_masks_pad_tail():
    """The pre-padded encoder path (encoder_forward pads once to the flash
    kernel's 128-multiple and passes n_valid) must equal unpadded attention
    on the real rows.  Off-TPU this exercises the einsum fallback's key
    masking; the flash segment-id variant is hardware-parity-checked."""
    import numpy as np

    from whisper_rs_tpu.ops.encoder_attention import encoder_attention

    rng = np.random.default_rng(0)
    B, H, T, dh, pad = 2, 4, 100, 16, 28
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, dh)), jnp.float32) * 0.3
        for _ in range(3)
    )
    want = np.asarray(encoder_attention(q, k, v, dh**-0.5))

    zp = jnp.zeros((B, H, pad, dh), jnp.float32)
    qp, kp, vp = (jnp.concatenate([t, zp], axis=2) for t in (q, k, v))
    got = np.asarray(
        encoder_attention(qp, kp, vp, dh**-0.5, n_valid=T)[:, :, :T]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
