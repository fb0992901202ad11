"""Custom encoder Pallas kernels (interpret mode on CPU):

  * single-pass attention kernel vs the einsum reference, with and
    without a padded key tail;
  * fused residual+LN / LN kernels vs models.whisper.layer_norm;
  * full encoder_forward with WHISPER_PALLAS_ENCODER=interpret vs the
    default XLA path (end-to-end routing check).

Hardware compilation is covered by the WHISPER_TPU_TESTS=1 suite (the
Mosaic bf16 bug history proves interpret-only coverage is insufficient —
ROADMAP r2); these tests pin the math.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_rs_tpu.ops.encoder_attention_pallas import encoder_attention_pallas
from whisper_rs_tpu.ops.encoder_fused import ln_fused, residual_ln


def _ref_attention(q, k, v, scale, n_valid=None):
    qk = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    if n_valid is not None and n_valid < q.shape[2]:
        mask = jnp.where(jnp.arange(q.shape[2]) >= n_valid, -jnp.inf, 0.0)
        qk = qk + mask[None, None, None, :]
    w = jax.nn.softmax(qk, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("n_valid", [None, 250])
def test_attention_kernel_matches_einsum(n_valid):
    B, H, T, dh = 2, 3, 256, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, dh)), jnp.float32) * 0.5
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)), jnp.float32) * 0.5
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)), jnp.float32) * 0.5
    scale = dh**-0.5
    want = np.asarray(_ref_attention(q, k, v, scale, n_valid))
    got = np.asarray(
        encoder_attention_pallas(
            q, k, v, scale, n_valid=n_valid, block_q=128, interpret=True
        )
    )
    valid = slice(None) if n_valid is None else slice(0, n_valid)
    np.testing.assert_allclose(
        got[:, :, valid], want[:, :, valid], rtol=2e-5, atol=2e-5
    )


def test_attention_kernel_bf16_close_to_f32():
    B, H, T, dh = 1, 2, 128, 64
    rng = np.random.default_rng(1)
    qf = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.5
    kf = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.5
    vf = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.5
    scale = dh**-0.5
    want = np.asarray(
        _ref_attention(jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf), scale)
    )
    got = np.asarray(
        encoder_attention_pallas(
            jnp.asarray(qf, jnp.bfloat16),
            jnp.asarray(kf, jnp.bfloat16),
            jnp.asarray(vf, jnp.bfloat16),
            scale,
            interpret=True,
        ),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=0.03)


@pytest.mark.parametrize("n_valid", [None, 200])
def test_merged_attention_matches_einsum(n_valid):
    from whisper_rs_tpu.ops.encoder_attention_pallas import (
        encoder_attention_merged,
    )

    B, H, T, dh = 2, 4, 256, 64
    D = H * dh
    rng = np.random.default_rng(5)
    qm = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.5
    km = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.5
    vm = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.5
    scale = dh**-0.5

    def split(x):
        return x.reshape(B, T, H, dh).transpose(0, 2, 1, 3)

    want = np.asarray(
        _ref_attention(split(qm), split(km), split(vm), scale, n_valid)
    )  # [B, H, T, dh]
    got = np.asarray(
        encoder_attention_merged(
            qm, km, vm, H, scale, n_valid=n_valid, block_q=128, interpret=True
        )
    ).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
    valid = slice(None) if n_valid is None else slice(0, n_valid)
    np.testing.assert_allclose(
        got[:, :, valid], want[:, :, valid], rtol=2e-5, atol=2e-5
    )


def test_residual_ln_matches_reference():
    from whisper_rs_tpu.models.whisper import layer_norm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 64, 128)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((3, 64, 128)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(128), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(128), jnp.float32)

    y, ln = residual_ln(x, d, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x + d), rtol=1e-6)
    want = layer_norm(x + d, {"scale": scale, "bias": bias})
    np.testing.assert_allclose(np.asarray(ln), np.asarray(want), rtol=2e-5, atol=2e-5)

    ln2 = ln_fused(x, scale, bias, interpret=True)
    want2 = layer_norm(x, {"scale": scale, "bias": bias})
    np.testing.assert_allclose(np.asarray(ln2), np.asarray(want2), rtol=2e-5, atol=2e-5)


def test_residual_ln_odd_row_count():
    # row blocking must handle row counts that are not multiples of 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 40, 128)), jnp.float32)
    d = jnp.zeros_like(x)
    scale = jnp.ones(128, jnp.float32)
    bias = jnp.zeros(128, jnp.float32)
    y, ln = residual_ln(x, d, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_encoder_forward_interpret_matches_xla():
    from whisper_rs_tpu.config import ModelDims
    from whisper_rs_tpu.models import encoder_forward, init_params

    dims = ModelDims(80, 1000, 1500, 64, 4, 2, 448, 64, 4, 2)
    params = init_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)), jnp.float32) * 0.3

    old = os.environ.get("WHISPER_PALLAS_ENCODER")
    try:
        os.environ["WHISPER_PALLAS_ENCODER"] = "0"
        want = np.asarray(encoder_forward(params, mel, dims))
        os.environ["WHISPER_PALLAS_ENCODER"] = "interpret"
        got = np.asarray(encoder_forward(params, mel, dims))
    finally:
        if old is None:
            os.environ.pop("WHISPER_PALLAS_ENCODER", None)
        else:
            os.environ["WHISPER_PALLAS_ENCODER"] = old
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
