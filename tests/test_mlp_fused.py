"""Fused decode-step MLP kernel (ops/decoder_mlp_fused.py), interpret mode:
kernel math vs the XLA reference, and exact-token decode parity through the
greedy and beam loops with WHISPER_PALLAS_MLP=interpret.

Hardware compilation/parity is covered by the WHISPER_TPU_TESTS=1 suite
(interpret mode cannot catch Mosaic lowering bugs — ROADMAP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_rs_tpu.config import BeamSearchMode, GreedyMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig, decode_beam, decode_greedy
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.ops.decoder_mlp_fused import (
    decoder_mlp_step,
    mlp_fused_ok,
    pack_mlp_params,
)

DIMS = ModelDims(80, 1000, 1500, 64, 4, 2, 448, 64, 4, 2)


def _blocks(L, D, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return {
        "mlp": {
            "fc1": {
                "w": jnp.asarray(rng.standard_normal((L, D, 4 * D)), dtype) * 0.2,
                "b": jnp.asarray(rng.standard_normal((L, 4 * D)), dtype) * 0.1,
            },
            "fc2": {
                "w": jnp.asarray(rng.standard_normal((L, 4 * D, D)), dtype) * 0.2,
                "b": jnp.asarray(rng.standard_normal((L, D)), dtype) * 0.1,
            },
        }
    }


@pytest.mark.parametrize("D", [128, 256])
def test_mlp_kernel_matches_xla(D):
    L = 3
    blocks = _blocks(L, D)
    wp, b1 = pack_mlp_params(blocks)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((5, D)), jnp.float32) * 0.5
    for l in range(L):
        got = np.asarray(
            decoder_mlp_step(h, wp, b1, jnp.int32(l), interpret=True)
        )
        fc1, fc2 = blocks["mlp"]["fc1"], blocks["mlp"]["fc2"]
        a = h @ fc1["w"][l] + fc1["b"][l]
        want = np.asarray(jax.nn.gelu(a, approximate=False) @ fc2["w"][l])
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mlp_fused_ok_rejects_quantized():
    from whisper_rs_tpu.models.quantize import quantize_params

    params = init_params(jax.random.PRNGKey(0), DIMS)
    assert mlp_fused_ok(params["decoder"]["blocks"])
    q = quantize_params(params)
    assert not mlp_fused_ok(q["decoder"]["blocks"])


def test_decode_exact_match_with_mlp_kernel(monkeypatch):
    """Greedy and beam decodes produce bit-identical tokens with the MLP
    kernel engaged (interpret) vs the XLA path."""
    params = init_params(jax.random.PRNGKey(0), DIMS)
    cfg = FilterConfig(
        n_vocab=1000, token_id_eot=500, token_id_space=7,
        token_id_ts_begin=600, token_id_no_timestamps=599,
    )
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3)
    initial = jnp.asarray([[501]] * 2, np.int32)

    def run(fn, mode):
        return fn(
            params, mel, initial, jnp.int32(1), jnp.int32(0), DIMS, cfg,
            mode, 8, no_speech_id=502,
        )

    monkeypatch.delenv("WHISPER_PALLAS_MLP", raising=False)
    ref_g = np.asarray(run(decode_greedy, GreedyMode()).candidates)
    ref_b = np.asarray(run(decode_beam, BeamSearchMode(beam_size=3)).candidates)

    monkeypatch.setenv("WHISPER_PALLAS_MLP", "interpret")
    got_g = np.asarray(run(decode_greedy, GreedyMode()).candidates)
    got_b = np.asarray(run(decode_beam, BeamSearchMode(beam_size=3)).candidates)

    np.testing.assert_array_equal(got_g, ref_g)
    np.testing.assert_array_equal(got_b, ref_b)
