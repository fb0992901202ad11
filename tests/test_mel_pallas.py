"""Fused Pallas mel kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from whisper_rs_tpu.audio import N_SAMPLES, log_mel_spectrogram
from whisper_rs_tpu.ops.mel_pallas import log_mel_pallas


def test_pallas_mel_matches_xla_path():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, N_SAMPLES)) * 0.3).astype(np.float32)

    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    got = np.asarray(log_mel_pallas(jnp.asarray(audio), interpret=True))

    assert got.shape == ref.shape == (2, 80, 3000)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_mel_single_and_128mels():
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(N_SAMPLES) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio), 128))
    got = np.asarray(log_mel_pallas(jnp.asarray(audio), 128, interpret=True))
    assert got.shape == ref.shape == (128, 3000)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
