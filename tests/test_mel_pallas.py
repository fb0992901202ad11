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


def _xla_file_mel(audio, n_mels=80):
    """The XLA bucket path of log_mel_file, inlined (log_mel_file itself may
    dispatch to Pallas depending on platform/env)."""
    n = audio.shape[-1]
    n_frames = n // 160
    bucket = max(1, -(-n // N_SAMPLES)) * N_SAMPLES
    padded = np.zeros(bucket, np.float32)
    padded[:n] = audio
    mel = log_mel_spectrogram(jnp.asarray(padded), n_mels)
    return np.asarray(mel[:, :n_frames])


def test_pallas_file_mel_matches_xla_path():
    """Whole-file chunked Pallas mel (true-sample halos + global floor) is
    numerically identical to the XLA bucket path, including across chunk
    boundaries and for non-multiple-of-30s lengths."""
    from whisper_rs_tpu.ops.mel_pallas import log_mel_file_pallas

    rng = np.random.default_rng(2)
    for seconds in (9.7, 65.0):
        n = int(seconds * 16000)
        audio = (rng.standard_normal(n) * 0.2).astype(np.float32)
        ref = _xla_file_mel(audio)
        got = np.asarray(log_mel_file_pallas(audio, interpret=True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_transcribe_path_invokes_pallas_mel(monkeypatch):
    """The production transcribe frontend routes through the Pallas kernel
    when forced (and on TPU): log_mel_file -> log_mel_file_pallas."""
    import whisper_rs_tpu.ops.mel_pallas as mp
    from whisper_rs_tpu.audio.mel import log_mel_file

    calls = {"n": 0}
    orig = mp.log_mel_file_pallas

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(mp, "log_mel_file_pallas", spy)
    monkeypatch.setenv("WHISPER_FORCE_PALLAS_MEL", "interpret")

    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    got = log_mel_file(audio)
    assert calls["n"] == 1
    np.testing.assert_allclose(
        np.asarray(got), _xla_file_mel(audio), rtol=1e-4, atol=1e-4
    )
