"""Mel frontend golden tests.

Mirrors the reference's only tests (audio.rs:261-301): filterbank corner vs
test/data/mel-filter-8x8.csv at tight tolerance, and the full log-mel
pipeline vs test/data/mel-spectrogram.csv.  The reference's wav fixture is
not committed upstream, so the spectrogram test synthesizes audio and checks
self-consistency against a NumPy/torch oracle instead, plus shape/range
contracts of the golden CSV.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_rs_tpu.audio import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_MELS,
    N_SAMPLES,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)


def test_mel_filter_golden(ref_mel_filter_8x8):
    # reference audio.rs:267-279 — same tolerances (1e-5 rtol, 1e-8 atol)
    fb = mel_filterbank(N_MELS)[:8, :8]
    np.testing.assert_allclose(fb, ref_mel_filter_8x8, rtol=1e-5, atol=1e-8)


def test_mel_filter_shape_and_area():
    fb = mel_filterbank(80)
    assert fb.shape == (80, 201)
    assert (fb >= 0).all()
    fb128 = mel_filterbank(128)
    assert fb128.shape == (128, 201)


def test_log_mel_vs_torch_stft_oracle():
    """Cross-check our matmul-DFT STFT against torch's FFT STFT — the exact
    operation the reference calls (audio.rs:236-246)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000 * 2).astype(np.float32)

    ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))

    at = torch.from_numpy(audio)
    window = torch.hann_window(N_FFT)
    stft = torch.stft(
        at,
        N_FFT,
        HOP_LENGTH,
        window=window,
        center=True,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
    )
    mag = stft[..., :-1].abs() ** 2
    fb = torch.from_numpy(mel_filterbank(N_MELS))
    mel = fb @ mag
    log_spec = mel.clamp_min(1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    expect = ((log_spec + 4.0) / 4.0).numpy()

    assert ours.shape == expect.shape == (N_MELS, 200)
    # f32 matmul-DFT vs FFT butterfly: ~1e-3 relative; still far tighter than
    # the reference's own spectrogram tolerance (0.1 rtol / 0.005 atol,
    # audio.rs:295-300).
    np.testing.assert_allclose(ours, expect, rtol=5e-3, atol=2e-3)


def test_log_mel_30s_shape():
    audio = jnp.zeros(N_SAMPLES)
    mel = log_mel_spectrogram(audio)
    assert mel.shape == (N_MELS, N_FRAMES)


def test_log_mel_batched():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 16000)).astype(np.float32)
    batched = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    single0 = np.asarray(log_mel_spectrogram(jnp.asarray(audio[0])))
    np.testing.assert_allclose(batched[0], single0, rtol=1e-5, atol=1e-6)


def test_golden_spectrogram_contract(ref_mel_spectrogram):
    # The CSV golden (dumped from OpenAI whisper) fixes the output contract:
    # 80 mel rows, (x+4)/4 scaling keeps values in a small range.
    assert ref_mel_spectrogram.shape[0] == 80
    assert ref_mel_spectrogram.max() <= 2.0 + 1e-6


def test_pad_or_trim():
    x = jnp.ones((80, 1234))
    assert pad_or_trim(x, 3000).shape == (80, 3000)
    assert pad_or_trim(x, 1000).shape == (80, 1000)
    padded = pad_or_trim(x, 3000)
    assert float(padded[:, 1234:].sum()) == 0.0
    # also on raw 1-D samples (reference uses it both ways)
    a = jnp.ones(100)
    assert pad_or_trim(a, 480000).shape == (480000,)
