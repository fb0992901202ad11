"""FLAC decode tests (roundtrip through the in-tree encoder; no FLAC
tooling exists in the image)."""

import numpy as np
import pytest

from whisper_rs_tpu.audio.flac import decode_flac, encode_flac
from whisper_rs_tpu.audio.io import load_audio


def _sine(sr, secs, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_roundtrip_mono_fixed_orders(order):
    audio = _sine(16000, 0.5)
    blob = encode_flac(audio, 16000, fixed_order=order)
    out, sr = decode_flac(blob)
    assert sr == 16000
    assert out.shape == (len(audio), 1)
    np.testing.assert_allclose(out[:, 0], audio, atol=2e-4)


def test_roundtrip_stereo():
    sr = 22050
    left = _sine(sr, 0.3, 440.0)
    right = _sine(sr, 0.3, 660.0)
    audio = np.stack([left, right], axis=1)
    blob = encode_flac(audio, sr)
    out, got_sr = decode_flac(blob)
    assert got_sr == sr
    np.testing.assert_allclose(out, audio, atol=2e-4)


def test_roundtrip_noise_multiframe():
    # >1 frame (4096 block size), noisy signal stresses rice coding
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(10000) * 0.3).clip(-1, 1).astype(np.float32)
    blob = encode_flac(audio, 16000, fixed_order=1)
    out, _ = decode_flac(blob)
    np.testing.assert_allclose(out[:, 0], audio, atol=2e-4)


def test_load_audio_flac(tmp_path):
    sr = 44100
    audio = _sine(sr, 0.25)
    p = tmp_path / "t.flac"
    p.write_bytes(encode_flac(audio, sr))
    out = load_audio(p, use_native=False)
    # resampled to 16 kHz mono
    assert abs(len(out) - int(0.25 * 16000)) <= 2
    ideal = _sine(16000, len(out) / 16000)[: len(out)]
    assert np.abs(out[200:-200] - ideal[200 : len(out) - 200]).max() < 0.02


def test_24bit():
    audio = _sine(16000, 0.2)
    blob = encode_flac(audio, 16000, bps=24)
    out, _ = decode_flac(blob)
    np.testing.assert_allclose(out[:, 0], audio, atol=2e-6)


@pytest.mark.skipif(
    not __import__("whisper_rs_tpu.runtime.native", fromlist=["available"]).available(),
    reason="native lib unavailable",
)
def test_native_flac_matches_python(tmp_path):
    """The C++ FLAC decoder (runtime/audio_native.cpp) must agree exactly
    with the pure-Python decoder on mono/stereo, fixed orders, and noise
    (stresses Rice partitions)."""
    from whisper_rs_tpu.runtime import native

    rng = np.random.default_rng(7)
    cases = [
        ("mono_o0", (rng.standard_normal(5000) * 0.3).astype(np.float32), 0),
        ("mono_o1", (rng.standard_normal(9000) * 0.3).astype(np.float32), 1),
        ("corr_o4", None, 4),
        ("stereo", (rng.standard_normal((6000, 2)) * 0.2).astype(np.float32), 2),
    ]
    for name, x, order in cases:
        if x is None:
            x = np.cumsum(rng.standard_normal(20000)).astype(np.float32)
            x = (0.5 * x / np.abs(x).max()).astype(np.float32)
        blob = encode_flac(x, 16000, fixed_order=order)
        p = tmp_path / f"{name}.flac"
        p.write_bytes(blob)
        y_py, sr = decode_flac(blob)
        assert sr == 16000
        y_nat = native.load_audio(str(p))
        mono_py = y_py.mean(axis=1).astype(np.float32)
        assert len(y_nat) == len(mono_py), name
        np.testing.assert_allclose(y_nat, mono_py, atol=1e-7, err_msg=name)
