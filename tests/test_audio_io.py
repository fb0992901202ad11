"""Audio ingest tests: WAV parse, downmix, resample — Python path and the
native C++ runtime (skipped if the toolchain didn't produce the library)."""

import numpy as np
import pytest

from whisper_rs_tpu.audio.io import _parse_wav, load_audio, resample_to_16k, write_wav
from whisper_rs_tpu.runtime import native


def _sine(sr, secs, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    audio = _sine(16000, 0.25)
    p = tmp_path / "t.wav"
    write_wav(p, audio)
    out = load_audio(p, use_native=False)
    assert out.shape == audio.shape
    np.testing.assert_allclose(out, audio, atol=1e-3)


def test_wav_stereo_downmix(tmp_path):
    import struct

    sr = 16000
    left = _sine(sr, 0.1, 440.0)
    right = _sine(sr, 0.1, 880.0)
    inter = np.stack([left, right], axis=1).reshape(-1)
    pcm = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    p = tmp_path / "stereo.wav"
    p.write_bytes(hdr + pcm)

    out = load_audio(p, use_native=False)
    np.testing.assert_allclose(out, (left + right) / 2, atol=2e-3)


def test_resample_44k_to_16k(tmp_path):
    audio = _sine(44100, 0.5)
    p = tmp_path / "hi.wav"
    write_wav(p, audio, sr=44100)
    out = load_audio(p, use_native=False)
    assert abs(len(out) - 8000) <= 2
    # 440 Hz tone survives; compare against an ideal 16 kHz sine (skip edges)
    ideal = _sine(16000, len(out) / 16000)[: len(out)]
    err = np.abs(out[200:-200] - ideal[200:-200]).max()
    assert err < 0.02


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_python(tmp_path):
    audio = _sine(22050, 0.3)
    p = tmp_path / "n.wav"
    write_wav(p, audio, sr=22050)
    py = load_audio(p, use_native=False)
    nat = native.load_audio(str(p))
    assert nat is not None
    assert abs(len(nat) - len(py)) <= 2
    n = min(len(nat), len(py))
    # two different band-limited interpolators; agree to ~1%
    assert np.abs(nat[200 : n - 200] - py[200 : n - 200]).max() < 0.02


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_resample_identity():
    x = _sine(16000, 0.2)
    out = native.resample(x, 16000, 16000)
    np.testing.assert_allclose(out, x, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_16k_passthrough(tmp_path):
    audio = _sine(16000, 0.25)
    p = tmp_path / "t16.wav"
    write_wav(p, audio)
    out = native.load_audio(str(p))
    np.testing.assert_allclose(out, audio, atol=1e-3)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_resample_rates():
    """Windowed-sinc resampler across common rates: tone survives, length
    scales correctly."""
    for sr in (8000, 22050, 48000):
        audio = _sine(sr, 0.4)
        out = native.resample(audio, sr, 16000)
        expect_len = int(len(audio) * 16000 / sr)
        assert abs(len(out) - expect_len) <= 2
        ideal = _sine(16000, len(out) / 16000)[: len(out)]
        err = np.abs(out[300:-300] - ideal[300 : len(out) - 300]).max()
        assert err < 0.03, f"sr={sr}: err={err}"


def _write_extensible_wav(path, audio, sub_format):
    """WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) writer: 40-byte fmt chunk with
    the SubFormat GUID; 32-bit int PCM (sub_format=1) or float (=3)."""
    import struct

    if sub_format == 1:
        pcm = (np.clip(audio, -1, 1) * 2147483647.0).astype("<i4").tobytes()
    else:
        pcm = audio.astype("<f4").tobytes()
    guid_tail = bytes.fromhex("000000001000800000aa00389b71")
    # fmt body: 18-byte base (incl cbSize=22) + 2 valid bits + 4 mask + 16 GUID
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000 * 4, 4, 32)
        + struct.pack("<H", 22)          # cbSize
        + struct.pack("<H", 32)          # valid bits
        + struct.pack("<I", 0)           # channel mask
        + struct.pack("<I", sub_format) + guid_tail  # SubFormat GUID
    )
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    hdr += b"data" + struct.pack("<I", len(pcm))
    pathlib = __import__("pathlib")
    pathlib.Path(path).write_bytes(hdr + pcm)


def test_extensible_wav_subformat_guid(tmp_path):
    """0xFFFE files must be decoded per the SubFormat GUID, not guessed
    from bit depth — 32-bit int PCM and 32-bit float both exist (round-1
    advisor finding: the two paths guessed oppositely for 32-bit)."""
    audio = _sine(16000, 0.3)
    for sub, name in ((1, "int32"), (3, "float32")):
        p = tmp_path / f"ext_{name}.wav"
        _write_extensible_wav(p, audio, sub)
        out_py = load_audio(p, use_native=False)
        np.testing.assert_allclose(out_py, audio, atol=1e-4,
                                   err_msg=f"python path, {name}")
        if native.available():
            out_nat = native.load_audio(str(p))
            np.testing.assert_allclose(out_nat, audio, atol=1e-4,
                                       err_msg=f"native path, {name}")
