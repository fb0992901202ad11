"""Log-mel spectrogram frontend, TPU-first.

Reference behavior being matched (NOT translated):
  - mel filterbank: slaney-scale, area-normalized, htk=False
    (reference: /root/reference/src/audio.rs:175-188 via the `mel_filter`
    crate with NormalizationFactor::One) — i.e. librosa `filters.mel(...,
    norm="slaney")` semantics.
  - log_mel_spectrogram: centered reflect-padded STFT (n_fft=400, hop=160,
    periodic Hann, onesided), drop the final frame, power spectrum, mel
    matmul, log10 with 1e-10 clamp, dynamic-range floor at max-8, then
    (x+4)/4 (reference: audio.rs:230-259).

TPU-first design: the STFT is expressed as two real matmuls against a
precomputed DFT basis (cos/sin of shape [400, 201]) instead of an FFT
butterfly.  At Whisper's tiny n_fft=400 this routes the entire frontend
through the MXU as `[n_frames, 400] @ [400, 201]` and lets XLA fuse the
window, power, mel projection and log compression into a handful of kernels.
A fully fused single-pass Pallas kernel lives in
`whisper_rs_tpu.ops.mel_pallas` and is used on TPU; this module is the
reference implementation and the CPU path, and both are golden-tested
against the reference's CSV fixtures.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .constants import HOP_LENGTH, N_FFT, N_MELS, SAMPLE_RATE


# ---------------------------------------------------------------------------
# mel filterbank (host-side constant; constant-folded into the jitted frontend)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(freqs: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    f_sp = 200.0 / 3.0
    mels = freqs / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freqs >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freqs, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3.0
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freqs,
    )
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = N_MELS,
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
) -> np.ndarray:
    """[n_mels, n_fft//2+1] slaney-normalized triangular filterbank (f32).

    Matches reference audio.rs:175-188 (mel_filter crate, norm=One,
    htk=false), verified against test/data/mel-filter-8x8.csv.
    """
    fmax = sample_rate / 2.0
    fftfreqs = np.linspace(0.0, fmax, n_fft // 2 + 1)

    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(0.0)),
        _hz_to_mel_slaney(np.array(fmax)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney area normalization (NormalizationFactor::One in the reference)
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# DFT basis: rFFT as matmul (MXU-friendly at n_fft=400)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _dft_basis(n_fft: int = N_FFT) -> tuple:
    """(cos, sin) each [n_fft, n_fft//2+1] such that for frame x,
    re = x @ cos, im = x @ sin gives the onesided DFT (im negated —
    irrelevant for power)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=4)
def hann_window(n_fft: int = N_FFT) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default; reference
    audio.rs:233)."""
    n = np.arange(n_fft)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(np.float32)


# ---------------------------------------------------------------------------
# pad / trim (reference audio.rs:213-228)
# ---------------------------------------------------------------------------


def pad_or_trim(x: jnp.ndarray, length: int, axis: int = -1) -> jnp.ndarray:
    """Pad with zeros or trim the given axis to exactly `length`.

    Used both on raw samples and on mel frames (reference transcribe.rs:152).
    """
    size = x.shape[axis]
    if size > length:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, length)
        return x[tuple(sl)]
    if size < length:
        pads = [(0, 0)] * x.ndim
        pads[axis % x.ndim] = (0, length - size)
        return jnp.pad(x, pads)
    return x


# ---------------------------------------------------------------------------
# log-mel spectrogram
# ---------------------------------------------------------------------------


def _frame_audio(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Centered reflect-padded framing: [n_samples] -> [n_frames, n_fft].

    Matches torch.stft(center=True, pad_mode="reflect"): pad n_fft//2 on both
    sides, then slide. n_frames = 1 + n_samples // hop.
    """
    pad = n_fft // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + audio.shape[-1] // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return padded[idx]


def log_mel_file(
    audio: np.ndarray,
    n_mels: int = N_MELS,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Whole-file mel with jit-stable shapes: audio is zero-padded up to the
    next 30s bucket, the (jitted, shape-bucketed) spectrogram runs once, and
    the result is sliced back to the true frame count.

    Rationale: the seek-loop driver computes mel for arbitrary-length files
    (transcribe.rs:111-112); tracing per unique length would recompile, and
    eager dispatch pays per-op latency on remote runtimes.  Zero tail
    padding can alter at most the last 2 frames relative to an exact-length
    reflect-padded STFT — beyond the true n_frames the seek loop never
    looks, and the final window is zero-padded anyway (pad_or_trim).

    On TPU this routes through the fused Pallas kernel
    (ops.mel_pallas.log_mel_file_pallas — chunked with true-sample halos,
    numerically identical); elsewhere it runs the XLA matmul-DFT path.
    ``WHISPER_FORCE_PALLAS_MEL=interpret`` forces the Pallas path in
    interpreter mode (CPU test hook).
    """
    from .constants import N_SAMPLES

    force = os.environ.get("WHISPER_FORCE_PALLAS_MEL")
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu or force:
        from ..ops.mel_pallas import log_mel_file_pallas

        return log_mel_file_pallas(
            audio, n_mels, dtype=dtype, interpret=(force == "interpret")
        )

    n = int(np.shape(audio)[-1])
    n_frames = n // HOP_LENGTH
    bucket = max(1, -(-n // N_SAMPLES)) * N_SAMPLES
    padded = np.zeros(bucket, np.float32)
    padded[:n] = np.asarray(audio, np.float32)
    mel = _jitted_mel(jnp.asarray(padded), n_mels, dtype)
    return mel[:, :n_frames]


@functools.lru_cache(maxsize=16)
def _jitted_mel_fn(n_mels: int, dtype):
    return jax.jit(lambda a: log_mel_spectrogram(a, n_mels, dtype=dtype))


def _jitted_mel(audio, n_mels, dtype):
    return _jitted_mel_fn(n_mels, dtype)(audio)


def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = N_MELS,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """[n_samples] (or [batch, n_samples]) f32 audio -> [(batch,) n_mels, n_frames].

    Exact math of reference audio.rs:230-259: STFT -> drop last frame ->
    |.|^2 -> mel matmul -> log10(clamp 1e-10) -> floor at global max-8 ->
    (x+4)/4.  The dynamic-range floor uses the per-utterance global max, so
    batching vmaps the whole pipeline per utterance.
    """
    if audio.ndim == 2:
        return jax.vmap(lambda a: log_mel_spectrogram(a, n_mels, dtype=dtype))(audio)
    assert audio.ndim == 1, audio.shape

    window = jnp.asarray(hann_window())
    cos_b, sin_b = _dft_basis()
    cos_b, sin_b = jnp.asarray(cos_b), jnp.asarray(sin_b)
    mel_fb = jnp.asarray(mel_filterbank(n_mels))

    frames = _frame_audio(audio.astype(jnp.float32), N_FFT, HOP_LENGTH)
    # reference drops the last STFT frame (audio.rs:247 slice(1, None, -1))
    frames = frames[:-1] * window[None, :]

    hi = jax.lax.Precision.HIGHEST  # bf16 MXU default wrecks log-floor bins
    re = jnp.matmul(frames, cos_b, precision=hi)  # [n_frames, 201]
    im = jnp.matmul(frames, sin_b, precision=hi)
    power = re * re + im * im

    mel_spec = jnp.matmul(power, mel_fb.T, precision=hi)  # [n_frames, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    out = (log_spec + 4.0) / 4.0
    # layout: [n_mels, n_frames] like the reference (mel_filter @ magnitudes)
    return out.T.astype(dtype)
