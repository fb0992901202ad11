"""Fused Pallas TPU kernel for the log-mel frontend.

One kernel fuses framing + Hann window + 400-pt real DFT + power spectrum +
mel projection + log10 for a 30s window (reference math: audio.rs:230-259).
TPU-first formulation:

  * the Hann window is folded into the DFT basis, so the whole frontend is
    MXU matmuls + elementwise ops;
  * framing needs no gather or concat: with hop=160, audio reshaped
    ``[rows,160]`` makes each 400-sample frame three consecutive row slices
    (400 = 160+160+80), so the DFT splits into three partial matmuls
    ``R[k:k+F] @ W[160k:160(k+1)]`` summed — the basis is zero-padded to
    480 rows so the third partial uses a full 160-wide slice;
  * overlapping frame tiles are DMA'd HBM->VMEM per grid step (overlap of 2
    rows between tiles rules out plain BlockSpecs);
  * the dynamic-range floor (``max - 8``) is a per-utterance global
    reduction, left to a fused XLA epilogue.

Frequency axis padded 201->256 and mel axis 80->128 for clean MXU tiling;
zero rows/cols contribute nothing and are sliced off outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.constants import HOP_LENGTH, N_FFT, N_SAMPLES
from ..audio.mel import _dft_basis, hann_window, mel_filterbank

F_TILE = 600  # frames per grid step (3000 = 5 * 600)
FREQ_PAD = 256  # 201 one-sided bins padded for lane alignment
MEL_PAD = 128  # n_mels (80 or 128) padded
ROW_PAD = 256  # hop rows (160 samples) padded to an aligned lane width
LN10 = float(np.log(10.0))


@functools.lru_cache(maxsize=4)
def _basis_constants(n_mels: int):
    """(wcos [3*ROW_PAD,256], wsin [3*ROW_PAD,256], melT [256,128]): Hann
    window folded into the DFT basis.  Audio rows are 160 samples padded to
    ROW_PAD lanes, so basis chunk k occupies rows [k*ROW_PAD, k*ROW_PAD+160)
    with zeros elsewhere; the padded audio lanes hit zero rows."""
    cos_b, sin_b = _dft_basis(N_FFT)
    win = hann_window(N_FFT)
    wcos = np.zeros((3 * ROW_PAD, FREQ_PAD), np.float32)
    wsin = np.zeros((3 * ROW_PAD, FREQ_PAD), np.float32)
    wc = win[:, None] * cos_b
    ws = win[:, None] * sin_b
    for k in range(3):
        n = min(HOP_LENGTH, N_FFT - k * HOP_LENGTH)  # 160,160,80
        wcos[k * ROW_PAD : k * ROW_PAD + n, : wc.shape[1]] = wc[
            k * HOP_LENGTH : k * HOP_LENGTH + n
        ]
        wsin[k * ROW_PAD : k * ROW_PAD + n, : ws.shape[1]] = ws[
            k * HOP_LENGTH : k * HOP_LENGTH + n
        ]

    fb = mel_filterbank(n_mels)  # [n_mels, 201]
    melT = np.zeros((FREQ_PAD, MEL_PAD), np.float32)
    melT[: fb.shape[1], : fb.shape[0]] = fb.T
    return wcos, wsin, melT


def _mel_kernel(audio_ref, wcos_ref, wsin_ref, melT_ref, out_ref):
    """Grid (B, n_frame_tiles).  audio_ref: [B, rows, 160] in HBM;
    out_ref block: [1, F_TILE, MEL_PAD] log10-mel."""
    b = pl.program_id(0)
    p = pl.program_id(1)

    def body(scratch, sem):
        rows = F_TILE + 8  # sublane-aligned DMA tile (needs F_TILE+2)
        dma = pltpu.make_async_copy(
            audio_ref.at[b, pl.ds(p * F_TILE, rows), :], scratch, sem
        )
        dma.start()
        dma.wait()

        R = scratch[:]  # [F_TILE+8, ROW_PAD]
        # frame f = [R[f,:160], R[f+1,:160], R[f+2,:80]] (400 = 160+160+80);
        # the DFT is three shifted partial matmuls against ROW_PAD-row basis
        # chunks (zero rows soak up the lane padding).  Mosaic cannot slice
        # at unaligned row offsets, so shifts use pltpu.roll.
        re = jnp.zeros((F_TILE, FREQ_PAD), jnp.float32)
        im = jnp.zeros((F_TILE, FREQ_PAD), jnp.float32)
        for k in range(3):
            # rotate row k to the top (roll requires non-negative shifts)
            Rk = R if k == 0 else pltpu.roll(R, shift=R.shape[0] - k, axis=0)
            Rk = Rk[0:F_TILE]
            re = re + jnp.dot(
                Rk,
                wcos_ref[k * ROW_PAD : (k + 1) * ROW_PAD],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            im = im + jnp.dot(
                Rk,
                wsin_ref[k * ROW_PAD : (k + 1) * ROW_PAD],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        power = re * re + im * im
        mel = jnp.dot(
            power,
            melT_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / LN10)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((F_TILE + 8, ROW_PAD), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


def _raw_log10_mel(audio_r: jnp.ndarray, n_mels: int, interpret: bool):
    """[B, 3008, ROW_PAD] hop-rows -> [B, 3000, MEL_PAD] log10-mel (no
    dynamic-range floor/scale — callers apply it at their own granularity)."""
    B = audio_r.shape[0]
    wcos, wsin, melT = _basis_constants(n_mels)
    n_tiles = 3000 // F_TILE
    return pl.pallas_call(
        _mel_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, F_TILE, MEL_PAD), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 3000, MEL_PAD), jnp.float32),
        interpret=interpret,
    )(audio_r, jnp.asarray(wcos), jnp.asarray(wsin), jnp.asarray(melT))


def log_mel_pallas(
    audio: jnp.ndarray,
    n_mels: int = 80,
    *,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, 480000] (or [480000]) -> [B, n_mels, 3000] log-mel, fused kernel.

    Exact 30s windows only (the shape every decode window consumes);
    arbitrary lengths go through ``log_mel_file_pallas`` (whole files) or the
    XLA path (audio.mel).
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    B, n = audio.shape
    assert n == N_SAMPLES, f"pallas mel path expects 30s windows, got {n}"

    pad = N_FFT // 2
    padded = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    # split into hop-sized rows (8 rows of slack so every (F_TILE+8)-row DMA
    # tile stays in bounds), then pad each 160-sample row to ROW_PAD lanes
    # for aligned DMA (Mosaic requires 128-multiple lane slices)
    total = padded.shape[1]
    rows = 3000 + 8
    padded = jnp.pad(padded, ((0, 0), (0, rows * HOP_LENGTH - total)))
    audio_r = padded.reshape(B, rows, HOP_LENGTH)
    audio_r = jnp.pad(audio_r, ((0, 0), (0, 0), (0, ROW_PAD - HOP_LENGTH)))

    out = _raw_log10_mel(audio_r, n_mels, interpret)

    log_spec = out[:, :, :n_mels]  # drop mel padding
    # dynamic-range floor + scale epilogue (audio.rs:256-258), fused by XLA
    m = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, m - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    log_spec = log_spec.transpose(0, 2, 1).astype(dtype)  # [B, n_mels, 3000]
    return log_spec[0] if squeeze else log_spec


@functools.partial(jax.jit, static_argnums=(1, 2))
def _file_mel_epilogue(raw, n_mels, dtype):
    """Concat chunk outputs and apply the whole-file dynamic-range floor
    (audio.rs:256: the max is global over the file, NOT per window) + scale.
    The slice to the true frame count happens outside (avoids one compile
    per distinct file length)."""
    C = raw.shape[0]
    mel = raw[:, :, :n_mels].reshape(C * 3000, n_mels)
    m = jnp.max(mel)  # over all bucket frames — matches audio.mel.log_mel_file
    mel = jnp.maximum(mel, m - 8.0)
    return ((mel + 4.0) / 4.0).T.astype(dtype)  # [n_mels, C*3000]


def log_mel_file_pallas(
    audio,
    n_mels: int = 80,
    *,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-file log-mel via the fused kernel: the file is zero-padded to a
    30s bucket, reflect-padded once (audio.rs:236 center semantics), and cut
    into 30s chunks with TRUE-sample halos so chunk-boundary frames read the
    same samples a single whole-file STFT would — numerically identical to
    ``audio.mel.log_mel_file``'s XLA bucket path, frame for frame.

    This is the production transcribe/CLI frontend on TPU (TranscribeTask /
    BatchTranscriber route here via ``audio.mel.log_mel_file``).
    """
    n = int(np.shape(audio)[-1])
    n_frames = n // HOP_LENGTH
    C = max(1, -(-n // N_SAMPLES))
    pad = N_FFT // 2
    buf = np.zeros(C * N_SAMPLES, np.float32)
    buf[:n] = np.asarray(audio, np.float32)
    padded = np.pad(buf, (pad, pad), mode="reflect")

    rows = 3000 + 8  # 8 rows of DMA-tile slack (see log_mel_pallas)
    seg_len = rows * HOP_LENGTH
    chunks = np.zeros((C, seg_len), np.float32)
    for c in range(C):
        seg = padded[c * N_SAMPLES : c * N_SAMPLES + seg_len]
        chunks[c, : seg.shape[0]] = seg
    audio_r = chunks.reshape(C, rows, HOP_LENGTH)
    audio_r = np.pad(audio_r, ((0, 0), (0, 0), (0, ROW_PAD - HOP_LENGTH)))

    raw = _jitted_raw_mel(n_mels, interpret)(jnp.asarray(audio_r))
    return _file_mel_epilogue(raw, n_mels, dtype)[:, :n_frames]


@functools.lru_cache(maxsize=8)
def _jitted_raw_mel(n_mels: int, interpret: bool):
    return jax.jit(lambda a: _raw_log10_mel(a, n_mels, interpret))


def log_mel_frontend(audio: jnp.ndarray, n_mels: int = 80, *, dtype=jnp.float32):
    """Dispatch: fused Pallas kernel on TPU for exact 30s windows, XLA
    matmul-DFT path otherwise."""
    from ..audio.mel import log_mel_spectrogram

    n = audio.shape[-1]
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and n == N_SAMPLES:
        return log_mel_pallas(audio, n_mels, dtype=dtype)
    return log_mel_spectrogram(audio, n_mels, dtype=dtype)
