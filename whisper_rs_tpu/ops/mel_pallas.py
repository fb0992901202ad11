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


def log_mel_pallas(
    audio: jnp.ndarray,
    n_mels: int = 80,
    *,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, 480000] (or [480000]) -> [B, n_mels, 3000] log-mel, fused kernel.

    Exact 30s windows only (the shape every decode window consumes);
    arbitrary lengths go through the XLA path (audio.mel).
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

    wcos, wsin, melT = _basis_constants(n_mels)
    n_tiles = 3000 // F_TILE

    out = pl.pallas_call(
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

    log_spec = out[:, :, :n_mels]  # drop mel padding
    # dynamic-range floor + scale epilogue (audio.rs:256-258), fused by XLA
    m = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, m - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    log_spec = log_spec.transpose(0, 2, 1).astype(dtype)  # [B, n_mels, 3000]
    return log_spec[0] if squeeze else log_spec


def log_mel_frontend(audio: jnp.ndarray, n_mels: int = 80, *, dtype=jnp.float32):
    """Dispatch: fused Pallas kernel on TPU for exact 30s windows, XLA
    matmul-DFT path otherwise."""
    from ..audio.mel import log_mel_spectrogram

    n = audio.shape[-1]
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and n == N_SAMPLES:
        return log_mel_pallas(audio, n_mels, dtype=dtype)
    return log_mel_spectrogram(audio, n_mels, dtype=dtype)
