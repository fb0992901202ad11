from .constants import (
    CHUNK_LENGTH,
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_FREQS,
    N_MELS,
    N_SAMPLES,
    SAMPLE_RATE,
)
from .mel import hann_window, log_mel_file, log_mel_spectrogram, mel_filterbank, pad_or_trim

__all__ = [
    "CHUNK_LENGTH",
    "HOP_LENGTH",
    "N_FFT",
    "N_FRAMES",
    "N_FREQS",
    "N_MELS",
    "N_SAMPLES",
    "SAMPLE_RATE",
    "hann_window",
    "log_mel_file",
    "log_mel_spectrogram",
    "mel_filterbank",
    "pad_or_trim",
]
