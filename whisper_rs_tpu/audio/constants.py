"""Audio frontend contract constants (reference: /root/reference/src/audio.rs:12-18).

Every layer above the frontend assumes these values.  ``N_MELS`` is the
*default* (80); large-v3 uses 128 — pass ``n_mels`` explicitly where it
matters (the reference hardcodes 80, audio.rs:14).
"""

SAMPLE_RATE = 16_000
N_FFT = 400
N_MELS = 80
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000 samples per 30s chunk
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3_000 mel frames per chunk
N_FREQS = N_FFT // 2 + 1  # 201 one-sided rFFT bins
