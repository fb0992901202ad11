"""whisper_rs_tpu — a TPU-native Whisper inference framework.

Brand-new JAX/XLA/Pallas/pjit implementation with the capabilities of the
reference `laptou/whisper-rs` (Rust + libtorch), redesigned TPU-first:
functional model state, static shapes, on-device decoding (greedy + beam
search with vectorized logit filters), Pallas mel frontend, and
DP/TP sharding over `jax.sharding.Mesh`.
"""

from .config import (
    BeamSearchMode,
    DecodeOptions,
    GreedyMode,
    ModelDims,
    MODEL_REGISTRY,
    TranscribeOptions,
    dims_for,
)

__version__ = "0.1.0"
