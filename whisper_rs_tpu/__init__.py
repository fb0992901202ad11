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
from .decode import DecodeOutput, DecodeTask
from .models import init_params, load_openai_checkpoint
from .models.checkpoint import load_params, save_params
from .serve import RequestHandle, ServingEngine
from .tokenize import Task, Tokenizer
from .transcribe import TranscribeOutput, TranscribeSegment, TranscribeTask

__version__ = "0.1.0"

__all__ = [
    "BeamSearchMode",
    "DecodeOptions",
    "DecodeOutput",
    "DecodeTask",
    "GreedyMode",
    "MODEL_REGISTRY",
    "ModelDims",
    "RequestHandle",
    "ServingEngine",
    "Task",
    "Tokenizer",
    "TranscribeOptions",
    "TranscribeOutput",
    "TranscribeSegment",
    "TranscribeTask",
    "dims_for",
    "init_params",
    "load_openai_checkpoint",
    "load_params",
    "save_params",
]
