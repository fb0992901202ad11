from .params import (
    init_params,
    load_checkpoint,
    load_hf_checkpoint,
    load_openai_checkpoint,
    params_from_state_dict,
)
from .whisper import (
    CrossKV,
    KVCache,
    decoder_forward,
    encoder_forward,
    model_forward,
    precompute_cross_kv,
    sinusoids,
)

__all__ = [
    "CrossKV",
    "KVCache",
    "decoder_forward",
    "encoder_forward",
    "init_params",
    "load_checkpoint",
    "load_hf_checkpoint",
    "load_openai_checkpoint",
    "model_forward",
    "params_from_state_dict",
    "precompute_cross_kv",
    "sinusoids",
]
