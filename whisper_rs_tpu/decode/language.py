"""Language identification.

The reference declares ``Task::LanguageId`` (tokenize.rs:135) but never
implements it (its tokenizer asserts transcribe-only, tokenize.rs:143-147).
Implemented here with OpenAI semantics: run one decoder step on ``[sot]``
and softmax the logits restricted to the 99 ``<|xx|>`` language tokens.
Requires a multilingual checkpoint (en-only vocabs have language tokens the
model never saw; callers should check ``tokenizer.is_multilingual``).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelDims
from ..models.whisper import (
    KVCache,
    decoder_forward,
    encoder_forward,
    precompute_cross_kv,
)
from ..tokenize.languages import LANGUAGE_CODES  # noqa: F401 (re-export)


def detect_language_logits(
    params,
    mel: jnp.ndarray,  # [B, n_mels, 3000]
    dims: ModelDims,
    sot_id: int,
    lang_token_ids: jnp.ndarray,  # [n_langs] i32
) -> jnp.ndarray:
    """[B, n_langs] language probabilities (jittable core)."""
    xa = encoder_forward(params, mel, dims)
    cross_kv = precompute_cross_kv(params, xa, dims)
    cache = KVCache.init(dims, mel.shape[0], dtype=xa.dtype)
    tokens = jnp.full((mel.shape[0], 1), sot_id, jnp.int32)
    logits, _ = decoder_forward(params, tokens, jnp.int32(0), cross_kv, cache, dims)
    lang_logits = logits[:, 0, :][:, lang_token_ids]  # [B, n_langs]
    return jax.nn.softmax(lang_logits.astype(jnp.float32), axis=-1)


def detect_language(
    params, mel, dims: ModelDims, tokenizer
) -> List[Dict[str, float]]:
    """Per-audio {language_code: probability}, most likely first."""
    mel = jnp.asarray(mel)
    if mel.ndim == 2:
        mel = mel[None]
    # Language-ID range derives from the tokenizer's own table (99 or 100
    # codes depending on checkpoint family) — not a global constant.
    codes = getattr(tokenizer, "language_codes", LANGUAGE_CODES)
    lang_ids = jnp.asarray(
        [tokenizer.token_id_sot + 1 + i for i in range(len(codes))],
        jnp.int32,
    )
    probs = np.asarray(
        _jitted_detect(dims, int(tokenizer.token_id_sot))(params, mel, lang_ids)
    )
    out = []
    for row in probs:
        ranked = sorted(zip(codes, row.tolist()), key=lambda kv: -kv[1])
        out.append(dict(ranked))
    return out


@functools.lru_cache(maxsize=None)
def _jitted_detect(dims: ModelDims, sot_id: int):
    """One compiled executable per (dims, sot) — repeated detect_language
    calls reuse it instead of re-jitting (round-1 weak spot)."""
    return jax.jit(
        lambda p, m, lang_ids: detect_language_logits(p, m, dims, sot_id, lang_ids)
    )
