"""Weight-only int8 quantization (per-output-channel symmetric scales).

Serving-oriented: the decoder's per-step HBM traffic is dominated by weight
and embedding streams at production batch sizes; int8 storage halves them
vs bf16.  Dequantization folds into the matmul epilogue: with per-OUTPUT-
channel scales, ``y_j = s_j * (x @ w_q)_j``, so the kernel reads int8 and
multiplies once per output element.

Quantized linears are the same pytree dicts with an extra ``"s"`` leaf —
``models.whisper.linear`` dispatches on its presence, so every code path
(encoder, decoder, cross-attention, tied-embedding logits) works unchanged.
LayerNorms, biases, conv stems and positional embeddings stay in the source
dtype (negligible traffic, precision-sensitive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quantize_linear(p: dict) -> dict:
    w = p["w"].astype(jnp.float32)
    # per-output-channel symmetric scale: reduce ONLY the contraction axis
    # (axis -2); leading axes (the stacked-layer L axis) keep their own
    # scales
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w": q, "s": jnp.squeeze(scale, axis=-2).astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _quantize_block(bp: dict) -> dict:
    out = dict(bp)
    for attn_key in ("attn", "cross_attn"):
        if attn_key in bp:
            out[attn_key] = {
                name: _quantize_linear(bp[attn_key][name])
                for name in bp[attn_key]
            }
    out["mlp"] = {name: _quantize_linear(bp["mlp"][name]) for name in bp["mlp"]}
    return out


def quantize_params(params: dict) -> dict:
    """bf16/f32 params pytree -> int8-weight pytree (same structure plus
    per-linear ``"s"`` scale leaves; token embedding quantized per row)."""
    enc = params["encoder"]
    dec = params["decoder"]

    tok = dec["token_emb"].astype(jnp.float32)  # [V, D]
    amax = jnp.maximum(jnp.max(jnp.abs(tok), axis=1, keepdims=True), 1e-8)
    tok_scale = amax / 127.0
    tok_q = jnp.clip(jnp.round(tok / tok_scale), -127, 127).astype(jnp.int8)

    return {
        "encoder": {
            "conv1": enc["conv1"],
            "conv2": enc["conv2"],
            "blocks": _quantize_block(enc["blocks"]),
            "ln_post": enc["ln_post"],
        },
        "decoder": {
            "token_emb": tok_q,
            "token_emb_scale": tok_scale[:, 0],  # [V]
            "pos_emb": dec["pos_emb"],
            "blocks": _quantize_block(dec["blocks"]),
            "ln": dec["ln"],
        },
    }
