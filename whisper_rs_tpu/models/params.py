"""Parameter pytree: random init + OpenAI checkpoint conversion.

The pytree layout is the contract (reference equivalent: the tch VarStore
name tree built at model.rs:560-583, with names like
``encoder/blocks/3/attn/query/weight``).  Here per-layer weights are
**stacked along a leading L axis** so the block loop can be a ``lax.scan``.

Name mapping from OpenAI's ``.pt`` ``model_state_dict`` (documented against
model.rs:124-155, 279-297, 463-482):

  encoder.conv{1,2}.{weight,bias}           -> encoder.conv{1,2}.{w,b}
  encoder.blocks.{i}.attn.query.{weight,bias} -> encoder.blocks.attn.query.{w,b}[i]
  encoder.blocks.{i}.attn.key.weight          -> (no bias — model.rs:133-143)
  encoder.blocks.{i}.mlp.{0,2}.*              -> mlp.{fc1,fc2} (torch
      Sequential indices 0/2, model.rs:279-292)
  encoder.ln_post.*                           -> encoder.ln_post.{scale,bias}
  decoder.token_embedding.weight              -> decoder.token_emb
  decoder.positional_embedding                -> decoder.pos_emb
  decoder.blocks.{i}.cross_attn*.*            -> decoder.blocks.cross_attn*
  decoder.ln.*                                -> decoder.ln.{scale,bias}

Linear weights are stored **[in, out]** (x @ W), i.e. transposed from
torch's [out, in].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelDims


# ---------------------------------------------------------------------------
# random init (tests/bench run without pretrained weights)
# ---------------------------------------------------------------------------


def _init_linear(key, n_in, n_out, bias=True, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (n_in, n_out), dtype) * (n_in**-0.5)}
    if bias:
        p["b"] = jnp.zeros((n_out,), dtype)
    return p


def _init_ln(n, dtype=jnp.float32):
    return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def _init_block(key, n_state, cross: bool, dtype):
    keys = jax.random.split(key, 8)
    p = {
        "attn": {
            "query": _init_linear(keys[0], n_state, n_state, dtype=dtype),
            "key": _init_linear(keys[1], n_state, n_state, bias=False, dtype=dtype),
            "value": _init_linear(keys[2], n_state, n_state, dtype=dtype),
            "out": _init_linear(keys[3], n_state, n_state, dtype=dtype),
        },
        "attn_ln": _init_ln(n_state, dtype),
        "mlp": {
            "fc1": _init_linear(keys[4], n_state, 4 * n_state, dtype=dtype),
            "fc2": _init_linear(keys[5], 4 * n_state, n_state, dtype=dtype),
        },
        "mlp_ln": _init_ln(n_state, dtype),
    }
    if cross:
        p["cross_attn"] = {
            "query": _init_linear(keys[6], n_state, n_state, dtype=dtype),
            "key": _init_linear(keys[7], n_state, n_state, bias=False, dtype=dtype),
            "value": _init_linear(keys[6], n_state, n_state, dtype=dtype),
            "out": _init_linear(keys[7], n_state, n_state, dtype=dtype),
        }
        p["cross_attn_ln"] = _init_ln(n_state, dtype)
    return p


def _stack_blocks(blocks):
    """List of per-layer pytrees -> single pytree with leading L axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def init_params(key, dims: ModelDims, dtype=jnp.float32) -> dict:
    """Random parameters with the exact pytree layout of the converter."""
    ke, kd, kc1, kc2, kt, kp = jax.random.split(key, 6)

    enc_blocks = [
        _init_block(k, dims.n_audio_state, cross=False, dtype=dtype)
        for k in jax.random.split(ke, dims.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(k, dims.n_text_state, cross=True, dtype=dtype)
        for k in jax.random.split(kd, dims.n_text_layer)
    ]

    s = 0.02
    return {
        "encoder": {
            "conv1": {
                "w": jax.random.normal(
                    kc1, (dims.n_audio_state, dims.n_mels, 3), dtype
                )
                * s,
                "b": jnp.zeros((dims.n_audio_state,), dtype),
            },
            "conv2": {
                "w": jax.random.normal(
                    kc2, (dims.n_audio_state, dims.n_audio_state, 3), dtype
                )
                * s,
                "b": jnp.zeros((dims.n_audio_state,), dtype),
            },
            "blocks": _stack_blocks(enc_blocks),
            "ln_post": _init_ln(dims.n_audio_state, dtype),
        },
        "decoder": {
            "token_emb": jax.random.normal(
                kt, (dims.n_vocab, dims.n_text_state), dtype
            )
            * s,
            "pos_emb": jax.random.normal(
                kp, (dims.n_text_ctx, dims.n_text_state), dtype
            )
            * s,
            "blocks": _stack_blocks(dec_blocks),
            "ln": _init_ln(dims.n_text_state, dtype),
        },
    }


# ---------------------------------------------------------------------------
# OpenAI checkpoint conversion
# ---------------------------------------------------------------------------


def _lin_from(sd, prefix, bias=True):
    p = {"w": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)}
    if bias:
        p["b"] = np.asarray(sd[prefix + ".bias"])
    return p


def _ln_from(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _block_from(sd, prefix, cross: bool):
    p = {
        "attn": {
            "query": _lin_from(sd, f"{prefix}.attn.query"),
            "key": _lin_from(sd, f"{prefix}.attn.key", bias=False),
            "value": _lin_from(sd, f"{prefix}.attn.value"),
            "out": _lin_from(sd, f"{prefix}.attn.out"),
        },
        "attn_ln": _ln_from(sd, f"{prefix}.attn_ln"),
        "mlp": {
            "fc1": _lin_from(sd, f"{prefix}.mlp.0"),
            "fc2": _lin_from(sd, f"{prefix}.mlp.2"),
        },
        "mlp_ln": _ln_from(sd, f"{prefix}.mlp_ln"),
    }
    if cross:
        p["cross_attn"] = {
            "query": _lin_from(sd, f"{prefix}.cross_attn.query"),
            "key": _lin_from(sd, f"{prefix}.cross_attn.key", bias=False),
            "value": _lin_from(sd, f"{prefix}.cross_attn.value"),
            "out": _lin_from(sd, f"{prefix}.cross_attn.out"),
        }
        p["cross_attn_ln"] = _ln_from(sd, f"{prefix}.cross_attn_ln")
    return p


def params_from_state_dict(
    sd: dict, dims: ModelDims, dtype=jnp.float32
) -> dict:
    """Convert an OpenAI-Whisper-style flat state dict (numpy/torch arrays)
    into the stacked params pytree."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    enc_blocks = [
        _block_from(sd, f"encoder.blocks.{i}", cross=False)
        for i in range(dims.n_audio_layer)
    ]
    dec_blocks = [
        _block_from(sd, f"decoder.blocks.{i}", cross=True)
        for i in range(dims.n_text_layer)
    ]

    def to_dev(tree):
        return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)

    params = {
        "encoder": {
            "conv1": {
                "w": np.asarray(sd["encoder.conv1.weight"]),
                "b": np.asarray(sd["encoder.conv1.bias"]),
            },
            "conv2": {
                "w": np.asarray(sd["encoder.conv2.weight"]),
                "b": np.asarray(sd["encoder.conv2.bias"]),
            },
            "blocks": _stack_blocks([to_dev(b) for b in enc_blocks]),
            "ln_post": _ln_from(sd, "encoder.ln_post"),
        },
        "decoder": {
            "token_emb": np.asarray(sd["decoder.token_embedding.weight"]),
            "pos_emb": np.asarray(sd["decoder.positional_embedding"]),
            "blocks": _stack_blocks([to_dev(b) for b in dec_blocks]),
            "ln": _ln_from(sd, "decoder.ln"),
        },
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def load_openai_checkpoint(path: str, dtype=jnp.float32):
    """Load an OpenAI whisper ``.pt`` checkpoint -> (params, ModelDims).

    The reference loads pre-converted tch ``.ot`` weights
    (examples/transcribe.rs:37) with the converter left out of the repo; here
    the converter is first-class.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        d = ckpt["dims"]
        dims = ModelDims(
            n_mels=d["n_mels"],
            n_vocab=d["n_vocab"],
            n_audio_ctx=d["n_audio_ctx"],
            n_audio_state=d["n_audio_state"],
            n_audio_head=d["n_audio_head"],
            n_audio_layer=d["n_audio_layer"],
            n_text_ctx=d["n_text_ctx"],
            n_text_state=d["n_text_state"],
            n_text_head=d["n_text_head"],
            n_text_layer=d["n_text_layer"],
        )
        sd = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    else:
        raise ValueError(
            "expected an OpenAI whisper checkpoint with 'model_state_dict'"
        )
    return params_from_state_dict(sd, dims, dtype), dims


# ---------------------------------------------------------------------------
# Hugging Face transformers checkpoints (WhisperForConditionalGeneration)
# ---------------------------------------------------------------------------

# HF module path -> OpenAI name fragment, applied inside each layer block.
_HF_LAYER_MAP = {
    "self_attn.q_proj": "attn.query",
    "self_attn.k_proj": "attn.key",
    "self_attn.v_proj": "attn.value",
    "self_attn.out_proj": "attn.out",
    "self_attn_layer_norm": "attn_ln",
    "encoder_attn.q_proj": "cross_attn.query",
    "encoder_attn.k_proj": "cross_attn.key",
    "encoder_attn.v_proj": "cross_attn.value",
    "encoder_attn.out_proj": "cross_attn.out",
    "encoder_attn_layer_norm": "cross_attn_ln",
    "fc1": "mlp.0",
    "fc2": "mlp.2",
    "final_layer_norm": "mlp_ln",
}

_HF_TOP_MAP = {
    "encoder.layer_norm": "encoder.ln_post",
    "decoder.layer_norm": "decoder.ln",
    "decoder.embed_tokens": "decoder.token_embedding",
}


def hf_rename_state_dict(sd: dict) -> dict:
    """HF transformers Whisper names -> OpenAI names (then reuse
    ``params_from_state_dict``).  Drops the encoder's fixed sinusoid
    positional buffer and the tied ``proj_out``."""
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("model.")
        if k.startswith("proj_out.") or k == "encoder.embed_positions.weight":
            continue  # tied to embed_tokens / recomputed sinusoids
        if k == "decoder.embed_positions.weight":
            out["decoder.positional_embedding"] = v
            continue
        parts = k.split(".")
        if len(parts) >= 3 and parts[1] == "layers":
            side, _, idx = parts[0], parts[1], parts[2]
            rest = ".".join(parts[3:-1])  # module path without param name
            mapped = _HF_LAYER_MAP.get(rest)
            if mapped is None:
                raise KeyError(f"unrecognized HF layer param: {k}")
            out[f"{side}.blocks.{idx}.{mapped}.{parts[-1]}"] = v
            continue
        prefix, param = k.rsplit(".", 1)
        out[f"{_HF_TOP_MAP.get(prefix, prefix)}.{param}"] = v
    return out


def hf_dims_from_config(cfg: dict) -> ModelDims:
    """ModelDims from an HF transformers Whisper ``config.json`` dict."""
    return ModelDims(
        n_mels=cfg["num_mel_bins"],
        n_vocab=cfg["vocab_size"],
        n_audio_ctx=cfg["max_source_positions"],
        n_audio_state=cfg["d_model"],
        n_audio_head=cfg["encoder_attention_heads"],
        n_audio_layer=cfg["encoder_layers"],
        n_text_ctx=cfg["max_target_positions"],
        n_text_state=cfg["d_model"],
        n_text_head=cfg["decoder_attention_heads"],
        n_text_layer=cfg["decoder_layers"],
    )


def load_hf_checkpoint(path: str, dtype=jnp.float32):
    """Load an HF transformers Whisper checkpoint directory
    (``config.json`` + ``model.safetensors`` or ``pytorch_model.bin``)
    -> (params, ModelDims)."""
    import json
    import pathlib

    d = pathlib.Path(path)
    cfg = json.loads((d / "config.json").read_text())
    dims = hf_dims_from_config(cfg)

    st = d / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st))
    else:
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(
                d / "pytorch_model.bin", map_location="cpu", weights_only=True
            ).items()
        }
    return params_from_state_dict(hf_rename_state_dict(sd), dims, dtype), dims


def load_checkpoint(path: str, dtype=jnp.float32):
    """Auto-detecting loader: an HF checkpoint directory (config.json), an
    OpenAI ``.pt`` file, or this framework's own ``.npz`` save format
    (models/checkpoint.py save_params) -> (params, ModelDims)."""
    import pathlib

    p = pathlib.Path(path)
    if p.is_dir():
        return load_hf_checkpoint(path, dtype)
    if p.suffix == ".npz":
        from .checkpoint import load_params

        return load_params(path, dtype=dtype)
    return load_openai_checkpoint(path, dtype)
