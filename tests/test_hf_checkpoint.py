"""HF transformers checkpoint ingestion (WhisperForConditionalGeneration).

The reference only loads pre-converted tch weights
(/root/reference/examples/transcribe.rs:37); this build converts OpenAI
``.pt`` first-class AND HF transformers checkpoints (config.json +
model.safetensors / pytorch_model.bin), since that is where most users'
Whisper weights live today.  The HF-named state dict must produce the
exact same params pytree as the OpenAI-named one.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_oracle import make_random_state_dict
from whisper_rs_tpu.config import ModelDims
from whisper_rs_tpu.models import load_hf_checkpoint, params_from_state_dict
from whisper_rs_tpu.models.params import hf_dims_from_config, hf_rename_state_dict

DIMS = ModelDims(80, 51864, 1500, 64, 4, 2, 448, 64, 4, 2)

_INV_LAYER = {
    "attn.query": "self_attn.q_proj",
    "attn.key": "self_attn.k_proj",
    "attn.value": "self_attn.v_proj",
    "attn.out": "self_attn.out_proj",
    "attn_ln": "self_attn_layer_norm",
    "cross_attn.query": "encoder_attn.q_proj",
    "cross_attn.key": "encoder_attn.k_proj",
    "cross_attn.value": "encoder_attn.v_proj",
    "cross_attn.out": "encoder_attn.out_proj",
    "cross_attn_ln": "encoder_attn_layer_norm",
    "mlp.0": "fc1",
    "mlp.2": "fc2",
    "mlp_ln": "final_layer_norm",
}

_CFG = dict(
    num_mel_bins=80, vocab_size=51864, max_source_positions=1500,
    d_model=64, encoder_attention_heads=4, encoder_layers=2,
    max_target_positions=448, decoder_attention_heads=4, decoder_layers=2,
)


def _as_hf(sd: dict) -> dict:
    """OpenAI-named state dict -> HF transformers names (test-side inverse
    of hf_rename_state_dict)."""
    hf = {}
    for k, v in sd.items():
        if k == "decoder.positional_embedding":
            hf["model.decoder.embed_positions.weight"] = v
        elif k == "decoder.token_embedding.weight":
            hf["model.decoder.embed_tokens.weight"] = v
        elif k == "encoder.positional_embedding":
            hf["model.encoder.embed_positions.weight"] = v
        elif k.startswith("encoder.ln_post."):
            hf["model.encoder.layer_norm." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("decoder.ln."):
            hf["model.decoder.layer_norm." + k.rsplit(".", 1)[1]] = v
        elif k.split(".")[1] == "blocks":
            parts = k.split(".")
            side, idx, param = parts[0], parts[2], parts[-1]
            frag = ".".join(parts[3:-1])
            hf[f"model.{side}.layers.{idx}.{_INV_LAYER[frag]}.{param}"] = v
        else:
            hf["model." + k] = v  # conv1 / conv2
    return hf


@pytest.fixture(scope="module")
def state_dicts():
    sd = {k: v.numpy() for k, v in make_random_state_dict(DIMS, seed=0).items()}
    return sd, _as_hf(sd)


def test_hf_rename_matches_openai_tree(state_dicts):
    sd, hf = state_dicts
    want = params_from_state_dict(sd, DIMS)
    got = params_from_state_dict(hf_rename_state_dict(hf), DIMS)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hf_dims_from_config():
    assert hf_dims_from_config(_CFG) == DIMS


def test_load_hf_checkpoint_safetensors(state_dicts, tmp_path):
    sd, hf = state_dicts
    from safetensors.numpy import save_file

    (tmp_path / "config.json").write_text(json.dumps(_CFG))
    save_file(
        {k: np.ascontiguousarray(v) for k, v in hf.items()},
        str(tmp_path / "model.safetensors"),
    )
    params, dims = load_hf_checkpoint(str(tmp_path))
    assert dims == DIMS
    want = params_from_state_dict(sd, DIMS)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_accepts_hf_dir(state_dicts, tmp_path):
    """End to end: the CLI's auto-detecting loader transcribes from an HF
    checkpoint directory."""
    sd, hf = state_dicts
    from safetensors.numpy import save_file

    from whisper_rs_tpu.audio.io import write_wav
    from whisper_rs_tpu.cli import main

    (tmp_path / "config.json").write_text(json.dumps(_CFG))
    save_file(
        {k: np.ascontiguousarray(v) for k, v in hf.items()},
        str(tmp_path / "model.safetensors"),
    )
    wav = tmp_path / "s.wav"
    rng = np.random.default_rng(0)
    write_wav(str(wav), (rng.standard_normal(16000) * 0.1).astype(np.float32))
    rc = main([
        str(wav), "--checkpoint", str(tmp_path), "--greedy",
        "--sample-len", "4", "--dtype", "float32",
    ])
    assert rc == 0
