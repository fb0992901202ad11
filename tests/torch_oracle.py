"""Test-only torch oracle: a minimal Whisper forward implementing the same
published architecture math (OpenAI Whisper), used to validate the JAX model
and the checkpoint converter without pretrained weights.

This mirrors what the reference validates against (it compares to OpenAI
Whisper dumps via CSV goldens, audio.rs:261-301); with no network access we
generate random weights in OpenAI state-dict format and cross-check
activations end to end.
"""

import numpy as np
import torch
import torch.nn.functional as F


def make_random_state_dict(dims, seed=0):
    """Random weights in OpenAI whisper ``model_state_dict`` naming."""
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.05):
        return torch.from_numpy(
            (rng.standard_normal(shape) * scale).astype(np.float32)
        )

    sd = {
        "encoder.conv1.weight": t(dims.n_audio_state, dims.n_mels, 3),
        "encoder.conv1.bias": t(dims.n_audio_state),
        "encoder.conv2.weight": t(dims.n_audio_state, dims.n_audio_state, 3),
        "encoder.conv2.bias": t(dims.n_audio_state),
        "encoder.ln_post.weight": 1 + 0.1 * t(dims.n_audio_state),
        "encoder.ln_post.bias": t(dims.n_audio_state),
        "decoder.token_embedding.weight": t(dims.n_vocab, dims.n_text_state),
        "decoder.positional_embedding": t(dims.n_text_ctx, dims.n_text_state),
        "decoder.ln.weight": 1 + 0.1 * t(dims.n_text_state),
        "decoder.ln.bias": t(dims.n_text_state),
    }

    def add_block(prefix, n, cross):
        sd[f"{prefix}.attn.query.weight"] = t(n, n)
        sd[f"{prefix}.attn.query.bias"] = t(n)
        sd[f"{prefix}.attn.key.weight"] = t(n, n)
        sd[f"{prefix}.attn.value.weight"] = t(n, n)
        sd[f"{prefix}.attn.value.bias"] = t(n)
        sd[f"{prefix}.attn.out.weight"] = t(n, n)
        sd[f"{prefix}.attn.out.bias"] = t(n)
        sd[f"{prefix}.attn_ln.weight"] = 1 + 0.1 * t(n)
        sd[f"{prefix}.attn_ln.bias"] = t(n)
        if cross:
            for nm in ["query", "value", "out"]:
                sd[f"{prefix}.cross_attn.{nm}.weight"] = t(n, n)
                sd[f"{prefix}.cross_attn.{nm}.bias"] = t(n)
            sd[f"{prefix}.cross_attn.key.weight"] = t(n, n)
            sd[f"{prefix}.cross_attn_ln.weight"] = 1 + 0.1 * t(n)
            sd[f"{prefix}.cross_attn_ln.bias"] = t(n)
        sd[f"{prefix}.mlp.0.weight"] = t(4 * n, n)
        sd[f"{prefix}.mlp.0.bias"] = t(4 * n)
        sd[f"{prefix}.mlp.2.weight"] = t(n, 4 * n)
        sd[f"{prefix}.mlp.2.bias"] = t(n)
        sd[f"{prefix}.mlp_ln.weight"] = 1 + 0.1 * t(n)
        sd[f"{prefix}.mlp_ln.bias"] = t(n)

    for i in range(dims.n_audio_layer):
        add_block(f"encoder.blocks.{i}", dims.n_audio_state, cross=False)
    for i in range(dims.n_text_layer):
        add_block(f"decoder.blocks.{i}", dims.n_text_state, cross=True)
    return sd


def _sinusoids(length, channels):
    log_inc = np.log(10000.0) / (channels // 2 - 1)
    inv = torch.exp(-log_inc * torch.arange(channels // 2).float())
    scaled = torch.arange(length).float()[:, None] * inv[None, :]
    return torch.cat([scaled.sin(), scaled.cos()], dim=1)


def _ln(x, sd, p):
    return F.layer_norm(x, x.shape[-1:], sd[p + ".weight"], sd[p + ".bias"])


def _lin(x, sd, p, bias=True):
    return F.linear(x, sd[p + ".weight"], sd[p + ".bias"] if bias else None)


def _mha(x, sd, p, n_head, xa=None, mask=None):
    q = _lin(x, sd, p + ".query")
    src = x if xa is None else xa
    k = _lin(src, sd, p + ".key", bias=False)
    v = _lin(src, sd, p + ".value")

    b, t, d = q.shape
    scale = (d // n_head) ** -0.25
    q = q.view(b, t, n_head, -1).permute(0, 2, 1, 3) * scale
    k = k.view(b, k.shape[1], n_head, -1).permute(0, 2, 3, 1) * scale
    v = v.view(b, v.shape[1], n_head, -1).permute(0, 2, 1, 3)

    qk = q @ k
    if mask is not None:
        qk = qk + mask[:t, : k.shape[-1]]
    w = qk.softmax(dim=-1)
    out = (w @ v).permute(0, 2, 1, 3).flatten(2)
    return _lin(out, sd, p + ".out")


def _block(x, sd, p, n_head, xa=None, mask=None, cross=False):
    x = x + _mha(_ln(x, sd, p + ".attn_ln"), sd, p + ".attn", n_head, mask=mask)
    if cross:
        x = x + _mha(
            _ln(x, sd, p + ".cross_attn_ln"), sd, p + ".cross_attn", n_head, xa=xa
        )
    h = _ln(x, sd, p + ".mlp_ln")
    h = _lin(h, sd, p + ".mlp.0")
    h = F.gelu(h)
    h = _lin(h, sd, p + ".mlp.2")
    return x + h


@torch.no_grad()
def encoder_forward(sd, mel, dims):
    x = F.gelu(F.conv1d(mel, sd["encoder.conv1.weight"], sd["encoder.conv1.bias"], padding=1))
    x = F.gelu(
        F.conv1d(x, sd["encoder.conv2.weight"], sd["encoder.conv2.bias"], stride=2, padding=1)
    )
    x = x.permute(0, 2, 1)
    x = x + _sinusoids(dims.n_audio_ctx, dims.n_audio_state)
    for i in range(dims.n_audio_layer):
        x = _block(x, sd, f"encoder.blocks.{i}", dims.n_audio_head)
    return _ln(x, sd, "encoder.ln_post")


@torch.no_grad()
def decoder_forward(sd, tokens, xa, dims):
    n_ctx = dims.n_text_ctx
    mask = torch.full((n_ctx, n_ctx), float("-inf")).triu_(1)
    x = sd["decoder.token_embedding.weight"][tokens] + sd[
        "decoder.positional_embedding"
    ][: tokens.shape[-1]]
    for i in range(dims.n_text_layer):
        x = _block(
            x, sd, f"decoder.blocks.{i}", dims.n_text_head, xa=xa, mask=mask, cross=True
        )
    x = _ln(x, sd, "decoder.ln")
    return x @ sd["decoder.token_embedding.weight"].T
