"""Checkpoint-drop validation workflow smoke test (VERDICT r2 item #6).

Proves `tools/validate_checkpoint.py` is runnable end to end on a seeded
synthetic checkpoint + synthetic LibriSpeech layout: WER, int8 and
int8-KV ΔWER, word-timing sanity, and language-ID smoke all execute and
land in one JSON verdict.  With random weights the quality gates fail
(rc=3) — what's validated here is the machinery, so the instant real
weights land the one-liner already works.
"""

import json
import pathlib
import sys

import numpy as np
import pytest


@pytest.fixture()
def librispeech_dir(tmp_path):
    from whisper_rs_tpu.audio.flac import encode_flac

    d = tmp_path / "test-clean" / "19" / "198"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        utt = f"19-198-{i:04d}"
        audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        (d / f"{utt}.flac").write_bytes(encode_flac(audio, 16000))
        lines.append(f"{utt} HELLO WORLD NUMBER {i}")
    (d / "19-198.trans.txt").write_text("\n".join(lines))
    return tmp_path / "test-clean"


@pytest.fixture()
def tiny_checkpoint(tmp_path):
    import torch

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from torch_oracle import make_random_state_dict

    from whisper_rs_tpu.config import ModelDims

    dims = ModelDims(80, 51864, 1500, 64, 4, 2, 448, 64, 4, 2)
    p = tmp_path / "tiny.pt"
    torch.save(
        {
            "dims": {
                "n_mels": 80, "n_vocab": 51864, "n_audio_ctx": 1500,
                "n_audio_state": 64, "n_audio_head": 4, "n_audio_layer": 2,
                "n_text_ctx": 448, "n_text_state": 64, "n_text_head": 4,
                "n_text_layer": 2,
            },
            "model_state_dict": make_random_state_dict(dims, seed=0),
        },
        str(p),
    )
    return p


def test_validate_checkpoint_one_liner(librispeech_dir, tiny_checkpoint, capsys):
    repo_root = pathlib.Path(__file__).parent.parent
    sys.path.insert(0, str(repo_root / "tools"))
    import validate_checkpoint

    rc = validate_checkpoint.main(
        [
            "--checkpoint", str(tiny_checkpoint),
            "--librispeech", str(librispeech_dir),
            "--greedy", "--batch", "2", "--dtype", "float32",
            "--sample-len", "8",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    verdict = json.loads(out)

    # every subsystem produced a result in the single JSON verdict
    for key in (
        "wer", "wer_ok", "wer_int8", "delta_wer_int8", "int8_ok",
        "wer_int8_kv", "delta_wer_int8_kv", "int8_kv_ok",
        "wer_int8_matmul", "delta_wer_int8_matmul", "int8_matmul_ok",
        "word_timing", "language_id", "audio_s_per_s", "ok",
    ):
        assert key in verdict, key
    assert verdict["n_utterances"] == 2
    # OpenAI robustness recipe (temperature ladder + no-speech skip) is the
    # default, so the first real-weights WER is comparable to published
    # numbers (VERDICT r3 item #1); with random weights every window fails
    # needs_fallback, so this smoke run rides the ladder to the last rung
    assert verdict["recipe"] == "openai"
    assert 0.0 <= verdict["wer"]
    assert verdict["word_timing"]["n_segments"] >= 1
    # english-only vocab: language ID must be explicitly skipped, not broken
    assert verdict["language_id"] == {"skipped": "english-only checkpoint"}
    # random weights: gates decide the rc; machinery must agree with it
    assert rc == (0 if verdict["ok"] else 3)


def test_validate_checkpoint_skip_quant(librispeech_dir, tiny_checkpoint, capsys):
    repo_root = pathlib.Path(__file__).parent.parent
    sys.path.insert(0, str(repo_root / "tools"))
    import validate_checkpoint

    validate_checkpoint.main(
        [
            "--checkpoint", str(tiny_checkpoint),
            "--librispeech", str(librispeech_dir),
            "--greedy", "--batch", "2", "--dtype", "float32",
            "--sample-len", "6", "--skip-quant",
        ]
    )
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert verdict["int8_ok"] is None and verdict["int8_kv_ok"] is None
    assert "wer" in verdict and "word_timing" in verdict
