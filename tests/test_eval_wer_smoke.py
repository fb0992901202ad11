"""One-command WER harness smoke test (VERDICT round-1 item #5b).

Builds a synthetic LibriSpeech-layout split (FLAC + .trans.txt) and a
seeded-random checkpoint, then runs the real `tools/eval_wer.py` main — so
the moment real OpenAI weights and LibriSpeech land, the documented
one-liner

    python tools/eval_wer.py --checkpoint base.en.pt \
        --librispeech /data/LibriSpeech/test-clean --greedy

is already proven end to end (ingest -> batched transcribe -> WER).
"""

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


def test_eval_wer_one_liner(librispeech_dir, tiny_checkpoint, capsys):
    repo_root = pathlib.Path(__file__).parent.parent
    sys.path.insert(0, str(repo_root / "tools"))
    import eval_wer

    rc = eval_wer.main(
        [
            "--checkpoint", str(tiny_checkpoint),
            "--librispeech", str(librispeech_dir),
            "--greedy", "--batch", "2", "--dtype", "float32",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "WER:" in out and "over 2 utterances" in out
