"""Full-stack end-to-end CLI test: synthetic OpenAI-format checkpoint with
the REAL gpt2 vocab size + tiny layers, a generated wav, and the actual CLI
entry point — exercises audio ingest, mel, model load/convert, decode,
tokenizer, segmentation, and output formatting in one run."""

import json
import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not (pathlib.Path(__file__).parents[1] / "whisper_rs_tpu" / "assets" / "gpt2.json").exists(),
    reason="gpt2.json fixture unavailable",
)


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from torch_oracle import make_random_state_dict

    from whisper_rs_tpu.config import ModelDims

    dims = ModelDims(
        n_mels=80,
        n_vocab=51864,  # real en vocab so the real tokenizer applies
        n_audio_ctx=1500,
        n_audio_state=64,
        n_audio_head=4,
        n_audio_layer=2,
        n_text_ctx=448,
        n_text_state=64,
        n_text_head=4,
        n_text_layer=2,
    )
    sd = make_random_state_dict(dims, seed=0)
    path = tmp_path_factory.mktemp("ckpt") / "tiny_test.pt"
    torch.save(
        {
            "dims": {
                "n_mels": dims.n_mels,
                "n_vocab": dims.n_vocab,
                "n_audio_ctx": dims.n_audio_ctx,
                "n_audio_state": dims.n_audio_state,
                "n_audio_head": dims.n_audio_head,
                "n_audio_layer": dims.n_audio_layer,
                "n_text_ctx": dims.n_text_ctx,
                "n_text_state": dims.n_text_state,
                "n_text_head": dims.n_text_head,
                "n_text_layer": dims.n_text_layer,
            },
            "model_state_dict": sd,
        },
        str(path),
    )
    return str(path)


def test_cli_transcribe_json(checkpoint, tmp_path, capsys):
    from whisper_rs_tpu.audio.io import write_wav
    from whisper_rs_tpu.cli import main

    rng = np.random.default_rng(0)
    wav = tmp_path / "t.wav"
    write_wav(wav, (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32))

    rc = main(
        [
            str(wav),
            "--checkpoint",
            checkpoint,
            "--greedy",
            "--sample-len",
            "8",
            "--dtype",
            "float32",
            "--json",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert payload["file"] == str(wav)
    assert "text" in payload
    assert isinstance(payload["segments"], list) and payload["segments"]
    seg = payload["segments"][0]
    assert set(seg) == {"start", "end", "text"}


def test_cli_missing_audio(checkpoint, capsys):
    from whisper_rs_tpu.cli import main

    rc = main(
        ["/nonexistent.wav", "--checkpoint", checkpoint, "--greedy",
         "--sample-len", "4", "--dtype", "float32"]
    )
    assert rc == 1


def test_cli_beam_and_quant(checkpoint, tmp_path, capsys):
    """Beam-search CLI path with int8 quantization, end to end."""
    from whisper_rs_tpu.audio.io import write_wav
    from whisper_rs_tpu.cli import main

    rng = np.random.default_rng(1)
    wav = tmp_path / "b.wav"
    write_wav(wav, (rng.standard_normal(16000) * 0.1).astype(np.float32))

    rc = main(
        [
            str(wav),
            "--checkpoint", checkpoint,
            "--beam", "2",
            "--sample-len", "4",
            "--dtype", "float32",
            "--quant", "int8",
            "--json",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert "text" in payload and payload["segments"]


def test_cli_srt_format(checkpoint, tmp_path, capsys):
    from whisper_rs_tpu.audio.io import write_wav
    from whisper_rs_tpu.cli import main

    rng = np.random.default_rng(2)
    wav = tmp_path / "s.wav"
    write_wav(wav, (rng.standard_normal(16000) * 0.1).astype(np.float32))
    rc = main([str(wav), "--checkpoint", checkpoint, "--greedy",
               "--sample-len", "4", "--dtype", "float32", "--format", "srt"])
    assert rc == 0
    out = capsys.readouterr().out
    # SRT shape: index line, HH:MM:SS,mmm --> HH:MM:SS,mmm cue (the exact
    # first timestamp depends on the random-weight decode)
    import re

    assert re.search(r"1\n\d\d:\d\d:\d\d,\d\d\d --> \d\d:\d\d:\d\d,\d\d\d\n", out)


@pytest.fixture(scope="module")
def multilingual_setup(tmp_path_factory):
    """Synthetic multilingual checkpoint (n_vocab=51865) + a fake
    multilingual tokenizer json (the real one is not fetchable offline:
    zero egress).  The fake moves <|endoftext|> to id 50257 — exactly the
    property `Tokenizer.is_multilingual` keys on — leaving BPE content
    untouched (random weights make the text gibberish either way)."""
    torch = pytest.importorskip("torch")
    from torch_oracle import make_random_state_dict

    from whisper_rs_tpu.config import ModelDims

    root = tmp_path_factory.mktemp("multi")
    src = pathlib.Path(__file__).parents[1] / "whisper_rs_tpu" / "assets" / "gpt2.json"
    tok = json.loads(src.read_text())
    vocab = tok["model"]["vocab"]
    assert vocab["<|endoftext|>"] == 50256
    vocab["<|endoftext|>"] = 50257
    vocab["<|filler50256|>"] = 50256
    tok_path = root / "gpt2_multi.json"
    tok_path.write_text(json.dumps(tok))

    dims = ModelDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    sd = make_random_state_dict(dims, seed=3)
    ckpt = root / "multi_test.pt"
    torch.save(
        {"dims": {k: getattr(dims, k) for k in (
            "n_mels", "n_vocab", "n_audio_ctx", "n_audio_state",
            "n_audio_head", "n_audio_layer", "n_text_ctx", "n_text_state",
            "n_text_head", "n_text_layer")},
         "model_state_dict": sd},
        str(ckpt),
    )
    return str(ckpt), str(tok_path)


def test_cli_language_auto(multilingual_setup, tmp_path, capsys):
    """--language auto: per-file detection feeds the sot sequence and the
    JSON output (reference declares Task::LanguageId but never implements
    it, tokenize.rs:135,143-147)."""
    from whisper_rs_tpu.audio.io import write_wav
    from whisper_rs_tpu.cli import main
    from whisper_rs_tpu.tokenize.languages import LANGUAGE_CODES

    ckpt, tok_json = multilingual_setup
    rng = np.random.default_rng(4)
    wav = tmp_path / "auto.wav"
    write_wav(wav, (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32))

    rc = main([
        str(wav), "--checkpoint", ckpt, "--tokenizer", tok_json,
        "--language", "auto", "--greedy", "--sample-len", "4",
        "--dtype", "float32", "--json",
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["language"] in LANGUAGE_CODES
    assert "text" in payload


def test_cli_language_auto_requires_multilingual(checkpoint, tmp_path, capsys):
    """en-only checkpoints reject --language auto with a clear error."""
    from whisper_rs_tpu.audio.io import write_wav
    from whisper_rs_tpu.cli import main

    rng = np.random.default_rng(5)
    wav = tmp_path / "en.wav"
    write_wav(wav, (rng.standard_normal(16000) * 0.1).astype(np.float32))
    rc = main([str(wav), "--checkpoint", checkpoint, "--language", "auto",
               "--greedy", "--sample-len", "4", "--dtype", "float32"])
    assert rc == 2
    assert "multilingual" in capsys.readouterr().err


def test_cli_batch_mode(checkpoint, tmp_path, capsys):
    """--batch routes multi-file input through the data-parallel batch
    driver: one JSON line per file, bad files isolated (exit 1 but the
    good file still transcribes), and --language auto is rejected."""
    from whisper_rs_tpu.audio.io import write_wav
    from whisper_rs_tpu.cli import main

    rng = np.random.default_rng(1)
    wavs = []
    for i in range(2):
        w = tmp_path / f"b{i}.wav"
        write_wav(w, (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32))
        wavs.append(str(w))

    rc = main(
        wavs
        + ["--checkpoint", checkpoint, "--greedy", "--sample-len", "6",
           "--dtype", "float32", "--batch", "2", "--json"]
    )
    assert rc == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert [p["file"] for p in lines] == wavs
    assert all("text" in p and isinstance(p["segments"], list) for p in lines)

    # per-file error isolation: missing file -> rc 1, good file still emitted
    rc = main(
        [wavs[0], "/nonexistent.wav", "--checkpoint", checkpoint, "--greedy",
         "--sample-len", "4", "--dtype", "float32", "--batch", "2", "--json"]
    )
    assert rc == 1
    out_lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert [p["file"] for p in out_lines] == [wavs[0]]

    # batch mode shares one decode config: language auto is rejected
    rc = main(
        wavs
        + ["--checkpoint", checkpoint, "--greedy", "--sample-len", "4",
           "--dtype", "float32", "--batch", "2", "--language", "auto"]
    )
    assert rc == 2
