"""WER metric + CLI arg plumbing tests."""

import numpy as np

from whisper_rs_tpu.cli import build_parser
from whisper_rs_tpu.utils.wer import edit_distance, wer


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a"]) == 1
    assert edit_distance("the cat sat".split(), "the cat sat".split()) == 0
    assert edit_distance("the cat sat".split(), "the bat sat".split()) == 1
    assert edit_distance("a b c".split(), "b c d".split()) == 2


def test_wer_normalization():
    refs = ["THE QUICK BROWN FOX", "HELLO WORLD"]
    hyps = ["the quick brown fox!", "hello, world"]
    assert wer(refs, hyps) == 0.0
    assert wer(["a b c d"], ["a b x d"]) == 0.25


def test_cli_parser_defaults():
    args = build_parser().parse_args(["f.wav", "--checkpoint", "w.pt"])
    assert args.beam == 5
    assert args.patience == 1.0
    assert args.max_initial_timestamp == 1.0
    assert not args.greedy
    assert args.dtype == "bfloat16"


def test_subtitle_formats():
    from whisper_rs_tpu.transcribe import TranscribeSegment
    from whisper_rs_tpu.utils import to_srt, to_text, to_vtt

    segs = [
        TranscribeSegment(0, 0.0, 2.5, 0, 3, " hello there"),
        TranscribeSegment(0, 2.5, 3661.25, 3, 6, " big jump"),
    ]
    srt = to_srt(segs)
    assert "1\n00:00:00,000 --> 00:00:02,500\nhello there" in srt
    assert "01:01:01,250" in srt  # 3661.25s rolls into hours
    vtt = to_vtt(segs)
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:02.500" in vtt
    assert to_text(segs) == "hello there\nbig jump"
