"""Seek-loop segmentation tests with a stubbed decode task.

The stub returns crafted token sequences so both segmentation branches of
transcribe.rs:167-233 are exercised deterministically: consecutive-pair
splitting with timestamp-guided seek advance, and the single-segment
fallback with lone-trailing-timestamp duration trim."""

import numpy as np
import pytest

import whisper_rs_tpu.transcribe as T
from whisper_rs_tpu.audio import N_FRAMES
from whisper_rs_tpu.config import ModelDims, TranscribeOptions
from whisper_rs_tpu.decode.task import DecodeOutput

TS = 600  # ts_begin in the fake tokenizer
EOT = 500


class FakeTokenizer:
    token_id_sot = 501
    token_id_eot = EOT
    token_id_no_speech = 502
    token_id_startofprev = 503
    token_id_no_timestamps = 599
    token_id_ts_begin = TS
    token_id_space = 7

    def decode(self, toks):
        return "".join(f"<{int(t)}>" for t in toks if int(t) < TS)

    def encode(self, text):
        return [9, 8]

    def sequence_sot(self):
        return [self.token_id_sot]

    def non_speech_tokens(self):
        return (3, 5)


class StubDecodeTask:
    """Returns queued token sequences; records prompts it was given."""

    def __init__(self, outputs):
        self.outputs = list(outputs)
        self.prompts = []

    def set_prompt(self, prompt):
        self.prompts.append(list(prompt) if prompt is not None else None)

    def run(self, mel, temperature=None):
        toks = np.asarray(self.outputs.pop(0), np.int64)
        return [
            DecodeOutput(
                tokens=toks,
                text="".join(f"<{int(t)}>" for t in toks if int(t) < TS),
                avg_logprob=-0.5,
                no_speech_prob=0.1,
            )
        ]


DIMS = ModelDims(80, 1000, 1500, 64, 4, 2, 448, 64, 4, 2)


def make_task(outputs):
    task = T.TranscribeTask.__new__(T.TranscribeTask)
    task.dims = DIMS
    task.tokenizer = FakeTokenizer()
    task.options = TranscribeOptions()
    task.decode_task = StubDecodeTask(outputs)
    return task


def test_consecutive_timestamp_segmentation():
    # window 1: <|0.00|> 10 11 <|1.00|> <|1.00|> 12 <|2.00|> <|2.00|>
    # ts positions: 1.00s = ts+50, 2.00s = ts+100
    w1 = [TS + 0, 10, 11, TS + 50, TS + 50, 12, TS + 100, TS + 100]
    # window 2 (after seek advance): lone trailing ts -> fallback branch
    w2 = [TS + 0, 13, TS + 60]
    task = make_task([w1, w2])

    mel = np.zeros((80, N_FRAMES + 100), np.float32)  # 2 windows worth
    out = task.run(None, mel=mel)

    # first window: two segments from the pairs
    assert len(out.segments) == 3
    s0, s1, s2 = out.segments
    assert s0.seek == 0
    assert s0.start_time == pytest.approx(0.0)
    assert s0.end_time == pytest.approx(1.0)
    assert s0.text == "<10><11>"
    assert s1.start_time == pytest.approx(1.0)
    assert s1.end_time == pytest.approx(2.0)
    assert s1.text == "<12>"

    # seek advanced to last pair timestamp: 100 ts positions * 2 frames
    assert s2.seek == 200
    # fallback branch: duration trimmed to the lone trailing ts (60*0.02)
    assert s2.start_time == pytest.approx(2.0)
    assert s2.end_time == pytest.approx(2.0 + 1.2)
    assert s2.text == "<13>"

    # token accumulation: w1[:last_slice+1] (last_slice = 7, so all 8 tokens
    # incl. the closing pair — transcribe.rs:207-210) then all of w2
    expect_tokens = w1[:8] + w2
    np.testing.assert_array_equal(out.tokens, expect_tokens)
    # full text decodes non-ts tokens
    assert out.text == "<10><11><12><13>"


def test_full_window_advance_without_timestamps():
    w1 = [TS + 0, 20, 21]  # lone ts at start == ts_begin -> no trim
    task = make_task([w1])
    mel = np.zeros((80, 500), np.float32)
    out = task.run(None, mel=mel)
    assert len(out.segments) == 1
    seg = out.segments[0]
    assert seg.end_time == pytest.approx(30.0)  # full window duration


def test_prompt_conditioning_feeds_accumulated_tokens():
    w1 = [TS + 0, 30, TS + 10, TS + 10, 31, TS + 20, TS + 20]
    w2 = [TS + 0, 32]
    task = make_task([w1, w2])
    mel = np.zeros((80, N_FRAMES + 10), np.float32)
    out = task.run(None, mel=mel)
    stub = task.decode_task
    assert stub.prompts[0] == []  # first window: nothing accumulated yet
    # second window gets w1[:last_slice+1] (last_slice=6 -> all 7 tokens)
    assert stub.prompts[1] == w1


def test_initial_prompt_text():
    w1 = [TS + 0, 40]
    task = make_task([w1])
    task.options = TranscribeOptions(initial_prompt_text="hello")
    mel = np.zeros((80, 100), np.float32)
    out = task.run(None, mel=mel)
    # encoded prompt [9, 8] prepended to output token stream
    assert list(out.tokens[:2]) == [9, 8]
    assert task.decode_task.prompts[0] == [9, 8]


def test_zero_advance_guard():
    """A degenerate <|0.00|><|0.00|> pair must not stall the seek loop
    (full-window fallback instead of a 0-frame advance)."""
    w1 = [TS + 0, TS + 0]  # consecutive pair at timestamp 0.00
    w2 = [TS + 0, 44, TS + 30]
    task = make_task([w1, w2])
    mel = np.zeros((80, N_FRAMES + 50), np.float32)
    out = task.run(None, mel=mel)
    # window 1 consumed via full-window advance; window 2 processed; done
    assert len(task.decode_task.outputs) == 0
    assert out.segments[0].seek == 0
    assert out.segments[-1].seek == N_FRAMES


def test_sub_frame_audio_yields_empty_output():
    """Audio shorter than one hop (160 samples) has zero mel frames: the
    seek loop never runs and the output is empty rather than crashing."""
    task = make_task([])
    out = task.run(np.zeros(100, np.float32))
    assert len(out.segments) == 0
    assert out.text == ""
    assert out.tokens.size == 0
