"""ServingEngine: continuous batching of transcription requests.

Validates the serving layer (whisper_rs_tpu/serve.py — a new subsystem with
no reference counterpart; the reference is one-shot, transcribe.rs:103)
against the sequential TranscribeTask on the same tiny model: identical
output per utterance, mid-flight admission (no drain barrier), per-request
error isolation, and stats/latency accounting.
"""

import threading
import time

import jax
import numpy as np
import pytest

from whisper_rs_tpu.config import (
    DecodeOptions,
    GreedyMode,
    ModelDims,
    TranscribeOptions,
)
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.serve import ServingEngine
from whisper_rs_tpu.transcribe import TranscribeTask

from test_batch_transcriber import DIMS, OPTS, SmallTokenizer


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(21), DIMS)
    rng = np.random.default_rng(9)
    audios = [
        (rng.standard_normal(16000 * 35) * 0.1).astype(np.float32),  # 2 windows
        (rng.standard_normal(16000 * 20) * 0.1).astype(np.float32),  # 1 window
        (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32),  # 1 window
    ]
    return params, audios


def test_serving_matches_sequential(setup):
    """Output is bit-identical to TranscribeTask regardless of batch
    composition (rows are independent in the jitted program)."""
    params, audios = setup
    tok = SmallTokenizer()

    with ServingEngine(params, DIMS, tok, OPTS, batch_size=2) as engine:
        handles = [engine.submit(a) for a in audios]
        outs = [h.result(timeout=600) for h in handles]

    for audio, got in zip(audios, outs):
        want = TranscribeTask(params, DIMS, tok, OPTS).run(audio)
        assert got.text == want.text
        np.testing.assert_array_equal(got.tokens, want.tokens)
        assert len(got.segments) == len(want.segments)
        for gs, ws in zip(got.segments, want.segments):
            assert gs.seek == ws.seek
            assert gs.start_time == pytest.approx(ws.start_time)
            assert gs.text == ws.text


def test_continuous_admission_no_drain_barrier(setup):
    """A request submitted while the engine is mid-utterance joins the very
    next window batch (continuous batching), not after a full drain."""
    params, audios = setup
    tok = SmallTokenizer()
    engine = ServingEngine(params, DIMS, tok, OPTS, batch_size=2)

    rounds = []  # (n_real_rows, active_request_ids) per decode round
    orig = engine.decode_task.run_batch
    barrier = threading.Event()

    def spy(mel, prompts, **kw):
        rounds.append(sorted(
            j.handle.request_id for j in engine._active if j is not None
        ))
        barrier.set()  # first round started: release the late submitter
        return orig(mel, prompts, **kw)

    engine.decode_task.run_batch = spy
    try:
        h_long = engine.submit(audios[0])  # 2 windows: occupies >= 2 rounds
        assert barrier.wait(timeout=600)
        h_late = engine.submit(audios[2])  # 1 window, submitted mid-flight
        out_long = h_long.result(timeout=600)
        out_late = h_late.result(timeout=600)
    finally:
        engine.close()

    assert out_long.text and out_late.text
    # the late request must appear in some round TOGETHER with the long one
    # (shared batch) — proof there was no drain barrier between requests
    joint = [r for r in rounds if len(r) == 2]
    assert joint, rounds
    # and the late request's output still matches sequential decoding
    want = TranscribeTask(params, DIMS, tok, OPTS).run(audios[2])
    assert out_late.text == want.text


def test_error_isolation_per_request(setup):
    """A request whose windows poison the device fails alone; batchmates
    complete normally (same isolation contract as parallel/batch.py)."""
    params, audios = setup
    tok = SmallTokenizer()
    engine = ServingEngine(params, DIMS, tok, OPTS, batch_size=2)

    class Boom(Exception):
        pass

    orig = engine.decode_task.run_batch

    def flaky(mel, prompts, **kw):
        if np.isnan(np.asarray(mel)).any():
            raise Boom("device error")
        return orig(mel, prompts, **kw)

    engine.decode_task.run_batch = flaky
    try:
        bad = np.full(16000 * 5, np.nan, np.float32)
        h_good = engine.submit(audios[1])
        h_bad = engine.submit(bad)
        out = h_good.result(timeout=600)
        assert out.text
        with pytest.raises(Boom):
            h_bad.result(timeout=600)
    finally:
        engine.close()

    s = engine.stats()
    assert s["completed"] == 1 and s["failed"] == 1


def test_unreadable_audio_rejected_at_submit(setup):
    """Garbage input fails its own handle at submit; the engine stays up."""
    params, audios = setup
    tok = SmallTokenizer()
    with ServingEngine(params, DIMS, tok, OPTS, batch_size=2) as engine:
        h_bad = engine.submit(np.zeros((0,), np.float32))  # empty: mel fails
        h_good = engine.submit(audios[2])
        assert h_good.result(timeout=600).text
        if not h_bad.done() or h_bad._error is None:
            # empty audio may legitimately produce an empty transcript
            # instead of an error; either way the good request completed
            h_bad.result(timeout=600)


def test_stats_and_partial_segments(setup):
    params, audios = setup
    tok = SmallTokenizer()
    with ServingEngine(params, DIMS, tok, OPTS, batch_size=2) as engine:
        handles = [engine.submit(a) for a in audios]
        assert engine.drain(timeout=600)
        outs = [h.result(timeout=1) for h in handles]
        s = engine.stats()

    assert s["submitted"] == 3 and s["completed"] == 3 and s["failed"] == 0
    assert s["queued"] == 0 and s["active"] == 0
    assert s["windows_decoded"] >= 4  # 2 + 1 + 1 windows minimum
    assert 0.0 < s["batch_utilization"] <= 1.0
    assert s["throughput_audio_s_per_s"] > 0.0
    assert s["latency_p50"] is not None and s["latency_p95"] is not None
    for h, out in zip(handles, outs):
        assert h.latency is not None and h.latency > 0.0
        # after completion the partial-segment snapshot equals the output
        assert len(h.segments_so_far()) == len(out.segments)


def test_serving_temperature_fallback_matches_sequential(setup):
    """Full TranscribeOptions contract: a window failing needs_fallback is
    re-decoded at the next temperature rung (seek held) and the accepted
    output is bit-identical to the sequential TranscribeTask running the
    same ladder.  logprob_threshold=1.0 forces every window off rung 0
    (avg logprobs are always negative), so the t>0 sampling task MUST
    engage."""
    import dataclasses

    params, audios = setup
    tok = SmallTokenizer()
    opts = dataclasses.replace(
        OPTS, temperatures=(0.0, 0.5), logprob_threshold=1.0
    )

    with ServingEngine(params, DIMS, tok, opts, batch_size=2) as engine:
        handles = [engine.submit(a) for a in audios]
        outs = [h.result(timeout=600) for h in handles]
        engaged = engine._sampling_task_cache is not None
    assert engaged, "fallback never reached the t>0 sampling rung"

    for audio, got in zip(audios, outs):
        want = TranscribeTask(params, DIMS, tok, opts).run(audio)
        assert got.text == want.text
        np.testing.assert_array_equal(got.tokens, want.tokens)
        assert len(got.segments) == len(want.segments)
        assert got.avg_logprobs == pytest.approx(want.avg_logprobs)


def test_serving_word_timestamps_matches_sequential(setup):
    """Word-timestamp alignment runs per serving row and matches the
    sequential TranscribeTask word-for-word."""
    import dataclasses

    params, audios = setup
    tok = SmallTokenizer()
    opts = dataclasses.replace(OPTS, word_timestamps=True)

    with ServingEngine(params, DIMS, tok, opts, batch_size=2) as engine:
        handles = [engine.submit(a) for a in audios]
        outs = [h.result(timeout=600) for h in handles]

    any_words = False
    for audio, got in zip(audios, outs):
        want = TranscribeTask(params, DIMS, tok, opts).run(audio)
        assert got.text == want.text
        assert len(got.segments) == len(want.segments)
        for gs, ws in zip(got.segments, want.segments):
            gw = gs.words or []
            ww = ws.words or []
            assert len(gw) == len(ww)
            for a, b in zip(gw, ww):
                any_words = True
                assert a.word == b.word
                assert a.start == pytest.approx(b.start)
                assert a.end == pytest.approx(b.end)
    assert any_words, "expected at least one aligned word"


def test_serving_tp_sharded_params(setup):
    """Serving is the layer multi-chip exists for: the engine must run on
    TP-sharded params over the fake mesh and match unsharded serving."""
    import jax as _jax

    from whisper_rs_tpu.parallel import make_mesh, shard_params

    if len(_jax.devices()) < 8:
        pytest.skip("needs the 8-device fake mesh")

    params, audios = setup
    tok = SmallTokenizer()

    with ServingEngine(params, DIMS, tok, OPTS, batch_size=2) as engine:
        want = [engine.submit(a).result(timeout=600) for a in audios]

    mesh = make_mesh(n_model=2)
    with _jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        with ServingEngine(sp, DIMS, tok, OPTS, batch_size=2) as engine:
            handles = [engine.submit(a) for a in audios]
            got = [h.result(timeout=600) for h in handles]

    for w, g in zip(want, got):
        assert w.text == g.text
        np.testing.assert_array_equal(w.tokens, g.tokens)
