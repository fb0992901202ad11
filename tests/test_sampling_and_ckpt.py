"""Temperature sampling / best-of-N (reference left unimplemented,
greedy.rs:27-29), no-speech skip (reference TODO, transcribe.rs:165), and
checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from whisper_rs_tpu.config import (
    DecodeOptions,
    GreedyMode,
    ModelDims,
    TranscribeOptions,
)
from whisper_rs_tpu.decode import FilterConfig, decode_greedy
from whisper_rs_tpu.models import init_params
from whisper_rs_tpu.models.checkpoint import load_params, save_params
from whisper_rs_tpu.transcribe import should_skip_no_speech

DIMS = ModelDims(80, 1000, 1500, 64, 4, 2, 448, 64, 4, 2)
CFG = FilterConfig(
    n_vocab=1000,
    token_id_eot=500,
    token_id_space=7,
    token_id_ts_begin=600,
    token_id_no_timestamps=599,
)


def _decode(params, mel, mode, rng_key=None, temperature=None):
    initial = np.asarray([[501]] * mel.shape[0], np.int32)
    return decode_greedy(
        params,
        jnp.asarray(mel),
        jnp.asarray(initial),
        jnp.int32(1),
        jnp.int32(0),
        DIMS,
        CFG,
        mode,
        8,
        no_speech_id=502,
        rng_key=rng_key,
        temperature=temperature,
    )


def test_temperature_sampling_best_of_n():
    params = init_params(jax.random.PRNGKey(5), DIMS)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3

    mode = GreedyMode(group_size=3, temperature=0.8)
    res = _decode(params, mel, mode, rng_key=jax.random.PRNGKey(7))
    assert res.candidates.shape == (2, 3, 448)
    assert res.scores.shape == (2, 3)
    # sampled candidates within a group differ (overwhelmingly likely)
    c = np.asarray(res.candidates)
    assert not (
        np.array_equal(c[0, 0], c[0, 1]) and np.array_equal(c[0, 1], c[0, 2])
    )
    # every candidate EOT-terminated by finalize
    for i in range(2):
        for g in range(3):
            assert 500 in list(c[i, g])

    # deterministic given the same key
    res2 = _decode(params, mel, mode, rng_key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(c, np.asarray(res2.candidates))

    # temperature 0 == plain greedy, group collapses to identical rows
    res0 = _decode(params, mel, GreedyMode(group_size=2, temperature=0.0))
    c0 = np.asarray(res0.candidates)
    np.testing.assert_array_equal(c0[:, 0], c0[:, 1])


def test_no_speech_skip_rule():
    opts = TranscribeOptions(no_speech_threshold=0.6, logprob_threshold=-1.0)
    assert should_skip_no_speech(opts, 0.9, -2.0)
    assert not should_skip_no_speech(opts, 0.9, -0.5)  # confident decode
    assert not should_skip_no_speech(opts, 0.3, -2.0)  # speech likely
    # default: reference behavior (never skip)
    assert not should_skip_no_speech(TranscribeOptions(), 0.99, -9.0)


def test_checkpoint_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(1), DIMS)
    p = tmp_path / "ckpt.npz"
    save_params(str(p), params, DIMS)
    loaded, dims = load_params(str(p))
    assert dims == DIMS
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        loaded,
    )


def test_detect_language_shapes():
    from whisper_rs_tpu.decode.language import detect_language

    class MiniTok:
        token_id_sot = 501

    params = init_params(jax.random.PRNGKey(3), DIMS)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3
    # vocab 1000 < 501+1+99=601 fits
    out = detect_language(params, mel, DIMS, MiniTok())
    assert len(out) == 2
    for probs in out:
        assert len(probs) == 99
        np.testing.assert_allclose(sum(probs.values()), 1.0, rtol=1e-4)
        # sorted most-likely first
        vals = list(probs.values())
        assert vals == sorted(vals, reverse=True)


def test_compression_ratio_and_fallback_rule():
    from whisper_rs_tpu.transcribe import compression_ratio, needs_fallback

    assert compression_ratio("ha ha ha ha ha ha ha ha ha ha") > compression_ratio(
        "the quick brown fox jumped"
    )
    opts = TranscribeOptions(
        temperatures=(0.0, 0.5), compression_ratio_threshold=2.4,
        logprob_threshold=-1.0,
    )
    assert needs_fallback(opts, "ok text", -2.0)  # low confidence
    assert needs_fallback(opts, "na " * 200, -0.1)  # degenerate repetition
    assert not needs_fallback(opts, "a normal sentence here", -0.1)
    # OpenAI silence short-circuit: a confidently-silent window is accepted
    # (then skipped) instead of climbing the ladder, even if it would
    # otherwise fail the confidence/repetition checks
    sil = TranscribeOptions(
        temperatures=(0.0, 0.5), compression_ratio_threshold=2.4,
        logprob_threshold=-1.0, no_speech_threshold=0.6,
    )
    assert not needs_fallback(sil, "ok text", -2.0, no_speech_prob=0.9)
    assert not needs_fallback(sil, "na " * 200, -0.1, no_speech_prob=0.9)
    assert needs_fallback(sil, "ok text", -2.0, no_speech_prob=0.3)
    # threshold unset -> no short-circuit regardless of the probability
    assert needs_fallback(opts, "ok text", -2.0, no_speech_prob=0.99)


def test_temperature_ladder_retries(monkeypatch):
    """Windows failing quality checks retry at the next temperature."""
    from whisper_rs_tpu import transcribe as T
    from whisper_rs_tpu.decode.task import DecodeOutput

    calls = []

    class StubTask:
        def __init__(self, temperature, outputs):
            self.temperature = temperature
            self.outputs = outputs

        def set_prompt(self, p):
            pass

        def run(self, mel, temperature=None):
            # the shared sampling task receives the rung as a runtime arg
            calls.append(self.temperature if temperature is None else temperature)
            return [self.outputs.pop(0)]

    bad = DecodeOutput(
        tokens=np.asarray([600, 10], np.int64), text="x", avg_logprob=-5.0,
        no_speech_prob=0.0,
    )
    good = DecodeOutput(
        tokens=np.asarray([600, 11], np.int64), text="fine words", avg_logprob=-0.2,
        no_speech_prob=0.0,
    )

    task = T.TranscribeTask.__new__(T.TranscribeTask)
    task.dims = DIMS
    task.tokenizer = type(
        "Tok",
        (),
        {
            "token_id_ts_begin": 600,
            "decode": staticmethod(lambda toks: "t"),
            "encode": staticmethod(lambda s: [1]),
        },
    )()
    task.options = TranscribeOptions(
        temperatures=(0.0, 0.4), condition_on_prev_text=False
    )
    t0 = StubTask(0.0, [bad])
    t4 = StubTask(None, [good])
    task.decode_task = t0
    task._fallback_tasks = {"sampling": t4}

    mel = np.zeros((80, 100), np.float32)
    out = task.run(None, mel=mel)
    assert calls == [0.0, 0.4]  # retried once
    assert out.avg_logprobs == [-0.2]


def test_checkpoint_preserves_int8(tmp_path):
    """Quantized checkpoints must round-trip int8 leaves as int8 — casting
    them to the float target dtype would silently quadruple the weight
    footprint (round-1 advisor finding)."""
    import jax.numpy as jnp

    from whisper_rs_tpu.models import init_params
    from whisper_rs_tpu.models.quantize import quantize_params

    params = init_params(jax.random.PRNGKey(3), DIMS)
    qparams = quantize_params(params)
    p = tmp_path / "q.npz"
    save_params(str(p), qparams, DIMS)
    loaded, _ = load_params(str(p), dtype=jnp.bfloat16)

    flat_orig = jax.tree_util.tree_flatten_with_path(qparams)[0]
    flat_load = jax.tree_util.tree_flatten_with_path(loaded)[0]
    n_int8 = 0
    for (path_o, leaf_o), (path_l, leaf_l) in zip(flat_orig, flat_load):
        assert path_o == path_l
        if leaf_o.dtype == jnp.int8:
            assert leaf_l.dtype == jnp.int8, path_l
            n_int8 += 1
        elif jnp.issubdtype(leaf_o.dtype, jnp.floating):
            assert leaf_l.dtype == jnp.bfloat16, path_l
    assert n_int8 > 0


def test_traced_temperature_single_executable():
    """A traced temperature scalar reproduces the static-temperature decode
    exactly, and one jitted executable serves every rung (round-1 weak #8:
    one compile per ladder rung)."""
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(5), DIMS)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3

    def run_traced(t):
        return _decode(
            params, mel, GreedyMode(group_size=2),
            rng_key=jax.random.PRNGKey(7), temperature=jnp.float32(t),
        )

    for t in (0.0, 0.8):
        ref = _decode(
            params, mel, GreedyMode(group_size=2, temperature=t),
            rng_key=jax.random.PRNGKey(7),
        )
        got = run_traced(t)
        np.testing.assert_array_equal(
            np.asarray(got.candidates), np.asarray(ref.candidates)
        )
