"""Word-level timestamp alignment (decode/align.py): DTW correctness,
median filter, word splitting on the real tokenizer, and an end-to-end
TranscribeTask run with word_timestamps on."""

import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not (
        pathlib.Path(__file__).parents[1]
        / "whisper_rs_tpu" / "assets" / "gpt2.json"
    ).exists(),
    reason="gpt2.json fixture unavailable",
)

from whisper_rs_tpu.decode.align import (  # noqa: E402
    WordTiming,
    _dtw_fast,
    dtw,
    median_filter,
    split_words,
)


def _path_cost(cost, rows, cols):
    return float(cost[rows, cols].sum())


@pytest.mark.parametrize("shape", [(5, 7), (12, 12), (30, 90), (3, 40)])
def test_dtw_fast_matches_reference(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    cost = rng.standard_normal(shape)
    r1, c1 = dtw(cost)
    r2, c2 = _dtw_fast(cost)
    # both paths are optimal: identical total cost, monotone, full span
    assert np.isclose(_path_cost(cost, r1, c1), _path_cost(cost, r2, c2))
    for rows, cols in ((r1, c1), (r2, c2)):
        assert rows[0] == 0 and cols[0] == 0
        assert rows[-1] == shape[0] - 1 and cols[-1] == shape[1] - 1
        assert np.all(np.diff(rows) >= 0) and np.all(np.diff(cols) >= 0)
        assert np.all((np.diff(rows) + np.diff(cols)) >= 1)


def test_dtw_diagonal_preference():
    # a clean diagonal valley must be followed exactly
    N = 6
    cost = np.full((N, N), 10.0)
    np.fill_diagonal(cost, 0.0)
    rows, cols = _dtw_fast(cost)
    assert np.array_equal(rows, np.arange(N))
    assert np.array_equal(cols, np.arange(N))


def test_median_filter_matches_naive():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 33))
    width = 7
    got = median_filter(x, width)
    pad = width // 2
    xp = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            assert np.isclose(got[i, j], np.median(xp[i, j:j + width]))


def test_split_words_real_tokenizer():
    from whisper_rs_tpu.tokenize import Tokenizer

    tok = Tokenizer()
    ids = list(tok.encode(" hello there, wonderful world."))
    words = split_words(ids, tok.decode, "en")
    texts = [w for w, _ in words]
    # every token accounted for, in order
    assert [t for _, tl in words for t in tl] == ids
    assert len(texts) >= 4
    # punctuation glued to the preceding word, not standalone
    assert all(t.strip() not in {",", "."} for t in texts)
    joined = "".join(texts)
    assert joined.replace(" ", "") == " hello there, wonderful world.".replace(
        " ", ""
    )


def test_split_words_multibyte_cjk():
    """CJK text tokenizes into partial-UTF-8 byte fragments that decode to
    U+FFFD individually; cumulative decoding must merge them into complete
    characters (no '�' may survive into any word)."""
    from whisper_rs_tpu.tokenize import Tokenizer

    tok = Tokenizer()
    text = " 日本語のテスト"
    ids = list(tok.encode(text))
    # precondition: at least one token is a partial UTF-8 fragment
    per_token = [tok.decode(np.asarray([t], np.int64)) for t in ids]
    assert any("�" in p for p in per_token), "fixture lost its point"
    for lang in ("ja", "en"):
        words = split_words(ids, tok.decode, lang)
        assert [t for _, tl in words for t in tl] == ids
        assert all("�" not in w for w, _ in words), (lang, words)
        assert "".join(w for w, _ in words) == text
    # no-space language splits per character-piece, not one giant word
    assert len(split_words(ids, tok.decode, "ja")) >= 3


def test_split_words_emoji_roundtrip():
    from whisper_rs_tpu.tokenize import Tokenizer

    tok = Tokenizer()
    text = " nice 👍 ok"
    ids = list(tok.encode(text))
    words = split_words(ids, tok.decode, "en")
    assert [t for _, tl in words for t in tl] == ids
    assert all("�" not in w for w, _ in words)
    assert "".join(w for w, _ in words) == text


def test_transcribe_word_timestamps_e2e():
    import jax

    from whisper_rs_tpu.config import (
        DecodeOptions,
        GreedyMode,
        ModelDims,
        TranscribeOptions,
    )
    from whisper_rs_tpu.models import init_params
    from whisper_rs_tpu.tokenize import Tokenizer
    from whisper_rs_tpu.transcribe import TranscribeTask

    dims = ModelDims(
        n_mels=80, n_vocab=51864, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_params(jax.random.PRNGKey(7), dims)
    tokenizer = Tokenizer()
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)

    task = TranscribeTask(
        params, dims, tokenizer,
        TranscribeOptions(
            decode=DecodeOptions(mode=GreedyMode(), sample_len=12),
            word_timestamps=True,
        ),
    )
    res = task.run(audio)
    assert res.segments
    all_words = []
    for s in res.segments:
        assert s.words is not None
        all_words.extend(s.words)
    assert all_words, "expected at least one aligned word"
    for w in all_words:
        assert isinstance(w, WordTiming)
        assert w.word.strip() != ""
        assert 0.0 <= w.start <= w.end <= 35.0
    # word times are monotone across the transcript
    starts = [w.start for w in all_words]
    assert all(a <= b + 1e-9 for a, b in zip(starts, starts[1:]))


def test_word_timestamps_off_by_default():
    from whisper_rs_tpu.transcribe import TranscribeSegment

    s = TranscribeSegment(0, 0.0, 1.0, 0, 1, "x")
    assert s.words is None
