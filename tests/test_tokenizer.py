"""Tokenizer wrapper tests against the GPT-2 vocab (reference fixture
tokenizer/gpt2.json; reference behavior at tokenize.rs:140-321)."""

import pathlib

import pytest

pytestmark = pytest.mark.skipif(
    not (pathlib.Path(__file__).parents[1] / "whisper_rs_tpu" / "assets" / "gpt2.json").exists(),
    reason="gpt2.json fixture unavailable",
)

from whisper_rs_tpu.tokenize import Task, Tokenizer


@pytest.fixture(scope="module")
def tok():
    return Tokenizer(Task.TRANSCRIBE)


def test_special_token_ids(tok):
    # gpt2 vocab: 0..50256 (eot=50256); specials appended in canonical order
    assert tok.token_id_eot == 50256
    assert tok.token_id_sot == 50257
    # 99 language tags follow sot
    assert tok.token_id_translate == 50257 + 100
    assert tok.token_id_transcribe == 50257 + 101
    assert tok.token_id_startoflm == 50257 + 102
    assert tok.token_id_startofprev == 50257 + 103
    assert tok.token_id_no_speech == 50257 + 104
    assert tok.token_id_no_timestamps == 50257 + 105
    # virtual timestamps begin right after the last special
    assert tok.token_id_ts_begin == 50257 + 106


def test_encode_decode_roundtrip(tok):
    text = " And so my fellow Americans"
    ids = tok.encode(text)
    assert isinstance(ids, list) and len(ids) > 0
    assert tok.decode(ids) == text


def test_decode_skips_timestamp_and_special_tokens(tok):
    ids = tok.encode(" hello world")
    with_ts = [tok.token_id_sot, tok.token_id_ts_begin] + ids + [
        tok.token_id_ts_begin + 50,
        tok.token_id_eot,
    ]
    assert tok.decode(with_ts) == " hello world"


def test_decode_with_timestamps(tok):
    ids = tok.encode(" hi")
    seq = [tok.token_id_ts_begin] + ids + [tok.token_id_ts_begin + 100]
    out = tok.decode_with_timestamps(seq)
    assert out.startswith("<|0.00|>")
    assert out.endswith("<|2.00|>")
    assert " hi" in out


def test_sequence_sot_english_only(tok):
    # en-only vocab: bare [sot] (tokenize.rs:201-205)
    assert tok.sequence_sot() == [tok.token_id_sot]


def test_non_speech_tokens(tok):
    ns = tok.non_speech_tokens()
    assert len(ns) > 30
    assert ns == tuple(sorted(ns))
    # '#' encodes to one token and must be suppressed
    hash_id = tok.encode("#")[0]
    assert hash_id in ns
    # " -" first token
    dash_id = tok.encode(" -")[0]
    assert dash_id in ns
    # basic punctuation NOT suppressed
    for keep in [",", ".", "?", "!"]:
        ids = tok.encode(keep)
        if len(ids) == 1:
            assert ids[0] not in ns


def test_token_id_space(tok):
    assert tok.token_id_space == tok.encode(" hello")[0] or tok.token_id_space == tok.encode(" ")[0]


def test_multilingual_sot_sequence(tok, monkeypatch):
    """Multilingual sequence [sot, <|lang|>, <|task|>] (the reference leaves
    this unimplemented, tokenize.rs:202-203)."""
    monkeypatch.setattr(
        Tokenizer, "is_multilingual", property(lambda self: True)
    )
    tok2 = Tokenizer(Task.TRANSCRIBE, language="de")
    seq = tok2.sequence_sot()
    assert seq[0] == tok2.token_id_sot
    assert seq[1] == tok2._tk.token_to_id("<|de|>")
    assert seq[2] == tok2.token_id_transcribe

    tok3 = Tokenizer(Task.TRANSLATE, language="fr")
    seq = tok3.sequence_sot()
    assert seq[2] == tok3.token_id_translate

    import pytest as _pytest

    tok4 = Tokenizer(Task.TRANSCRIBE, language="xx")
    with _pytest.raises(ValueError):
        tok4.sequence_sot()


def test_large_v3_100_language_layout():
    """large-v3 family (n_vocab 51866) has 100 language tokens (<|yue|>);
    every special after the language block shifts by one vs the 99-language
    checkpoints.  Regression for the round-1 advisor finding."""
    from whisper_rs_tpu.config import dims_for
    from whisper_rs_tpu.tokenize.languages import num_languages_for_vocab

    assert num_languages_for_vocab(51864) == 99
    assert num_languages_for_vocab(51865) == 99
    assert num_languages_for_vocab(51866) == 100

    tok = Tokenizer.for_dims(dims_for("large-v3"))
    assert tok.num_languages == 100
    assert tok.language_codes[-1] == "yue"
    assert tok._tk.token_to_id("<|yue|>") == 50257 + 100
    # OpenAI large-v3 canonical IDs
    assert tok.token_id_sot == 50258 - 1  # gpt2 en vocab base in this fixture
    base = tok.token_id_sot
    assert tok.token_id_translate == base + 101
    assert tok.token_id_transcribe == base + 102
    assert tok.token_id_startoflm == base + 103
    assert tok.token_id_startofprev == base + 104
    assert tok.token_id_no_speech == base + 105
    assert tok.token_id_no_timestamps == base + 106
    assert tok.token_id_ts_begin == base + 107

    # 99-language models keep the old layout
    tok99 = Tokenizer.for_dims(dims_for("base.en"))
    assert tok99.num_languages == 99
    assert tok99.token_id_transcribe == tok99.token_id_sot + 101
