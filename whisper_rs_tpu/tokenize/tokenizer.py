"""Whisper tokenizer: GPT-2 BPE + Whisper special tokens + virtual
timestamp tokens.

Host-side component (tokenization never touches the TPU), wrapping the
HuggingFace `tokenizers` package — the same backend the reference wraps from
Rust (/root/reference/src/tokenize.rs:112-321, Cargo.toml:17).

Special-token registration follows tokenize.rs:154-178:
``<|startoftranscript|>``, the 99 ``<|xx|>`` language tags (canonical order —
see languages.py), ``<|translate|>``, ``<|transcribe|>``, ``<|startoflm|>``,
``<|startofprev|>``, ``<|nospeech|>``, ``<|notimestamps|>``.  Timestamp
tokens are *virtual*: IDs beyond the last special token
(tokenize.rs:188-191), ``<|0.00|>`` .. in 0.02 s steps.
"""

from __future__ import annotations

import enum
import functools
import os
import pathlib
from typing import List, Optional, Sequence

from .languages import language_table, num_languages_for_vocab

_DEFAULT_TOKENIZER_PATHS = (
    os.environ.get("WHISPER_TOKENIZER_JSON"),
    str(pathlib.Path(__file__).resolve().parents[2] / "assets" / "gpt2.json"),
)


class Task(enum.Enum):
    """reference: tokenize.rs:133-138."""

    LANGUAGE_ID = "language_id"
    TRANSLATE = "translate"
    TRANSCRIBE = "transcribe"


_SPECIALS_TAIL = (
    "<|translate|>",
    "<|transcribe|>",
    "<|startoflm|>",
    "<|startofprev|>",
    "<|nospeech|>",
    "<|notimestamps|>",
)

# Symbols whose single-token encodings are suppressed to avoid non-speech
# annotations (reference tokenize.rs:215-307).
_NON_SPEECH_SYMBOLS = (
    '"', "#", "(", ")", "*", "+", "/", ":", ";", "<", "=", ">", "@", "[",
    "\\", "]", "^", "_", "`", "{", "|", "}", "~", "「", "」", "『", "』",
    "<<", ">>", "<<<", ">>>", "--", "---", "-(", "-[", "('", '("', "((",
    "))", "(((", ")))", "[[", "]]", "{{", "}}", "♪♪", "♪♪♪",
)

# U+2640-U+267F misc symbols: suppressing the *first* BPE token is safe since
# the 3-byte UTF-8 representations share their first two bytes
# (tokenize.rs:287-303).
_NON_SPEECH_MISC = ("♩", "♪", "♫", "♬", "♭", "♮", "♯")


class Tokenizer:
    """Fast-access wrapper (reference ``Tokenizer`` struct,
    tokenize.rs:112-131): caches every control-token ID as an attribute."""

    def __init__(
        self,
        task: Task = Task.TRANSCRIBE,
        tokenizer_json: Optional[str] = None,
        language: str = "en",
        num_languages: int = 99,
    ):
        # Multilingual task routing is implemented (unlike the reference,
        # which asserts transcribe-only, tokenize.rs:143-147) but the
        # sot-sequence keeps reference semantics by default.
        #
        # `num_languages` must match the checkpoint family: 99 for every
        # model through large-v2, 100 for large-v3/large-v3-turbo (which
        # insert <|yue|> after <|su|>, shifting every later special ID by
        # one).  Use `Tokenizer.for_dims(...)` / `num_languages_for_vocab`
        # to derive it from the model's n_vocab.
        import tokenizers as hf_tokenizers

        path = tokenizer_json
        if path is None:
            for cand in _DEFAULT_TOKENIZER_PATHS:
                if cand and pathlib.Path(cand).exists():
                    path = cand
                    break
        if path is None:
            raise FileNotFoundError(
                "no tokenizer json found; set WHISPER_TOKENIZER_JSON or pass "
                "tokenizer_json="
            )

        tk = hf_tokenizers.Tokenizer.from_file(str(path))

        self.languages = language_table(num_languages)
        self.language_codes = tuple(code for code, _ in self.languages)
        self.num_languages = num_languages
        specials = (
            ["<|startoftranscript|>"]
            + [f"<|{code}|>" for code in self.language_codes]
            + list(_SPECIALS_TAIL)
        )
        tk.add_special_tokens(
            [
                hf_tokenizers.AddedToken(s, special=True, normalized=False)
                for s in specials
            ]
        )

        self._tk = tk
        self.task = task
        self.language = language

        self.token_id_sot = tk.token_to_id("<|startoftranscript|>")
        self.token_id_eot = tk.token_to_id("<|endoftext|>")
        self.token_id_translate = tk.token_to_id("<|translate|>")
        self.token_id_transcribe = tk.token_to_id("<|transcribe|>")
        self.token_id_no_timestamps = tk.token_to_id("<|notimestamps|>")
        self.token_id_no_speech = tk.token_to_id("<|nospeech|>")
        self.token_id_startofprev = tk.token_to_id("<|startofprev|>")
        self.token_id_startoflm = tk.token_to_id("<|startoflm|>")
        # virtual timestamp tokens start right after the last special token
        self.token_id_ts_begin = (
            max(tk.token_to_id(s) for s in specials) + 1
        )

    @classmethod
    def for_dims(cls, dims, task: Task = Task.TRANSCRIBE,
                 tokenizer_json: Optional[str] = None, language: str = "en"):
        """Tokenizer matching a ModelDims' vocab (picks 99 vs 100 languages;
        large-v3's n_vocab=51866 adds <|yue|> and shifts later special IDs)."""
        return cls(
            task,
            tokenizer_json=tokenizer_json,
            language=language,
            num_languages=num_languages_for_vocab(dims.n_vocab),
        )

    # -- encode / decode ----------------------------------------------------

    def encode(self, text: str) -> List[int]:
        return self._tk.encode(text, add_special_tokens=True).ids

    def decode(self, token_ids: Sequence[int]) -> str:
        """Decode, silently skipping virtual timestamp IDs (they are outside
        the vocab — the reference relies on the HF decoder dropping unknown
        IDs, tokenize.rs:309-312)."""
        ids = [int(t) for t in token_ids if int(t) < self.token_id_ts_begin]
        return self._tk.decode(ids, skip_special_tokens=True)

    def decode_with_timestamps(self, token_ids: Sequence[int]) -> str:
        """Debug-friendly decode rendering ``<|t.tt|>`` markers."""
        out, chunk = [], []
        for t in token_ids:
            t = int(t)
            if t >= self.token_id_ts_begin:
                if chunk:
                    out.append(self.decode(chunk))
                    chunk = []
                out.append(f"<|{(t - self.token_id_ts_begin) * 0.02:.2f}|>")
            else:
                chunk.append(t)
        if chunk:
            out.append(self.decode(chunk))
        return "".join(out)

    # -- control sequences --------------------------------------------------

    def sequence_sot(self) -> List[int]:
        """Initial SOT sequence.

        Reference returns ``[sot]`` only, with translate unimplemented
        (tokenize.rs:201-205).  We return the full multilingual sequence
        ``[sot, <|lang|>, <|task|>]`` when the task/language call for it, and
        the bare ``[sot]`` for English-only transcribe — matching both the
        reference and OpenAI's en-only models.
        """
        if self.task == Task.TRANSCRIBE and self.language == "en" and not self.is_multilingual:
            return [self.token_id_sot]
        lang_id = self._tk.token_to_id(f"<|{self.language}|>")
        if lang_id is None:
            raise ValueError(f"unknown language {self.language!r}")
        task_id = (
            self.token_id_translate
            if self.task == Task.TRANSLATE
            else self.token_id_transcribe
        )
        return [self.token_id_sot, lang_id, task_id]

    @property
    def is_multilingual(self) -> bool:
        # en-only gpt2 vocab has 50257 base tokens; multilingual has 50258+
        return self._tk.token_to_id("<|endoftext|>") != 50256

    @functools.lru_cache(maxsize=1)
    def non_speech_tokens(self) -> tuple:
        """Token IDs to suppress so the model avoids speaker tags / music
        glyphs (same construction as tokenize.rs:215-307): ``" -"``/``" '"``
        first tokens, each symbol (bare and space-prefixed) when it encodes
        to a single token, and the first token of each U+2640-U+267F glyph."""
        enc = lambda s: self._tk.encode(s, add_special_tokens=True).ids
        result = [enc(" -")[0], enc(" '")[0]]
        for sym in _NON_SPEECH_SYMBOLS:
            for variant in (sym, " " + sym):
                ids = enc(variant)
                if len(ids) == 1:
                    result.append(ids[0])
        for sym in _NON_SPEECH_MISC:
            for variant in (sym, " " + sym):
                result.append(enc(variant)[0])
        return tuple(sorted(set(result)))

    @property
    def token_id_space(self) -> int:
        """First token of " " — used by the suppress-blank filter
        (suppress_blanks.rs:24-31)."""
        return self._tk.encode(" ", add_special_tokens=True).ids[0]
