"""Word-level timestamps via cross-attention DTW alignment.

The reference has no word timing at all (segments only,
transcribe.rs:59-67); this implements the algorithm popularized by
OpenAI's whisper (timing.py semantics, re-derived TPU-first):

  1. one teacher-forced decoder pass over the window's final token
     sequence (jitted, token length bucketed to avoid per-window
     recompiles), capturing the pre-softmax cross-attention logits of the
     ALIGNMENT HEADS — by default every head in the upper half of the
     decoder layers (OpenAI's fallback when a checkpoint ships no
     alignment-head mask; pass ``alignment_heads`` to override with a
     model-specific list of (layer, head) pairs);
  2. softmax over the audio axis, slice to the window's real content
     frames, z-normalize each head over the token axis, median-filter
     along time, and average heads into one [text_tokens, frames] matrix;
  3. dynamic time warping over the negative matrix gives the monotone
     token->frame alignment; the first aligned frame of each token is its
     start time (frame * 0.02 s);
  4. BPE tokens merge into words at space boundaries (per-token for
     scripts written without spaces), pure-punctuation pieces glued to
     the preceding word.

Everything device-side is one extra prefill-shaped forward per 30s
window; DTW and word splitting run on host (matrices are <= 448 x 1500).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelDims
from ..models.whisper import layer_norm, linear, mha_self, _split_heads

# seconds per encoder frame: 2 mel hops of 10 ms (transcribe.rs:117-122)
TIME_PER_FRAME = 0.02

# scripts written without spaces: split words per token
_NO_SPACE_LANGUAGES = {"zh", "ja", "th", "lo", "my", "yue"}

_PUNCT = set(",.!?;:、。！？；：，\"')]}%")


@dataclasses.dataclass
class WordTiming:
    word: str
    start: float
    end: float


def default_alignment_heads(dims: ModelDims) -> Tuple[Tuple[int, int], ...]:
    """All heads of the upper half of the decoder layers (OpenAI's
    fallback for checkpoints without an alignment-head mask)."""
    return tuple(
        (l, h)
        for l in range(dims.n_text_layer // 2, dims.n_text_layer)
        for h in range(dims.n_text_head)
    )


@functools.partial(jax.jit, static_argnames=("dims", "heads"))
def _alignment_qk(
    params,
    tokens: jnp.ndarray,  # [T] int32 (padded to a bucket; pads are causal-
    #   masked by construction so they never influence earlier positions)
    xa: jnp.ndarray,  # [Tk, n_audio_state] encoder output for the window
    dims: ModelDims,
    heads: Tuple[Tuple[int, int], ...],
) -> jnp.ndarray:  # [n_heads, T, Tk] f32 pre-softmax cross-attention logits
    dec = params["decoder"]
    n_head = dims.n_text_head
    scale = dims.head_dim**-0.5
    T = tokens.shape[0]

    x_dtype = dec["pos_emb"].dtype
    emb = dec["token_emb"][tokens].astype(x_dtype)
    if "token_emb_scale" in dec:
        emb = emb * dec["token_emb_scale"][tokens][..., None].astype(x_dtype)
    x = (emb + dec["pos_emb"][:T].astype(x_dtype))[None]  # [1, T, n]

    neg = jnp.asarray(-jnp.inf, jnp.float32)
    causal = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, neg
    )[None, None]

    xa_b = xa[None].astype(x_dtype)  # [1, Tk, n]
    blocks = dec["blocks"]
    collected = []
    for l in range(dims.n_text_layer):
        bp = jax.tree_util.tree_map(lambda a: a[l], blocks)
        # self-attention (full causal prefill; cold path, no cache)
        x = x + mha_self(layer_norm(x, bp["attn_ln"]), bp["attn"], n_head, causal)
        # cross-attention, capturing the selected heads' logits
        h = layer_norm(x, bp["cross_attn_ln"])
        q = _split_heads(linear(h, bp["cross_attn"]["query"]), n_head) * scale
        k = _split_heads(linear(xa_b, bp["cross_attn"]["key"]), n_head)
        v = _split_heads(linear(xa_b, bp["cross_attn"]["value"]), n_head)
        qk = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )  # [1, H, T, Tk]
        for (ll, hh) in heads:
            if ll == l:
                collected.append(qk[0, hh].astype(jnp.float32))
        w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(x.shape)
        x = x + linear(attn, bp["cross_attn"]["out"])
        # MLP
        from ..models.whisper import gelu

        hm = layer_norm(x, bp["mlp_ln"])
        x = x + linear(gelu(linear(hm, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])
    return jnp.stack(collected)  # [n_heads, T, Tk]


def median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis with reflect padding (matches the
    OpenAI timing pipeline's medfilt_width=7 default)."""
    if width <= 1:
        return x
    pad = width // 2
    if x.shape[-1] <= pad:
        return x
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotone alignment path minimizing total cost over an [N, M] matrix
    (moves: down, right, diagonal).  Returns (rows, cols) along the path."""
    N, M = cost.shape
    big = np.inf
    acc = np.full((N + 1, M + 1), big, dtype=np.float64)
    acc[0, 0] = 0.0
    trace = np.zeros((N + 1, M + 1), dtype=np.int8)
    for i in range(1, N + 1):
        row = cost[i - 1]
        prev = acc[i - 1]
        cur = acc[i]
        # c0: diagonal (i-1, j-1), c1: up (i-1, j), c2: left (i, j-1)
        for j in range(1, M + 1):
            c0, c1, c2 = prev[j - 1], prev[j], cur[j - 1]
            if c0 <= c1 and c0 <= c2:
                cur[j] = c0 + row[j - 1]
                trace[i, j] = 0
            elif c1 <= c2:
                cur[j] = c1 + row[j - 1]
                trace[i, j] = 1
            else:
                cur[j] = c2 + row[j - 1]
                trace[i, j] = 2
    i, j = N, M
    rows, cols = [], []
    while i > 0 and j > 0:
        rows.append(i - 1)
        cols.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(rows[::-1]), np.array(cols[::-1])


def _dtw_fast(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """DTW with a vectorized row recurrence (O(N) numpy passes instead of
    an O(N*M) python loop).  Within a row,

        acc[i, j] = cost[j] + min(acc[i-1, j-1], acc[i-1, j], acc[i, j-1])

    and unrolling the serial left-move chain gives

        acc[i, j] = min_{k <= j} ( m[k] + sum_{t=k..j} cost[t] ),
        m[k] = min(acc[i-1, k-1], acc[i-1, k])

    which is a cumulative sum plus a running minimum.  The path is
    recovered by backtracking over the finished acc table (same tie order
    as the reference ``dtw``: diagonal, then up, then left — verified
    equivalent by the unit tests on random matrices)."""
    N, M = cost.shape
    acc = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    acc[0, 0] = 0.0
    for i in range(1, N + 1):
        row = cost[i - 1].astype(np.float64)
        m = np.minimum(acc[i - 1, :-1], acc[i - 1, 1:])  # [M]: min(diag, up)
        csum = np.cumsum(row)  # csum[j-1] = sum_{t<=j} cost[t-1]
        shifted = np.concatenate(([0.0], csum[:-1]))  # sum strictly before k
        best = np.minimum.accumulate(m - shifted)
        acc[i, 1:] = csum + best
    i, j = N, M
    rows, cols = [], []
    while i > 0 and j > 0:
        rows.append(i - 1)
        cols.append(j - 1)
        d, u, lft = acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]
        if d <= u and d <= lft:
            i, j = i - 1, j - 1
        elif u <= lft:
            i -= 1
        else:
            j -= 1
    return np.array(rows[::-1]), np.array(cols[::-1])


def _complete_unicode_pieces(
    token_ids: Sequence[int], decode_fn
) -> List[Tuple[str, List[int]]]:
    """Group BPE tokens into complete-unicode pieces by cumulative decoding.

    A token holding a partial UTF-8 sequence decodes to U+FFFD, not the
    empty string, so per-token decoding cannot detect fragment boundaries
    for CJK/emoji text.  Instead, decode a running token list and cut a
    piece only when its decode contains no U+FFFD — unless the U+FFFD is
    genuinely present in the full decode at that offset (i.e. the audio
    really transcribed a replacement char)."""
    REPL = "�"
    ids = [int(t) for t in token_ids]
    full = decode_fn(np.asarray(ids, np.int64)) if ids else ""
    pieces: List[Tuple[str, List[int]]] = []
    cur: List[int] = []
    offset = 0
    for tid in ids:
        cur.append(tid)
        dec = decode_fn(np.asarray(cur, np.int64))
        i = dec.find(REPL)
        if i < 0 or (offset + i < len(full) and full[offset + i] == REPL):
            pieces.append((dec, cur))
            cur = []
            offset += len(dec)
    if cur:  # trailing incomplete fragment (truncated window tail)
        pieces.append((decode_fn(np.asarray(cur, np.int64)), cur))
    return pieces


def split_words(
    token_ids: Sequence[int], decode_fn, language: Optional[str]
) -> List[Tuple[str, List[int]]]:
    """Group text tokens into words.  Space-delimited scripts start a new
    word at a leading-space piece; no-space scripts split per complete
    unicode piece; punctuation-only pieces attach to the preceding word.
    Multi-byte BPE fragments are first merged into complete unicode pieces
    via cumulative decoding (see ``_complete_unicode_pieces``)."""
    words: List[Tuple[str, List[int]]] = []
    no_space = (language or "en") in _NO_SPACE_LANGUAGES
    for piece, ids in _complete_unicode_pieces(token_ids, decode_fn):
        if not piece:
            if words:
                words[-1] = (words[-1][0], words[-1][1] + ids)
            continue
        stripped = piece.strip()
        punct_only = bool(stripped) and all(c in _PUNCT for c in stripped)
        new_word = (
            not words
            or (no_space and not punct_only)
            or (not no_space and piece.startswith(" ") and not punct_only)
        )
        if new_word:
            words.append((piece, ids))
        else:
            words[-1] = (words[-1][0] + piece, words[-1][1] + ids)
    return words


class WordAligner:
    """Per-window word-timestamp extraction (see module docstring)."""

    def __init__(
        self,
        params,
        dims: ModelDims,
        tokenizer,
        compute_dtype=jnp.float32,
        alignment_heads: Optional[Sequence[Tuple[int, int]]] = None,
        medfilt_width: int = 7,
    ):
        self.params = params
        self.dims = dims
        self.tokenizer = tokenizer
        self.dtype = compute_dtype
        self.heads = tuple(alignment_heads or default_alignment_heads(dims))
        self.medfilt_width = medfilt_width

    def _bucket(self, n: int) -> int:
        b = max(64, -(-n // 64) * 64)
        return min(b, self.dims.n_text_ctx)

    def align_window(
        self,
        window_tokens: Sequence[int],  # the window's sampled tokens
        xa: np.ndarray,  # [n_audio_ctx, n_state] encoder output
        time_offset: float,  # absolute seconds of the window start
        content_frames: int,  # real (unpadded) encoder frames in the window
    ) -> List[WordTiming]:
        tok = self.tokenizer
        ts_begin = tok.token_id_ts_begin
        eot = tok.token_id_eot

        # text tokens only (timestamp tokens are segmentation markers, not
        # aligned content); remember their positions in the fed sequence.
        # <|notimestamps|> follows the SOT sequence, matching the
        # established teacher-forced alignment conditioning.
        sot_seq = list(tok.sequence_sot()) + [tok.token_id_no_timestamps]
        fed: List[int] = list(sot_seq)
        text_positions: List[int] = []
        text_ids: List[int] = []
        for t in window_tokens:
            t = int(t)
            if t >= ts_begin or t == eot:
                continue
            text_positions.append(len(fed))
            text_ids.append(t)
            fed.append(t)
        fed.append(eot)
        if not text_ids:
            return []

        T = self._bucket(len(fed))
        padded = np.full((T,), eot, np.int32)
        padded[: len(fed)] = fed

        qk = _alignment_qk(
            self.params,
            jnp.asarray(padded),
            jnp.asarray(xa).astype(self.dtype),
            self.dims,
            self.heads,
        )  # [nAH, T, Tk]
        w = np.asarray(qk, np.float32)[:, text_positions, :]
        frames = max(1, min(content_frames, w.shape[-1]))
        # slice to content frames BEFORE the softmax so attention mass
        # leaked onto padding frames cannot perturb short final windows
        w = w[:, :, :frames]
        w = w - w.max(axis=-1, keepdims=True)
        w = np.exp(w)
        w = w / w.sum(axis=-1, keepdims=True)
        # z-normalize each head over the token axis, median-filter in time
        mean = w.mean(axis=1, keepdims=True)
        std = w.std(axis=1, keepdims=True) + 1e-8
        w = (w - mean) / std
        w = median_filter(w, self.medfilt_width)
        matrix = w.mean(axis=0)  # [n_text, frames]

        rows, cols = _dtw_fast(-matrix.astype(np.float64))
        # first aligned frame per token
        n_text = matrix.shape[0]
        starts = np.zeros(n_text, np.int64)
        seen = np.zeros(n_text, bool)
        for r, c in zip(rows, cols):
            if not seen[r]:
                starts[r] = c
                seen[r] = True
        ends = np.append(starts[1:], frames)

        words = split_words(text_ids, tok.decode, getattr(tok, "language", None))
        out: List[WordTiming] = []
        idx = 0
        for text, ids in words:
            first, last = idx, idx + len(ids) - 1
            idx += len(ids)
            out.append(
                WordTiming(
                    word=text,
                    start=time_offset + float(starts[first]) * TIME_PER_FRAME,
                    end=time_offset + float(ends[last]) * TIME_PER_FRAME,
                )
            )
        # enforce monotonicity (DTW guarantees it per token; word merging
        # keeps it, but guard against degenerate zero-length words)
        for i in range(1, len(out)):
            if out[i].start < out[i - 1].end - 1e-9:
                out[i].start = out[i - 1].end
            if out[i].end < out[i].start:
                out[i].end = out[i].start
        return out
