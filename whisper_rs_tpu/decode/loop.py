"""On-device single-window decode: prefill + lax.while_loop over steps.

This is the TPU-native replacement for the reference's host-driven main loop
(``decode/mod.rs:220-282``) and its extractors:

  * greedy (extractor/greedy.rs — left unfinished upstream: finalize is
    ``todo!()`` at greedy.rs:60 and construction ``todo!()`` at
    decode/mod.rs:134; implemented fully here, it is BASELINE config #1),
  * beam search (extractor/beam_search.rs — upstream runs it on the host
    with a HashMap and per-candidate scalar device reads every step; here
    the whole search is vectorized `lax.top_k`/sort/gather inside the loop,
    and the KV-cache beam reorder (beam_search.rs:111-114 →
    model.rs:53-62) is a batched on-device gather).

Everything — model step, logit filters, token extraction, finished-
hypothesis bookkeeping, termination — runs under one jit; the host sees
only the final result arrays.

Beam-search dedup note: the reference dedups candidate sequences via its
HashMap key (beam_search.rs:56-79), which only matters at the first step
when all beams hold identical prefixes.  We instead initialize
``sum_logprobs`` to ``[0, -inf, -inf, ...]`` per audio (the standard
flax-style trick): duplicate candidates from beams >0 start at -inf and can
never enter the top-k, and after step one all live prefixes are distinct by
induction, so the outcomes are identical.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import BeamSearchMode, GreedyMode, ModelDims
from ..models.whisper import (
    KVCache,
    decoder_forward,
    encoder_forward,
    precompute_cross_kv,
)
from .filters import FilterConfig, apply_filters, _log_softmax

BIG_NEG = -1e9  # finite stand-in for -inf in scores (keeps arithmetic NaN-free)


class DecodeResult(NamedTuple):
    """Raw device-side outputs of one window decode (per audio)."""

    candidates: jnp.ndarray  # [n_audio, n_cand, n_ctx] i32 (EOT-terminated)
    scores: jnp.ndarray  # [n_audio, n_cand] f32 cumulative logprob
    no_speech_probs: jnp.ndarray  # [n_audio] f32
    audio_features: jnp.ndarray  # [n_audio, n_audio_ctx, n_state]


# ---------------------------------------------------------------------------
# shared: encoder + prefill
# ---------------------------------------------------------------------------


def _encode_and_prefill(
    params,
    mel,  # [n_audio, n_mels, 3000]
    initial_tokens,  # [n_audio, P] i32
    sample_begin,  # scalar i32
    sot_idx,  # scalar i32
    group_size: int,
    dims: ModelDims,
    cfg: FilterConfig,
    no_speech_id: int,
    compute_dtype,
    key_start=None,  # [n_audio] i32: first valid prompt slot per row (or None)
    quantize_kv: bool = False,
    encoder_fn=None,  # (params, mel, dims) -> xa override (e.g. PP encoder)
):
    """Encoder forward, group repeat, prefill pass.

    Returns (tokens buffer [B,n_ctx], first-step filtered logits [B,V],
    cache, cross_kv, no_speech_probs [n_audio], audio_features).
    The group repeat mirrors decode/mod.rs:307-313 (repeat_interleave by
    beam/group size).
    """
    n_audio = mel.shape[0]
    if encoder_fn is None:
        encoder_fn = encoder_forward
    xa = encoder_fn(params, mel.astype(compute_dtype), dims)
    audio_features = xa

    # repeat_interleave along batch for beam/group (decode/mod.rs:307-313).
    # Cross-K/V is NOT repeated: group members share one per-audio copy
    # (whisper._attend_grouped) — repeating would multiply HBM footprint and
    # per-step read traffic by group_size.
    if group_size > 1:
        initial_tokens = jnp.repeat(initial_tokens, group_size, axis=0)
        if key_start is not None:
            key_start = jnp.repeat(key_start, group_size, axis=0)
    B = n_audio * group_size

    cross_kv = precompute_cross_kv(params, xa, dims, quantize=quantize_kv)
    cache = KVCache.init(dims, B, dtype=xa.dtype, quantize=quantize_kv)

    # only two prefill rows ever have their logits read: the SOT row (for
    # no_speech_prob, decode/mod.rs:250-255) and the last prompt row (the
    # first sampled position) — skip the vocab projection for the rest.
    positions = jnp.stack([sot_idx, sample_begin - 1]).astype(jnp.int32)
    logits, cache = decoder_forward(
        params, initial_tokens, jnp.int32(0), cross_kv, cache, dims,
        key_start=key_start, logit_positions=positions, cross_group=group_size,
    )  # [B, 2, V] f32

    no_speech = jax.nn.softmax(logits[:, 0].astype(jnp.float32), axis=-1)[
        :, no_speech_id
    ]
    no_speech_probs = no_speech[::group_size]  # de-interleave (mod.rs:336-338)

    last = logits[:, 1].astype(jnp.float32)

    # token buffer [B, n_ctx]: prompt then zeros
    tokens = jnp.zeros((B, dims.n_text_ctx), jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, initial_tokens, (0, 0))

    filtered = apply_filters(cfg, last, tokens, sample_begin, sample_begin)
    return tokens, filtered, cache, cross_kv, no_speech_probs, audio_features, key_start


def _step_logits(
    params, tokens, pos, cross_kv, cache, dims, cfg, sample_begin,
    key_start=None, cross_group: int = 1, ctx_window=None, ancestors=None,
    packed=None, k_ctx_major=False, packed_mlp=None, mlp_interpret=False,
    kv_fused=False, fused_self_interpret=False,
):
    """One incremental decoder step: feed the token at pos-1, return
    filtered logits for position pos and the updated cache."""
    B = tokens.shape[0]
    tok_in = jnp.take_along_axis(
        tokens, (pos - 1)[None, None].astype(jnp.int32).repeat(B, 0), axis=1
    )  # [B, 1]
    logits, cache = decoder_forward(
        params, tok_in, pos - 1, cross_kv, cache, dims, key_start=key_start,
        cross_group=cross_group, ctx_window=ctx_window, ancestors=ancestors,
        packed=packed, k_ctx_major=k_ctx_major, packed_mlp=packed_mlp,
        mlp_interpret=mlp_interpret, kv_fused=kv_fused,
        fused_self_interpret=fused_self_interpret,
    )
    filtered = apply_filters(
        cfg, logits[:, 0].astype(jnp.float32), tokens, pos, sample_begin
    )
    return filtered, cache


def _phase_windows(n_ctx: int, prefill_width: int, sample_len: int) -> tuple:
    """Static cache-window schedule for the decode loop.

    Self-attention reads and beam cache gathers only need slots
    ``[0, pos]``; running the loop in phases with growing static windows
    (256 -> n_ctx) cuts that HBM stream roughly in half on typical decodes.
    Phases that the position can never reach are dropped at trace time.
    """
    max_pos = min(n_ctx, prefill_width + sample_len + 1)
    wins = []
    for W in (128, 256, n_ctx):
        if W < prefill_width or W <= (wins[-1] if wins else 0):
            continue  # positions start at sample_begin <= prefill_width
        wins.append(W)
        if W >= max_pos:
            break
    return tuple(wins)


# ---------------------------------------------------------------------------
# greedy
# ---------------------------------------------------------------------------


class _GreedyState(NamedTuple):
    step: jnp.ndarray
    pos: jnp.ndarray
    tokens: jnp.ndarray  # [B, n_ctx]
    sum_logprobs: jnp.ndarray  # [B]
    finished: jnp.ndarray  # [B] bool
    cache: KVCache


def _sample_rows(rng, scaled_logits, group):
    """Temperature-sample one token per row with BATCH-COMPOSITION-INVARIANT
    noise: row r's key is folded by its within-group index (r % group) only,
    so an utterance samples the same tokens whether it decodes alone or
    shares a batch with others, and regardless of its row position.  This is
    what makes the temperature-fallback ladder bit-identical across the
    sequential / batch / serving drivers (a plain ``categorical`` over
    [B, vocab] draws row noise from the flat element index, which shifts
    with batch position).  Group members (best-of-N) still get independent
    noise via the fold."""
    keys = jax.vmap(lambda g: jax.random.fold_in(rng, g))(
        jnp.arange(scaled_logits.shape[0], dtype=jnp.uint32) % group
    )
    return jax.vmap(
        lambda k, l: jax.random.categorical(k, l, axis=-1)
    )(keys, scaled_logits).astype(jnp.int32)


def _greedy_update(logits, tokens, pos, sum_logprobs, finished, eot,
                   temperature=0.0, rng=None, group=1):
    """Greedy/sampling extractor semantics (greedy.rs:22-53 / OpenAI
    GreedyDecoder): argmax (or temperature-sample — the reference left this
    ``unimplemented!``, greedy.rs:27-29) next token; accumulate logprob only
    for still-live rows; pin finished rows to EOT.

    ``temperature`` may be a TRACED scalar: one compiled executable then
    serves the whole fallback ladder (0.2, 0.4, ...) instead of one
    compile per rung (round-1 serving-latency foot-gun)."""
    if isinstance(temperature, jnp.ndarray):
        sampled = _sample_rows(
            rng, logits / jnp.maximum(temperature, 1e-6), group
        )
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(temperature > 0.0, sampled, greedy)
    elif temperature and temperature > 0.0:
        next_tok = _sample_rows(rng, logits / temperature, group)
    else:
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logprobs = _log_softmax(logits)
    cur_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]
    sum_logprobs = sum_logprobs + jnp.where(finished, 0.0, cur_lp)
    next_tok = jnp.where(finished, eot, next_tok)
    finished = finished | (next_tok == eot)
    tokens = lax.dynamic_update_slice(
        tokens, next_tok[:, None], (0, pos)
    )
    return tokens, sum_logprobs, finished


def decode_greedy(
    params,
    mel,
    initial_tokens,
    sample_begin,
    sot_idx,
    dims: ModelDims,
    cfg: FilterConfig,
    mode: GreedyMode,
    sample_len: int,
    no_speech_id: int,
    compute_dtype=jnp.float32,
    key_start=None,
    rng_key=None,
    quantize_kv: bool = False,
    temperature=None,  # traced scalar override of mode.temperature
    encoder_fn=None,  # (params, mel, dims) -> xa override (e.g. PP encoder)
) -> DecodeResult:
    eot = cfg.token_id_eot
    n_ctx = dims.n_text_ctx
    group = mode.group_size
    if temperature is None:
        temperature = mode.temperature
    traced_temp = isinstance(temperature, jnp.ndarray)
    if (traced_temp or temperature > 0.0) and rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    (tokens, first_logits, cache, cross_kv, no_speech, feats, key_start) = _encode_and_prefill(
        params, mel, initial_tokens, sample_begin, sot_idx, group, dims, cfg,
        no_speech_id, compute_dtype, key_start, quantize_kv,
        encoder_fn=encoder_fn,
    )
    B = tokens.shape[0]
    n_audio = B // group

    def step_rng(pos):
        # fold by the STEP index (pos - sample_begin), not the absolute
        # position: the prefill bucket (and with it sample_begin) depends
        # on the longest prompt in the batch, so absolute positions are not
        # batch-composition-invariant — step indices are (see _sample_rows)
        if traced_temp or temperature > 0.0:
            return jax.random.fold_in(rng_key, pos - sample_begin)
        return None

    sum_lp = jnp.zeros((B,), jnp.float32)
    finished = jnp.zeros((B,), bool)
    tokens, sum_lp, finished = _greedy_update(
        first_logits, tokens, sample_begin, sum_lp, finished, eot,
        temperature, step_rng(sample_begin), group,
    )

    init = _GreedyState(
        step=jnp.int32(1),
        pos=sample_begin + 1,
        tokens=tokens,
        sum_logprobs=sum_lp,
        finished=finished,
        cache=cache,
    )

    # phased cache windows: loop bounds from decode/mod.rs:234,274-276
    # (sample_len steps max, stop when all rows emitted EOT or the context
    # is full), with attention reads statically capped per phase
    # Megakernel prep (WHISPER_PALLAS_DECODE=layer): pre-pack per-layer
    # decoder weights OUTSIDE the while loop (a loop-invariant operand —
    # packing inside the loop body costs a per-step copy, measured +0.3 ms
    # at base.en b32), and flip the K cache from the hybrid path's
    # transposed [L, B, H, dh, ctx] to ctx-major [L, B, H, ctx, dh]: the
    # kernel reads either layout equally fast, but the per-step K column
    # write is an in-place sublane dynamic_update_slice only in ctx-major
    # form (the lane-column write copy-lowers, ~312 us/step base.en b32).
    # One 2x-cache-sized transpose per window, amortized over <=224 steps.
    from ..models.whisper import _pallas_layer_mode, decode_kernel_modes

    use_mlp, mlp_interp, fs_mode, fs_interp = decode_kernel_modes(dims, B)
    packed_mlp = None
    if use_mlp:
        from ..ops.decoder_mlp_fused import mlp_fused_ok, pack_mlp_params

        if mlp_fused_ok(params["decoder"]["blocks"]):
            # loop-invariant: pack fc1+fc2 into one stream OUTSIDE the loop
            packed_mlp = pack_mlp_params(params["decoder"]["blocks"])

    packed = None
    use_fused = False
    if _pallas_layer_mode()[0] and not quantize_kv:
        from ..ops.decoder_layer_fused import layer_fused_ok, pack_block_params

        use_fused = layer_fused_ok(
            dims, tokens.shape[0], group, n_ctx, cross_kv.kv.shape[-1],
            quantize_kv,
        ) and "s" not in params["decoder"]["blocks"]["attn"]["query"]
        if use_fused:
            packed = pack_block_params(params["decoder"]["blocks"])
            init = init._replace(
                cache=init.cache._replace(k=init.cache.k.swapaxes(-1, -2))
            )

    # Fused self-attention cache layouts (greedy only; shape-gated to the
    # large-model small-batch regime by decode_kernel_modes; mutually
    # exclusive with the opt-in megakernel and int8 KV):
    #   "append" — flip V into K's TRANSPOSED [L, B, H, dh, ctx] layout
    #     once per window; the per-step column writes happen INSIDE
    #     self_attention_append_step (manual DMA into the aliased cache),
    #     so both planes read at the fast transposed rate (r5);
    #   "ctx" — flip K into V's ctx-major layout so the XLA column writes
    #     stay in-place sublane writes (the r4 kernel, ~92 vs ~114
    #     us/layer for the XLA cache dots at large-v3 b12).
    kv_fused = "off"
    if fs_mode != "off" and not use_fused and not quantize_kv:
        kv_fused = fs_mode
        if fs_mode == "ctx":
            init = init._replace(
                cache=init.cache._replace(
                    k=init.cache.k.swapaxes(-1, -2)
                )
            )
        else:  # append: V joins K in the transposed layout, and both
            # planes are lane-padded to a 128-multiple (DMA slice widths
            # on tiled memrefs must be 128-aligned; pad is zero-filled
            # and never attended)
            from ..ops.decode_attention import append_ctx_pad

            pad = append_ctx_pad(n_ctx) - n_ctx
            init = init._replace(
                cache=init.cache._replace(
                    k=jnp.pad(
                        init.cache.k, ((0, 0),) * 4 + ((0, pad),)
                    ),
                    v=jnp.pad(
                        init.cache.v.swapaxes(-1, -2),
                        ((0, 0),) * 4 + ((0, pad),),
                    ),
                )
            )

    s = init
    for W in _phase_windows(n_ctx, initial_tokens.shape[1], sample_len):

        def cond(st: _GreedyState, W=W):
            return (st.step < sample_len) & ~jnp.all(st.finished) & (st.pos < W)

        def body(st: _GreedyState, W=W):
            logits, cache = _step_logits(
                params, st.tokens, st.pos, cross_kv, st.cache, dims, cfg,
                sample_begin, key_start, group, ctx_window=W, packed=packed,
                k_ctx_major=use_fused, packed_mlp=packed_mlp,
                mlp_interpret=mlp_interp, kv_fused=kv_fused,
                fused_self_interpret=fs_interp,
            )
            tokens, sum_lp, finished = _greedy_update(
                logits, st.tokens, st.pos, st.sum_logprobs, st.finished, eot,
                temperature, step_rng(st.pos), group,
            )
            return _GreedyState(
                st.step + 1, st.pos + 1, tokens, sum_lp, finished, cache
            )

        s = lax.while_loop(cond, body, s)

    # finalize (OpenAI GreedyDecoder.finalize; the reference left this
    # todo!(), greedy.rs:60): rows that never emitted EOT get one appended.
    write_pos = jnp.minimum(s.pos, n_ctx - 1)
    eot_col = jnp.where(
        s.finished[:, None],
        jnp.take_along_axis(
            s.tokens, write_pos[None, None].astype(jnp.int32).repeat(s.tokens.shape[0], 0), axis=1
        ),
        jnp.full((s.tokens.shape[0], 1), eot, jnp.int32),
    )
    tokens = lax.dynamic_update_slice(s.tokens, eot_col, (0, write_pos))

    # group_size > 1 (best-of-N sampling): candidates per audio, ranked by
    # the shared max-likelihood ranker downstream (decode/mod.rs:336-347
    # de-interleave semantics)
    return DecodeResult(
        candidates=tokens.reshape(n_audio, group, n_ctx),
        scores=s.sum_logprobs.reshape(n_audio, group),
        no_speech_probs=no_speech,
        audio_features=feats,
    )


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------


class _BeamState(NamedTuple):
    step: jnp.ndarray
    pos: jnp.ndarray
    tokens: jnp.ndarray  # [n_audio*beam, n_ctx]
    sum_logprobs: jnp.ndarray  # [n_audio*beam]
    cache: KVCache
    fin_tokens: jnp.ndarray  # [n_audio, cap, n_ctx]
    fin_scores: jnp.ndarray  # [n_audio, cap]
    fin_count: jnp.ndarray  # [n_audio] i32
    # gather-at-read ancestor table [B, n_ctx]: anc[b, j] = the PHYSICAL
    # batch row holding logical beam b's K/V at position j.  The cache
    # itself never moves; attention resolves rows per position
    # (decoder_forward ``ancestors``).  Replaces the reference's physical
    # update_cache permutation (beam_search.rs:111-114 -> model.rs:53-62),
    # deleting the dominant per-step read+write stream of beam search.
    anc: Optional[jnp.ndarray] = None


def _beam_step(
    logits,  # [n_audio*beam, V] filtered, f32
    s: _BeamState,
    beam: int,
    cap: int,
    eot: int,
    ctx_window=None,
):
    """One beam-search update (beam_search.rs:22-148, vectorized).

    Per audio: per-beam top-(beam+1) candidates ranked globally by cumulative
    logprob; EOT candidates stream into the finished buffer (capacity = cap,
    insertion in score order, matching beam_search.rs:122-137); the best
    `beam` unfinished candidates continue, with tokens + KV cache gathered to
    their source beams.
    """
    n_total, V = logits.shape
    n_audio = n_total // beam
    n_ctx = s.tokens.shape[-1]
    K = beam * (beam + 1)

    logprobs = _log_softmax(logits)
    cum = s.sum_logprobs[:, None] + logprobs  # [n_audio*beam, V]
    cum = cum.reshape(n_audio, beam, V)

    # per-beam top-(beam+1) (beam_search.rs:62-65)
    top_lp, top_tok = lax.top_k(cum, beam + 1)  # [n_audio, beam, beam+1]
    score = top_lp.reshape(n_audio, K)
    tok = top_tok.reshape(n_audio, K).astype(jnp.int32)
    src = (jnp.arange(K) // (beam + 1))[None, :].repeat(n_audio, 0)

    # global sort by score desc (beam_search.rs:85-87)
    order = jnp.argsort(-score, axis=-1)
    score = jnp.take_along_axis(score, order, axis=1)
    tok = jnp.take_along_axis(tok, order, axis=1)
    src = jnp.take_along_axis(src, order, axis=1)

    is_fin = tok == eot

    # ---- continuing beams: first `beam` unfinished in score order --------
    unf = ~is_fin
    rank_unf = jnp.cumsum(unf, axis=-1)
    sel = unf & (rank_unf <= beam)
    sel_pos = jnp.where(sel, jnp.arange(K)[None, :], K)
    sel_idx = jnp.sort(sel_pos, axis=-1)[:, :beam]  # [n_audio, beam]

    new_score = jnp.take_along_axis(score, sel_idx, axis=1).reshape(-1)
    new_tok = jnp.take_along_axis(tok, sel_idx, axis=1).reshape(-1)
    new_src = jnp.take_along_axis(src, sel_idx, axis=1)  # [n_audio, beam]
    global_src = (new_src + jnp.arange(n_audio)[:, None] * beam).reshape(-1)

    tokens = jnp.take(s.tokens, global_src, axis=0)
    tokens = lax.dynamic_update_slice(tokens, new_tok[:, None], (0, s.pos))
    if s.anc is not None:
        # gather-at-read: only the [B, n_ctx] i32 ancestor table moves
        anc = jnp.take(s.anc, global_src, axis=0)
        cache = s.cache
    else:
        anc = None
        # NOTE: an identity-permutation fast path via lax.cond was tried and
        # measured SLOWER (cond defeats in-loop buffer aliasing, forcing
        # copies on the pass-through branch) — unconditional windowed gather.
        cache = s.cache.reorder(global_src, window=ctx_window)

    # ---- finished candidates -> capacity-capped buffer -------------------
    # The reference walks candidates in score order and STOPS after saving
    # beam_size unfinished ones (beam_search.rs:88-107), so an EOT candidate
    # is only collected if it outranks the beam-th surviving candidate.
    eligible_fin = is_fin & (rank_unf < beam)
    rank_fin = jnp.cumsum(eligible_fin, axis=-1)
    slot = s.fin_count[:, None] + rank_fin - 1  # [n_audio, K]
    writable = eligible_fin & (slot < cap)
    slot = jnp.where(writable, slot, cap)  # cap = out of range -> dropped

    # candidate sequences: source-beam prefix + EOT at pos
    fin_src = src + jnp.arange(n_audio)[:, None] * beam
    cand = jnp.take(s.tokens, fin_src.reshape(-1), axis=0).reshape(
        n_audio, K, n_ctx
    )
    cand = jax.vmap(
        lambda c, t: lax.dynamic_update_slice(c, t[:, None], (0, s.pos))
    )(cand, tok)

    def insert(buf_t, buf_s, cand_t, cand_s, slots):
        buf_t = buf_t.at[slots].set(cand_t, mode="drop")
        buf_s = buf_s.at[slots].set(cand_s, mode="drop")
        return buf_t, buf_s

    fin_tokens, fin_scores = jax.vmap(insert)(
        s.fin_tokens, s.fin_scores, cand, score, slot
    )
    fin_count = s.fin_count + jnp.sum(writable, axis=-1).astype(jnp.int32)

    return _BeamState(
        step=s.step + 1,
        pos=s.pos + 1,
        tokens=tokens,
        sum_logprobs=new_score,
        cache=cache,
        fin_tokens=fin_tokens,
        fin_scores=fin_scores,
        fin_count=fin_count,
        anc=anc,
    )


def decode_beam(
    params,
    mel,
    initial_tokens,
    sample_begin,
    sot_idx,
    dims: ModelDims,
    cfg: FilterConfig,
    mode: BeamSearchMode,
    sample_len: int,
    no_speech_id: int,
    compute_dtype=jnp.float32,
    key_start=None,
    rng_key=None,  # unused (beam search is deterministic); signature parity
    quantize_kv: bool = False,
    temperature=None,  # unused; signature parity with decode_greedy
    encoder_fn=None,  # (params, mel, dims) -> xa override (e.g. PP encoder)
) -> DecodeResult:
    beam = mode.beam_size
    # max finished candidates per audio (beam_search.rs:122-124)
    cap = max(beam, int(round(mode.patience * beam)))
    eot = cfg.token_id_eot
    n_ctx = dims.n_text_ctx

    (tokens, first_logits, cache, cross_kv, no_speech, feats, key_start) = _encode_and_prefill(
        params, mel, initial_tokens, sample_begin, sot_idx, beam, dims, cfg,
        no_speech_id, compute_dtype, key_start, quantize_kv,
        encoder_fn=encoder_fn,
    )
    B = tokens.shape[0]
    n_audio = B // beam

    # dedup-free init: only beam 0 is live at step 0 (see module docstring)
    sum_lp = jnp.where(
        (jnp.arange(B) % beam) == 0, 0.0, BIG_NEG
    ).astype(jnp.float32)

    # Gather-at-read ancestor table: on wherever the Pallas beam kernel can
    # take it (in-kernel ancestor resolution; stable on TPU and ~1.6x the
    # physical-reorder throughput at medium.en beam5).  The pure-XLA
    # take_along_axis resolve is CPU-exact but nondeterministically faults
    # the tunneled TPU runtime at scale, so "auto" only enables ancestors
    # when a Pallas mode is active (int8 caches ride the same kernel with
    # per-position scale blocks); WHISPER_BEAM_ANCESTOR=1/0 forces either
    # way.
    import os as _os

    env_anc = _os.environ.get("WHISPER_BEAM_ANCESTOR", "auto")
    if env_anc == "auto":
        from ..models.whisper import _pallas_decode_mode

        p_self, p_cross, _ = _pallas_decode_mode()
        use_anc = p_self or p_cross
    else:
        use_anc = env_anc == "1"
    ident = jnp.arange(B, dtype=jnp.int32)
    anc0 = jnp.broadcast_to(ident[:, None], (B, n_ctx)) if use_anc else None

    from ..models.whisper import decode_kernel_modes

    use_mlp, mlp_interp, _, _ = decode_kernel_modes(dims, B)
    packed_mlp = None
    if use_mlp:
        from ..ops.decoder_mlp_fused import mlp_fused_ok, pack_mlp_params

        if mlp_fused_ok(params["decoder"]["blocks"]):
            packed_mlp = pack_mlp_params(params["decoder"]["blocks"])

    init = _BeamState(
        step=jnp.int32(0),
        pos=sample_begin,
        tokens=tokens,
        sum_logprobs=sum_lp,
        cache=cache,
        fin_tokens=jnp.zeros((n_audio, cap, n_ctx), jnp.int32),
        fin_scores=jnp.full((n_audio, cap), BIG_NEG, jnp.float32),
        fin_count=jnp.zeros((n_audio,), jnp.int32),
        anc=anc0,
    )

    phases = _phase_windows(n_ctx, initial_tokens.shape[1], sample_len)

    # first step uses the prefill logits (valid cache rows < prefill width
    # <= first phase window; prefill rows were written at identity rows, so
    # the init ancestor table is already correct)
    s = _beam_step(first_logits, init, beam, cap, eot, ctx_window=phases[0])

    # phased cache windows: caps the attention reads (and, in fallback
    # mode, the per-step beam cache gather)
    for W in phases:

        def cond(st: _BeamState, W=W):
            completed = jnp.all(st.fin_count >= cap)  # beam_search.rs:140-147
            return (st.step < sample_len) & ~completed & (st.pos < W)

        def body(st: _BeamState, W=W):
            anc = st.anc
            if anc is not None:
                # the K/V about to be read at slot pos-1 were written by
                # each row itself after the last gather -> identity column
                anc = lax.dynamic_update_slice(
                    anc, ident[:, None], (0, st.pos - 1)
                )
                st = st._replace(anc=anc)
            logits, cache = _step_logits(
                params, st.tokens, st.pos, cross_kv, st.cache, dims, cfg,
                sample_begin, key_start, beam, ctx_window=W, ancestors=anc,
                packed_mlp=packed_mlp, mlp_interpret=mlp_interp,
            )
            st = st._replace(cache=cache)
            return _beam_step(logits, st, beam, cap, eot, ctx_window=W)

        s = lax.while_loop(cond, body, s)

    # ---- finalize (beam_search.rs:151-206): backfill each audio that has
    # fewer than beam finished sequences with its best unfinished beams,
    # EOT-terminated.
    write_pos = jnp.minimum(s.pos, n_ctx - 1)
    live_tokens = s.tokens.reshape(n_audio, beam, n_ctx)
    live_scores = s.sum_logprobs.reshape(n_audio, beam)
    live_tokens = jax.vmap(
        lambda c: lax.dynamic_update_slice(
            c, jnp.full((beam, 1), eot, jnp.int32), (0, write_pos)
        )
    )(live_tokens)

    order = jnp.argsort(-live_scores, axis=-1)  # best-first (rs:169-171 rev)
    live_scores = jnp.take_along_axis(live_scores, order, axis=1)
    live_tokens = jnp.take_along_axis(live_tokens, order[..., None], axis=1)

    k = jnp.arange(beam)[None, :]
    slot = s.fin_count[:, None] + k
    writable = slot < beam  # insert only while count < beam_size (rs:165-180)
    slot = jnp.where(writable, slot, cap)

    def backfill(buf_t, buf_s, cand_t, cand_s, slots):
        buf_t = buf_t.at[slots].set(cand_t, mode="drop")
        buf_s = buf_s.at[slots].set(cand_s, mode="drop")
        return buf_t, buf_s

    fin_tokens, fin_scores = jax.vmap(backfill)(
        s.fin_tokens, s.fin_scores, live_tokens, live_scores, slot
    )

    return DecodeResult(
        candidates=fin_tokens,
        scores=fin_scores,
        no_speech_probs=no_speech,
        audio_features=feats,
    )
