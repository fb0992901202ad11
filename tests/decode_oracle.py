"""Test oracles: row-wise NumPy re-statements of the reference's decode
semantics (filters, greedy, beam search), used to validate the vectorized
on-device implementations.

These mirror the *behavior* of decode/filter/*.rs and decode/extractor/*.rs
(host-loop style, HashMaps and all) so the JAX versions can be checked
step-for-step on tiny models.
"""

import numpy as np


def log_softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    s = x - m
    return s - np.log(np.sum(np.exp(s), axis=axis, keepdims=True))


def apply_filters_ref(cfg, logits, tokens_so_far, sample_begin):
    """cfg: FilterConfig; logits [B, V] f64; tokens_so_far: list of B lists
    (full sequences incl. prompt).  Mirrors suppress_blanks.rs,
    suppress_tokens.rs, timestamp_tokens.rs applied in decode/mod.rs order."""
    logits = logits.copy()
    B, V = logits.shape
    cur_len = len(tokens_so_far[0])

    if cfg.suppress_blank and cur_len == sample_begin:
        logits[:, cfg.token_id_space] = -np.inf
        logits[:, cfg.token_id_eot] = -np.inf

    if cfg.suppress_ids:
        logits[:, list(cfg.suppress_ids)] = -np.inf

    if cfg.timestamps:
        ts_begin = cfg.token_id_ts_begin
        logits[:, cfg.token_id_no_timestamps] = -np.inf

        for k in range(B):
            seq = tokens_so_far[k][sample_begin:]
            last_was_ts = len(seq) >= 1 and seq[-1] >= ts_begin
            second_last_was_ts = len(seq) < 2 or seq[-2] >= ts_begin
            if last_was_ts:
                if second_last_was_ts:
                    logits[k, ts_begin:] = -np.inf
                else:
                    logits[k, : cfg.token_id_eot] = -np.inf

        if cur_len == sample_begin:
            logits[:, :ts_begin] = -np.inf
            if cfg.max_initial_timestamp_index is not None:
                last_allowed = ts_begin + cfg.max_initial_timestamp_index
                logits[:, last_allowed + 1 :] = -np.inf

        lp = log_softmax(logits.astype(np.float64))
        for k in range(B):
            with np.errstate(divide="ignore"):
                ts_lse = np.logaddexp.reduce(lp[k, ts_begin:])
            max_text = lp[k, :ts_begin].max()
            if ts_lse > max_text:
                logits[k, :ts_begin] = -np.inf

    return logits


def beam_step_ref(prefixes, sum_logprobs, logits, beam_size, eot,
                  finished_sequences, max_candidates):
    """One reference beam step (beam_search.rs:22-148) on the host.

    prefixes: list of B=n_audio*beam token lists; returns (new prefixes,
    new sum_logprobs, source_indices, completed).  Mutates
    finished_sequences (list of dicts per audio).
    """
    B = len(prefixes)
    n_audio = B // beam_size
    logprobs = log_softmax(logits.astype(np.float64))

    next_tokens, source_indices = [], []
    new_sum_logprobs = []

    for i in range(n_audio):
        scores_sources = {}
        for j in range(beam_size):
            idx = i * beam_size + j
            order = np.argsort(-logprobs[idx])[: beam_size + 1]
            for token in order:
                new_lp = sum_logprobs[idx] + logprobs[idx, token]
                seq = tuple(prefixes[idx]) + (int(token),)
                # HashMap insert (dedup identical sequences)
                scores_sources[seq] = (new_lp, idx)

        ranked = sorted(scores_sources.items(), key=lambda kv: -kv[1][0])
        saved = 0
        for seq, (score, source) in ranked:
            if seq[-1] == eot:
                if len(finished_sequences[i]) < max_candidates:
                    finished_sequences[i][seq] = score
            else:
                new_sum_logprobs.append(score)
                next_tokens.append(list(seq))
                source_indices.append(source)
                saved += 1
                if saved == beam_size:
                    break

    completed = all(len(f) >= max_candidates for f in finished_sequences)
    return next_tokens, np.array(new_sum_logprobs), source_indices, completed
