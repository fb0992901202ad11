"""On-device beam search vs a host-side reference-semantics oracle.

The oracle mirrors beam_search.rs (per-beam top-(beam+1), HashMap dedup +
score sort, EOT candidates into capped finished maps, patience termination)
driving the same tiny model via full re-prefills, so sequences and scores
must agree step-for-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decode_oracle import apply_filters_ref, beam_step_ref
from whisper_rs_tpu.config import BeamSearchMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig, decode_beam
from whisper_rs_tpu.models import (
    KVCache,
    decoder_forward,
    encoder_forward,
    init_params,
    precompute_cross_kv,
)

DIMS = ModelDims(
    n_mels=80,
    n_vocab=1000,
    n_audio_ctx=1500,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_text_ctx=448,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)

CFG = FilterConfig(
    n_vocab=1000,
    token_id_eot=500,
    token_id_space=7,
    token_id_ts_begin=600,
    token_id_no_timestamps=599,
    suppress_blank=True,
    timestamps=True,
    suppress_ids=(3, 5),
    max_initial_timestamp_index=50,
)

SOT = 501
EOT = 500
BEAM = 3
SAMPLE_LEN = 10


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(7), DIMS)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3
    return params, mel


def oracle_beam(params, mel, sample_begin, sample_len, beam, patience=1.0):
    n_audio = mel.shape[0]
    xa = encoder_forward(params, jnp.asarray(mel), DIMS)
    xa = jnp.repeat(xa, beam, axis=0)
    cross_kv = precompute_cross_kv(params, xa, DIMS)
    B = n_audio * beam

    rows = [[SOT] for _ in range(B)]
    sum_lp = np.zeros(B)
    # dedup-equivalent init: only beam 0 live (see loop.py docstring) —
    # mirrors the HashMap collapse of identical step-0 prefixes.
    max_candidates = max(beam, round(patience * beam))
    finished = [dict() for _ in range(n_audio)]

    for step in range(sample_len):
        toks = jnp.asarray(np.asarray(rows, np.int32))
        logits, _ = decoder_forward(
            params, toks, jnp.int32(0), cross_kv, KVCache.init(DIMS, B), DIMS
        )
        last = np.asarray(logits)[:, -1].astype(np.float64)
        filt = apply_filters_ref(CFG, last, rows, sample_begin)
        rows, sum_lp, _src, completed = beam_step_ref(
            rows, sum_lp, filt, beam, EOT, finished, max_candidates
        )
        if completed:
            break

    # finalize backfill (beam_search.rs:151-206)
    for i in range(n_audio):
        if len(finished[i]) < beam:
            order = np.argsort(-sum_lp[i * beam : (i + 1) * beam])
            for j in order:
                seq = tuple(rows[i * beam + j]) + (EOT,)
                finished[i][seq] = sum_lp[i * beam + j]
                if len(finished[i]) >= beam:
                    break
    return finished


def test_beam_matches_oracle(setup):
    params, mel = setup
    initial = np.asarray([[SOT]] * 2, np.int32)

    result = decode_beam(
        params,
        jnp.asarray(mel),
        jnp.asarray(initial),
        jnp.int32(1),
        jnp.int32(0),
        DIMS,
        CFG,
        BeamSearchMode(beam_size=BEAM, patience=1.0),
        SAMPLE_LEN,
        no_speech_id=502,
    )
    cands = np.asarray(result.candidates)  # [n_audio, cap, n_ctx]
    scores = np.asarray(result.scores)

    ref = oracle_beam(params, mel, 1, SAMPLE_LEN, BEAM)

    for i in range(2):
        ref_set = {}
        for seq, sc in ref[i].items():
            ref_set[tuple(seq)] = sc
        our_set = {}
        for c in range(cands.shape[1]):
            if scores[i, c] <= -1e8:
                continue
            row = list(cands[i, c])
            end = row.index(EOT) + 1
            our_set[tuple(row[:end])] = scores[i, c]

        assert set(our_set) == set(ref_set), (
            f"audio {i}: ours={sorted(our_set)}, ref={sorted(ref_set)}"
        )
        for seq in ref_set:
            np.testing.assert_allclose(
                our_set[seq], ref_set[seq], rtol=1e-3, atol=1e-3
            )


def test_beam_patience_expands_candidates(setup):
    params, mel = setup
    initial = np.asarray([[SOT]] * 2, np.int32)
    result = decode_beam(
        params,
        jnp.asarray(mel),
        jnp.asarray(initial),
        jnp.int32(1),
        jnp.int32(0),
        DIMS,
        CFG,
        BeamSearchMode(beam_size=2, patience=2.0),
        SAMPLE_LEN,
        no_speech_id=502,
    )
    assert result.candidates.shape[1] == 4  # cap = round(2.0 * 2)


def test_beam_candidates_eot_terminated(setup):
    params, mel = setup
    initial = np.asarray([[SOT]] * 2, np.int32)
    result = decode_beam(
        params,
        jnp.asarray(mel),
        jnp.asarray(initial),
        jnp.int32(1),
        jnp.int32(0),
        DIMS,
        CFG,
        BeamSearchMode(beam_size=BEAM, patience=1.0),
        SAMPLE_LEN,
        no_speech_id=502,
    )
    cands = np.asarray(result.candidates)
    scores = np.asarray(result.scores)
    for i in range(cands.shape[0]):
        for c in range(cands.shape[1]):
            if scores[i, c] > -1e8:
                assert EOT in list(cands[i, c])


def test_beam_with_prompt_matches_oracle(setup):
    """Prompt-conditioned beam search vs the oracle: prompt occupies
    [0, sample_begin), pairing/begin filter state offsets shift."""
    params, mel = setup
    mel1 = mel[:1]
    prompt = [503, 17, 23, SOT]  # [sop, p, p, sot]; sample_begin = 4
    sample_begin = 4
    beam = 2

    # device: prefill bucket 8, left-aligned prompt
    initial = np.zeros((1, 8), np.int32)
    initial[0, :sample_begin] = prompt
    result = decode_beam(
        params,
        jnp.asarray(mel1),
        jnp.asarray(initial),
        jnp.int32(sample_begin),
        jnp.int32(3),
        DIMS,
        CFG,
        BeamSearchMode(beam_size=beam, patience=1.0),
        6,
        no_speech_id=502,
    )
    cands = np.asarray(result.candidates)
    scores = np.asarray(result.scores)

    # oracle on the same prompt
    xa = encoder_forward(params, jnp.asarray(mel1), DIMS)
    xa = jnp.repeat(xa, beam, axis=0)
    cross_kv = precompute_cross_kv(params, xa, DIMS)
    rows = [list(prompt) for _ in range(beam)]
    sum_lp = np.zeros(beam)
    finished = [dict()]
    for step in range(6):
        toks = jnp.asarray(np.asarray(rows, np.int32))
        logits, _ = decoder_forward(
            params, toks, jnp.int32(0), cross_kv, KVCache.init(DIMS, beam), DIMS
        )
        last = np.asarray(logits)[:, -1].astype(np.float64)
        filt = apply_filters_ref(CFG, last, rows, sample_begin)
        rows, sum_lp, _src, completed = beam_step_ref(
            rows, sum_lp, filt, beam, EOT, finished, beam
        )
        if completed:
            break
    if len(finished[0]) < beam:
        order = np.argsort(-sum_lp)
        for j in order:
            finished[0][tuple(rows[j]) + (EOT,)] = sum_lp[j]
            if len(finished[0]) >= beam:
                break

    ref_set = {tuple(k): v for k, v in finished[0].items()}
    our_set = {}
    for c in range(cands.shape[1]):
        if scores[0, c] <= -1e8:
            continue
        row = list(cands[0, c])
        end = row.index(EOT) + 1
        our_set[tuple(row[:end])] = scores[0, c]

    assert set(our_set) == set(ref_set)
    for seq in ref_set:
        np.testing.assert_allclose(our_set[seq], ref_set[seq], rtol=1e-3, atol=1e-3)


def test_beam5_deep_matches_oracle(setup):
    """Deeper search: beam=5, 16 steps — exercises multi-round finished
    collection and patience bookkeeping at reference scale (beam=5 is the
    reference example default, examples/transcribe.rs:47)."""
    params, mel = setup
    mel1 = mel[:1]
    initial = np.asarray([[SOT]], np.int32)
    beam = 5

    result = decode_beam(
        params, jnp.asarray(mel1), jnp.asarray(initial), jnp.int32(1),
        jnp.int32(0), DIMS, CFG, BeamSearchMode(beam_size=beam, patience=1.0),
        16, no_speech_id=502,
    )
    cands = np.asarray(result.candidates)
    scores = np.asarray(result.scores)

    ref = oracle_beam(params, mel1, 1, 16, beam)
    ref_set = {tuple(k): v for k, v in ref[0].items()}
    our_set = {}
    for c in range(cands.shape[1]):
        if scores[0, c] <= -1e8:
            continue
        row = list(cands[0, c])
        end = row.index(EOT) + 1
        our_set[tuple(row[:end])] = scores[0, c]
    assert set(our_set) == set(ref_set)
    for seq in ref_set:
        np.testing.assert_allclose(our_set[seq], ref_set[seq], rtol=1e-3, atol=2e-3)
