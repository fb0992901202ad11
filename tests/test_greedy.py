"""On-device greedy decode vs a host-side oracle loop.

The oracle recomputes logits each step with a full prefill (no KV cache),
applies the NumPy reference filters, and takes argmax — i.e. the reference
main_loop semantics (decode/mod.rs:220-282) with a correct greedy extractor
(the reference's is unfinished, greedy.rs:60)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decode_oracle import apply_filters_ref, log_softmax
from whisper_rs_tpu.config import GreedyMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig, decode_greedy
from whisper_rs_tpu.decode.ranker import rank_max_likelihood
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
SAMPLE_LEN = 12


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(42), DIMS)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3
    return params, mel


def oracle_greedy(params, mel, initial_tokens, sample_begin, sample_len, dims=None):
    """Host loop: full re-prefill each step, filters, argmax, EOT pinning."""
    dims = dims or DIMS
    xa = encoder_forward(params, jnp.asarray(mel), dims)
    cross_kv = precompute_cross_kv(params, xa, dims)
    B = mel.shape[0]
    rows = [list(initial_tokens[i]) for i in range(B)]
    sum_lp = np.zeros(B)
    finished = np.zeros(B, bool)

    for _ in range(sample_len):
        L = len(rows[0])
        toks = jnp.asarray(np.asarray(rows, np.int32))
        logits, _ = decoder_forward(
            params, toks, jnp.int32(0), cross_kv, KVCache.init(dims, B), dims
        )
        last = np.asarray(logits)[:, -1].astype(np.float64)
        filt = apply_filters_ref(CFG, last, rows, sample_begin)
        nxt = np.argmax(filt, axis=-1)
        lp = log_softmax(filt)
        for i in range(B):
            if not finished[i]:
                sum_lp[i] += lp[i, nxt[i]]
            tok = EOT if finished[i] else int(nxt[i])
            rows[i].append(tok)
            finished[i] = finished[i] or tok == EOT
        if finished.all():
            break
    # finalize: ensure one EOT
    for i in range(B):
        if not finished[i]:
            rows[i].append(EOT)
    return rows, sum_lp


def test_greedy_matches_oracle(setup):
    params, mel = setup
    initial = np.asarray([[SOT]] * 2, np.int32)

    result = decode_greedy(
        params,
        jnp.asarray(mel),
        jnp.asarray(initial),
        jnp.int32(1),
        jnp.int32(0),
        DIMS,
        CFG,
        GreedyMode(),
        SAMPLE_LEN,
        no_speech_id=502,
    )
    ours = np.asarray(result.candidates)[:, 0]  # [B, n_ctx]
    our_scores = np.asarray(result.scores)[:, 0]

    rows, ref_scores = oracle_greedy(params, mel, initial, 1, SAMPLE_LEN)

    for i in range(2):
        seq = rows[i]
        # compare up to and including first EOT
        end = seq.index(EOT) + 1 if EOT in seq else len(seq)
        np.testing.assert_array_equal(ours[i, :end], seq[:end])
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-3, atol=1e-3)


def test_greedy_no_speech_prob_range(setup):
    params, mel = setup
    initial = np.asarray([[SOT]] * 2, np.int32)
    result = decode_greedy(
        params,
        jnp.asarray(mel),
        jnp.asarray(initial),
        jnp.int32(1),
        jnp.int32(0),
        DIMS,
        CFG,
        GreedyMode(),
        4,
        no_speech_id=502,
    )
    nsp = np.asarray(result.no_speech_probs)
    assert nsp.shape == (2,)
    assert ((nsp >= 0) & (nsp <= 1)).all()


def test_greedy_with_prompt_prefix(setup):
    """Prompted decode: prompt tokens occupy [0, sample_begin); generation
    must still start with a forced timestamp."""
    params, mel = setup
    # [sop, p, p, sot] padded to bucket 8
    initial = np.zeros((2, 8), np.int32)
    initial[:, :4] = [503, 17, 23, SOT]
    result = decode_greedy(
        params,
        jnp.asarray(mel),
        jnp.asarray(initial),
        jnp.int32(4),
        jnp.int32(3),
        DIMS,
        CFG,
        GreedyMode(),
        6,
        no_speech_id=502,
    )
    toks = np.asarray(result.candidates)[:, 0]
    # prompt preserved
    np.testing.assert_array_equal(toks[:, :4], initial[:, :4])
    # first sampled token is a timestamp in [ts_begin, ts_begin+50]
    assert (toks[:, 4] >= 600).all() and (toks[:, 4] <= 650).all()

    # and matches the oracle run with the same prompt
    rows, _ = oracle_greedy(params, mel, [list(initial[i, :4]) for i in range(2)], 4, 6)
    for i in range(2):
        seq = rows[i]
        end = seq.index(EOT) + 1 if EOT in seq else len(seq)
        np.testing.assert_array_equal(toks[i, :end], seq[:end])


def test_ranker_greedy():
    from whisper_rs_tpu.decode.loop import DecodeResult

    cands = np.full((1, 1, 16), 0, np.int32)
    cands[0, 0, :3] = [SOT, 601, 602]
    cands[0, 0, 5] = EOT  # length = 5 - 1 = 4
    res = DecodeResult(
        candidates=jnp.asarray(cands),
        scores=jnp.asarray([[-2.0]], jnp.float32),
        no_speech_probs=jnp.zeros((1,)),
        audio_features=jnp.zeros((1, 4, 4)),
    )
    sel, avg_lp, lengths = rank_max_likelihood(res, jnp.int32(1), EOT, None)
    assert int(sel[0]) == 0
    assert int(lengths[0, 0]) == 4
    np.testing.assert_allclose(float(avg_lp[0]), -2.0 / 5.0, rtol=1e-6)


def test_no_speech_prob_matches_full_prefill(setup):
    """no_speech_prob must equal softmax(logits at the SOT row)[nospeech]
    from a plain full-prompt forward (decode/mod.rs:250-255)."""
    params, mel = setup
    initial = np.asarray([[SOT]] * 2, np.int32)
    result = decode_greedy(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1),
        jnp.int32(0), DIMS, CFG, GreedyMode(), 2, no_speech_id=502,
    )

    xa = encoder_forward(params, jnp.asarray(mel), DIMS)
    cross_kv = precompute_cross_kv(params, xa, DIMS)
    logits, _ = decoder_forward(
        params, jnp.asarray(initial), jnp.int32(0), cross_kv,
        KVCache.init(DIMS, 2), DIMS,
    )
    expect = jax.nn.softmax(logits[:, 0].astype(jnp.float32), axis=-1)[:, 502]
    np.testing.assert_allclose(
        np.asarray(result.no_speech_probs), np.asarray(expect), rtol=1e-4, atol=1e-5
    )


def test_avg_logprob_formula(setup):
    """avg_logprob = cum_logprob / (sampled_len + 1) (decode/mod.rs:389-397),
    checked through the full DecodeResult -> ranker path."""
    from whisper_rs_tpu.decode.ranker import rank_max_likelihood

    params, mel = setup
    initial = np.asarray([[SOT]] * 2, np.int32)
    result = decode_greedy(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1),
        jnp.int32(0), DIMS, CFG, GreedyMode(), 8, no_speech_id=502,
    )
    sel, avg_lp, lengths = rank_max_likelihood(result, jnp.int32(1), EOT, None)
    scores = np.asarray(result.scores)
    for i in range(2):
        s = int(np.asarray(sel)[i])
        want = scores[i, s] / (int(np.asarray(lengths)[i, s]) + 1.0)
        np.testing.assert_allclose(float(np.asarray(avg_lp)[i]), want, rtol=1e-5)


def test_greedy_asymmetric_depths_runs():
    """distil-style dims (deep encoder, shallow decoder) flow through the
    whole decode stack — guards n_audio_layer/n_text_layer separation in
    init_params, KVCache, and the layer scans."""
    import dataclasses

    dims = dataclasses.replace(DIMS, n_audio_layer=3, n_text_layer=1)
    params = init_params(jax.random.PRNGKey(7), dims)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.3
    initial = np.asarray([[SOT]], np.int32)

    result = decode_greedy(
        params, jnp.asarray(mel), jnp.asarray(initial), jnp.int32(1),
        jnp.int32(0), dims, CFG, GreedyMode(), SAMPLE_LEN, no_speech_id=502,
    )
    toks = np.asarray(result.candidates)[0, 0]
    assert toks.shape[0] == dims.n_text_ctx
    assert np.isfinite(np.asarray(result.scores)).all()

    rows, ref_scores = oracle_greedy(params, mel, initial, 1, SAMPLE_LEN, dims=dims)
    seq = rows[0]
    end = seq.index(EOT) + 1 if EOT in seq else len(seq)
    np.testing.assert_array_equal(toks[:end], seq[:end])
