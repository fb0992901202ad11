"""Vectorized logit filters vs the row-wise NumPy oracle."""

import jax.numpy as jnp
import numpy as np

from decode_oracle import apply_filters_ref
from whisper_rs_tpu.decode import FilterConfig, apply_filters

V = 100
CFG = FilterConfig(
    n_vocab=V,
    token_id_eot=50,
    token_id_space=7,
    token_id_ts_begin=60,
    token_id_no_timestamps=59,
    suppress_blank=True,
    timestamps=True,
    suppress_ids=(3, 5, 58),
    max_initial_timestamp_index=10,
)


def _run_both(cfg, logits, rows, sample_begin):
    """rows: list of B full token lists (same length)."""
    B = len(rows)
    n_ctx = 32
    tokens = np.zeros((B, n_ctx), np.int32)
    pos = len(rows[0])
    for i, r in enumerate(rows):
        tokens[i, : len(r)] = r

    ours = np.asarray(
        apply_filters(
            cfg,
            jnp.asarray(logits, jnp.float32),
            jnp.asarray(tokens),
            jnp.int32(pos),
            jnp.int32(sample_begin),
        )
    )
    ref = apply_filters_ref(cfg, logits.astype(np.float64), rows, sample_begin)
    return ours, ref


def _check(cfg, logits, rows, sample_begin):
    ours, ref = _run_both(cfg, logits, rows, sample_begin)
    ban_ours = ~np.isfinite(ours)
    ban_ref = ~np.isfinite(ref)
    np.testing.assert_array_equal(ban_ours, ban_ref)
    np.testing.assert_allclose(
        np.where(ban_ours, 0.0, ours), np.where(ban_ref, 0.0, ref), rtol=1e-5
    )


def test_first_position_rules():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, V))
    rows = [[51], [51], [51]]  # just sot; sample_begin = 1
    _check(CFG, logits, rows, 1)


def test_after_single_timestamp():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, V))
    rows = [[51, 61, 20], [51, 62, 63]]  # row 1: ts, text; row 2: ts, ts
    _check(CFG, logits, rows, 1)


def test_timestamp_pair_rules():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((4, V))
    rows = [
        [51, 61, 62],  # last two are ts -> ban ts
        [51, 20, 61],  # text then ts -> ban text
        [51, 20, 21],  # text only -> no pairing ban
        [51, 61, 20],  # last is text -> no pairing ban
    ]
    _check(CFG, logits, rows, 1)
    # single sampled ts: len<2 -> second_last_was_ts -> ban ts
    logits2 = rng.standard_normal((1, V))
    _check(CFG, logits2, [[51, 61]], 1)


def test_with_prompt_offset():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, V))
    # prompt of 4 tokens; sample region starts at 4
    rows = [[90, 1, 2, 51], [90, 1, 2, 51]]
    _check(CFG, logits, rows, 4)
    rows2 = [[90, 1, 2, 51, 61], [90, 1, 2, 51, 20]]
    _check(CFG, logits, rows2, 4)


def test_forced_timestamp_logsumexp():
    # craft logits where timestamp mass dominates -> text must be banned
    logits = np.full((1, V), -5.0)
    logits[0, 60:80] = 3.0
    rows = [[51, 61, 20]]
    ours, ref = _run_both(CFG, logits, rows, 1)
    assert not np.isfinite(ours[0, :50]).any()
    np.testing.assert_array_equal(~np.isfinite(ours), ~np.isfinite(ref))


def test_suppress_lists_disabled():
    cfg = FilterConfig(
        n_vocab=V,
        token_id_eot=50,
        token_id_space=7,
        token_id_ts_begin=60,
        token_id_no_timestamps=59,
        suppress_blank=False,
        timestamps=False,
        suppress_ids=(),
        max_initial_timestamp_index=None,
    )
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((2, V))
    rows = [[51], [51]]
    ours, ref = _run_both(cfg, logits, rows, 1)
    np.testing.assert_allclose(ours, logits, rtol=1e-6)
    np.testing.assert_allclose(ref, logits, rtol=1e-6)


def test_filters_random_property(subtests=None):
    """Property test: 40 random (logits, history) states must match the
    row-wise oracle bit-for-bit on the ban pattern."""
    rng = np.random.default_rng(7)
    for trial in range(40):
        B = int(rng.integers(1, 5))
        sample_begin = int(rng.integers(1, 6))
        n_sampled = int(rng.integers(0, 6))
        L = sample_begin + n_sampled
        rows = []
        for _ in range(B):
            prompt = rng.integers(0, V, sample_begin - 1).tolist() + [51]
            sampled = []
            for _ in range(n_sampled):
                # mix of text and timestamp tokens
                sampled.append(
                    int(rng.integers(60, 90)) if rng.random() < 0.5
                    else int(rng.integers(0, 50))
                )
            rows.append(prompt + sampled)
        logits = rng.standard_normal((B, V)) * 2
        _check(CFG, logits, rows, sample_begin)
