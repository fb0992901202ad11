"""Per-row prompt batching: end-aligned prompts with key_start masking must
reproduce the per-utterance (single-prompt) decode exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_rs_tpu.config import GreedyMode, ModelDims
from whisper_rs_tpu.decode import FilterConfig, decode_greedy
from whisper_rs_tpu.decode.prompt import build_batch_prompts
from whisper_rs_tpu.models import init_params

DIMS = ModelDims(80, 1000, 1500, 64, 4, 2, 448, 64, 4, 2)
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
SOT, SOP, EOT = 501, 503, 500


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(11), DIMS)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3
    return params, mel


def test_build_batch_prompts_layout():
    tokens, key_start, P, sot_idx = build_batch_prompts(
        [None, [17, 23, 42]], [SOT], SOT, SOP
    )
    assert P == 8
    assert sot_idx == 7
    # row 0: no prompt -> [0..0, sot]
    np.testing.assert_array_equal(tokens[0], [0, 0, 0, 0, 0, 0, 0, SOT])
    assert key_start[0] == 7
    # row 1: [sop, 17, 23, 42, sot] end-aligned
    np.testing.assert_array_equal(tokens[1], [0, 0, 0, SOP, 17, 23, 42, SOT])
    assert key_start[1] == 3


def test_mixed_prompt_batch_matches_individual(setup):
    """Batch of [no-prompt, prompted] must equal two single-utterance runs
    (each via the same end-aligned path so positions match)."""
    params, mel = setup
    prompt = [17, 23, 42]

    def run(mel_rows, prompts):
        tokens, key_start, P, sot_idx = build_batch_prompts(
            prompts, [SOT], SOT, SOP
        )
        return decode_greedy(
            params,
            jnp.asarray(mel_rows),
            jnp.asarray(tokens),
            jnp.int32(P),
            jnp.int32(sot_idx),
            DIMS,
            CFG,
            GreedyMode(),
            8,
            no_speech_id=502,
            key_start=jnp.asarray(key_start),
        )

    both = run(mel, [None, prompt])
    solo0 = run(mel[:1], [None])
    solo1 = run(mel[1:], [prompt])

    np.testing.assert_array_equal(
        np.asarray(both.candidates)[0], np.asarray(solo0.candidates)[0]
    )
    np.testing.assert_array_equal(
        np.asarray(both.candidates)[1], np.asarray(solo1.candidates)[0]
    )
    np.testing.assert_allclose(
        np.asarray(both.scores),
        np.concatenate([solo0.scores, solo1.scores]),
        rtol=1e-4, atol=1e-4,
    )


def test_left_pad_is_masked_out(setup):
    """A row whose prompt region is left-padded must decode identically to
    the same logical prompt with different pad garbage — pads must not leak
    into attention."""
    params, mel = setup
    prompt = [17, 23]

    tokens, key_start, P, sot_idx = build_batch_prompts(
        [prompt, prompt], [SOT], SOT, SOP
    )
    # poison row 1's pad slots with arbitrary token ids
    tokens = tokens.copy()
    tokens[1, : key_start[1]] = 777

    out = decode_greedy(
        params,
        jnp.asarray(mel[:1].repeat(2, axis=0)),
        jnp.asarray(tokens),
        jnp.int32(P),
        jnp.int32(sot_idx),
        DIMS,
        CFG,
        GreedyMode(),
        6,
        no_speech_id=502,
        key_start=jnp.asarray(key_start),
    )
    c = np.asarray(out.candidates)
    # generated region identical despite differing pad garbage
    np.testing.assert_array_equal(c[0, 0, P:], c[1, 0, P:])
