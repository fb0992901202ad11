"""GPipe pipeline-parallel encoder vs the single-device forward (fake mesh).

Closes the last SURVEY §2.3 parallelism row: encoder blocks staged across
a ('stage',) mesh, microbatches flowing via lax.ppermute under shard_map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_rs_tpu.config import ModelDims
from whisper_rs_tpu.models import encoder_forward, init_params
from whisper_rs_tpu.parallel.pipeline import encoder_forward_pp, make_pipeline_mesh

DIMS = ModelDims(
    n_mels=80, n_vocab=1000, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=4, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8
    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((8, 80, 3000)).astype(np.float32) * 0.3)
    return params, mel


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 8)])
def test_pp_encoder_matches_single_device(setup, n_stages, n_micro):
    params, mel = setup
    expect = np.asarray(encoder_forward(params, mel, DIMS))
    mesh = make_pipeline_mesh(n_stages)
    got = np.asarray(
        encoder_forward_pp(params, mel, DIMS, mesh, n_micro=n_micro)
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_pp_rejects_bad_split(setup):
    params, mel = setup
    mesh = make_pipeline_mesh(3)  # 4 layers not divisible by 3 stages
    with pytest.raises(ValueError):
        encoder_forward_pp(params, mel, DIMS, mesh)
