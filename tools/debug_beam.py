"""Step-by-step beam divergence debugging (not a test)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, os.path.dirname(__file__))
from decode_oracle import apply_filters_ref, beam_step_ref, log_softmax
from test_beam import CFG, DIMS, SOT, EOT, BEAM
from whisper_rs_tpu.models import (
    KVCache,
    decoder_forward,
    encoder_forward,
    init_params,
    precompute_cross_kv,
)
from whisper_rs_tpu.decode.filters import apply_filters

params = init_params(jax.random.PRNGKey(7), DIMS)
rng = np.random.default_rng(5)
mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3
mel = mel[:1]  # just audio 0

n_audio = 1
beam = BEAM
xa = encoder_forward(params, jnp.asarray(mel), DIMS)
xa = jnp.repeat(xa, beam, axis=0)
cross_kv = precompute_cross_kv(params, xa, DIMS)
B = n_audio * beam

rows = [[SOT] for _ in range(B)]
sum_lp = np.zeros(B)
finished = [dict()]
cap = beam

for step in range(10):
    toks = jnp.asarray(np.asarray(rows, np.int32))
    logits, _ = decoder_forward(
        params, toks, jnp.int32(0), cross_kv, KVCache.init(DIMS, B), DIMS
    )
    last = np.asarray(logits)[:, -1].astype(np.float64)
    filt = apply_filters_ref(CFG, last, rows, 1)

    # also compute the vectorized filter on the same logits
    n_ctx = DIMS.n_text_ctx
    tokbuf = np.zeros((B, n_ctx), np.int32)
    L = len(rows[0])
    for i, r in enumerate(rows):
        tokbuf[i, :L] = r
    vfilt = np.asarray(
        apply_filters(
            CFG,
            jnp.asarray(last, jnp.float32),
            jnp.asarray(tokbuf),
            jnp.int32(L),
            jnp.int32(1),
        )
    )
    ban_diff = (~np.isfinite(filt)) != (~np.isfinite(vfilt))
    if ban_diff.any():
        ks, vs = np.nonzero(ban_diff)
        print(f"step {step}: FILTER BAN DIFF rows {rows} at", list(zip(ks, vs))[:10])

    lp = log_softmax(filt)
    for j in range(B):
        top = np.argsort(-lp[j])[:4]
        print(f"step {step} beam {j} prefix={rows[j][-3:]} top4={[(int(t), round(lp[j,t],3)) for t in top]} cum={sum_lp[j]:.3f}")

    rows, sum_lp, src, completed = beam_step_ref(
        rows, sum_lp, filt, beam, EOT, finished, cap
    )
    print(f"  -> beams {[r[-3:] for r in rows]} scores {np.round(sum_lp,3)} fin={len(finished[0])}")
    if completed:
        break
print("finished:", {k[-4:]: round(v, 3) for k, v in finished[0].items()})
