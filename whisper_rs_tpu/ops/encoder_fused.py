"""Fused residual-add + LayerNorm Pallas kernels for the encoder stack.

The encoder's per-block LN/residual traffic is the second-largest cost
after attention on v5e: XLA lowers ``x + delta`` -> f32 convert -> mean/
var reduce -> normalize as separate fusions that re-materialize [B, T, D]
f32 intermediates in HBM (device trace, large-v3-turbo b16: ~1.9 ms +
0.43 ms per layer against a ~0.3 ms 4-tensor traffic roofline).

Two row-parallel kernels close that gap (everything stays in VMEM
registers between the add and the normalize; LN math in f32 exactly as
models/whisper.py::layer_norm / model.rs:14-18):

  residual_ln(x, delta, scale, bias) -> (y, ln)   # y = x+delta, ln=LN(y)
  ln_fused(x, scale, bias)           -> ln        # plain LN

Both treat [B, T, D] as [B*T, D] row blocks — LN is row-local, so pad
rows and batch boundaries need no special handling.

Gating rides WHISPER_PALLAS_ENCODER (see ops/encoder_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _residual_ln_kernel(x_ref, d_ref, scale_ref, bias_ref, y_ref, ln_ref,
                        *, eps):
    y = x_ref[:].astype(jnp.float32) + d_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    n = (y - mean) * jax.lax.rsqrt(var + eps)
    n = n * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    ln_ref[:] = n.astype(ln_ref.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, ln_ref, *, eps):
    y = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    n = (y - mean) * jax.lax.rsqrt(var + eps)
    n = n * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    ln_ref[:] = n.astype(ln_ref.dtype)


_ROWS = 256


def _row_grid(n_rows: int):
    r = min(_ROWS, n_rows)
    while n_rows % r:
        r //= 2
    return n_rows // r, r


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def residual_ln(x, delta, scale, bias, eps: float = 1e-5, interpret=False):
    """(x + delta, LN(x + delta)) in one pass.  x, delta: [..., D]."""
    shape = x.shape
    D = shape[-1]
    x2 = x.reshape(-1, D)
    d2 = delta.reshape(-1, D)
    n_blocks, r = _row_grid(x2.shape[0])
    y, ln = pl.pallas_call(
        functools.partial(_residual_ln_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
        ),
        interpret=interpret,
    )(x2, d2, scale, bias)
    return y.reshape(shape), ln.reshape(shape)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_fused(x, scale, bias, eps: float = 1e-5, interpret=False):
    """LN(x) as a single row-parallel kernel.  x: [..., D]."""
    shape = x.shape
    D = shape[-1]
    x2 = x.reshape(-1, D)
    n_blocks, r = _row_grid(x2.shape[0])
    ln = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r, D), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    return ln.reshape(shape)
