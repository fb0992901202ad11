"""Kernel-safe math helpers shared by the Pallas decode kernels.

``lax.erf``/``lax.erfc`` have NO Pallas TPU lowering in this JAX build —
caught by the r5 on-chip suite: the f32 megakernel and fused-MLP paths
failed to compile with 'Unimplemented primitive ... erf/erfc' while every
interpret-mode parity test passed (interpret mode executes the XLA
primitive and cannot catch lowering gaps — the exact hazard ROADMAP's
Mosaic notes warn about).  Kernels therefore carry their own erf.
"""

from __future__ import annotations

import jax.numpy as jnp


def kernel_erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 — at f32
    rounding, comfortably inside the 2e-5 parity tolerances)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def kernel_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching models.whisper.gelu's numerics: erf form in f32,
    tanh approximation in half precision — lowerable inside Mosaic."""
    if x.dtype in (jnp.float32, jnp.float64):
        inv_sqrt2 = jnp.asarray(0.7071067811865476, x.dtype)
        return 0.5 * x * (1.0 + kernel_erf(x * inv_sqrt2))
    c = jnp.asarray(0.7978845608028654, x.dtype)  # sqrt(2/pi)
    k = jnp.asarray(0.044715, x.dtype)
    half = jnp.asarray(0.5, x.dtype)
    one = jnp.asarray(1.0, x.dtype)
    return half * x * (one + jnp.tanh(c * (x + k * jnp.square(x) * x)))
