"""Normalization + activation ops.

Reference: ``rmsnorm`` (x86_simd.cpp:1750-1764, eps hardcoded 1e-5),
``swiglu`` (x86_simd.cpp:1767-1770: ``xo = xo * sigmoid(xo) * xi``),
``softmax`` with max-subtraction (tf_operators.cpp:176-209).

These are jnp implementations; XLA fuses them into neighbouring ops.  (An
rmsnorm+quantize Pallas epilogue was considered and dropped: the engines
dequantize WEIGHTS in-kernel and keep activations bf16, so there is no
activation-quantize step on the hot path outside parity mode.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rmsnorm(x: jax.Array, w: jax.Array, eps: float = 1e-5) -> jax.Array:
    """o = w * x / sqrt(mean(x^2) + eps); stats in fp32 regardless of x dtype."""
    xf = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * r).astype(x.dtype) * w.astype(x.dtype)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """silu(gate) * up — reference execute_ffn13 (transformer.cpp:468-483):
    o1 = W1 x (gate), o3 = W3 x (up), o1.swiglu(o3)."""
    return jax.nn.silu(gate) * up


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)
