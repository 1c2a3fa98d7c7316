"""Quantized matmul — the framework's hot op.

The reference computes W@x with *both* sides quantized: per 64-group integer
dot, accumulated as ``sum_g int_dot(w_g, x_g) * ws_g * xs_g`` in fp32
(``quant_operators.cpp:252-348``, AVX-512 int8 inner loop
``x86_simd.cpp:1647-1674``).  That design exists because int8 dot is ~4x fp32
throughput on AVX-512.

On TPU the decode-time matmul is **HBM-bandwidth bound**, not compute bound:
the win is streaming int8 weights (1 byte/param) out of HBM, not integer
arithmetic.  So the TPU-native fast path dequantizes weight tiles to
bf16/fp32 *in VMEM* and feeds the MXU at full tile sizes (fused Pallas kernel
in ops/pallas/qmm.py; the jnp fallback below lets XLA do the same fusion).
The bit-faithful reference math (activation re-quantization + grouped int
dot, transformer.cpp:135-150) is kept as ``qmatmul_parity`` for accuracy
parity tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fastllama_tpu.config import QuantType
from fastllama_tpu.quant.groupquant import QArray, dequantize, quantize


def qmatmul(x: jax.Array, w, compute_dtype=jnp.float32) -> jax.Array:
    """``x @ w`` where ``w`` is a QArray in the transposed (I, O) layout
    (groups along I, group_axis=-2) or a plain (I, O) array.
    ``x``: (..., I).  Returns (..., O) in x.dtype."""
    if isinstance(w, QArray):
        wf = dequantize(w, compute_dtype)
    else:
        wf = w.astype(compute_dtype)
    # fp32 inputs get true-fp32 MXU passes; bf16 inputs use the native path.
    precision = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out = jax.lax.dot_general(
        x.astype(compute_dtype), wf,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def qmatmul_parity(x: jax.Array, w: QArray) -> jax.Array:
    """Bit-faithful reference math (quant_operators.cpp:252-284): quantize the
    activation per group, integer dot per group, fp32 accumulation of
    ``int_dot * ws * xs``.  ``x``: (B, I) fp32; ``w``: (I, O) QArray with
    group_axis=-2 (scales (G, O))."""
    w = w.unpacked()
    gs = w.group_size
    I, O = w.data.shape
    G = I // gs
    xq = quantize(x, w.qtype, gs)
    # int32 grouped dot: (G, gs, O) x (B, G, gs) -> (B, O, G)
    wd = w.data.reshape(G, gs, O).astype(jnp.int32)
    xd = xq.data.reshape(*x.shape[:-1], G, gs).astype(jnp.int32)
    acc = jnp.einsum("gko,...gk->...og", wd, xd)
    scaled = (acc.astype(jnp.float32)
              * jnp.swapaxes(w.scales, 0, 1)[None, :, :]
              * xq.scales[..., None, :])
    return jnp.sum(scaled, axis=-1)
