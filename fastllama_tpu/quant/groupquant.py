"""Group-wise symmetric quantization core.

TPU-native re-design of the reference's quantization scheme
(``/root/reference/src/blas/quant_operators.cpp:26-117``):

* groups of ``group_size`` (default 64) elements along the **last** axis,
* per-group scale ``s = max|x| / QF`` with QF = 5792 / 127 / 7 for
  INT16 / INT8 / INT4 (quant_operators.h:32-34),
* values quantized by **truncation toward zero** (``qx[j] = x[j] / r`` with a
  C integer cast, quant_operators.cpp:33-45) — we reproduce that exactly so
  converted checkpoints are bit-identical to ``tools/convert_flm.py``
  (reference lines 216-243, which uses ``ndarray.astype`` = the same
  truncation).

Unlike the reference (separate ``char* data`` + ``float* scales`` buffers
inside one Tensor), a :class:`QArray` is a JAX pytree of two device arrays, so
it flows through ``jit`` / ``shard_map`` / donation like any other array, and
sub-byte INT4 uses the native ``int4`` dtype rather than the reference's
hand-packed ``Bit4Pair`` (quant_operators.h:25-31); packing only exists at the
file-format boundary (see loaders/flm.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastllama_tpu.config import QuantType

# INT4 values are carried in int8 lanes on device: the native jnp.int4 dtype
# hits a device_put RecursionError on the axon TPU backend (verified on
# jax 0.9.0 / TPU v5e), and sub-byte layouts buy nothing until the Pallas
# kernels consume nibble-packed uint8 directly (pack_int4_np below is the
# wire/kernel format, matching the reference's Bit4Pair).
_QDTYPE = {
    QuantType.INT16: jnp.int16,
    QuantType.INT8: jnp.int8,
    QuantType.INT4: jnp.int8,
}
_QDTYPE_NP = {
    QuantType.INT16: np.int16,
    QuantType.INT8: np.int8,
    QuantType.INT4: np.int8,  # numpy has no int4; store unpacked in int8
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QArray:
    """Group-quantized tensor: integer ``data`` + per-group fp32 ``scales``.

    ``group_axis`` selects where quant groups run:

    * ``-1`` (default): groups along the last axis — activations and the
      embedding table ``(V, D)``, matching the reference's per-row grouping.
    * ``-2``: groups along the second-to-last axis — projection weights in
      the TPU-native transposed layout ``(in, out)`` with scales
      ``(in // gs, out)``.  Lanes then carry output features, which is what
      the MXU and the Pallas dequant kernel want (scale expansion along
      sublanes; see ops/pallas/qmm.py).
    """

    data: jax.Array
    scales: jax.Array
    qtype: QuantType = dataclasses.field(metadata=dict(static=True))
    group_size: int = dataclasses.field(metadata=dict(static=True))
    group_axis: int = dataclasses.field(default=-1, metadata=dict(static=True))
    # INT4 nibble packing along axis -2 (the contraction axis of transposed
    # weights): ``data`` is int8 of half height, SPLIT-HALF order — byte row
    # r holds logical row r in the low nibble and logical row r + I/2 in the
    # high nibble (pack_int4_rows_np; both kernels unpack the same way).
    # The same two-values-per-byte wire idea as the reference's Bit4Pair
    # (quant_operators.h:25-31), but split-half keeps each nibble plane a
    # contiguous K-range so the kernel runs two clean half-K MXU passes.
    # Halves decode HBM traffic; kernels unpack in VMEM.
    packed: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def astype_f(self, dtype=jnp.float32) -> jax.Array:
        return dequantize(self, dtype)

    def __getitem__(self, idx) -> "QArray":
        # Leading-axis indexing only (layer slicing); groups live on trailing
        # axes, which negative group_axis keeps addressing correctly.
        return QArray(self.data[idx], self.scales[idx], self.qtype,
                      self.group_size, self.group_axis, self.packed)

    def unpacked(self) -> "QArray":
        """Materialize int8 values from a nibble-packed INT4 QArray."""
        if not self.packed:
            return self
        return QArray(unpack_int4_rows(self.data), self.scales, self.qtype,
                      self.group_size, self.group_axis, packed=False)


def compress_scales(tree, dtype=jnp.bfloat16):
    """Store group scales of every non-wide QArray in ``tree`` as ``dtype``
    (serving option, EngineConfig.scale_dtype="bfloat16").

    Bit-identical decode math for INT8/INT4: the Pallas dequant multiply
    casts scales to bf16 anyway (ops/pallas/qmm._qmm_chunk), so only the
    HBM storage narrows — the f32 scale stream is 1/16 of the int8 weight
    bytes at gs=64 (416 MB of the 7B serving step's 7.15 GB).  INT16 keeps
    f32: its wide path dequantizes in f32, where scale rounding would cost
    real precision.  Non-QArray leaves pass through untouched."""
    def conv(x):
        if isinstance(x, QArray) and x.qtype != QuantType.INT16:
            return QArray(x.data, x.scales.astype(dtype), x.qtype,
                          x.group_size, x.group_axis, x.packed)
        return x

    return jax.tree.map(conv, tree,
                        is_leaf=lambda x: isinstance(x, QArray))


def _check(n: int, gs: int) -> None:
    if n % gs != 0:
        raise ValueError(f"last dim {n} not a multiple of group_size {gs}")


def quantize(x: jax.Array, qtype: QuantType, group_size: int = 64) -> QArray:
    """Quantize along the last axis. Matches quant_operators.cpp:26-47 exactly
    (scale = max|group|/QF, truncation toward zero)."""
    if qtype == QuantType.NONE:
        raise ValueError("quantize() with QuantType.NONE")
    gs = group_size
    _check(x.shape[-1], gs)
    g = x.reshape(*x.shape[:-1], x.shape[-1] // gs, gs).astype(jnp.float32)
    scale = jnp.max(jnp.abs(g), axis=-1) / float(qtype.factor)
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.trunc(g / safe[..., None]).astype(_QDTYPE[qtype])
    return QArray(q.reshape(x.shape), scale, qtype, gs)


def dequantize(q: QArray, dtype=jnp.float32) -> jax.Array:
    """Inverse of :func:`quantize` (quant_operators.cpp:50-66)."""
    q = q.unpacked()
    gs = q.group_size
    shape = q.data.shape
    if q.group_axis == -1:
        g = q.data.reshape(*shape[:-1], shape[-1] // gs, gs).astype(dtype)
        out = g * q.scales[..., None].astype(dtype)
    elif q.group_axis == -2:
        g = q.data.reshape(*shape[:-2], shape[-2] // gs, gs,
                           shape[-1]).astype(dtype)
        out = g * q.scales[..., :, None, :].astype(dtype)
    else:
        raise ValueError(f"unsupported group_axis {q.group_axis}")
    return out.reshape(shape)


def transpose_weight(data: np.ndarray, scales: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(…, O, I) data + (…, O, I/gs) scales  ->  (…, I, O) + (…, I/gs, O):
    the load-time conversion from checkpoint layout to the TPU-native
    transposed (group_axis=-2) layout."""
    return (np.ascontiguousarray(np.swapaxes(data, -1, -2)),
            np.ascontiguousarray(np.swapaxes(scales, -1, -2)))


# ---------------------------------------------------------------------------
# numpy versions (host-side, used by loaders/converter before device_put)
# ---------------------------------------------------------------------------

def quantize_np(x: np.ndarray, qtype: QuantType, group_size: int = 64
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Host quantization; bit-identical to reference convert_flm.py:216-243."""
    gs = group_size
    _check(x.shape[-1], gs)
    g = np.ascontiguousarray(x, dtype=np.float32).reshape(
        *x.shape[:-1], x.shape[-1] // gs, gs)
    scale = np.abs(g).max(axis=-1) / float(qtype.factor)
    safe = np.where(scale > 0, scale, 1.0).astype(np.float32)
    q = np.trunc(g / safe[..., None]).astype(_QDTYPE_NP[qtype])
    return q.reshape(x.shape), scale.astype(np.float32)


def dequantize_np(q: np.ndarray, scales: np.ndarray, group_size: int = 64
                  ) -> np.ndarray:
    gs = group_size
    g = q.reshape(*q.shape[:-1], q.shape[-1] // gs, gs).astype(np.float32)
    return (g * scales[..., None]).reshape(q.shape)


def pack_int4_np(q: np.ndarray) -> np.ndarray:
    """Pack int8-held int4 values (range [-8,7]) into the reference's
    ``Bit4Pair`` layout: low nibble = even element, high nibble = odd element
    (quant_operators.h:25-31, quant_operators.cpp:36-40)."""
    assert q.shape[-1] % 2 == 0
    lo = q[..., 0::2].astype(np.uint8) & 0x0F
    hi = (q[..., 1::2].astype(np.uint8) & 0x0F) << 4
    return (lo | hi).astype(np.uint8)


def pack_int4_rows_np(q: np.ndarray) -> np.ndarray:
    """Nibble-pack int8-held int4 values along axis -2 (the transposed
    weight layout's contraction axis) in SPLIT-HALF order: byte row ``i``
    holds logical row ``i`` in the low nibble and row ``i + I/2`` in the
    high nibble — (…, I, O) int8 -> (…, I/2, O) int8.

    Split-half (not adjacent-pair) order so unpacking never shuffles
    sublanes: each nibble plane IS a contiguous K-range, and the fused
    kernel consumes the two planes as two half-K matmul passes (an
    adjacent-pair layout needs a stack+reshape interleave that Mosaic
    lowers to a slow sublane shuffle — measured 4x slower end-to-end)."""
    assert q.shape[-2] % 2 == 0
    half = q.shape[-2] // 2
    lo = q[..., :half, :].astype(np.uint8) & 0x0F
    hi = (q[..., half:, :].astype(np.uint8) & 0x0F) << 4
    return (lo | hi).astype(np.int8)


def unpack_int4_rows_np(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_int4_rows_np`."""
    u = packed.astype(np.uint8)
    lo = (u & 0x0F).astype(np.int8)
    hi = ((u >> 4) & 0x0F).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo).astype(np.int8)
    hi = np.where(hi >= 8, hi - 16, hi).astype(np.int8)
    return np.concatenate([lo, hi], axis=-2)


def unpack_int4_rows(packed: jax.Array) -> jax.Array:
    """jnp inverse of :func:`pack_int4_rows_np`: two sign-extending int32
    shifts and a half-concat (no interleave)."""
    p = packed.astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.int8)
    hi = ((p << 24) >> 28).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization over the LAST axis (one scale per
    row, round-to-nearest): the KV-cache scheme.  Unlike weights (fixed at
    convert time, reference truncation semantics), cache rows are quantized
    on the fly each step, so we use rounding for the extra half-bit.

    Returns (int8 data, f32 scales with a trailing singleton axis) —
    scales keep shape (..., 1) so kernels broadcast along lanes."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(xf / safe), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rows(q: jax.Array, scales: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    """Inverse of :func:`quantize_rows`."""
    return (q.astype(jnp.float32) * scales).astype(dtype)


def unpack_int4_np(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_int4_np`: two's-complement nibbles → int8."""
    lo = (packed & 0x0F).astype(np.int8)
    hi = ((packed >> 4) & 0x0F).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo).astype(np.int8)
    hi = np.where(hi >= 8, hi - 16, hi).astype(np.int8)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), dtype=np.int8)
    out[..., 0::2] = lo
    out[..., 1::2] = hi
    return out


def from_prequantized(data: np.ndarray, scales: np.ndarray, qtype: QuantType,
                      group_size: int = 64, device_put=jnp.asarray) -> QArray:
    """Wrap pre-quantized host arrays (e.g. read from an FLM file) as a QArray."""
    return QArray(device_put(data), device_put(scales.astype(np.float32)),
                  qtype, group_size)
