"""Fused dequant+matmul Pallas kernel — the TPU replacement for the
reference's hand-fused AVX-512 int8 dot-product matmul
(``quant_operators.cpp:252-348``, ``x86_simd.cpp:1647-1674``).

Decode-time matmuls are HBM-bandwidth bound: the win is streaming int8/int16
weights out of HBM at 1-2 bytes/param and dequantizing **in VMEM** right
before the MXU — never materializing a dequantized copy in HBM (which is
what the jnp fallback costs whenever XLA fails to fuse).

Layout (see models/llama.py): weights are (I, O) with scales (I/gs, O) —
lanes carry output features, so the per-group scale expansion is a sublane
broadcast+reshape (Mosaic supports collapsing leading dims; it rejects the
minor-dim collapse the (O, I) layout would need).  Grid is
(T_tiles, O_tiles, K_tiles) with K minor-most: each (TT, TO) output tile
stays in VMEM accumulating fp32 partial dots while weight K-tiles stream.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastllama_tpu.config import QuantType
from fastllama_tpu.quant.groupquant import QArray

# prefer the largest K tile that divides I (fewer output-tile revisits; a
# full-K 4096 tile measured +4% decode and +19% prefill over 2048 on v5e)
_TK_CANDIDATES = (4096, 2048, 1024, 512)
_W_TILE_BYTES = 2 * 1024 * 1024
# TO=1024 + k_inner=512 measured ~full HBM bandwidth on the decode-shaped
# 4096x4096 stream (tools/qmm_sweep.py two-point sweep, v5e) vs 74% for the
# round-2 TO=512 whole-tile dequant; env knobs keep the sweep cheap
_MAX_TO = int(os.environ.get("FASTLLAMA_QMM_MAXTO", "512"))
_MAX_TT = 256
# default K sub-chunk for in-kernel dequant (0 = whole tile); applied to
# unpacked int8/int16 tiles when the K tile is at least 2x the chunk
_K_INNER = int(os.environ.get("FASTLLAMA_QMM_KI", "0"))


def _auto_k_inner(k_inner: int, TK: int, gs: int) -> int:
    """Resolve the k_inner default: explicit arg wins, else the env/module
    default.  When the requested chunk doesn't evenly split the K tile
    (e.g. the 11008 FFN contraction), fall back to the largest divisor of
    TK that is a multiple of gs and <= the request, so the knob still
    applies to irregular shapes."""
    ki = k_inner if k_inner else _K_INNER
    if not ki or ki >= TK:
        return 0
    if TK % ki == 0 and ki % gs == 0:
        return ki
    best = 0
    for d in range(gs, min(ki, TK) + 1, gs):
        if TK % d == 0:
            best = d
    return best


def _qmm_chunk(x, w, s, gs: int, wide: bool):
    """One dequant+dot over a (rows, TO) weight chunk; x (TT, rows)."""
    TKg, TO = s.shape
    # group scales expand along sublanes: row g covers data rows [g*gs,(g+1)*gs)
    scale = jnp.broadcast_to(s[:, None, :], (TKg, gs, TO)).reshape(TKg * gs, TO)
    if wide:
        # int16 values (to 5792) overflow bf16's 8-bit mantissa: f32 dequant
        # + full-precision MXU passes
        wf = w.astype(jnp.float32) * scale
        return jax.lax.dot_general(
            x.astype(jnp.float32), wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    # int8 values (<=127) are exact in bf16; rounding the SCALE to bf16
    # costs <=2^-9 relative on the dequantized weight (inside bf16's own
    # storage error) and skips the f32 intermediate — one VPU op and a
    # third of the VMEM intermediate traffic less per element (the
    # 4096x4096 projections measured 74% of HBM bandwidth with the f32
    # dequant; w1/w2/w3 86-90%)
    wf = w.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), wf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _qmm_chunk_groupdot(x, w, s, gs: int):
    """Scale-after-dot variant: convert the int8 tile to bf16 (one VPU op
    per element — no broadcast/multiply), contract each gs-row group
    separately on the MXU, then apply the (TKg, TO) group scales to the
    per-group partial dots.  Cuts the per-weight-element VPU work from
    3 ops (convert + scale broadcast + multiply) to 1, at the cost of a
    batched G-deep dot (K=gs per group) and a (TKg, TT, TO) f32
    intermediate — a roofline experiment for the decode-dominant
    4096x4096 wo stream measured at 74% HBM efficiency."""
    TKg, TO = s.shape
    TT = x.shape[0]
    wg = w.astype(jnp.bfloat16).reshape(TKg, gs, TO)
    xg = jnp.transpose(x.astype(jnp.bfloat16).reshape(TT, TKg, gs),
                       (1, 0, 2))                  # (TKg, TT, gs)
    part = jax.lax.dot_general(
        xg, wg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (TKg, TT, TO)
    return jnp.sum(part * s[:, None, :], axis=0)   # (TT, TO)


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, *, gs: int, wide: bool,
                k_inner: int = 0, groupdot: bool = False):
    if groupdot and not wide:
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += _qmm_chunk_groupdot(x_ref[:], w_ref[:], s_ref[:], gs)
        return
    _qmm_kernel_std(x_ref, w_ref, s_ref, o_ref, gs=gs, wide=wide,
                    k_inner=k_inner)


def _qmm_kernel_std(x_ref, w_ref, s_ref, o_ref, *, gs: int, wide: bool,
                    k_inner: int = 0):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    TK = w_ref.shape[0]
    if k_inner and k_inner < TK and TK % k_inner == 0:
        # chunked dequant: bounds the (rows, TO) bf16 intermediates so the
        # scoped-VMEM stack stays small and the NEXT weight tile's DMA can
        # double-buffer
        acc = o_ref[:]
        for j in range(TK // k_inner):
            acc += _qmm_chunk(
                x_ref[:, j * k_inner:(j + 1) * k_inner],
                w_ref[j * k_inner:(j + 1) * k_inner, :],
                s_ref[j * k_inner // gs:(j + 1) * k_inner // gs, :],
                gs, wide)
        o_ref[:] = acc
    else:
        o_ref[:] += _qmm_chunk(x_ref[:], w_ref[:], s_ref[:], gs, wide)


def _pick_to(O: int, cap: int) -> int:
    """Largest multiple of 128 <= cap that divides O (0 if none)."""
    to = min(cap, O) // 128 * 128
    while to >= 128 and O % to != 0:
        to -= 128
    return to


def _pick_tiles(T: int, O: int, I: int, gs: int, itemsize: int):
    """(TT, TO, TK) — TO must divide O; TK must divide I with TK%gs==0 and
    (TK/gs)%8==0 (Mosaic sublane constraint on the scale block), else try
    half/quarter-K splits, else fall back to full-K tiles with a narrower
    TO."""
    TT = min(_MAX_TT, T)
    # narrow-O decode-shaped streams (tiny T): 1024x1024 tiles measured
    # fastest in the honest fetch-synced sweep on v5e (wo 4096x4096: 700 vs
    # 661 GB/s for tk4096_to512; w2 11264x4096: 730 vs 623) — with few
    # output tiles the full-K grid has too few steps to double-buffer, and
    # the 1 MB tiles pipeline deeper.  Wide-O shapes already stream at the
    # ceiling with full-K (fused QKV 4096x12288: 748 GB/s; fused gate-up
    # 4096x22016: 775) and keep the default.
    dtile = int(os.environ.get("FASTLLAMA_QMM_DECODE_TILE", "1024"))
    if (dtile and T <= 8 and O <= 4096 and O % dtile == 0 and I % dtile == 0
            and dtile % gs == 0 and (dtile // gs) % 8 == 0):
        return TT, dtile, dtile
    for tk in _TK_CANDIDATES:
        if I % tk == 0 and tk % gs == 0 and (tk // gs) % 8 == 0:
            return TT, _pick_to(O, _MAX_TO), tk
    # irregular contractions (e.g. the padded 11264 FFN hidden): an I/2 or
    # I/4 split keeps TO wide (the full-K fallback squeezed TO to 128,
    # measured 77% of HBM bandwidth vs 86-90% for the wide-TO kernels)
    for tk in (I // 2, I // 4):
        if tk and I % tk == 0 and tk % gs == 0 and (tk // gs) % 8 == 0:
            to_cap = max(128, _W_TILE_BYTES // (tk * itemsize) // 128 * 128)
            to = _pick_to(O, min(_MAX_TO, to_cap))
            if to:
                return TT, to, tk
    # full-K fallback: bound the weight tile bytes.  For decode-shaped
    # streams (tiny T) a TO=256 tile fits the 16 MB scoped-VMEM stack at
    # the 11008 contraction and measured 723.8 GB/s vs 664.1 for the
    # byte-capped TO=128 (96.5% vs 88.5% of the honest 750 ceiling;
    # min-of-5 384-iter two-point, numerics pinned vs jnp — NEXT.md
    # round-4 findings).  TO=512 OOMs scoped VMEM (22.96M > 16M) and
    # TO=512+k_inner compiles but loses (632); wider T keeps the
    # conservative cap — the prefill w2 stream is MXU-amortized anyway.
    to_cap = max(128, _W_TILE_BYTES // (I * itemsize) // 128 * 128)
    if T <= 8:
        to_cap = max(to_cap, 256)
    return TT, _pick_to(O, min(to_cap, _MAX_TO)), I


# dequantizing a packed tile materializes ~8 bytes/element of VMEM
# intermediates per nibble plane (int32 nibbles + bf16 dequant/product);
# cap the plane so the scoped-VMEM stack stays under the 16 MB core limit
_PACKED_TILE_ELEMS = 512 * 1024


def _pick_tiles_packed(T: int, O: int, Ih: int, gs: int):
    """(TT, TO, TKp) for split-half packed INT4: TKp counts PACKED rows
    (= logical rows per nibble plane) and must divide Ih = I/2."""
    TT = min(_MAX_TT, T)
    for tk in _TK_CANDIDATES:
        if Ih % tk == 0 and tk % gs == 0 and (tk // gs) % 8 == 0:
            to = _pick_to(O, _MAX_TO)
            while to > 128 and tk * to > _PACKED_TILE_ELEMS:
                to = _pick_to(O, to - 128)
            if to and tk * to <= _PACKED_TILE_ELEMS:
                return TT, to, tk
    return TT, 0, 0


def pack_supported(I: int, O: int, gs: int) -> bool:
    """True if an (I, O) weight with group_size ``gs`` can be split-half
    nibble-packed and still tile onto the fused kernel (used at load time to
    decide whether to pack a given projection)."""
    if I % 2 or (I // 2) % gs or O % 128:
        return False
    _, TO, TKp = _pick_tiles_packed(1, O, I // 2, gs)
    return TO > 0 and TKp > 0


def supported(x: jax.Array, w) -> bool:
    if not isinstance(w, QArray) or w.group_axis != -2:
        return False
    if x.ndim != 2 or w.data.ndim != 2:
        return False
    T, I = x.shape
    O = w.data.shape[1]
    gs = w.group_size
    if I % gs != 0 or O % 128 != 0:
        return False
    if getattr(w, "packed", False):
        if w.data.shape[0] * 2 != I:
            return False
        TT, TO, TKp = _pick_tiles_packed(T, O, I // 2, gs)
        return TO > 0 and TKp > 0 and T % TT == 0
    if w.data.shape[0] != I:
        return False
    TT, TO, TK = _pick_tiles(T, O, I, gs, w.data.dtype.itemsize)
    return TO > 0 and T % TT == 0 and I % TK == 0


def qmatmul_pallas(x: jax.Array, w: QArray, compute_dtype=jnp.bfloat16,
                   interpret: bool = False, tiles=None,
                   k_inner: int = 0, groupdot: bool = False) -> jax.Array:
    """``x @ w`` with in-VMEM dequantization.  ``x``: (T, I) f32/bf16;
    ``w``: QArray (I, O) (split-half packed INT4: (I/2, O)), scales
    (I/gs, O).  Returns (T, O) in x.dtype.

    ``tiles``: optional (TT, TO, TK) override (perf experiments —
    tools/qmm_sweep.py); ``k_inner``: dequantize/accumulate the K tile in
    sub-chunks of this many rows inside the kernel (0 = whole tile), which
    shrinks the dequant intermediates and frees VMEM for deeper DMA
    double-buffering."""
    T, I = x.shape
    O = w.data.shape[-1]
    gs = w.group_size
    if getattr(w, "packed", False):
        Ih = I // 2
        TT, TO, TKp = tiles or _pick_tiles_packed(T, O, Ih, gs)
        KHB = Ih // TKp
        kernel = functools.partial(_qmm_kernel_p4, gs=gs, groupdot=groupdot)
        out = pl.pallas_call(
            kernel,
            grid=(T // TT, O // TO, KHB),
            in_specs=[
                pl.BlockSpec((TT, TKp), lambda t, o, k: (t, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TT, TKp), lambda t, o, k: (t, k + KHB),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TKp, TO), lambda t, o, k: (k, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TKp // gs, TO), lambda t, o, k: (k, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TKp // gs, TO), lambda t, o, k: (k + KHB, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TT, TO), lambda t, o, k: (t, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, O), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * O * I,
                bytes_accessed=O * I // 2 + O * I // gs * 4
                + 2 * T * I * x.dtype.itemsize + T * O * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, x, w.data, w.scales, w.scales)
        return out.astype(x.dtype)

    TT, TO, TK = tiles or _pick_tiles(T, O, I, gs, w.data.dtype.itemsize)
    if tiles and (T % TT or O % TO or I % TK):
        # a non-dividing explicit tiling silently TRUNCATES the grid
        # (computes a subset of the contraction and reads fewer bytes) —
        # this produced impossible >100%-of-peak rows in qmm_sweep before
        # the guard
        raise ValueError(f"tiles {tiles} do not divide ({T}, {O}, {I})")
    # INT16 values overflow bf16's mantissa; an explicit fp32 compute_dtype
    # also gets the full-precision path (parity with the jnp fallback)
    wide = (w.qtype == QuantType.INT16
            or jnp.dtype(compute_dtype) == jnp.float32)

    kernel = functools.partial(_qmm_kernel, gs=gs, wide=wide,
                               k_inner=_auto_k_inner(k_inner, TK, gs),
                               groupdot=groupdot)
    out = pl.pallas_call(
        kernel,
        grid=(T // TT, O // TO, I // TK),
        in_specs=[
            pl.BlockSpec((TT, TK), lambda t, o, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TO), lambda t, o, k: (k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // gs, TO), lambda t, o, k: (k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, TO), lambda t, o, k: (t, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * O * I,
            bytes_accessed=O * I * w.data.dtype.itemsize + O * I // gs * 4
            + T * I * x.dtype.itemsize + T * O * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, w.data, w.scales)
    return out.astype(x.dtype)


# nibble-unpack strategy for packed INT4 (VPU-bound; the decode wall):
#   int32 - convert to int32 lanes, 2 shifts per plane (the round-2 default;
#           int8-lane shifts do NOT legalize in Mosaic - tpu_smoke caught it)
#   int16 - shifts in int16 lanes: packed 2x lane density, half the shift
#           cycles IF Mosaic legalizes 16-bit shifts on the target
#   f32   - no shifts: hi = floor(p/16) (exact for |p|<2^24), lo from the
#           remainder; skips the intN->f32 converts and shares hi between
#           planes
_INT4_UNPACK = os.environ.get("FASTLLAMA_INT4_UNPACK", "int32")


def _unpack_planes(p8):
    """(w_lo, w_hi) sign-extended nibble planes ([-8,7]) from the packed
    int8 tile, as f32 (ready for the scale multiply)."""
    mode = _INT4_UNPACK
    if mode == "int16":
        p = p8.astype(jnp.int16)
        lo = ((p << 12) >> 12).astype(jnp.float32)
        hi = (p >> 4).astype(jnp.float32)
        return lo, hi
    if mode == "f32":
        pf = p8.astype(jnp.float32)               # [-128, 127], integral
        hi = jnp.floor(pf * 0.0625)               # == p >> 4 (floor div 16)
        lo_u = pf - hi * 16.0                     # [0, 15]
        lo = lo_u - jnp.where(lo_u >= 8.0, 16.0, 0.0)
        return lo, hi
    p = p8.astype(jnp.int32)
    return (((p << 28) >> 28).astype(jnp.float32),
            ((p << 24) >> 28).astype(jnp.float32))


def _qmm_kernel_p4(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref, *,
                   gs: int, groupdot: bool = False):
    """Split-half packed INT4: the packed tile's low nibbles are logical K
    rows [k*TKp, (k+1)*TKp), the high nibbles the same range offset by I/2.
    Two clean half-K MXU passes, no sublane shuffling; x and scales arrive
    twice with offset index maps."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    planes = _unpack_planes(w_ref[:])             # (TKp, TO) f32 x2
    acc = jnp.zeros_like(o_ref)
    for w, x_ref, s_ref in ((planes[0], x_lo_ref, s_lo_ref),
                            (planes[1], x_hi_ref, s_hi_ref)):
        s = s_ref[:]                              # (TKp//gs, TO)
        if groupdot:
            # scale-after-dot (see _qmm_chunk_groupdot): skip the scale
            # broadcast+multiply; int32->f32->bf16 converts only (the
            # direct int32->bf16 convert measured slower on the VPU)
            acc += _groupdot_p4(x_ref[:], w, s, gs)
            continue
        TKg, TO = s.shape
        scale = jnp.broadcast_to(s[:, None, :],
                                 (TKg, gs, TO)).reshape(TKg * gs, TO)
        # f32 dequant: the bf16-scale variant measured SLOWER here (96.7 vs
        # 105.9 tok/s int4 7B single-stream) — int32->bf16 conversion is the
        # expensive step, and int32->f32 is the cheap one on the VPU
        wf = (w * scale).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _groupdot_p4(x, w_f32, s, gs: int):
    """Scale-after-dot for one unpacked nibble plane: w_f32 (TKp, TO)."""
    TKg, TO = s.shape
    TT = x.shape[0]
    wg = w_f32.astype(jnp.bfloat16).reshape(TKg, gs, TO)
    xg = jnp.transpose(x.astype(jnp.bfloat16).reshape(TT, TKg, gs),
                       (1, 0, 2))                  # (TKg, TT, gs)
    part = jax.lax.dot_general(
        xg, wg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (TKg, TT, TO)
    return jnp.sum(part * s[:, None, :], axis=0)   # (TT, TO)


def _qmm_kernel_p4_idx(l_ref, x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref,
                       o_ref, *, gs: int):
    """Layer-indexed split-half packed INT4 (leading singleton layer axis)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    planes = _unpack_planes(w_ref[0])
    acc = jnp.zeros_like(o_ref)
    for w, x_ref, s_ref in ((planes[0], x_lo_ref, s_lo_ref),
                            (planes[1], x_hi_ref, s_hi_ref)):
        s = s_ref[0]
        TKg, TO = s.shape
        scale = jnp.broadcast_to(s[:, None, :],
                                 (TKg, gs, TO)).reshape(TKg * gs, TO)
        wf = (w * scale).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _qmm_kernel_idx(l_ref, x_ref, w_ref, s_ref, o_ref, *, gs: int, wide: bool,
                    k_inner: int = 0):
    """Layer-indexed variant: blocks carry a leading singleton layer axis."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[0]
    s = s_ref[0]
    TK = w.shape[0]
    if k_inner and k_inner < TK and TK % k_inner == 0:
        # chunked dequant (see _qmm_kernel_std): smaller VMEM intermediates
        # leave room for deeper DMA double-buffering of the weight stream
        acc = o_ref[:]
        for j in range(TK // k_inner):
            acc += _qmm_chunk(
                x_ref[:, j * k_inner:(j + 1) * k_inner],
                w[j * k_inner:(j + 1) * k_inner, :],
                s[j * k_inner // gs:(j + 1) * k_inner // gs, :],
                gs, wide)
        o_ref[:] = acc
        return
    o_ref[:] += _qmm_chunk(x_ref[:], w, s, gs, wide)


def _qmm_kernel_idx_fused(l_ref, *refs, gs: int, wide: bool,
                          k_inner: int = 0, has_norm: bool, has_res: bool,
                          eps: float = 1e-5):
    """Layer-indexed kernel with the decode-scan glue folded in:

    * ``has_norm``: the rmsnorm that feeds this projection runs as a kernel
      PROLOGUE on the (TT, I) activation block (requires TK == I so the
      whole row is visible) — removes one standalone VPU op + its
      activation round trip per projection per layer;
    * ``has_res``: the residual-add that consumes this projection runs as
      the kernel EPILOGUE (the accumulator initializes from the residual
      block instead of zeros) — removes the separate add.

    Together these fold the scan's per-layer elementwise glue (the ~0.4 ms
    /step VPU epilogue named in NEXT.md round-4 #3) into the matmuls whose
    weight streams already hide it."""
    i = 0
    x_ref = refs[i]; i += 1                                    # noqa: E702
    g_ref = None
    if has_norm:
        g_ref = refs[i]; i += 1                                # noqa: E702
    r_ref = None
    if has_res:
        r_ref = refs[i]; i += 1                                # noqa: E702
    w_ref, s_ref, o_ref = refs[i], refs[i + 1], refs[i + 2]

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        if r_ref is not None:
            o_ref[:] = r_ref[:].astype(jnp.float32)
        else:
            o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:]
    if g_ref is not None:
        # same f32 math as ops/norms.rmsnorm, then back to the activation
        # dtype the unfused path would have fed the matmul
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(m + eps) * g_ref[:].astype(jnp.float32)
             ).astype(x.dtype)

    w = w_ref[0]
    s = s_ref[0]
    TK = w.shape[0]
    if k_inner and k_inner < TK and TK % k_inner == 0:
        acc = o_ref[:]
        for j in range(TK // k_inner):
            acc += _qmm_chunk(
                x[:, j * k_inner:(j + 1) * k_inner],
                w[j * k_inner:(j + 1) * k_inner, :],
                s[j * k_inner // gs:(j + 1) * k_inner // gs, :],
                gs, wide)
        o_ref[:] = acc
        return
    o_ref[:] += _qmm_chunk(x, w, s, gs, wide)


def supported_indexed(x: jax.Array, w) -> bool:
    if not isinstance(w, QArray) or w.group_axis != -2:
        return False
    if x.ndim != 2 or w.data.ndim != 3:
        return False
    T, I = x.shape
    O = w.data.shape[2]
    gs = w.group_size
    if I % gs != 0 or O % 128 != 0:
        return False
    if getattr(w, "packed", False):
        if w.data.shape[1] * 2 != I:
            return False
        TT, TO, TKp = _pick_tiles_packed(T, O, I // 2, gs)
        return TO > 0 and TKp > 0 and T % TT == 0
    if w.data.shape[1] != I:
        return False
    TT, TO, TK = _pick_tiles(T, O, I, gs, w.data.dtype.itemsize)
    return TO > 0 and T % TT == 0 and I % TK == 0


def qmatmul_pallas_indexed(x: jax.Array, w: QArray, layer,
                           compute_dtype=jnp.bfloat16,
                           interpret: bool = False,
                           norm_gain=None, eps: float = 1e-5,
                           residual=None) -> jax.Array:
    """``x @ w[layer]`` where ``w`` is the LAYER-STACKED QArray (L, I, O) and
    ``layer`` a traced scalar.  The kernel's index_map selects the layer via
    scalar prefetch, so the stacked weight buffer is read directly from HBM —
    no XLA dynamic-slice copy (which profiling showed costs ~50% of decode
    when scanning over stacked weights).

    ``norm_gain``/``residual`` fold the adjacent scan glue into the kernel
    (see _qmm_kernel_idx_fused): ``norm_gain`` (I,) runs rmsnorm(x) as a
    prologue (needs a full-K tiling; silently applied outside otherwise),
    ``residual`` (T, O) initializes the accumulator (out = residual + x@w)."""
    T, I = x.shape
    L, _, O = w.data.shape
    gs = w.group_size
    l_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if getattr(w, "packed", False):
        # packed INT4 is VPU-bound already — apply the glue outside
        if norm_gain is not None:
            from fastllama_tpu.ops.norms import rmsnorm
            x = rmsnorm(x, norm_gain, eps)
            norm_gain = None
        Ih = I // 2
        TT, TO, TKp = _pick_tiles_packed(T, O, Ih, gs)
        KHB = Ih // TKp
        kernel = functools.partial(_qmm_kernel_p4_idx, gs=gs)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // TT, O // TO, KHB),
            in_specs=[
                pl.BlockSpec((TT, TKp), lambda t, o, k, l: (t, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TT, TKp), lambda t, o, k, l: (t, k + KHB),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TKp, TO), lambda t, o, k, l: (l[0], k, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TKp // gs, TO),
                             lambda t, o, k, l: (l[0], k, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TKp // gs, TO),
                             lambda t, o, k, l: (l[0], k + KHB, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TT, TO), lambda t, o, k, l: (t, o),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, O), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * O * I,
                bytes_accessed=O * I // 2 + O * I // gs * 4
                + 2 * T * I * x.dtype.itemsize + T * O * 4,
                transcendentals=0),
            interpret=interpret,
        )(l_arr, x, x, w.data, w.scales, w.scales)
        return out.astype(x.dtype)

    TT, TO, TK = _pick_tiles(T, O, I, gs, w.data.dtype.itemsize)
    wide = (w.qtype == QuantType.INT16
            or jnp.dtype(compute_dtype) == jnp.float32)

    if norm_gain is not None and TK != I:
        # the prologue norm needs the whole activation row in the block;
        # sliced-K tilings apply it outside (still one fewer residual op)
        from fastllama_tpu.ops.norms import rmsnorm
        x = rmsnorm(x, norm_gain, eps)
        norm_gain = None

    if norm_gain is not None or residual is not None:
        has_norm = norm_gain is not None
        has_res = residual is not None
        kernel = functools.partial(
            _qmm_kernel_idx_fused, gs=gs, wide=wide,
            k_inner=_auto_k_inner(0, TK, gs), has_norm=has_norm,
            has_res=has_res, eps=eps)
        in_specs = [pl.BlockSpec((TT, TK), lambda t, o, k, l: (t, k),
                                 memory_space=pltpu.VMEM)]
        args = [x]
        if has_norm:
            in_specs.append(pl.BlockSpec((1, TK), lambda t, o, k, l: (0, k),
                                         memory_space=pltpu.VMEM))
            args.append(norm_gain.reshape(1, I))
        if has_res:
            in_specs.append(pl.BlockSpec((TT, TO), lambda t, o, k, l: (t, o),
                                         memory_space=pltpu.VMEM))
            args.append(residual)
        in_specs += [
            pl.BlockSpec((1, TK, TO), lambda t, o, k, l: (l[0], k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK // gs, TO), lambda t, o, k, l: (l[0], k, o),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // TT, O // TO, I // TK),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TT, TO), lambda t, o, k, l: (t, o),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, O), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * O * I,
                bytes_accessed=O * I * w.data.dtype.itemsize
                + O * I // gs * 4 + T * I * x.dtype.itemsize + T * O * 4,
                transcendentals=0),
            interpret=interpret,
        )(l_arr, *args, w.data, w.scales)
        return out.astype(x.dtype)

    kernel = functools.partial(_qmm_kernel_idx, gs=gs, wide=wide,
                               k_inner=_auto_k_inner(0, TK, gs))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // TT, O // TO, I // TK),
        in_specs=[
            pl.BlockSpec((TT, TK), lambda t, o, k, l: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, TO), lambda t, o, k, l: (l[0], k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK // gs, TO), lambda t, o, k, l: (l[0], k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, TO), lambda t, o, k, l: (t, o),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * O * I,
            bytes_accessed=O * I * w.data.dtype.itemsize + O * I // gs * 4
            + T * I * x.dtype.itemsize + T * O * 4,
            transcendentals=0),
        interpret=interpret,
    )(l_arr, x, w.data, w.scales)
    return out.astype(x.dtype)


def make_mm_indexed(compute_dtype=jnp.bfloat16, interpret: bool = False):
    """mm_idx(x, w_stacked, layer) for models.llama.forward scan mode.

    The returned callable accepts the fusion kwargs ``norm_gain``/``eps``/
    ``residual`` (see qmatmul_pallas_indexed) and advertises it via
    ``mm_idx.supports_fusion`` — callers that fold the scan glue into the
    kernel check the flag and fall back to separate ops otherwise."""
    from fastllama_tpu.ops.qmatmul import qmatmul

    def mm_idx(x, w, layer, norm_gain=None, eps: float = 1e-5,
               residual=None):
        if isinstance(w, QArray) and x.ndim == 2 and supported_indexed(x, w):
            return qmatmul_pallas_indexed(x, w, layer, compute_dtype,
                                          interpret, norm_gain=norm_gain,
                                          eps=eps, residual=residual)
        if norm_gain is not None:
            from fastllama_tpu.ops.norms import rmsnorm
            x = rmsnorm(x, norm_gain, eps)
        out = qmatmul(x, w[layer] if isinstance(w, QArray) else
                      jnp.take(w, layer, axis=0), compute_dtype)
        return out if residual is None else residual + out

    mm_idx.supports_fusion = True
    return mm_idx


def make_mm(compute_dtype=jnp.bfloat16, interpret: bool = False):
    """An mm(x, w) drop-in for models.llama.forward: Pallas where supported,
    jnp fallback otherwise (odd shapes, plain arrays)."""
    from fastllama_tpu.ops.qmatmul import qmatmul

    def mm(x, w):
        if isinstance(w, QArray) and x.ndim == 2 and supported(x, w):
            return qmatmul_pallas(x, w, compute_dtype, interpret)
        return qmatmul(x, w, compute_dtype)

    return mm
