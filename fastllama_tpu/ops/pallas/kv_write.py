"""In-place KV-cache row writers — one kernel launch for all slots.

The engines defer fresh K/V rows out of the layer scan (models/batched.py
docstring: carrying the cache through the scan either copies it wholesale or
OOMs) and then land them with per-slot ``dynamic_update_slice``s.  That
post-scan python loop is O(B) tiny HLO ops — 4·B ops/step at serving batch
(measured ~6 µs each on v5e; the in-scan variant of the same pattern was
18 ms/step at B=24) — and inside the ``shard_map`` spmd path it was round
1's flagged scaling hazard.  These kernels replace the loop with ONE
``pallas_call`` whose grid covers (slot, layer-block): each program
read-modify-writes the sublane-aligned slab containing slot ``b``'s row at
``pos[b]`` (scalar prefetch drives the ``index_map``; Mosaic requires the
trailing block dims to be tiling-aligned, so single rows are carried inside
an 8/16/32-row slab), and ``input_output_aliases`` keeps the untouched rest
of the cache in place — a true in-place scatter at per-slot positions,
which plain XLA cannot express without copying (a vector-index scatter on a
carried cache was measured to copy the whole buffer).

The reference's analogue is the per-thread O(1) KV append
(``transformer.cpp:431-432``); this is the batched-slot TPU equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane(dtype) -> int:
    """Native sublane tile for a dtype (f32 8, bf16 16, int8 32)."""
    return 8 * (4 // jnp.dtype(dtype).itemsize)


def _lane_block(S: int) -> int:
    """Scale-array lane block: 128 when it tiles S, else the full S."""
    return 128 if S % 128 == 0 else S


# per-block VMEM budget for the big cache operand (in + out + fresh +
# double buffering multiply this ~6x; 36.5 MB of scoped vmem OOM'd at 7B
# when one block spanned all 32 layers)
_BLOCK_BUDGET = 1 << 20


def _layer_block(L: int, per_layer_bytes: int) -> int:
    """Largest layer-block whose cache slab fits the budget.  Mosaic's
    tiling rules only see the trailing two dims, but the fresh-scale block
    (1, LB, n_kv) puts LB second-to-last, so LB must be a multiple of 8 or
    the whole L."""
    if L * per_layer_bytes <= _BLOCK_BUDGET:
        return L
    for lb in range(L - L % 8, 0, -8):
        if L % lb == 0 and lb * per_layer_bytes <= _BLOCK_BUDGET:
            return lb
    return 0                                      # caller falls back


def supported(cache) -> bool:
    """The writers need tiling-aligned slabs: S divisible by the dtype
    sublane, and a layer block that fits the VMEM budget."""
    L, B, n_kv, S, hs = cache.k.shape
    sub = _sublane(cache.k.dtype)
    return (S % sub == 0 and
            _layer_block(L, n_kv * sub * hs * cache.k.dtype.itemsize) > 0)


def _blend_row(slab, row, r, axis: int):
    """slab with ``row`` (broadcastable, extent 1 on ``axis``) planted at
    index ``r`` of ``axis`` — a full-slab select instead of a dynamic-offset
    store (Mosaic cannot prove unaligned sublane/lane store offsets)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, slab.shape, axis)
    return jnp.where(idx == r, jnp.broadcast_to(row, slab.shape), slab)


def _row5(ref, expand5: bool):
    """Fresh row as (LB, 1, n_kv, 1, hs).  When hs is lane-aligned the
    in-kernel reshape legalizes and the caller passes dense 4-D rows; at
    hs < 128 Mosaic rejects the unit-sublane-insert reshape (caught by
    tools/tpu_smoke.py — interpret mode accepted it), so the caller
    pre-expands the operand to 5-D (tile-padded, fine at small-model
    sizes) and the kernel reads it as-is."""
    if expand5:
        return ref[...]
    LB, _, n_kv, hs = ref.shape
    return ref[...].reshape(LB, 1, n_kv, 1, hs)


def _decode_kernel(pos_ref, k_ref, v_ref, cki_ref, cvi_ref,
                   cko_ref, cvo_ref, *, sub: int, expand5: bool):
    b = pl.program_id(0)
    r = pos_ref[b] % sub
    cko_ref[...] = _blend_row(cki_ref[...], _row5(k_ref, expand5), r, 3)
    cvo_ref[...] = _blend_row(cvi_ref[...], _row5(v_ref, expand5), r, 3)


def _decode_kernel_q(pos_ref, k_ref, v_ref, ks_ref, vs_ref,
                     cki_ref, cvi_ref, ksi_ref, vsi_ref,
                     cko_ref, cvo_ref, kso_ref, vso_ref, *,
                     sub: int, lane: int, expand5: bool):
    b = pl.program_id(0)
    r = pos_ref[b] % sub
    cko_ref[...] = _blend_row(cki_ref[...], _row5(k_ref, expand5), r, 3)
    cvo_ref[...] = _blend_row(cvi_ref[...], _row5(v_ref, expand5), r, 3)
    # scales: fresh arrive transposed (B, L, n_kv) so slot b's layer block
    # (1, LB, n_kv) meets the tiling rules; trailing-lane unit insert
    # (x[..., None]-style) legalizes fine
    c = pos_ref[b] % lane
    LB = kso_ref.shape[0]
    n_kv = kso_ref.shape[2]
    kso_ref[...] = _blend_row(ksi_ref[...],
                              ks_ref[...].reshape(LB, 1, n_kv, 1), c, 3)
    vso_ref[...] = _blend_row(vsi_ref[...],
                              vs_ref[...].reshape(LB, 1, n_kv, 1), c, 3)


def decode_write(cache, kq: jax.Array, vq: jax.Array, ks, vs,
                 pos: jax.Array, interpret: bool = False):
    """Write every slot's fresh decode row in ONE launch.

    cache: BatchedKVCache (possibly int8-quantized); kq/vq (L, B, n_kv, hs)
    already in the cache dtype; ks/vs (L, B, n_kv) fp32 row scales (None for
    unquantized caches); pos (B,) int32 per-slot positions.  Returns a new
    BatchedKVCache whose buffers alias the inputs (in-place under donation).
    """
    from fastllama_tpu.models.batched import BatchedKVCache
    L, B, n_kv, hs = kq.shape
    S = cache.k.shape[3]
    sub = _sublane(cache.k.dtype)
    LB = _layer_block(L, n_kv * sub * hs * cache.k.dtype.itemsize)
    if LB == 0 or S % sub:
        raise ValueError(f"decode_write unsupported shape: L={L} S={S}")
    quant = ks is not None

    # hs lane-aligned: dense 4-D fresh rows + in-kernel reshape (no padded
    # operands).  hs < 128: pre-expand to 5-D outside (see _row5).
    expand5 = hs % 128 != 0
    if expand5:
        fresh_spec = pl.BlockSpec((LB, 1, n_kv, 1, hs),
                                  lambda b, l, s: (l, b, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        kq_in, vq_in = kq[:, :, :, None, :], vq[:, :, :, None, :]
    else:
        fresh_spec = pl.BlockSpec((LB, 1, n_kv, hs),
                                  lambda b, l, s: (l, b, 0, 0),
                                  memory_space=pltpu.VMEM)
        kq_in, vq_in = kq, vq
    cache_spec = pl.BlockSpec((LB, 1, n_kv, sub, hs),
                              lambda b, l, s: (l, b, 0, s[b] // sub, 0),
                              memory_space=pltpu.VMEM)
    if not quant:
        in_specs = [fresh_spec, fresh_spec, cache_spec, cache_spec]
        operands = [kq_in, vq_in, cache.k, cache.v]
        out_specs = [cache_spec, cache_spec]
        out_shapes = [jax.ShapeDtypeStruct(cache.k.shape, cache.k.dtype),
                      jax.ShapeDtypeStruct(cache.v.shape, cache.v.dtype)]
        # alias indices count pallas_call inputs INCLUDING scalar prefetch
        aliases = {3: 0, 4: 1}
        kernel = functools.partial(_decode_kernel, sub=sub, expand5=expand5)
    else:
        lane = _lane_block(S)
        # fresh scales transposed to (B, L, n_kv): slot b's layer block is
        # (1, LB, n_kv) — trailing dims meet Mosaic's tiling rule with no
        # padded-singleton operand
        fs_spec = pl.BlockSpec((1, LB, n_kv), lambda b, l, s: (b, l, 0),
                               memory_space=pltpu.VMEM)
        cs_spec = pl.BlockSpec((LB, 1, n_kv, lane),
                               lambda b, l, s: (l, b, 0, s[b] // lane),
                               memory_space=pltpu.VMEM)
        in_specs = [fresh_spec, fresh_spec, fs_spec, fs_spec,
                    cache_spec, cache_spec, cs_spec, cs_spec]
        operands = [kq_in, vq_in, ks.transpose(1, 0, 2),
                    vs.transpose(1, 0, 2),
                    cache.k, cache.v, cache.k_scale, cache.v_scale]
        out_specs = [cache_spec, cache_spec, cs_spec, cs_spec]
        out_shapes = [
            jax.ShapeDtypeStruct(cache.k.shape, cache.k.dtype),
            jax.ShapeDtypeStruct(cache.v.shape, cache.v.dtype),
            jax.ShapeDtypeStruct(cache.k_scale.shape, cache.k_scale.dtype),
            jax.ShapeDtypeStruct(cache.v_scale.shape, cache.v_scale.dtype)]
        aliases = {5: 0, 6: 1, 7: 2, 8: 3}
        kernel = functools.partial(_decode_kernel_q, sub=sub, lane=lane,
                                   expand5=expand5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, L // LB),
        in_specs=in_specs, out_specs=out_specs)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        input_output_aliases=aliases, interpret=interpret,
    )(pos.astype(jnp.int32), *operands)
    if quant:
        return BatchedKVCache(outs[0], outs[1], outs[2], outs[3])
    return BatchedKVCache(outs[0], outs[1])


def _prefill_kernel(slots_ref, k_ref, v_ref, cki_ref, cvi_ref,
                    cko_ref, cvo_ref, *, T: int):
    if T:                                   # partial final slab: keep tail
        cko_ref[...] = cki_ref[...]
        cvo_ref[...] = cvi_ref[...]
        cko_ref[:, :, :, :T, :] = k_ref[...]
        cvo_ref[:, :, :, :T, :] = v_ref[...]
    else:                                   # fully fresh block
        cko_ref[...] = k_ref[...]
        cvo_ref[...] = v_ref[...]


def _prefill_kernel_q(slots_ref, k_ref, v_ref, ks_ref, vs_ref,
                      cki_ref, cvi_ref, ksi_ref, vsi_ref,
                      cko_ref, cvo_ref, kso_ref, vso_ref, *,
                      T: int, Ts: int):
    if T:
        cko_ref[...] = cki_ref[...]
        cvo_ref[...] = cvi_ref[...]
        cko_ref[:, :, :, :T, :] = k_ref[...]
        cvo_ref[:, :, :, :T, :] = v_ref[...]
    else:
        cko_ref[...] = k_ref[...]
        cvo_ref[...] = v_ref[...]
    if Ts:
        kso_ref[...] = ksi_ref[...]
        vso_ref[...] = vsi_ref[...]
        kso_ref[:, :, :, :Ts] = ks_ref[...]
        vso_ref[:, :, :, :Ts] = vs_ref[...]
    else:
        kso_ref[...] = ks_ref[...]
        vso_ref[...] = vs_ref[...]


def _seq_block(T: int, per_row_bytes: int, sub: int) -> int:
    """Sequence block for the prefill writer: halve T (power-of-two
    buckets) until the cache slab fits the budget, staying sublane
    -aligned."""
    TB = T
    while TB % 2 == 0 and (TB // 2) % sub == 0 \
            and TB * per_row_bytes > _BLOCK_BUDGET // 2:
        TB //= 2
    return TB


def prefill_write(cache, kq: jax.Array, vq: jax.Array, ks, vs,
                  slots: jax.Array, interpret: bool = False):
    """Write N freshly-prefilled prompts' K/V stacks into their slots in ONE
    launch: kq/vq (L, N, n_kv, T, hs) land at rows [0, T) of slot
    ``slots[n]``; ks/vs (L, N, n_kv, T) fp32 scales or None.  Duplicate slot
    ids (bucket padding repeats a request) are safe: the TPU grid runs
    sequentially and the duplicates carry identical rows.

    Grid = (N, L, T-blocks).  When T splits into sublane-aligned blocks,
    every block is fully fresh; otherwise one slab of ceil(T/sub)·sub rows
    is read-modify-written with rows [T, slab) copied back unchanged."""
    from fastllama_tpu.models.batched import BatchedKVCache
    L, N, n_kv, T, hs = kq.shape
    S = cache.k.shape[3]
    sub = _sublane(cache.k.dtype)
    quant = ks is not None

    TB = _seq_block(T, n_kv * hs * cache.k.dtype.itemsize, sub)
    if TB == T:
        NT = 1
        Tb = min(-(-T // sub) * sub, S)             # slab incl. tail rows
        t_part = T if T % sub else 0                # 0 = fully fresh
    else:
        NT = T // TB
        Tb = TB
        t_part = 0

    fresh_spec = pl.BlockSpec((1, 1, n_kv, TB, hs),
                              lambda n, l, t, s: (l, n, 0, t, 0),
                              memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec((1, 1, n_kv, Tb, hs),
                              lambda n, l, t, s: (l, s[n], 0, t, 0),
                              memory_space=pltpu.VMEM)
    if not quant:
        in_specs = [fresh_spec, fresh_spec, cache_spec, cache_spec]
        operands = [kq, vq, cache.k, cache.v]
        out_specs = [cache_spec, cache_spec]
        out_shapes = [jax.ShapeDtypeStruct(cache.k.shape, cache.k.dtype),
                      jax.ShapeDtypeStruct(cache.v.shape, cache.v.dtype)]
        aliases = {3: 0, 4: 1}
        kernel = functools.partial(_prefill_kernel, T=t_part)
    else:
        lane = _lane_block(S)
        if NT == 1:
            Tsl = min(-(-T // lane) * lane, S)
            ts_part = T if T % lane else 0
        else:
            # scale lanes must tile too: TB is a power-of-two >= sub; when
            # it's lane-aligned each scale block is fully fresh, else fall
            # back to one whole-T scale block per (n, l) — tiny either way
            if TB % lane == 0:
                Tsl, ts_part = TB, 0
            else:
                Tsl = min(-(-T // lane) * lane, S)
                ts_part = T if T % lane else 0
        fs_spec = pl.BlockSpec(
            (1, 1, n_kv, TB if NT > 1 and TB % lane == 0 else T),
            (lambda n, l, t, s: (l, n, 0, t)) if NT > 1 and TB % lane == 0
            else (lambda n, l, t, s: (l, n, 0, 0)),
            memory_space=pltpu.VMEM)
        cs_spec = pl.BlockSpec(
            (1, 1, n_kv, Tsl),
            (lambda n, l, t, s: (l, s[n], 0, t)) if NT > 1 and TB % lane == 0
            else (lambda n, l, t, s: (l, s[n], 0, 0)),
            memory_space=pltpu.VMEM)
        in_specs = [fresh_spec, fresh_spec, fs_spec, fs_spec,
                    cache_spec, cache_spec, cs_spec, cs_spec]
        operands = [kq, vq, ks, vs, cache.k, cache.v,
                    cache.k_scale, cache.v_scale]
        out_specs = [cache_spec, cache_spec, cs_spec, cs_spec]
        out_shapes = [
            jax.ShapeDtypeStruct(cache.k.shape, cache.k.dtype),
            jax.ShapeDtypeStruct(cache.v.shape, cache.v.dtype),
            jax.ShapeDtypeStruct(cache.k_scale.shape, cache.k_scale.dtype),
            jax.ShapeDtypeStruct(cache.v_scale.shape, cache.v_scale.dtype)]
        aliases = {5: 0, 6: 1, 7: 2, 8: 3}
        kernel = functools.partial(_prefill_kernel_q, T=t_part, Ts=ts_part)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N, L, NT),
        in_specs=in_specs, out_specs=out_specs)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        input_output_aliases=aliases, interpret=interpret,
    )(slots.astype(jnp.int32), *operands)
    if quant:
        return BatchedKVCache(outs[0], outs[1], outs[2], outs[3])
    return BatchedKVCache(outs[0], outs[1])


def make_kv_writer(interpret: bool = False):
    """Engine-facing factory: ``writer(cache, kq, vq, ks, vs, pos)`` with
    the quantize-on-write handled by the caller (scales may be None)."""
    return functools.partial(decode_write, interpret=interpret)


def make_prefill_writer(interpret: bool = False):
    return functools.partial(prefill_write, interpret=interpret)


def _spec_kernel(pos_ref, k_ref, v_ref, cki_ref, cvi_ref,
                 cko_ref, cvo_ref, *, sub: int, D: int, nsub: int):
    # grid t in {0, 1} visits the slab at pos//sub and its successor (the D
    # rows may straddle).  The successor index WRAPS (mod nsub): a wrap
    # implies the rows fit entirely in the last slab (caller guarantees
    # pos+D <= S), so the wrapped visit blends nothing and copies its slab
    # back unchanged.  With nsub == 1 both visits hit the same slab and the
    # blend re-applies idempotently (t treated as 0).
    b = pl.program_id(0)
    t = pl.program_id(2) if nsub > 1 else 0
    p = pos_ref[b] % sub
    k_slab = cki_ref[...]
    v_slab = cvi_ref[...]
    for d in range(D):
        r = p + d - t * sub                 # row inside THIS slab (may miss)
        k_slab = _blend_row(k_slab, k_ref[:, :, :, d:d + 1, :], r, 3)
        v_slab = _blend_row(v_slab, v_ref[:, :, :, d:d + 1, :], r, 3)
    cko_ref[...] = k_slab
    cvo_ref[...] = v_slab


def _spec_kernel_q(pos_ref, k_ref, v_ref, ks_ref, vs_ref,
                   cki_ref, cvi_ref, ksi_ref, vsi_ref,
                   cko_ref, cvo_ref, kso_ref, vso_ref, *,
                   sub: int, lane: int, D: int, nsub: int, nlane: int):
    b = pl.program_id(0)
    t = pl.program_id(2)
    ts = t if nsub > 1 else 0
    tl = t if nlane > 1 else 0
    p = pos_ref[b] % sub
    c = pos_ref[b] % lane
    k_slab = cki_ref[...]
    v_slab = cvi_ref[...]
    ks_slab = ksi_ref[...]
    vs_slab = vsi_ref[...]
    for d in range(D):
        r = p + d - ts * sub
        k_slab = _blend_row(k_slab, k_ref[:, :, :, d:d + 1, :], r, 3)
        v_slab = _blend_row(v_slab, v_ref[:, :, :, d:d + 1, :], r, 3)
        cl = c + d - tl * lane
        ks_slab = _blend_row(ks_slab, ks_ref[:, :, :, d:d + 1], cl, 3)
        vs_slab = _blend_row(vs_slab, vs_ref[:, :, :, d:d + 1], cl, 3)
    cko_ref[...] = k_slab
    cvo_ref[...] = v_slab
    kso_ref[...] = ks_slab
    vso_ref[...] = vs_slab


def spec_write(cache, kq: jax.Array, vq: jax.Array, ks, vs,
               pos: jax.Array, interpret: bool = False):
    """Write every slot's D fresh rows (speculative verify,
    models/batched.spec_decode_step) in ONE launch: kq/vq (L, B, n_kv, D,
    hs) land at rows [pos[b], pos[b]+D); ks/vs (L, B, n_kv, D) fp32 scales
    or None.  The D rows may straddle a slab boundary, so the grid's third
    dim visits the slab at pos//sub and its successor (clamped; a slab with
    no matching rows is copied back unchanged)."""
    from fastllama_tpu.models.batched import BatchedKVCache
    L, B, n_kv, D, hs = kq.shape
    S = cache.k.shape[3]
    sub = _sublane(cache.k.dtype)
    LB = _layer_block(L, n_kv * sub * hs * cache.k.dtype.itemsize)
    if LB == 0 or S % sub or D > sub:
        raise ValueError(f"spec_write unsupported: L={L} S={S} D={D}")
    quant = ks is not None
    nsub = S // sub

    fresh_spec = pl.BlockSpec((LB, 1, n_kv, D, hs),
                              lambda b, l, t, s: (l, b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec(
        (LB, 1, n_kv, sub, hs),
        lambda b, l, t, s: (l, b, 0, (s[b] // sub + t) % nsub, 0),
        memory_space=pltpu.VMEM)
    if not quant:
        in_specs = [fresh_spec, fresh_spec, cache_spec, cache_spec]
        operands = [kq, vq, cache.k, cache.v]
        out_specs = [cache_spec, cache_spec]
        out_shapes = [jax.ShapeDtypeStruct(cache.k.shape, cache.k.dtype),
                      jax.ShapeDtypeStruct(cache.v.shape, cache.v.dtype)]
        aliases = {3: 0, 4: 1}
        kernel = functools.partial(_spec_kernel, sub=sub, D=D, nsub=nsub)
    else:
        lane = _lane_block(S)
        nlane = S // lane
        fs_spec = pl.BlockSpec((LB, 1, n_kv, D),
                               lambda b, l, t, s: (l, b, 0, 0),
                               memory_space=pltpu.VMEM)
        cs_spec = pl.BlockSpec(
            (LB, 1, n_kv, lane),
            lambda b, l, t, s: (l, b, 0, (s[b] // lane + t) % nlane),
            memory_space=pltpu.VMEM)
        in_specs = [fresh_spec, fresh_spec, fs_spec, fs_spec,
                    cache_spec, cache_spec, cs_spec, cs_spec]
        operands = [kq, vq, ks, vs,
                    cache.k, cache.v, cache.k_scale, cache.v_scale]
        out_specs = [cache_spec, cache_spec, cs_spec, cs_spec]
        out_shapes = [
            jax.ShapeDtypeStruct(cache.k.shape, cache.k.dtype),
            jax.ShapeDtypeStruct(cache.v.shape, cache.v.dtype),
            jax.ShapeDtypeStruct(cache.k_scale.shape, cache.k_scale.dtype),
            jax.ShapeDtypeStruct(cache.v_scale.shape, cache.v_scale.dtype)]
        aliases = {5: 0, 6: 1, 7: 2, 8: 3}
        kernel = functools.partial(_spec_kernel_q, sub=sub, lane=lane, D=D,
                                   nsub=nsub, nlane=nlane)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, L // LB, 2),
        in_specs=in_specs, out_specs=out_specs)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        input_output_aliases=aliases, interpret=interpret,
    )(pos.astype(jnp.int32), *operands)
    if quant:
        return BatchedKVCache(outs[0], outs[1], outs[2], outs[3])
    return BatchedKVCache(outs[0], outs[1])


def make_spec_writer(interpret: bool = False):
    return functools.partial(spec_write, interpret=interpret)
