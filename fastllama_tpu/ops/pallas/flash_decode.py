"""Flash decode attention with a bounded KV window and head blocking.

The plain kernels in ops/pallas/attention.py stream the FULL ``max_seq_len``
K/V buffers every step because Pallas's automatic pipeline fetches every grid
block regardless of the causal mask.  At batch B that costs
``B * L * n_kv * S * hs * 2 * itemsize`` bytes per token — measured 4.3
GB/step for LLaMA2-7B at B=8, S=1024 on v5e — even when every slot holds a
50-token sequence.

Two structural decisions, both measured on chip:

* **Host-bounded window**: the host knows a tight upper bound on every
  slot's position for a whole decode chunk (``max(pos) + chunk``), so the
  engine compiles the step with a static ``s_bound`` (bucketed to block
  multiples) and the kernel grids over only ``s_bound // block`` sequence
  blocks.  A per-slot scalar-clamped index_map variant measured *slower*
  than streaming everything (dynamic mappings defeat Mosaic's double
  buffering); static grids + host bucketing win.
* **Head blocks**: one grid program per (slot, kv-head) left the kernel
  grid-overhead bound — xprof showed 547 us/layer at B=24 (8x the largest
  matmul) across 768 tiny programs.  Each program now covers ``HB`` kv
  heads (8, or all of them when n_kv < 8 / not 8-divisible), amortizing
  per-program cost and making the per-head scale / fresh-row blocks legal
  Mosaic shapes directly (no iota row-selects).

The kernel also supports ``quantized`` (int8 cache rows with per-row fp32
scales folded into the score/probability lanes) and ``fresh`` (the current
token's K/V passed separately under the deferred-write scheme: cache rows
masked STRICTLY below ``pos``, the fresh row merged into the online softmax
at the last grid step, in full precision even over an int8 cache).

The reference's analogue is its O(pos) per-head score loop
(``execute_attn``, transformer.cpp:418-454) — it too only touches ``pos+1``
cache rows; this is that bound, batch-shared and TPU-shaped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK = 256


def _head_block(n_kv: int) -> int:
    """kv heads per grid program: 8 when it divides (the Mosaic sublane
    quantum), else all heads (full-extent blocks are always legal)."""
    return 8 if n_kv % 8 == 0 else n_kv


def _slot_block(B: int, HB: int, block_s: int, hs: int, itemsize: int) -> int:
    """Slots per grid program.  One program per (slot, head-block) left the
    kernel PROGRAM-COUNT bound at serving batch sizes: B=48 x 4 head-blocks
    x 2 seq-blocks x 32 layers = 12k programs/step at ~0.7 us each — more
    than the whole weight stream.  Blocking BB slots per program divides
    that by BB; K/V tile bytes stay under ~2 MB for double buffering."""
    for bb in (8, 4, 2):
        if B % bb == 0 and bb * HB * block_s * hs * itemsize <= 2 * 1024 * 1024:
            return bb
    return 1


def _flash_kernel(scalars_ref, q_ref, k_ref, v_ref, *rest,
                  scale: float, block_s: int, nblocks: int,
                  quantized: bool = False, fresh: bool = False,
                  stats: bool = False):
    """Grid (B//BB, n_kv//HB, NB); single-stream callers wrap into a B=1
    batched cache (flash_decode_single).
    scalars = [layer, pos_0..pos_{B-1}].  Blocks carry BB slots x HB kv
    heads: q (BB, HB, hgs, hs), k/v (1, BB, HB, block_s, hs), scales
    (1, BB, HB, block_s), fresh rows (BB, HB, hs).  Scratch rows are
    (BB*HB*hgs, .): slot-major, then head, then query-in-group."""
    rest = list(rest)
    ks_ref = vs_ref = kn_ref = vn_ref = None
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    if fresh:
        kn_ref, vn_ref = rest[0], rest[1]
        rest = rest[2:]
    if stats:
        # extra outputs: the final online-softmax running max / sum, so a
        # caller can merge MORE rows (the deferred staged-KV block) into
        # the softmax outside the kernel (models/batched.py
        # decode_step_deferred)
        o_ref, m_out, l_out, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    j = pl.program_id(2)
    BB, HB, hgs, hs = q_ref.shape
    R = BB * HB * hgs                                  # scratch rows
    HR = HB * hgs                                      # rows per slot

    pos_s = [scalars_ref[1 + b * BB + i] for i in range(BB)]
    # per-row positions (for the causal mask) and the last block any slot
    # in this program still needs; with fresh (strict mask) row pos-1
    cap = pos_s[0]
    for p in pos_s[1:]:
        cap = jnp.maximum(cap, p)
    cap = ((cap - 1) if fresh else cap) // block_s

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def stack_rows(pieces):
        return jnp.concatenate(pieces, axis=0) if len(pieces) > 1 \
            else pieces[0]

    def row_scales(sc):
        """(BB, HB, BS) cache-row scales -> (R, BS) score-row scales."""
        return stack_rows([
            jnp.repeat(sc[i], hgs, axis=0) if hgs > 1 else sc[i]
            for i in range(BB)])

    @pl.when(j <= cap)
    def _():
        q = q_ref[:].astype(jnp.float32)               # (BB, HB, hgs, hs)
        k = k_ref[0].astype(jnp.float32)               # (BB, HB, BS, hs)
        v = v_ref[0].astype(jnp.float32)

        # per-(slot, head) scores, stacked to (R, BS)
        s = stack_rows([
            jax.lax.dot_general(
                q[i, h], k[i, h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for i in range(BB) for h in range(HB)]) * scale
        if quantized:
            # per-row K scales land on the SCORE lanes (column s of scores
            # = cache row s)
            s = s * row_scales(ks_ref[0])
        col = jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 1) \
            + j * block_s
        pos_rows = stack_rows([
            jnp.full((HR, 1), pos_s[i], jnp.int32) for i in range(BB)])
        s = jnp.where(col < pos_rows if fresh else col <= pos_rows, s,
                      NEG_INF)

        m = m_scr[:, :1]
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m2)
        e = jnp.exp(s - m2)
        m_scr[:, :1] = m2
        l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(e, axis=-1,
                                                     keepdims=True)
        if quantized:
            e = e * row_scales(vs_ref[0])              # fold V scales in
        pv = stack_rows([
            jax.lax.dot_general(
                e[(i * HB + h) * hgs:(i * HB + h + 1) * hgs], v[i, h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for i in range(BB) for h in range(HB)])    # (R, hs)
        acc_scr[:] = acc_scr[:] * corr + pv

    @pl.when(j == nblocks - 1)
    def _():
        if fresh:
            # merge the current token's K/V rows (always attended: the
            # query's own position); full precision even over int8 caches
            q = q_ref[:].astype(jnp.float32)           # (BB, HB, hgs, hs)
            kn = kn_ref[:].astype(jnp.float32)         # (BB, HB, hs)
            vn = vn_ref[:].astype(jnp.float32)
            s_new = stack_rows([
                jax.lax.dot_general(
                    q[i, h], kn[i, h:h + 1],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for i in range(BB) for h in range(HB)]) * scale   # (R, 1)
            m = m_scr[:, :1]
            m2 = jnp.maximum(m, s_new)
            corr = jnp.exp(m - m2)
            e = jnp.exp(s_new - m2)
            l2 = l_scr[:, :1] * corr + e
            vn_rows = stack_rows([
                jnp.repeat(vn[i], hgs, axis=0) if hgs > 1 else vn[i]
                for i in range(BB)])
            acc = acc_scr[:] * corr + e * vn_rows
            o_ref[:] = (acc / l2).reshape(BB, HB, hgs, hs).astype(o_ref.dtype)
            if stats:
                m_out[...] = jnp.broadcast_to(m2, (R, 128)).reshape(
                    BB, HB, hgs, 128)
                l_out[...] = jnp.broadcast_to(l2, (R, 128)).reshape(
                    BB, HB, hgs, 128)
        else:
            o_ref[:] = (acc_scr[:] / l_scr[:, :1]).reshape(
                BB, HB, hgs, hs).astype(o_ref.dtype)
            if stats:
                m_out[...] = jnp.broadcast_to(m_scr[:, :1], (R, 128)).reshape(
                    BB, HB, hgs, 128)
                l_out[...] = jnp.broadcast_to(l_scr[:, :1], (R, 128)).reshape(
                    BB, HB, hgs, 128)


def flash_decode_batched(q: jax.Array, ck: jax.Array, cv: jax.Array,
                         pos: jax.Array, layer, s_bound: int = 0,
                         block_s: int = DEFAULT_BLOCK,
                         interpret: bool = False,
                         k_scale=None, v_scale=None,
                         k_new=None, v_new=None, stats: bool = False):
    """Per-slot decode attention over the FULL stacked batched cache, reading
    only cache rows [0, s_bound) from HBM.

    q: (B, n_heads, 1, hs); caches (L, B, n_kv, S, hs); pos (B,) int32;
    layer: traced scalar; ``s_bound``: static upper bound with every
    ``pos[b] < s_bound`` (0 = max_seq_len).  ``k_scale``/``v_scale``
    (L, B, n_kv, S) mark an int8 cache (per-row dequant in VMEM).
    ``k_new``/``v_new`` (B, n_kv, hs) are the current token's rows under
    deferred writes (strict causal mask).  Returns (B, n_heads, 1, hs);
    with ``stats`` also the final online-softmax (max, sum) as two
    (B, n_kv, hgs) f32 arrays, so the caller can merge further score rows
    (the deferred staged-KV window) outside the kernel."""
    B, n_heads, T, hs = q.shape
    L, Bc, n_kv, S, _ = ck.shape
    s_bound = min(s_bound or S, S)
    NB = -(-s_bound // block_s)
    HB = _head_block(n_kv)
    BB = _slot_block(B, HB, block_s, hs, ck.dtype.itemsize)
    hgs = n_heads // n_kv
    qh = q.reshape(B, n_kv, hgs, hs)
    scalars = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                               pos.astype(jnp.int32)])
    quantized = k_scale is not None
    fresh = k_new is not None

    kernel = functools.partial(_flash_kernel, scale=1.0 / float(hs) ** 0.5,
                               block_s=block_s, nblocks=NB,
                               quantized=quantized, fresh=fresh, stats=stats)
    kv_spec = pl.BlockSpec((1, BB, HB, block_s, hs),
                           lambda b, h, j, s: (s[0], b, h, j, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((BB, HB, hgs, hs), lambda b, h, j, s: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
    ]
    operands = [qh, ck, cv]
    if quantized:
        # scales are 4D (L, B, n_kv, S) — no trailing singleton (lane-pads
        # 128x); slot/head blocks are legal Mosaic shapes, applied along
        # the score lanes
        sc_spec = pl.BlockSpec((1, BB, HB, block_s),
                               lambda b, h, j, s: (s[0], b, h, j),
                               memory_space=pltpu.VMEM)
        in_specs += [sc_spec, sc_spec]
        operands += [k_scale, v_scale]
    if fresh:
        fr_spec = pl.BlockSpec((BB, HB, hs), lambda b, h, j, s: (b, h, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [fr_spec, fr_spec]
        operands += [k_new, v_new]
    out_specs = pl.BlockSpec((BB, HB, hgs, hs),
                             lambda b, h, j, s: (b, h, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, n_kv, hgs, hs), q.dtype)
    if stats:
        st_spec = pl.BlockSpec((BB, HB, hgs, 128),
                               lambda b, h, j, s: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)
        st_shape = jax.ShapeDtypeStruct((B, n_kv, hgs, 128), jnp.float32)
        out_specs = [out_specs, st_spec, st_spec]
        out_shape = [out_shape, st_shape, st_shape]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BB, n_kv // HB, NB),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((BB * HB * hgs, 128), jnp.float32),  # running max
            pltpu.VMEM((BB * HB * hgs, 128), jnp.float32),  # running sum
            pltpu.VMEM((BB * HB * hgs, hs), jnp.float32),   # output acc
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_heads * s_bound * hs * 2,
            bytes_accessed=2 * B * n_kv * s_bound * hs * ck.dtype.itemsize,
            transcendentals=B * n_heads * s_bound),
        interpret=interpret,
    )(scalars, *operands)
    if stats:
        o, m, l = out
        return o.reshape(B, n_heads, 1, hs), m[..., 0], l[..., 0]
    return out.reshape(B, n_heads, 1, hs)


def flash_decode_single(q: jax.Array, ck: jax.Array, cv: jax.Array,
                        pos, layer, s_bound: int = 0,
                        block_s: int = DEFAULT_BLOCK,
                        interpret: bool = False) -> jax.Array:
    """Single-stream variant: q (n_heads, 1, hs), caches (L, n_kv, S, hs) —
    viewed as a B=1 batched cache (free reshape; same HBM buffer)."""
    n_heads, T, hs = q.shape
    L, n_kv, S, _ = ck.shape
    out = flash_decode_batched(
        q[None], ck.reshape(L, 1, n_kv, S, hs), cv.reshape(L, 1, n_kv, S, hs),
        jnp.asarray(pos, jnp.int32).reshape(1), layer, s_bound, block_s,
        interpret)
    return out[0]


def _block_size(S: int) -> int:
    if S % DEFAULT_BLOCK == 0:
        return DEFAULT_BLOCK
    for bs in (128, 64, 32, 16, 8):
        if S % bs == 0:
            return bs
    return 0


def round_bound(s_bound: int, S: int, block_s: int = DEFAULT_BLOCK) -> int:
    """Bucket a KV bound up to a block multiple (caps compile variants)."""
    if s_bound <= 0:
        return S
    bs = block_s if S % block_s == 0 else (_block_size(S) or S)
    return min(-(-s_bound // bs) * bs, S)


def _flash_block_kernel(scalars_ref, q_ref, k_ref, v_ref, *rest,
                        scale: float, block_s: int, nblocks: int, T: int,
                        quantized: bool = False):
    """T-query-row bounded attention for ONE slot: cache rows [0, start)
    plus a causal fresh block of T rows (the prefix-cache tail prefill and
    mid-sequence chunk prefill shape).  Grid (n_kv//HB, NB); scalars =
    [layer, slot, start].  Blocks: q (HB, hgs, T, hs), cache k/v
    (1, 1, HB, block_s, hs), scales (1, 1, HB, block_s), fresh k/v
    (HB, T, hs).  Scratch rows (HB*hgs*T, .)."""
    rest = list(rest)
    ks_ref = vs_ref = None
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    kn_ref, vn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    j = pl.program_id(1)
    HB, hgs, _, hs = q_ref.shape
    R = HB * hgs * T
    start = scalars_ref[2]
    cap = (start - 1) // block_s                   # strict: block not in cache

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def qrows():
        q = q_ref[:].astype(jnp.float32)           # (HB, hgs, T, hs)
        return q.reshape(HB, hgs * T, hs)

    @pl.when(j <= cap)
    def _():
        q = qrows()
        k = k_ref[0, 0].astype(jnp.float32)        # (HB, BS, hs)
        v = v_ref[0, 0].astype(jnp.float32)
        s = jnp.concatenate([
            jax.lax.dot_general(
                q[h], k[h], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0) * scale   # (R, BS)
        if quantized:
            ks = ks_ref[0, 0]                      # (HB, BS)
            s = s * jnp.repeat(ks, hgs * T, axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 1) \
            + j * block_s
        s = jnp.where(col < start, s, NEG_INF)     # strict: cache part only

        m = m_scr[:, :1]
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m2)
        e = jnp.exp(s - m2)
        m_scr[:, :1] = m2
        l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(e, axis=-1,
                                                     keepdims=True)
        if quantized:
            e = e * jnp.repeat(vs_ref[0, 0], hgs * T, axis=0)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                e[h * hgs * T:(h + 1) * hgs * T], v[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0)
        acc_scr[:] = acc_scr[:] * corr + pv

    @pl.when(j == nblocks - 1)
    def _():
        # causal self-attention over the fresh block, merged into the
        # online softmax in full precision
        q = qrows()
        kn = kn_ref[:].astype(jnp.float32)         # (HB, T, hs)
        vn = vn_ref[:].astype(jnp.float32)
        s_blk = jnp.concatenate([
            jax.lax.dot_general(
                q[h], kn[h], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0) * scale   # (R, T)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0) % T
        col_t = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        s_blk = jnp.where(col_t <= row_t, s_blk, NEG_INF)
        m = m_scr[:, :1]
        m2 = jnp.maximum(m, jnp.max(s_blk, axis=-1, keepdims=True))
        corr = jnp.exp(m - m2)
        e = jnp.exp(s_blk - m2)
        l2 = l_scr[:, :1] * corr + jnp.sum(e, axis=-1, keepdims=True)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                e[h * hgs * T:(h + 1) * hgs * T], vn[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0)
        acc = acc_scr[:] * corr + pv
        o_ref[:] = (acc / l2).reshape(HB, hgs, T, hs).astype(o_ref.dtype)


def flash_block_attend(q: jax.Array, ck: jax.Array, cv: jax.Array,
                       slot, layer, start, s_bound: int = 0,
                       block_s: int = DEFAULT_BLOCK,
                       interpret: bool = False,
                       k_scale=None, v_scale=None,
                       k_new=None, v_new=None) -> jax.Array:
    """T-row attention for one slot of the stacked batched cache: rows
    [0, start) of slot ``slot`` / layer ``layer`` plus the causal fresh
    block.  q (n_heads, T, hs); caches (L, B, n_kv, S, hs); k_new/v_new
    (n_kv, T, hs); slot/layer/start traced.  Returns (n_heads, T, hs)."""
    n_heads, T, hs = q.shape
    L, B, n_kv, S, _ = ck.shape
    s_bound = min(s_bound or S, S)
    NB = -(-s_bound // block_s)
    HB = _head_block(n_kv)
    hgs = n_heads // n_kv
    qh = q.reshape(n_kv, hgs, T, hs)
    scalars = jnp.stack([jnp.asarray(layer, jnp.int32),
                         jnp.asarray(slot, jnp.int32),
                         jnp.asarray(start, jnp.int32)])
    quantized = k_scale is not None

    kernel = functools.partial(
        _flash_block_kernel, scale=1.0 / float(hs) ** 0.5, block_s=block_s,
        nblocks=NB, T=T, quantized=quantized)
    kv_spec = pl.BlockSpec((1, 1, HB, block_s, hs),
                           lambda h, j, s: (s[0], s[1], h, j, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((HB, hgs, T, hs), lambda h, j, s: (h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        kv_spec, kv_spec,
    ]
    operands = [qh, ck, cv]
    if quantized:
        sc_spec = pl.BlockSpec((1, 1, HB, block_s),
                               lambda h, j, s: (s[0], s[1], h, j),
                               memory_space=pltpu.VMEM)
        in_specs += [sc_spec, sc_spec]
        operands += [k_scale, v_scale]
    fr_spec = pl.BlockSpec((HB, T, hs), lambda h, j, s: (h, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs += [fr_spec, fr_spec]
    operands += [k_new, v_new]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_kv // HB, NB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((HB, hgs, T, hs), lambda h, j, s: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HB * hgs * T, 128), jnp.float32),
            pltpu.VMEM((HB * hgs * T, 128), jnp.float32),
            pltpu.VMEM((HB * hgs * T, hs), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_kv, hgs, T, hs), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_heads * T * (s_bound + T) * hs * 2,
            bytes_accessed=2 * n_kv * s_bound * hs * ck.dtype.itemsize,
            transcendentals=n_heads * T * (s_bound + T)),
        interpret=interpret,
    )(scalars, *operands)
    return out.reshape(n_heads, T, hs)


def make_attn_tail(s_bound: int = 0, interpret: bool = False):
    """attn_tail(q, cache, slot, layer, start, k_new, v_new) for
    models.batched.prefill_into_slot_at — bounded-window kernel over the
    slot's existing rows + causal fresh block; jnp fallback otherwise.
    q (n_heads, T, hs); k_new/v_new (n_kv, T, hs)."""
    def attn_tail(q, cache, slot, layer, start, k_new, v_new):
        bs = _block_size(cache.k.shape[3])
        if q.shape[2] % 8 == 0 and bs and q.shape[1] * q.shape[0] <= 4096:
            return flash_block_attend(
                q, cache.k, cache.v, slot, layer, start, s_bound, bs,
                interpret, k_scale=cache.k_scale, v_scale=cache.v_scale,
                k_new=k_new, v_new=v_new)
        return None                                  # caller falls back

    return attn_tail


def make_attn_batched_flash(s_bound: int = 0, interpret: bool = False):
    """attn_bidx(q, cache, pos, layer, k_new, v_new) for
    models.batched.decode_step: bounded-window kernel over cache rows
    [0, pos) plus the (deferred-write) fresh K/V row; int8-dequant in VMEM
    when the cache is quantized; jnp fallback where shapes don't fit.
    q: (B, n_heads, hs); k_new/v_new: (B, n_kv, hs)."""
    from fastllama_tpu.ops.attention import gqa_attention_decode_batched

    def attn_bidx(q, cache, pos, layer, k_new, v_new):
        bs = _block_size(cache.k.shape[3])
        if q.shape[2] % 8 == 0 and bs:
            return flash_decode_batched(
                q[:, :, None], cache.k, cache.v, pos, layer, s_bound, bs,
                interpret, k_scale=cache.k_scale, v_scale=cache.v_scale,
                k_new=k_new, v_new=v_new)[:, :, 0]
        from fastllama_tpu.models.batched import _layer_slices
        ck_l, cv_l = _layer_slices(cache, layer, q.dtype)
        # the cache may carry MORE slots than the step decodes (multi-host
        # sink slot sits past the serving slots); row b = cache slot b
        B = q.shape[0]
        return gqa_attention_decode_batched(q, ck_l[:B], cv_l[:B],
                                            k_new, v_new, pos)

    return attn_bidx


def make_attn_batched_flash_stats(s_bound: int = 0, interpret: bool = False):
    """attn_stats(q, cache, pos0, layer, k_new, v_new) for
    models.batched.decode_step_deferred: the bounded-window kernel over
    cache rows [0, pos0) plus the current token's fresh row, ALSO returning
    the final online-softmax (max, sum) so the caller can merge the staged
    (not-yet-landed) KV rows outside the kernel.  No jnp fallback — the
    engine gates deferred chunks on the kernel's static shape requirements
    (hs % 8, tileable S) at init.

    q (B, n_heads, hs); k_new/v_new (B, n_kv, hs).  Returns
    (o (B, n_heads, hs), m (B, n_kv, hgs) f32, l (B, n_kv, hgs) f32)."""

    def attn_stats(q, cache, pos0, layer, k_new, v_new):
        bs = _block_size(cache.k.shape[3])
        o, m, l = flash_decode_batched(
            q[:, :, None], cache.k, cache.v, pos0, layer, s_bound, bs,
            interpret, k_scale=cache.k_scale, v_scale=cache.v_scale,
            k_new=k_new, v_new=v_new, stats=True)
        return o[:, :, 0], m, l

    return attn_stats


def make_attn_indexed_flash(s_bound: int = 0, interpret: bool = False):
    """attn_idx(q, ck_full, cv_full, pos, layer) for models.llama.forward's
    layer-indexed mode (single stream): bounded kernel for T=1, jnp fallback
    for prefill."""
    from fastllama_tpu.ops.attention import gqa_attention

    def attn_idx(q, ck, cv, pos, layer):
        bs = _block_size(ck.shape[2])
        if q.shape[1] == 1 and q.shape[2] % 8 == 0 and bs:
            return flash_decode_single(q, ck, cv, pos, layer, s_bound, bs,
                                       interpret)
        kc_l = jax.lax.dynamic_index_in_dim(ck, layer, 0, keepdims=False)
        vc_l = jax.lax.dynamic_index_in_dim(cv, layer, 0, keepdims=False)
        return gqa_attention(q, kc_l, vc_l, pos)

    return attn_idx


def _flash_spec_kernel(scalars_ref, q_ref, k_ref, v_ref, *rest,
                       scale: float, block_s: int, nblocks: int, T: int,
                       quantized: bool = False, exact_diag: bool = False):
    """T-query-row bounded attention PER SLOT over the stacked batched
    cache — the batched speculative-verify primitive: slot b's T rows at
    positions pos[b]..pos[b]+T-1 attend cache rows [0, pos[b]) strictly
    plus the causal fresh block.  Grid (B, n_kv//HB, NB); scalars =
    [layer, pos[0..B)].  With ``exact_diag`` two extra fresh operands
    carry the pre-quantization rows used only on the block diagonal
    (sequential-decode numerics parity, models/batched.spec_decode_step).
    """
    rest = list(rest)
    ks_ref = vs_ref = None
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    kn_ref, vn_ref = rest[0], rest[1]
    rest = rest[2:]
    ke_ref = ve_ref = None
    if exact_diag:
        ke_ref, ve_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    j = pl.program_id(2)
    _, HB, hgs, _, hs = q_ref.shape
    R = HB * hgs * T
    start = scalars_ref[1 + b]
    cap = (start - 1) // block_s                   # strict: row start stale

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def qrows():
        return q_ref[0].astype(jnp.float32).reshape(HB, hgs * T, hs)

    @pl.when(j <= cap)
    def _():
        q = qrows()
        k = k_ref[0, 0].astype(jnp.float32)        # (HB, BS, hs)
        v = v_ref[0, 0].astype(jnp.float32)
        s = jnp.concatenate([
            jax.lax.dot_general(
                q[h], k[h], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0) * scale   # (R, BS)
        if quantized:
            s = s * jnp.repeat(ks_ref[0, 0], hgs * T, axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 1) \
            + j * block_s
        s = jnp.where(col < start, s, NEG_INF)

        m = m_scr[:, :1]
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m2)
        e = jnp.exp(s - m2)
        m_scr[:, :1] = m2
        l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(e, axis=-1,
                                                     keepdims=True)
        if quantized:
            e = e * jnp.repeat(vs_ref[0, 0], hgs * T, axis=0)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                e[h * hgs * T:(h + 1) * hgs * T], v[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0)
        acc_scr[:] = acc_scr[:] * corr + pv

    @pl.when(j == nblocks - 1)
    def _():
        q = qrows()
        kn = kn_ref[0].astype(jnp.float32)         # (HB, T, hs)
        vn = vn_ref[0].astype(jnp.float32)
        s_blk = jnp.concatenate([
            jax.lax.dot_general(
                q[h], kn[h], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0) * scale   # (R, T)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0) % T
        col_t = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        diag = col_t == row_t
        if exact_diag:
            ke = ke_ref[0].astype(jnp.float32)
            s_diag = jnp.concatenate([
                jax.lax.dot_general(
                    q[h], ke[h], dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for h in range(HB)], axis=0) * scale
            s_blk = jnp.where(diag, s_diag, s_blk)
        s_blk = jnp.where(col_t <= row_t, s_blk, NEG_INF)
        m = m_scr[:, :1]
        m2 = jnp.maximum(m, jnp.max(s_blk, axis=-1, keepdims=True))
        corr = jnp.exp(m - m2)
        e = jnp.exp(s_blk - m2)
        l2 = l_scr[:, :1] * corr + jnp.sum(e, axis=-1, keepdims=True)
        if exact_diag:
            ve = ve_ref[0].astype(jnp.float32)
            e_diag = jnp.where(diag, e, 0.0)
            e = jnp.where(diag, 0.0, e)
            pv_diag = jnp.concatenate([
                jax.lax.dot_general(
                    e_diag[h * hgs * T:(h + 1) * hgs * T], ve[h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for h in range(HB)], axis=0)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                e[h * hgs * T:(h + 1) * hgs * T], vn[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(HB)], axis=0)
        if exact_diag:
            pv = pv + pv_diag
        acc = acc_scr[:] * corr + pv
        o_ref[:] = (acc / l2).reshape(1, HB, hgs, T, hs).astype(o_ref.dtype)


def flash_spec_batched(q: jax.Array, ck: jax.Array, cv: jax.Array,
                       pos: jax.Array, layer, s_bound: int = 0,
                       block_s: int = DEFAULT_BLOCK,
                       interpret: bool = False,
                       k_scale=None, v_scale=None,
                       k_new=None, v_new=None,
                       k_self=None, v_self=None) -> jax.Array:
    """Batched T-row speculative-verify attention over the FULL stacked
    cache.  q (B, n_heads, T, hs); caches (L, B, n_kv, S, hs); pos (B,);
    k_new/v_new (B, n_kv, T, hs) fresh (quantize-roundtripped when the
    cache is int8); k_self/v_self the exact diagonal rows (or None).
    Returns (B, n_heads, T, hs)."""
    B, n_heads, T, hs = q.shape
    L, Bc, n_kv, S, _ = ck.shape
    s_bound = min(s_bound or S, S)
    NB = -(-s_bound // block_s)
    HB = _head_block(n_kv)
    hgs = n_heads // n_kv
    qh = q.reshape(B, n_kv, hgs, T, hs)
    scalars = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                               pos.astype(jnp.int32)])
    quantized = k_scale is not None
    exact_diag = k_self is not None

    kernel = functools.partial(
        _flash_spec_kernel, scale=1.0 / float(hs) ** 0.5, block_s=block_s,
        nblocks=NB, T=T, quantized=quantized, exact_diag=exact_diag)
    kv_spec = pl.BlockSpec((1, 1, HB, block_s, hs),
                           lambda b, h, j, s: (s[0], b, h, j, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, HB, hgs, T, hs), lambda b, h, j, s: (b, h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        kv_spec, kv_spec,
    ]
    operands = [qh, ck, cv]
    if quantized:
        sc_spec = pl.BlockSpec((1, 1, HB, block_s),
                               lambda b, h, j, s: (s[0], b, h, j),
                               memory_space=pltpu.VMEM)
        in_specs += [sc_spec, sc_spec]
        operands += [k_scale, v_scale]
    fr_spec = pl.BlockSpec((1, HB, T, hs), lambda b, h, j, s: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs += [fr_spec, fr_spec]
    operands += [k_new, v_new]
    if exact_diag:
        in_specs += [fr_spec, fr_spec]
        operands += [k_self, v_self]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_kv // HB, NB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HB, hgs, T, hs),
                               lambda b, h, j, s: (b, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HB * hgs * T, 128), jnp.float32),
            pltpu.VMEM((HB * hgs * T, 128), jnp.float32),
            pltpu.VMEM((HB * hgs * T, hs), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, hgs, T, hs), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_heads * T * (s_bound + T) * hs * 2,
            bytes_accessed=2 * B * n_kv * s_bound * hs * ck.dtype.itemsize,
            transcendentals=B * n_heads * T * (s_bound + T)),
        interpret=interpret,
    )(scalars, *operands)
    return out.reshape(B, n_heads, T, hs)


def make_attn_spec_batched(s_bound: int = 0, interpret: bool = False):
    """attn_sbidx(q, cache, pos, layer, k_new, v_new, k_self=, v_self=)
    for models.batched.spec_decode_step; returns None where shapes don't
    fit (caller falls back to the jnp path)."""
    def attn_sbidx(q, cache, pos, layer, k_new, v_new, k_self=None,
                   v_self=None):
        bs = _block_size(cache.k.shape[3])
        if q.shape[3] % 8 == 0 and bs:
            return flash_spec_batched(
                q, cache.k, cache.v, pos, layer, s_bound, bs, interpret,
                k_scale=cache.k_scale, v_scale=cache.v_scale,
                k_new=k_new, v_new=v_new, k_self=k_self, v_self=v_self)
        return None

    return attn_sbidx
