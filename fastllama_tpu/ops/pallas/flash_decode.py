"""Flash decode attention with a bounded KV window.

The plain kernels in ops/pallas/attention.py stream the FULL ``max_seq_len``
K/V buffers every step because Pallas's automatic pipeline fetches every grid
block regardless of the causal mask.  At batch B that costs
``B * L * n_kv * S * hs * 2 * itemsize`` bytes per token — measured 4.3
GB/step for LLaMA2-7B at B=8, S=1024 on v5e, more than half of all decode
HBM traffic — even when every slot holds a 50-token sequence.

Design: the **host** already knows a tight upper bound on every slot's
position for a whole decode chunk (``max(pos) + chunk``), so the engine
compiles the step with a static ``s_bound`` (bucketed to multiples of the
block size) and this kernel grids over only ``s_bound // block`` sequence
blocks with an online-softmax accumulator in VMEM scratch.  The automatic
pipeline stays fully static — no scalar-dependent index_maps (a variant that
clamped block indices per-slot via scalar prefetch measured *slower* than
streaming everything: dynamic mappings defeat Mosaic's double buffering) —
and blocks past ``s_bound`` are never read.  Per-slot masking ``col <=
pos[b]`` still applies inside the window; whole blocks past a slot's
position skip their compute with ``pl.when``.

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


def _flash_kernel(scalars_ref, q_ref, k_ref, v_ref, *rest,
                  scale: float, block_s: int, nblocks: int, batched: bool,
                  quantized: bool = False, fresh: bool = False):
    """Grid (B, n_kv, NB) [batched] or (n_kv, NB) [single].
    scalars = [layer, pos_0..pos_{B-1}].  With ``quantized``, K/V blocks are
    int8 and two per-row fp32 scale refs follow k/v.  With ``fresh``, the
    current token's K/V rows arrive as separate (B, n_kv, hs) refs — the
    cache row at ``pos`` is stale (deferred write) and masked STRICTLY."""
    rest = list(rest)
    ks_ref = vs_ref = kn_ref = vn_ref = None
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    if fresh:
        kn_ref, vn_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, m_scr, l_scr, acc_scr = rest
    if batched:
        b = pl.program_id(0)
        h = pl.program_id(1)
        j = pl.program_id(2)
    else:
        b = 0
        h = pl.program_id(0)
        j = pl.program_id(1)
    pos = scalars_ref[1 + b]
    # last block holding valid rows; with fresh (strict mask) row pos-1
    cap = ((pos - 1) if fresh else pos) // block_s

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j <= cap)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)          # (hgs, hs)
        hgs, hs = q.shape
        k = k_ref[0, 0, 0].astype(jnp.float32)       # (BS, hs)
        v = v_ref[0, 0, 0].astype(jnp.float32)

        if quantized:
            # scale blocks span ALL kv heads (Mosaic wants the block's
            # second-minor dim full or 8-divisible); pick this program's
            # head row with an iota mask — (n_kv, BS) is tiny
            n_kv = ks_ref.shape[2]
            row = jax.lax.broadcasted_iota(jnp.int32, (n_kv, block_s), 0)
            ksv = jnp.sum(jnp.where(row == h, ks_ref[0, 0], 0.0),
                          axis=0).reshape(1, block_s)
            vsv = jnp.sum(jnp.where(row == h, vs_ref[0, 0], 0.0),
                          axis=0).reshape(1, block_s)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # (hgs, BS)
        if quantized:
            # per-row K scales land on the SCORE lanes (column s of scores
            # = cache row s) — a lane broadcast, no transpose of (BS,) vecs
            s = s * ksv
        col = jax.lax.broadcasted_iota(jnp.int32, (hgs, block_s), 1) \
            + j * block_s
        s = jnp.where(col < pos if fresh else col <= pos, s, NEG_INF)

        m = m_scr[:, :1]
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m2)
        e = jnp.exp(s - m2)
        m_scr[:, :1] = m2
        l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(e, axis=-1,
                                                     keepdims=True)
        if quantized:
            # fold per-row V scales into the probabilities (same lane axis)
            e = e * vsv
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            e, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nblocks - 1)
    def _():
        if fresh:
            # merge the current token's K/V row (always attended: the
            # query's own position) into the online softmax; fresh rows
            # are full precision even over an int8 cache
            q = q_ref[0, 0].astype(jnp.float32)
            hgs, hs = q.shape
            n_kv = kn_ref.shape[1]
            row = jax.lax.broadcasted_iota(jnp.int32, (n_kv, hs), 0)
            kn = jnp.sum(jnp.where(row == h, kn_ref[0].astype(jnp.float32),
                                   0.0), axis=0, keepdims=True)   # (1, hs)
            vn = jnp.sum(jnp.where(row == h, vn_ref[0].astype(jnp.float32),
                                   0.0), axis=0, keepdims=True)
            s_new = jax.lax.dot_general(
                q, kn, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale       # (hgs, 1)
            m = m_scr[:, :1]
            m2 = jnp.maximum(m, s_new)
            corr = jnp.exp(m - m2)
            e = jnp.exp(s_new - m2)
            l2 = l_scr[:, :1] * corr + e
            acc = acc_scr[:] * corr + e * vn
            o_ref[0, 0] = (acc / l2).astype(o_ref.dtype)
        else:
            o_ref[0, 0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def flash_decode_batched(q: jax.Array, ck: jax.Array, cv: jax.Array,
                         pos: jax.Array, layer, s_bound: int = 0,
                         block_s: int = DEFAULT_BLOCK,
                         interpret: bool = False,
                         k_scale=None, v_scale=None,
                         k_new=None, v_new=None) -> jax.Array:
    """Per-slot decode attention over the FULL stacked batched cache, reading
    only cache rows [0, s_bound) from HBM.

    q: (B, n_heads, 1, hs); caches (L, B, n_kv, S, hs); pos (B,) int32;
    layer: traced scalar; ``s_bound``: static upper bound with every
    ``pos[b] < s_bound`` (0 = max_seq_len).  ``k_scale``/``v_scale``
    (L, B, n_kv, S, 1) mark an int8 cache: rows are dequantized in VMEM
    right before the score/mix matmuls.  Returns (B, n_heads, 1, hs)."""
    B, n_heads, T, hs = q.shape
    L, Bc, n_kv, S, _ = ck.shape
    s_bound = min(s_bound or S, S)
    NB = -(-s_bound // block_s)
    hgs = n_heads // n_kv
    qh = q.reshape(B, n_kv, hgs, hs)
    scalars = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                               pos.astype(jnp.int32)])

    quantized = k_scale is not None
    fresh = k_new is not None
    kernel = functools.partial(_flash_kernel, scale=1.0 / float(hs) ** 0.5,
                               block_s=block_s, nblocks=NB, batched=True,
                               quantized=quantized, fresh=fresh)
    kv_spec = pl.BlockSpec((1, 1, 1, block_s, hs),
                           lambda b, h, j, s: (s[0], b, h, j, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, hgs, hs), lambda b, h, j, s: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
    ]
    operands = [qh, ck, cv]
    if quantized:
        # scales are 4D (L, B, n_kv, S) — no trailing singleton (lane-pads
        # 128x); blocks span all heads (Mosaic second-minor constraint) and
        # the kernel row-selects; applied along the score lanes
        sc_spec = pl.BlockSpec((1, 1, n_kv, block_s),
                               lambda b, h, j, s: (s[0], b, 0, j),
                               memory_space=pltpu.VMEM)
        in_specs += [sc_spec, sc_spec]
        operands += [k_scale, v_scale]
    if fresh:
        # current token's K/V rows (B, n_kv, hs): blocks span all heads
        # (second-minor constraint again); kernel row-selects
        fr_spec = pl.BlockSpec((1, n_kv, hs), lambda b, h, j, s: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [fr_spec, fr_spec]
        operands += [k_new, v_new]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_kv, NB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, hgs, hs), lambda b, h, j, s: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hgs, 128), jnp.float32),     # running max (col 0)
            pltpu.VMEM((hgs, 128), jnp.float32),     # running sum (col 0)
            pltpu.VMEM((hgs, hs), jnp.float32),      # output accumulator
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, hgs, hs), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_heads * s_bound * hs * 2,
            bytes_accessed=2 * B * n_kv * s_bound * hs * ck.dtype.itemsize,
            transcendentals=B * n_heads * s_bound),
        interpret=interpret,
    )(scalars, *operands)
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
    for bs in (512, 128, 64, 32, 16, 8):
        if S % bs == 0:
            return bs
    return 0


def round_bound(s_bound: int, S: int, block_s: int = DEFAULT_BLOCK) -> int:
    """Bucket a KV bound up to a block multiple (caps compile variants)."""
    if s_bound <= 0:
        return S
    bs = block_s if S % block_s == 0 else (_block_size(S) or S)
    return min(-(-s_bound // bs) * bs, S)


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
        return gqa_attention_decode_batched(q, ck_l, cv_l, k_new, v_new, pos)

    return attn_bidx


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
