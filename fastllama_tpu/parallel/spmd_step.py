"""Decode/prefill steps under shard_map with per-shard kernels.

The engines' default mesh mode relies on GSPMD auto-partitioning of the jnp
path — correct, but the fused Pallas kernels are single-device programs and
get disabled on a multi-device mesh.  This module expresses the batched
steps explicitly per shard with ``shard_map``, so each device runs the SAME
fused kernels on its local weight/KV shards and the only collectives are
the two per-layer ``psum``s after the row-parallel projections (wo, w2) —
exactly the schedule a hand-written TP engine uses.

Sharding contract (matches parallel/sharding.py):
  wq/wk/wv/w1/w3  (L, I, Olocal)   col-parallel over 'model'
  wo/w2           (L, Ilocal, O)   row-parallel -> psum
  KV cache        (L, Blocal, kvlocal, S, hs)
  norms           replicated; embedding/classifier vocab-sharded (the
  embed/classifier stay OUTSIDE the shard_map here: XLA handles a sharded
  gather/matmul well, and logits need a global argmax anyway)

``data_sharded=True`` additionally splits the batch/slot axis over the
'data' mesh axis — the multi-host serving layout (runtime/multihost.py):
each host's slots live on its own chips, activations cross hosts only at
the logits, and EVERY shard runs the fused hot loop on its local slots
(the reference's every-worker-hot-loop design, transformer.cpp:253-384,
x86_simd.cpp:1647-1674, re-expressed for a TPU mesh).  Slot ids passed to
the prefill are then DATA-SHARD-LOCAL.

Status: live in BOTH engines (EngineConfig.spmd_kernels — Engine and
BatchedEngine select this path on a multi-device mesh) and in
MultiHostEngine; validated against the replicated steps on the virtual CPU
mesh (tests/test_spmd_step.py) and at the engine level with interpret-mode
kernels.  Single-chip TPU runs use the engines' normal path.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fastllama_tpu.config import ModelConfig
from fastllama_tpu.models.batched import BatchedKVCache
from fastllama_tpu.models.llama import LlamaParams, embed_tokens
from fastllama_tpu.ops.attention import gqa_attention_decode_batched
from fastllama_tpu.ops.norms import rmsnorm, swiglu
from fastllama_tpu.ops.rope import apply_rope_half, rope_tables
from fastllama_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS
from fastllama_tpu.quant.groupquant import quantize_rows


def _shard_map(body, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:                            # older jax
        from jax.experimental.shard_map import shard_map
    try:
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:                              # older shard_map API
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _check_dims(cfg: ModelConfig, mesh, B: int, data_sharded: bool) -> None:
    mp = mesh.shape[MODEL_AXIS]
    if cfg.n_heads % mp or cfg.n_kv_heads % mp or cfg.hidden_dim % mp:
        raise ValueError(f"heads/hidden must divide the model axis ({mp})")
    gs = cfg.group_size
    if (cfg.n_heads * cfg.head_size // gs) % mp or (cfg.hidden_dim // gs) % mp:
        raise ValueError(
            f"row-parallel quant-group counts (I/gs) must divide the model "
            f"axis ({mp}); pad hidden/heads or shrink group_size")
    if data_sharded and B % mesh.shape[DATA_AXIS]:
        raise ValueError(
            f"batch {B} must divide the data axis ({mesh.shape[DATA_AXIS]})")


def spmd_decode_step(cfg: ModelConfig, mesh, params: LlamaParams,
                     tokens: jax.Array, pos: jax.Array,
                     cache: BatchedKVCache, *,
                     mm: Callable, mm_idx: Optional[Callable],
                     attn_bidx: Optional[Callable],
                     kv_writer: Optional[Callable] = None,
                     data_sharded: bool = False,
                     compute_dtype=jnp.bfloat16):
    """One batched decode token with the layer stack under shard_map.

    params must already be sharded per parallel/sharding.py; the cache per
    slot_cache_sharding.  Embedding gather and the classifier matmul run
    outside the shard_map (GSPMD handles the vocab sharding there)."""
    B = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    mp = mesh.shape[MODEL_AXIS]
    _check_dims(cfg, mesh, B, data_sharded)

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (B, D)
    cos, sin = rope_tables(cfg, pos, compute_dtype)

    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    da = DATA_AXIS if data_sharded else None
    slot_rows = P(da, None)                        # x, cos, sin
    slot_vec = P(da)                               # pos
    cache5 = P(None, da, MODEL_AXIS, None, None)
    cache4 = P(None, da, MODEL_AXIS, None)

    # pytree-PREFIX specs: one P covers every leaf of a QArray (data and
    # scales shard the same axis in both the col and row layouts)
    sc_spec = cache4 if cache.quantized else P()

    def body(x, cos, sin, pos_, attn_norm, ffn_norm, wq, wk, wv, wo, w1, w2,
             w3, ck, cv, ksc, vsc):
        """Runs per device on LOCAL shards: x (Blocal, D); wq local
        (L, D, Hq/mp); cache local (L, Blocal, n_kv/mp, S, hs)."""
        Bl = x.shape[0]
        n_heads_l = n_heads // mp
        n_kv_l = n_kv // mp
        L = cfg.n_layers

        def proj(h, w, l):
            if mm_idx is not None:
                return mm_idx(h, w, l)
            from fastllama_tpu.models.batched import _take_layer
            return mm(h, _take_layer(w, l))

        def scan_fn(x, layer):
            l, attn_norm_l, ffn_norm_l = layer
            h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
            q = proj(h, wq, l).reshape(Bl, n_heads_l, hs)
            k = proj(h, wk, l).reshape(Bl, n_kv_l, hs)
            v = proj(h, wv, l).reshape(Bl, n_kv_l, hs)
            q = apply_rope_half(q, cos[:, None], sin[:, None])
            k = apply_rope_half(k, cos[:, None], sin[:, None])

            local_cache = BatchedKVCache(ck, cv, ksc, vsc)
            if attn_bidx is not None:
                o = attn_bidx(q, local_cache, pos_, l, k, v)
            else:
                from fastllama_tpu.models.batched import _layer_slices
                ck_l, cv_l = _layer_slices(local_cache, l, compute_dtype)
                # the local cache shard may hold MORE slots than the step
                # decodes (multi-host sink slot past the serving range);
                # local row b addresses local slot b
                o = gqa_attention_decode_batched(q, ck_l[:Bl], cv_l[:Bl],
                                                 k, v, pos_)
            o = o.reshape(Bl, n_heads_l * hs)
            # row-parallel O projection: partial sums -> psum (the GSPMD
            # analogue of the reference's add-at-offset, transformer.cpp:465)
            x = x + jax.lax.psum(proj(o, wo, l), MODEL_AXIS)

            h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
            hd = swiglu(proj(h, w1, l), proj(h, w3, l))
            x = x + jax.lax.psum(proj(hd, w2, l), MODEL_AXIS)
            return x, (k, v)

        xs = (jnp.arange(L, dtype=jnp.int32), attn_norm, ffn_norm)
        x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)    # (L, Bl, n_kv_l, hs)

        if ksc is not None:
            kq, ks_ = quantize_rows(ks)
            vq, vs_ = quantize_rows(vs)
            ks2, vs2 = ks_[..., 0], vs_[..., 0]
        else:
            kq, vq = ks.astype(ck.dtype), vs.astype(cv.dtype)
            ks2 = vs2 = None
        if kv_writer is not None:
            # one in-place launch for the shard's whole slot range
            new = kv_writer(BatchedKVCache(ck, cv, ksc, vsc), kq, vq,
                            ks2, vs2, pos_)
            return x, new.k, new.v, new.k_scale, new.v_scale
        for b in range(Bl):
            ck = jax.lax.dynamic_update_slice(
                ck, kq[:, b][:, None, :, None], (0, b, 0, pos_[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[:, b][:, None, :, None], (0, b, 0, pos_[b], 0))
            if ksc is not None:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks2[:, b][:, None, :, None], (0, b, 0, pos_[b]))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs2[:, b][:, None, :, None], (0, b, 0, pos_[b]))
        return x, ck, cv, ksc, vsc

    in_specs = (slot_rows, slot_rows, slot_rows, slot_vec, P(), P(),
                col, col, col, row, col, row, col,
                cache5, cache5, sc_spec, sc_spec)
    out_specs = (slot_rows, cache5, cache5, sc_spec, sc_spec)
    fn = _shard_map(body, mesh, in_specs, out_specs)
    x, ck, cv, ksc, vsc = fn(
        x, cos, sin, pos, params.attn_norm, params.ffn_norm,
        params.wq, params.wk, params.wv, params.wo, params.w1, params.w2,
        params.w3, cache.k, cache.v, cache.k_scale, cache.v_scale)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    from fastllama_tpu.ops.qmatmul import qmatmul
    logits = qmatmul(x, params.classifier, compute_dtype)
    return logits.astype(jnp.float32), BatchedKVCache(ck, cv, ksc, vsc)


def spmd_spec_decode_step(cfg: ModelConfig, mesh, params: LlamaParams,
                          tokens: jax.Array, pos: jax.Array,
                          cache: BatchedKVCache, *,
                          mm: Callable, mm_idx: Optional[Callable],
                          attn_sbidx: Optional[Callable] = None,
                          spec_writer: Optional[Callable] = None,
                          data_sharded: bool = False,
                          compute_dtype=jnp.bfloat16):
    """Batched speculative VERIFY under shard_map — the spmd counterpart of
    models/batched.spec_decode_step (VERDICT r3 #1: the fastest loop must
    run on every shard, the reference's every-worker-hot-loop design,
    transformer.cpp:253-384).

    tokens (B, D) — slot b's D rows at absolute positions pos[b]..pos[b]+D-1;
    every matmul sees a (Bl*D, dim) LOCAL activation (weight stream amortized
    over the shard's slots exactly like the single-device path), attention is
    the per-shard flash_spec_batched over local slots + local kv heads, the
    D fresh rows land with one per-shard spec_write.  With ``data_sharded``
    the slot axis splits over 'data' (the multi-host layout; drafting stays
    OUTSIDE, it is slot-local jnp).  Returns (logits (B, D, vocab), cache).
    """
    B, D = tokens.shape
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    mp = mesh.shape[MODEL_AXIS]
    _check_dims(cfg, mesh, B, data_sharded)

    x = embed_tokens(params.embedding, tokens.reshape(B * D), compute_dtype)
    positions = pos[:, None] + jnp.arange(D, dtype=jnp.int32)[None]   # (B,D)
    cos, sin = rope_tables(cfg, positions.reshape(-1), compute_dtype)
    cos = cos.reshape(B, D, -1)
    sin = sin.reshape(B, D, -1)

    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    da = DATA_AXIS if data_sharded else None
    rows2 = P(da, None)                            # x: (B*D, dim) slot-major
    rows3 = P(da, None, None)                      # cos/sin: (B, D, hs/2)
    slot_vec = P(da)
    cache5 = P(None, da, MODEL_AXIS, None, None)
    cache4 = P(None, da, MODEL_AXIS, None)
    sc_spec = cache4 if cache.quantized else P()
    quant = cache.quantized

    def body(x, cos, sin, pos_, attn_norm, ffn_norm, wq, wk, wv, wo, w1, w2,
             w3, ck, cv, ksc, vsc):
        """Per shard: x (Bl*D, dim); cache local (L, Bl, n_kv/mp, S, hs)."""
        Bl = x.shape[0] // D
        n_heads_l = n_heads // mp
        n_kv_l = n_kv // mp

        def proj(h, w, l):
            if mm_idx is not None:
                return mm_idx(h, w, l)
            from fastllama_tpu.models.batched import _take_layer
            return mm(h, _take_layer(w, l))

        local_cache = BatchedKVCache(ck, cv, ksc, vsc)

        def scan_fn(x, layer):
            l, attn_norm_l, ffn_norm_l = layer
            h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
            q = proj(h, wq, l).reshape(Bl, D, n_heads_l, hs).transpose(
                0, 2, 1, 3)
            k = proj(h, wk, l).reshape(Bl, D, n_kv_l, hs).transpose(
                0, 2, 1, 3)
            v = proj(h, wv, l).reshape(Bl, D, n_kv_l, hs).transpose(
                0, 2, 1, 3)
            q = apply_rope_half(q, cos[:, None], sin[:, None])
            k = apply_rope_half(k, cos[:, None], sin[:, None])

            k_self = v_self = None
            if quant:
                # same quantize-roundtrip contract as spec_decode_step:
                # off-diagonal rows attend the int8-quantized values (what
                # sequential steps read back), the diagonal keeps the exact
                # row, and the scan outputs the quantized bytes so the
                # cache write is the SAME quantization
                from fastllama_tpu.quant.groupquant import dequantize_rows
                k_self, v_self = k, v
                kq_, ksc_ = quantize_rows(k)
                vq_, vsc_ = quantize_rows(v)
                k = dequantize_rows(kq_, ksc_, compute_dtype)
                v = dequantize_rows(vq_, vsc_, compute_dtype)
                out_kv = (kq_, vq_, ksc_[..., 0], vsc_[..., 0])
            else:
                out_kv = (k, v)

            o = attn_sbidx(q, local_cache, pos_, l, k, v, k_self=k_self,
                           v_self=v_self) if attn_sbidx is not None else None
            if o is None:                          # jnp fallback (CPU tests)
                from fastllama_tpu.models.batched import _layer_slices
                from fastllama_tpu.ops.attention import \
                    gqa_attention_spec_batched
                ck_l, cv_l = _layer_slices(local_cache, l, compute_dtype)
                o = gqa_attention_spec_batched(q, ck_l[:Bl], cv_l[:Bl], k, v,
                                               pos_, k_self=k_self,
                                               v_self=v_self)
            o = o.transpose(0, 2, 1, 3).reshape(Bl * D, n_heads_l * hs)
            x = x + jax.lax.psum(proj(o, wo, l), MODEL_AXIS)

            h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
            hd = swiglu(proj(h, w1, l), proj(h, w3, l))
            x = x + jax.lax.psum(proj(hd, w2, l), MODEL_AXIS)
            return x, out_kv

        xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32), attn_norm, ffn_norm)
        if quant:
            x, (kq, vq, ks2, vs2) = jax.lax.scan(scan_fn, x, xs)
        else:
            x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)  # (L,Bl,n_kv_l,D,hs)
            kq, vq = ks.astype(ck.dtype), vs.astype(cv.dtype)
            ks2 = vs2 = None
        if spec_writer is not None:
            new = spec_writer(BatchedKVCache(ck, cv, ksc, vsc), kq, vq,
                              ks2, vs2, pos_)
            return x, new.k, new.v, new.k_scale, new.v_scale
        for b in range(Bl):
            ck = jax.lax.dynamic_update_slice(
                ck, kq[:, b][:, None], (0, b, 0, pos_[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[:, b][:, None], (0, b, 0, pos_[b], 0))
            if quant:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks2[:, b][:, None], (0, b, 0, pos_[b]))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs2[:, b][:, None], (0, b, 0, pos_[b]))
        return x, ck, cv, ksc, vsc

    in_specs = (rows2, rows3, rows3, slot_vec, P(), P(),
                col, col, col, row, col, row, col,
                cache5, cache5, sc_spec, sc_spec)
    out_specs = (rows2, cache5, cache5, sc_spec, sc_spec)
    fn = _shard_map(body, mesh, in_specs, out_specs)
    x, ck, cv, ksc, vsc = fn(
        x, cos, sin, pos, params.attn_norm, params.ffn_norm,
        params.wq, params.wk, params.wv, params.wo, params.w1, params.w2,
        params.w3, cache.k, cache.v, cache.k_scale, cache.v_scale)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    from fastllama_tpu.ops.qmatmul import qmatmul
    logits = qmatmul(x, params.classifier, compute_dtype)
    return (logits.reshape(B, D, -1).astype(jnp.float32),
            BatchedKVCache(ck, cv, ksc, vsc))


def spmd_prefill_many(cfg: ModelConfig, mesh, params: LlamaParams,
                      tokens: jax.Array, lengths: jax.Array,
                      slots: jax.Array, cache: BatchedKVCache, *,
                      mm: Callable, mm_idx: Optional[Callable],
                      slot_writer: Optional[Callable] = None,
                      data_sharded: bool = False,
                      compute_dtype=jnp.bfloat16):
    """N same-bucket prompts prefilled under shard_map (the spmd counterpart
    of models/batched.prefill_many): block-diagonal attention over each
    prompt's own local-head K/V, per-layer psums after wo/w2, local-shard
    slot writes.  With ``data_sharded``, prompt n of each host's N/dp rows
    lands in that host's shard and ``slots`` holds DATA-SHARD-LOCAL slot
    ids.  Returns (last-token logits (N, vocab), cache)."""
    from fastllama_tpu.ops.attention import gqa_attention

    N, T = tokens.shape
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    mp = mesh.shape[MODEL_AXIS]
    _check_dims(cfg, mesh, N, data_sharded)

    x = embed_tokens(params.embedding, tokens.reshape(N * T), compute_dtype)
    cos, sin = rope_tables(cfg, jnp.arange(T, dtype=jnp.int32),
                           compute_dtype)

    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    rep = P()
    da = DATA_AXIS if data_sharded else None
    rows2 = P(da, None)                            # x: (N*T, D), host-major
    slot_vec = P(da)
    cache5 = P(None, da, MODEL_AXIS, None, None)
    cache4 = P(None, da, MODEL_AXIS, None)
    sc_spec = cache4 if cache.quantized else rep

    def body(x, cos, sin, slots_, attn_norm, ffn_norm, wq, wk, wv, wo, w1,
             w2, w3, ck, cv, ksc, vsc):
        Nl = x.shape[0] // T
        n_heads_l = n_heads // mp
        n_kv_l = n_kv // mp

        def proj(h, w, l):
            if mm_idx is not None:
                return mm_idx(h, w, l)
            from fastllama_tpu.models.batched import _take_layer
            return mm(h, _take_layer(w, l))

        def scan_fn(x, layer):
            l, attn_norm_l, ffn_norm_l = layer
            h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
            q = proj(h, wq, l).reshape(Nl, T, n_heads_l, hs).transpose(0, 2, 1, 3)
            k = proj(h, wk, l).reshape(Nl, T, n_kv_l, hs).transpose(0, 2, 1, 3)
            v = proj(h, wv, l).reshape(Nl, T, n_kv_l, hs).transpose(0, 2, 1, 3)
            q = apply_rope_half(q, cos[None, None], sin[None, None])
            k = apply_rope_half(k, cos[None, None], sin[None, None])

            o = jax.vmap(lambda qq, kk, vv: gqa_attention(qq, kk, vv, 0))(
                q, k, v)
            o = o.transpose(0, 2, 1, 3).reshape(Nl * T, n_heads_l * hs)
            x = x + jax.lax.psum(proj(o, wo, l), MODEL_AXIS)

            h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
            hd = swiglu(proj(h, w1, l), proj(h, w3, l))
            x = x + jax.lax.psum(proj(hd, w2, l), MODEL_AXIS)
            kv_dtype = compute_dtype if ksc is not None else ck.dtype
            return x, (k.astype(kv_dtype), v.astype(kv_dtype))

        xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32), attn_norm, ffn_norm)
        x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)  # (L, Nl, n_kv_l, T, hs)

        if ksc is not None:
            kq, ks_ = quantize_rows(ks)
            vq, vs_ = quantize_rows(vs)
            ks2, vs2 = ks_[..., 0], vs_[..., 0]
        else:
            kq, vq = ks, vs
            ks2 = vs2 = None
        if slot_writer is not None:
            new = slot_writer(BatchedKVCache(ck, cv, ksc, vsc), kq, vq,
                              ks2, vs2, slots_)
            return x, new.k, new.v, new.k_scale, new.v_scale
        for n in range(Nl):
            ck = jax.lax.dynamic_update_slice(
                ck, kq[:, n][:, None], (0, slots_[n], 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[:, n][:, None], (0, slots_[n], 0, 0, 0))
            if ksc is not None:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks2[:, n][:, None], (0, slots_[n], 0, 0))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs2[:, n][:, None], (0, slots_[n], 0, 0))
        return x, ck, cv, ksc, vsc

    in_specs = (rows2, rep, rep, slot_vec, rep, rep, col, col, col, row,
                col, row, col, cache5, cache5, sc_spec, sc_spec)
    out_specs = (rows2, cache5, cache5, sc_spec, sc_spec)
    fn = _shard_map(body, mesh, in_specs, out_specs)
    x, ck, cv, ksc, vsc = fn(
        x, cos, sin, slots, params.attn_norm, params.ffn_norm,
        params.wq, params.wk, params.wv, params.wo, params.w1, params.w2,
        params.w3, cache.k, cache.v, cache.k_scale, cache.v_scale)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps).reshape(N, T, -1)
    rows = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    from fastllama_tpu.ops.qmatmul import qmatmul
    logits = qmatmul(rows, params.classifier, compute_dtype)
    return logits.astype(jnp.float32), BatchedKVCache(ck, cv, ksc, vsc)


def spmd_prefill_tail(cfg: ModelConfig, mesh, params: LlamaParams,
                      tokens: jax.Array, length, slot, start,
                      cache: BatchedKVCache, *,
                      mm: Callable, mm_idx: Optional[Callable],
                      attn_tail: Optional[Callable] = None,
                      compute_dtype=jnp.bfloat16):
    """Mid-sequence single-slot prefill under shard_map — the prefix-cache
    tail path (models/batched.prefill_into_slot_at) expressed per shard so
    the fused kernels stay legal on a multi-device mesh (round-2's flagged
    hazard: the single-device Pallas tail under GSPMD compiles on the
    interpret-mode CPU mesh but cannot be auto-partitioned on hardware).

    tokens (T,) at positions [start, start+T) of ``slot``, attending the
    slot's existing rows [0, start) plus the causal fresh block.  Returns
    (last-valid-token logits (vocab,), cache)."""
    from fastllama_tpu.ops.attention import gqa_attention

    T = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    mp = mesh.shape[MODEL_AXIS]
    _check_dims(cfg, mesh, cache.k.shape[1], False)

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (T, D)
    positions = start + jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope_tables(cfg, positions, compute_dtype)

    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    rep = P()
    cache5 = P(None, None, MODEL_AXIS, None, None)
    cache4 = P(None, None, MODEL_AXIS, None)
    sc_spec = cache4 if cache.quantized else rep

    def body(x, cos, sin, slot_, start_, attn_norm, ffn_norm, wq, wk, wv,
             wo, w1, w2, w3, ck, cv, ksc, vsc):
        n_heads_l = n_heads // mp
        n_kv_l = n_kv // mp

        def proj(h, w, l):
            if mm_idx is not None:
                return mm_idx(h, w, l)
            from fastllama_tpu.models.batched import _take_layer
            return mm(h, _take_layer(w, l))

        local_cache = BatchedKVCache(ck, cv, ksc, vsc)

        def scan_fn(x, layer):
            l, attn_norm_l, ffn_norm_l = layer
            h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
            q = proj(h, wq, l).reshape(T, n_heads_l, hs).transpose(1, 0, 2)
            k = proj(h, wk, l).reshape(T, n_kv_l, hs).transpose(1, 0, 2)
            v = proj(h, wv, l).reshape(T, n_kv_l, hs).transpose(1, 0, 2)
            q = apply_rope_half(q, cos[None], sin[None])
            k = apply_rope_half(k, cos[None], sin[None])

            o = attn_tail(q, local_cache, slot_, l, start_, k, v) \
                if attn_tail is not None else None
            if o is None:
                from fastllama_tpu.models.batched import _layer_slices
                ck_l, cv_l = _layer_slices(local_cache, l, compute_dtype)
                ck_s = jax.lax.dynamic_index_in_dim(ck_l, slot_, 0,
                                                    keepdims=False)
                cv_s = jax.lax.dynamic_index_in_dim(cv_l, slot_, 0,
                                                    keepdims=False)
                kk = jax.lax.dynamic_update_slice(
                    ck_s.astype(compute_dtype), k, (0, start_, 0))
                vv = jax.lax.dynamic_update_slice(
                    cv_s.astype(compute_dtype), v, (0, start_, 0))
                o = gqa_attention(q, kk, vv, start_)
            o = o.transpose(1, 0, 2).reshape(T, n_heads_l * hs)
            x = x + jax.lax.psum(proj(o, wo, l), MODEL_AXIS)

            h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
            hd = swiglu(proj(h, w1, l), proj(h, w3, l))
            x = x + jax.lax.psum(proj(hd, w2, l), MODEL_AXIS)
            return x, (k, v)

        xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32), attn_norm, ffn_norm)
        x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)     # (L, n_kv_l, T, hs)

        if ksc is not None:
            kq, ks_ = quantize_rows(ks)
            vq, vs_ = quantize_rows(vs)
            ksc = jax.lax.dynamic_update_slice(
                ksc, ks_[..., 0][:, None], (0, slot_, 0, start_))
            vsc = jax.lax.dynamic_update_slice(
                vsc, vs_[..., 0][:, None], (0, slot_, 0, start_))
        else:
            kq, vq = ks.astype(ck.dtype), vs.astype(cv.dtype)
        ck = jax.lax.dynamic_update_slice(ck, kq[:, None],
                                          (0, slot_, 0, start_, 0))
        cv = jax.lax.dynamic_update_slice(cv, vq[:, None],
                                          (0, slot_, 0, start_, 0))
        return x, ck, cv, ksc, vsc

    in_specs = (rep, rep, rep, rep, rep, rep, rep, col, col, col, row,
                col, row, col, cache5, cache5, sc_spec, sc_spec)
    out_specs = (rep, cache5, cache5, sc_spec, sc_spec)
    fn = _shard_map(body, mesh, in_specs, out_specs)
    x, ck, cv, ksc, vsc = fn(
        x, cos, sin, jnp.asarray(slot, jnp.int32),
        jnp.asarray(start, jnp.int32), params.attn_norm, params.ffn_norm,
        params.wq, params.wk, params.wv, params.wo, params.w1, params.w2,
        params.w3, cache.k, cache.v, cache.k_scale, cache.v_scale)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    xl = jax.lax.dynamic_slice_in_dim(x, length - 1, 1, axis=0)
    from fastllama_tpu.ops.qmatmul import qmatmul
    logits = qmatmul(xl, params.classifier, compute_dtype)
    return logits[0].astype(jnp.float32), BatchedKVCache(ck, cv, ksc, vsc)


def spmd_prefill_tail_hits(cfg: ModelConfig, mesh, params: LlamaParams,
                           tokens: jax.Array, lengths: jax.Array,
                           slots: jax.Array, donors: jax.Array,
                           starts: jax.Array, cache: BatchedKVCache, *,
                           mm: Callable, mm_idx: Optional[Callable],
                           attn_tail: Optional[Callable] = None,
                           compute_dtype=jnp.bfloat16):
    """Up to k prefix-cache HITs per data shard, donor copies fused — the
    multi-host hit wave (runtime/multihost.py): every host admits its next
    k planned hits per collective call; hosts with fewer pass their sink
    slot with start=0 (VERDICT r3 Weak #4: a burst of N cache hits costs
    ceil(N/k) collectives, not N one-hit dispatches).

    tokens (H*k, TB) with H = the data-axis size, shard h owning rows
    [h*k, (h+1)*k); lengths/slots/donors/starts (H*k,) DATA-SHARD-LOCAL
    ids.  Each shard copies donor rows [0, start) into its slots on its
    LOCAL cache shard (host-local prefix reuse — a cross-host donor would
    need a DCN row copy, out of scope), then runs the TB-token tails at
    positions [start, start+TB), exactly the single-slot
    ``spmd_prefill_tail`` flow per hit (hits are independent: donors are
    live at plan time and never other hits of the same wave).  Returns
    (last-valid-token logits (H*k, vocab), cache)."""
    from fastllama_tpu.models.batched import copy_slot_prefix
    from fastllama_tpu.ops.attention import gqa_attention

    N, TB = tokens.shape
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    mp = mesh.shape[MODEL_AXIS]
    _check_dims(cfg, mesh, cache.k.shape[1], True)
    dp = mesh.shape[DATA_AXIS]
    if N % dp:
        raise ValueError(f"hit rows {N} must divide the data axis {dp}")
    k_hits = N // dp

    x = embed_tokens(params.embedding, tokens.reshape(N * TB),
                     compute_dtype).reshape(N, TB, -1)
    positions = starts[:, None] + jnp.arange(TB, dtype=jnp.int32)[None]
    cos, sin = rope_tables(cfg, positions.reshape(-1), compute_dtype)
    cos = cos.reshape(N, TB, -1)
    sin = sin.reshape(N, TB, -1)

    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    da_rows = P(DATA_AXIS, None, None)
    da_vec = P(DATA_AXIS)
    cache5 = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    cache4 = P(None, DATA_AXIS, MODEL_AXIS, None)
    sc_spec = cache4 if cache.quantized else P()

    def body(x, cos, sin, slot_a, donor_a, start_a, attn_norm, ffn_norm,
             wq, wk, wv, wo, w1, w2, w3, ck, cv, ksc, vsc):
        """Per (data, model) shard: x (k, TB, D); cache local
        (L, W, n_kv/mp, S, hs); slot/donor/start local (k,) vectors."""
        n_heads_l = n_heads // mp
        n_kv_l = n_kv // mp

        def proj(h, w, l):
            if mm_idx is not None:
                return mm_idx(h, w, l)
            from fastllama_tpu.models.batched import _take_layer
            return mm(h, _take_layer(w, l))

        def one_hit(x, cos_, sin_, slot_, donor_, start_, ck, cv, ksc, vsc):
            # donor rows [0, start) -> slot, on the local shard, fused into
            # this call (a separate copy dispatch costs a tunnel round-trip)
            pre = copy_slot_prefix(BatchedKVCache(ck, cv, ksc, vsc),
                                   donor_, slot_, start_)
            ck, cv, ksc, vsc = pre.k, pre.v, pre.k_scale, pre.v_scale
            local_cache = pre

            def scan_fn(x, layer):
                l, attn_norm_l, ffn_norm_l = layer
                h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
                q = proj(h, wq, l).reshape(TB, n_heads_l, hs).transpose(
                    1, 0, 2)
                k = proj(h, wk, l).reshape(TB, n_kv_l, hs).transpose(1, 0, 2)
                v = proj(h, wv, l).reshape(TB, n_kv_l, hs).transpose(1, 0, 2)
                q = apply_rope_half(q, cos_[None], sin_[None])
                k = apply_rope_half(k, cos_[None], sin_[None])

                o = attn_tail(q, local_cache, slot_, l, start_, k, v) \
                    if attn_tail is not None else None
                if o is None:
                    from fastllama_tpu.models.batched import _layer_slices
                    ck_l, cv_l = _layer_slices(local_cache, l, compute_dtype)
                    ck_s = jax.lax.dynamic_index_in_dim(ck_l, slot_, 0,
                                                        keepdims=False)
                    cv_s = jax.lax.dynamic_index_in_dim(cv_l, slot_, 0,
                                                        keepdims=False)
                    kk = jax.lax.dynamic_update_slice(
                        ck_s.astype(compute_dtype), k, (0, start_, 0))
                    vv = jax.lax.dynamic_update_slice(
                        cv_s.astype(compute_dtype), v, (0, start_, 0))
                    o = gqa_attention(q, kk, vv, start_)
                o = o.transpose(1, 0, 2).reshape(TB, n_heads_l * hs)
                x = x + jax.lax.psum(proj(o, wo, l), MODEL_AXIS)

                h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
                hd = swiglu(proj(h, w1, l), proj(h, w3, l))
                x = x + jax.lax.psum(proj(hd, w2, l), MODEL_AXIS)
                return x, (k, v)

            xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32), attn_norm,
                  ffn_norm)
            x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)  # (L, n_kv_l, TB, hs)

            if ksc is not None:
                kq, ks_ = quantize_rows(ks)
                vq, vs_ = quantize_rows(vs)
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks_[..., 0][:, None], (0, slot_, 0, start_))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs_[..., 0][:, None], (0, slot_, 0, start_))
            else:
                kq, vq = ks.astype(ck.dtype), vs.astype(cv.dtype)
            ck = jax.lax.dynamic_update_slice(ck, kq[:, None],
                                              (0, slot_, 0, start_, 0))
            cv = jax.lax.dynamic_update_slice(cv, vq[:, None],
                                              (0, slot_, 0, start_, 0))
            return x, ck, cv, ksc, vsc

        outs = []
        for i in range(k_hits):
            xi, ck, cv, ksc, vsc = one_hit(
                x[i], cos[i], sin[i], slot_a[i], donor_a[i], start_a[i],
                ck, cv, ksc, vsc)
            outs.append(xi)
        return jnp.stack(outs), ck, cv, ksc, vsc

    in_specs = (da_rows, da_rows, da_rows, da_vec, da_vec, da_vec,
                P(), P(), col, col, col, row, col, row, col,
                cache5, cache5, sc_spec, sc_spec)
    out_specs = (da_rows, cache5, cache5, sc_spec, sc_spec)
    fn = _shard_map(body, mesh, in_specs, out_specs)
    x, ck, cv, ksc, vsc = fn(
        x, cos, sin, slots.astype(jnp.int32), donors.astype(jnp.int32),
        starts.astype(jnp.int32), params.attn_norm, params.ffn_norm,
        params.wq, params.wk, params.wv, params.wo, params.w1, params.w2,
        params.w3, cache.k, cache.v, cache.k_scale, cache.v_scale)

    # classifier on each hit's last valid row (GSPMD handles vocab sharding)
    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    rows = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    from fastllama_tpu.ops.qmatmul import qmatmul
    logits = qmatmul(rows, params.classifier, compute_dtype)
    return logits.astype(jnp.float32), BatchedKVCache(ck, cv, ksc, vsc)
