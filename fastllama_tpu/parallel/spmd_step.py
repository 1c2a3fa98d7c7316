"""EXPERIMENTAL: decode step under shard_map with per-shard kernels.

The engines' mesh mode today relies on GSPMD auto-partitioning of the jnp
path — correct, but the fused Pallas kernels are single-device programs and
get disabled on a multi-device mesh.  This module is the round-2 direction
(NEXT.md #1): express the batched decode step explicitly per shard with
``shard_map``, so each device runs the SAME fused kernels on its local
weight/KV shards and the only collectives are the two per-layer ``psum``s
after the row-parallel projections (wo, w2) — exactly the schedule a
hand-written TP engine uses.

Sharding contract (matches parallel/sharding.py):
  wq/wk/wv/w1/w3  (L, I, Olocal)   col-parallel over 'model'
  wo/w2           (L, Ilocal, O)   row-parallel -> psum
  KV cache        (L, B, kvlocal, S, hs)
  norms, x        replicated; embedding/classifier vocab-sharded (the
  embed/classifier stay OUTSIDE the shard_map here: XLA handles a sharded
  gather/matmul well, and logits need a global argmax anyway)

Status: validated against the replicated decode_step on the virtual CPU
mesh (tests/test_spmd_step.py) with interpret-mode kernels; single-chip TPU
runs use the engines' normal path.  Wiring into BatchedEngine is round-2.
"""
from __future__ import annotations

from functools import partial
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
from fastllama_tpu.parallel.sharding import MODEL_AXIS
from fastllama_tpu.quant.groupquant import QArray, quantize_rows


def spmd_decode_step(cfg: ModelConfig, mesh, params: LlamaParams,
                     tokens: jax.Array, pos: jax.Array,
                     cache: BatchedKVCache, *,
                     mm: Callable, mm_idx: Optional[Callable],
                     attn_bidx: Optional[Callable],
                     compute_dtype=jnp.bfloat16):
    """One batched decode token with the layer stack under shard_map.

    params must already be sharded per parallel/sharding.py; the cache per
    slot_cache_sharding.  Embedding gather and the classifier matmul run
    outside the shard_map (GSPMD handles the vocab sharding there).
    """
    try:
        from jax import shard_map
    except ImportError:                            # older jax
        from jax.experimental.shard_map import shard_map

    B = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    mp = mesh.shape[MODEL_AXIS]
    if n_heads % mp or n_kv % mp or cfg.hidden_dim % mp:
        raise ValueError(f"heads/hidden must divide the model axis ({mp})")
    gs = cfg.group_size
    if (n_heads * hs // gs) % mp or (cfg.hidden_dim // gs) % mp:
        raise ValueError(
            f"row-parallel quant-group counts (I/gs) must divide the model "
            f"axis ({mp}); pad hidden/heads or shrink group_size")

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (B, D)
    cos, sin = rope_tables(cfg, pos, compute_dtype)

    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    rep = P()
    cache5 = P(None, None, MODEL_AXIS, None, None)
    cache4 = P(None, None, MODEL_AXIS, None)

    # pytree-PREFIX specs: one P covers every leaf of a QArray (data and
    # scales shard the same axis in both the col and row layouts)
    w_specs = dict(wq=col, wk=col, wv=col, wo=row, w1=col, w2=row, w3=col)
    sc_spec = cache4 if cache.quantized else rep

    def body(x, cos, sin, pos_, attn_norm, ffn_norm, wq, wk, wv, wo, w1, w2,
             w3, ck, cv, ksc, vsc):
        """Runs per device on LOCAL shards: x replicated (B, D); wq local
        (L, D, Hq/mp); cache local (L, B, n_kv/mp, S, hs)."""
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
            q = proj(h, wq, l).reshape(B, n_heads_l, hs)
            k = proj(h, wk, l).reshape(B, n_kv_l, hs)
            v = proj(h, wv, l).reshape(B, n_kv_l, hs)
            q = apply_rope_half(q, cos[:, None], sin[:, None])
            k = apply_rope_half(k, cos[:, None], sin[:, None])

            local_cache = BatchedKVCache(ck, cv, ksc, vsc)
            if attn_bidx is not None:
                o = attn_bidx(q, local_cache, pos_, l, k, v)
            else:
                from fastllama_tpu.models.batched import _layer_slices
                ck_l, cv_l = _layer_slices(local_cache, l, compute_dtype)
                o = gqa_attention_decode_batched(q, ck_l, cv_l, k, v, pos_)
            o = o.reshape(B, n_heads_l * hs)
            # row-parallel O projection: partial sums -> psum (the GSPMD
            # analogue of the reference's add-at-offset, transformer.cpp:465)
            x = x + jax.lax.psum(proj(o, wo, l), MODEL_AXIS)

            h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
            hd = swiglu(proj(h, w1, l), proj(h, w3, l))
            x = x + jax.lax.psum(proj(hd, w2, l), MODEL_AXIS)
            return x, (k, v)

        xs = (jnp.arange(L, dtype=jnp.int32), attn_norm, ffn_norm)
        x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)    # (L, B, n_kv_l, hs)

        if ksc is not None:
            kq, ks_ = quantize_rows(ks)
            vq, vs_ = quantize_rows(vs)
        else:
            kq, vq, ks_, vs_ = ks.astype(ck.dtype), vs.astype(cv.dtype), \
                None, None
        for b in range(B):
            ck = jax.lax.dynamic_update_slice(
                ck, kq[:, b][:, None, :, None], (0, b, 0, pos_[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[:, b][:, None, :, None], (0, b, 0, pos_[b], 0))
            if ksc is not None:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks_[..., 0][:, b][:, None, :, None],
                    (0, b, 0, pos_[b]))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs_[..., 0][:, b][:, None, :, None],
                    (0, b, 0, pos_[b]))
        return x, ck, cv, ksc, vsc

    in_specs = (rep, rep, rep, rep, rep, rep,
                w_specs["wq"], w_specs["wk"], w_specs["wv"], w_specs["wo"],
                w_specs["w1"], w_specs["w2"], w_specs["w3"],
                cache5, cache5, sc_spec, sc_spec)
    out_specs = (rep, cache5, cache5, sc_spec, sc_spec)
    try:
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except TypeError:                              # older shard_map API
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
    x, ck, cv, ksc, vsc = fn(
        x, cos, sin, pos, params.attn_norm, params.ffn_norm,
        params.wq, params.wk, params.wv, params.wo, params.w1, params.w2,
        params.w3, cache.k, cache.v, cache.k_scale, cache.v_scale)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    from fastllama_tpu.ops.qmatmul import qmatmul
    logits = qmatmul(x, params.classifier, compute_dtype)
    return logits.astype(jnp.float32), BatchedKVCache(ck, cv, ksc, vsc)


def spmd_prefill_many(cfg: ModelConfig, mesh, params: LlamaParams,
                      tokens: jax.Array, lengths: jax.Array,
                      slots: jax.Array, cache: BatchedKVCache, *,
                      mm: Callable, mm_idx: Optional[Callable],
                      compute_dtype=jnp.bfloat16):
    """N same-bucket prompts prefilled under shard_map (the spmd counterpart
    of models/batched.prefill_many): block-diagonal attention over each
    prompt's own local-head K/V, per-layer psums after wo/w2, local-shard
    slot writes.  Returns (last-token logits (N, vocab), cache)."""
    try:
        from jax import shard_map
    except ImportError:                            # older jax
        from jax.experimental.shard_map import shard_map
    from fastllama_tpu.ops.attention import gqa_attention

    N, T = tokens.shape
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    mp = mesh.shape[MODEL_AXIS]
    gs = cfg.group_size
    if n_heads % mp or n_kv % mp or cfg.hidden_dim % mp \
            or (n_heads * hs // gs) % mp or (cfg.hidden_dim // gs) % mp:
        raise ValueError(f"model dims must divide the model axis ({mp})")

    x = embed_tokens(params.embedding, tokens.reshape(N * T), compute_dtype)
    cos, sin = rope_tables(cfg, jnp.arange(T, dtype=jnp.int32),
                           compute_dtype)

    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    rep = P()
    cache5 = P(None, None, MODEL_AXIS, None, None)
    cache4 = P(None, None, MODEL_AXIS, None)
    sc_spec = cache4 if cache.quantized else rep

    def body(x, cos, sin, slots_, attn_norm, ffn_norm, wq, wk, wv, wo, w1,
             w2, w3, ck, cv, ksc, vsc):
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
            q = proj(h, wq, l).reshape(N, T, n_heads_l, hs).transpose(0, 2, 1, 3)
            k = proj(h, wk, l).reshape(N, T, n_kv_l, hs).transpose(0, 2, 1, 3)
            v = proj(h, wv, l).reshape(N, T, n_kv_l, hs).transpose(0, 2, 1, 3)
            q = apply_rope_half(q, cos[None, None], sin[None, None])
            k = apply_rope_half(k, cos[None, None], sin[None, None])

            o = jax.vmap(lambda qq, kk, vv: gqa_attention(qq, kk, vv, 0))(
                q, k, v)
            o = o.transpose(0, 2, 1, 3).reshape(N * T, n_heads_l * hs)
            x = x + jax.lax.psum(proj(o, wo, l), MODEL_AXIS)

            h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
            hd = swiglu(proj(h, w1, l), proj(h, w3, l))
            x = x + jax.lax.psum(proj(hd, w2, l), MODEL_AXIS)
            kv_dtype = compute_dtype if ksc is not None else ck.dtype
            return x, (k.astype(kv_dtype), v.astype(kv_dtype))

        xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32), attn_norm, ffn_norm)
        x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)  # (L, N, n_kv_l, T, hs)

        if ksc is not None:
            kq, ks_ = quantize_rows(ks)
            vq, vs_ = quantize_rows(vs)
        else:
            kq, vq, ks_, vs_ = ks, vs, None, None
        for n in range(N):
            ck = jax.lax.dynamic_update_slice(
                ck, kq[:, n][:, None], (0, slots_[n], 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[:, n][:, None], (0, slots_[n], 0, 0, 0))
            if ksc is not None:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks_[..., 0][:, n][:, None], (0, slots_[n], 0, 0))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs_[..., 0][:, n][:, None], (0, slots_[n], 0, 0))
        return x, ck, cv, ksc, vsc

    in_specs = (rep, rep, rep, rep, rep, rep, col, col, col, row, col, row,
                col, cache5, cache5, sc_spec, sc_spec)
    out_specs = (rep, cache5, cache5, sc_spec, sc_spec)
    try:
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except TypeError:
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
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
