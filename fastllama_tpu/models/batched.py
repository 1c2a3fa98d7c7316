"""Multi-sequence (slot-batched) LLaMA forward — the continuous-batching
substrate.

The reference engine is strictly single-stream (one prompt, one decode loop,
``transformer.cpp:76-103``); its "batch" is only the prompt length during
prefill.  On TPU, single-stream decode is HBM-bound streaming ~1-2 bytes per
weight per token, so the marginal cost of decoding B sequences in one step is
tiny until the KV-cache reads dominate — batching is the headroom the
hardware gives away.  This module adds:

* :class:`BatchedKVCache` — one preallocated ``(L, B, n_kv, S, hs)`` buffer;
  slot ``b`` is an independent sequence (the multi-slot analogue of the
  reference's per-thread caches, transformer.cpp:366-374).
* :func:`prefill_into_slot` — run a prompt through the model writing K/V into
  one slot starting at position 0.  Attention during prefill only sees the
  prompt's own fresh K/V (a new slot is always empty), so it never reads the
  big cache, and only the last valid token's logits row hits the classifier.
* :func:`decode_step` — one token for ALL slots at per-slot positions.

Both work with the same Pallas kernels as the single-stream path (matmuls
see a (B, dim) activation exactly like a (T, dim) prefill) plus a batched
decode-attention kernel (ops/pallas/attention.py) whose grid covers
(slot, kv-head) and reads per-slot positions from scalar prefetch.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from fastllama_tpu.config import ModelConfig
from fastllama_tpu.models.llama import LlamaParams, embed_tokens
from fastllama_tpu.ops.attention import gqa_attention, gqa_attention_batched
from fastllama_tpu.ops.norms import rmsnorm, swiglu
from fastllama_tpu.ops.qmatmul import qmatmul
from fastllama_tpu.ops.rope import apply_rope_half, rope_tables
from fastllama_tpu.quant.groupquant import QArray


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchedKVCache:
    """(L, B, n_kv, max_seq, head_size) per array; slot = independent stream.

    ``dtype='int8'``: rows stored int8 with per-row fp32 scales
    (``k_scale``/``v_scale``, shape (L, B, n_kv, max_seq) — NO trailing
    singleton: a (..., S, 1) layout would lane-pad 128x on TPU, turning
    33 MB of scales into 4.2 GB) — half the footprint and HBM traffic of
    bf16, so twice the slots fit (quantize_rows at write, dequant inside
    the attention kernels, applied lane-wise to scores)."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(cfg: ModelConfig, batch_size: int,
               max_seq_len: Optional[int] = None,
               dtype=jnp.float32) -> "BatchedKVCache":
        S = max_seq_len or cfg.max_seq_len
        shape = (cfg.n_layers, batch_size, cfg.n_kv_heads, S, cfg.head_size)
        if jnp.dtype(dtype) == jnp.int8:
            sshape = shape[:-1]
            return BatchedKVCache(jnp.zeros(shape, jnp.int8),
                                  jnp.zeros(shape, jnp.int8),
                                  jnp.ones(sshape, jnp.float32),
                                  jnp.ones(sshape, jnp.float32))
        return BatchedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def _take_layer(w, l):
    """Fallback layer indexing of a stacked weight (dynamic-slice copy) —
    only used when no layer-indexed Pallas kernel is active (CPU tests).
    QArray.__getitem__ preserves the static flags (qtype/packed/...)."""
    return w[l]


def _split_qkv(cfg: ModelConfig, params: LlamaParams, proj, h, l):
    """QKV projection (fused or separate) → q, k, v as flat feature rows."""
    qdim, kvdim = cfg.n_heads * cfg.head_size, cfg.kv_dim
    if params.wk is None:                      # fused QKV (fuse_params)
        qkv = proj(h, params.wq, l)
        return (qkv[:, :qdim], qkv[:, qdim:qdim + kvdim],
                qkv[:, qdim + kvdim:])
    return proj(h, params.wq, l), proj(h, params.wk, l), proj(h, params.wv, l)


def _ffn(cfg: ModelConfig, params: LlamaParams, proj, h, l):
    hdim = cfg.hidden_dim
    if params.w3 is None:                      # fused gate|up
        g13 = proj(h, params.w1, l)
        hd = swiglu(g13[:, :hdim], g13[:, hdim:])
    else:
        hd = swiglu(proj(h, params.w1, l), proj(h, params.w3, l))
    return proj(hd, params.w2, l)


def _make_proj(mm: Callable, mm_idx: Optional[Callable], compute_dtype):
    if mm_idx is not None:
        return mm_idx
    return lambda h, w, l: mm(h, _take_layer(w, l))


def _decode_layer_qkv(cfg: ModelConfig, params: LlamaParams, proj,
                      x, l, attn_norm_l, cos, sin):
    """Shared decode-layer front half (decode_step AND
    decode_step_deferred — one body so the two paths cannot drift): norm →
    QKV projection → per-head reshape → rope.  x (B, dim); returns
    q (B, H, hs), k/v (B, n_kv, hs) roped."""
    B = x.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
    q, k, v = _split_qkv(cfg, params, proj, h, l)
    q = q.reshape(B, n_heads, hs)
    k = k.reshape(B, n_kv, hs)
    v = v.reshape(B, n_kv, hs)
    q = apply_rope_half(q, cos[:, None], sin[:, None])
    k = apply_rope_half(k, cos[:, None], sin[:, None])
    return q, k, v


def _decode_layer_tail(cfg: ModelConfig, params: LlamaParams, proj,
                       x, o, l, ffn_norm_l):
    """Shared decode-layer back half: attention-output projection +
    residual, then the FFN block.  o (B, H*hs) flat."""
    x = x + proj(o, params.wo, l)
    h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
    return x + _ffn(cfg, params, proj, h, l)


def _write_slot(cache: "BatchedKVCache", ks: jax.Array, vs: jax.Array,
                slot) -> "BatchedKVCache":
    """Write (L, n_kv, T, hs) fresh K/V rows into slot ``slot`` at positions
    [0, T), quantizing rows when the cache is int8."""
    from fastllama_tpu.quant.groupquant import quantize_rows
    if cache.quantized:
        kq, ksc = quantize_rows(ks)                  # scales (L, n_kv, T, 1)
        vq, vsc = quantize_rows(vs)
        return BatchedKVCache(
            jax.lax.dynamic_update_slice(cache.k, kq[:, None],
                                         (0, slot, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cache.v, vq[:, None],
                                         (0, slot, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cache.k_scale, ksc[..., 0][:, None],
                                         (0, slot, 0, 0)),
            jax.lax.dynamic_update_slice(cache.v_scale, vsc[..., 0][:, None],
                                         (0, slot, 0, 0)))
    return BatchedKVCache(
        jax.lax.dynamic_update_slice(cache.k, ks[:, None].astype(cache.k.dtype),
                                     (0, slot, 0, 0, 0)),
        jax.lax.dynamic_update_slice(cache.v, vs[:, None].astype(cache.v.dtype),
                                     (0, slot, 0, 0, 0)))


def _layer_slices(cache: "BatchedKVCache", l, compute_dtype):
    """Dequantized (B, n_kv, S, hs) K/V slices of layer ``l`` — the jnp
    fallback read path (a copy; the Pallas kernels read in place)."""
    from fastllama_tpu.quant.groupquant import dequantize_rows
    ck = jax.lax.dynamic_index_in_dim(cache.k, l, 0, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(cache.v, l, 0, keepdims=False)
    if cache.quantized:
        ks = jax.lax.dynamic_index_in_dim(cache.k_scale, l, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(cache.v_scale, l, 0, keepdims=False)
        return (dequantize_rows(ck, ks[..., None], compute_dtype),
                dequantize_rows(cv, vs[..., None], compute_dtype))
    return ck, cv


def prefill_into_slot(cfg: ModelConfig, params: LlamaParams,
                      tokens: jax.Array, length, slot,
                      cache: BatchedKVCache, *,
                      mm: Callable = qmatmul,
                      mm_idx: Optional[Callable] = None,
                      compute_dtype=jnp.float32
                      ) -> Tuple[jax.Array, BatchedKVCache]:
    """Prefill ``tokens`` (T,) into cache slot ``slot`` at positions [0, T).

    ``length``/``slot`` are traced scalars (no recompile per slot).  Rows
    >= length are padding; causality keeps them out of earlier rows' results
    and their K/V rows are written but masked by future decode steps (slot
    position = length).  Returns (last-valid-token logits (vocab,), cache).
    """
    T = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    proj = _make_proj(mm, mm_idx, compute_dtype)

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (T, dim)
    cos, sin = rope_tables(cfg, jnp.arange(T, dtype=jnp.int32),
                           compute_dtype)

    # K/V leave the scan as OUTPUTS (tiny (L, n_kv, T, hs) stacks) and hit
    # the big cache in ONE slice-update afterwards.  Carrying the cache
    # through the scan with per-layer updates defeats XLA's in-place
    # analysis — it copied the full cache every layer (measured 165 ms for
    # a 64-token 7B prefill vs ~4 ms this way).
    kv_dtype = cache.k.dtype if not cache.quantized else compute_dtype

    def scan_fn(x, layer):
        l, attn_norm_l, ffn_norm_l = layer

        h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
        q, k, v = _split_qkv(cfg, params, proj, h, l)
        q = q.reshape(T, n_heads, hs).transpose(1, 0, 2)
        k = k.reshape(T, n_kv, hs).transpose(1, 0, 2)
        v = v.reshape(T, n_kv, hs).transpose(1, 0, 2)
        q = apply_rope_half(q, cos[None], sin[None])
        k = apply_rope_half(k, cos[None], sin[None])

        # a fresh slot is empty: attend over the prompt's own K/V only
        o = gqa_attention(q, k, v, 0)
        o = o.transpose(1, 0, 2).reshape(T, n_heads * hs)
        x = x + proj(o, params.wo, l)

        h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
        x = x + _ffn(cfg, params, proj, h, l)
        return x, (k.astype(kv_dtype), v.astype(kv_dtype))

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)      # (L, n_kv, T, hs)
    new_cache = _write_slot(cache, ks, vs, slot)

    # classifier only on the last valid row (transformer.cpp:140-142)
    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    xl = jax.lax.dynamic_slice_in_dim(x, length - 1, 1, axis=0)     # (1, dim)
    logits = mm(xl, params.classifier)                              # (1, V)
    return logits[0].astype(jnp.float32), new_cache


def prefill_into_slot_at(cfg: ModelConfig, params: LlamaParams,
                         tokens: jax.Array, length, slot, start,
                         cache: BatchedKVCache, *,
                         mm: Callable = qmatmul,
                         mm_idx: Optional[Callable] = None,
                         attn_tail: Optional[Callable] = None,
                         compute_dtype=jnp.float32
                         ) -> Tuple[jax.Array, BatchedKVCache]:
    """Mid-sequence slot prefill: run ``tokens`` (T,) at positions
    [start, start+T) of slot ``slot``, attending the slot's EXISTING cache
    rows [0, start) plus the block's own causal K/V — the tail-prefill
    primitive behind prefix caching (rows [0, start) were copied from a
    donor slot sharing the prompt prefix).

    ``length``/``slot``/``start`` are traced.  Rows >= length are padding
    (masked by later steps; the caller must only pad the FINAL block).
    Returns (last-valid-token logits (vocab,), cache)."""
    T = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    proj = _make_proj(mm, mm_idx, compute_dtype)

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (T, dim)
    positions = start + jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope_tables(cfg, positions, compute_dtype)

    def scan_fn(x, layer):
        l, attn_norm_l, ffn_norm_l = layer

        h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
        q, k, v = _split_qkv(cfg, params, proj, h, l)
        q = q.reshape(T, n_heads, hs).transpose(1, 0, 2)
        k = k.reshape(T, n_kv, hs).transpose(1, 0, 2)
        v = v.reshape(T, n_kv, hs).transpose(1, 0, 2)
        q = apply_rope_half(q, cos[None], sin[None])
        k = apply_rope_half(k, cos[None], sin[None])

        # attend the slot's existing rows + this block.  Fast path: the
        # bounded-window T-row kernel reads cache rows [0, start) in place
        # and merges the causal fresh block (ops/pallas/flash_decode.py).
        # Fallback: place the fresh rows into a COPY of the layer's slot
        # slice at [start, start+T) and run position-masked attention at
        # pos=start (the copy is per-layer scratch, not the carried cache
        # — no aliasing).
        o = attn_tail(q, cache, slot, l, start, k, v) \
            if attn_tail is not None else None
        if o is None:
            ck_l, cv_l = _layer_slices(cache, l, compute_dtype)
            ck_s = jax.lax.dynamic_index_in_dim(ck_l, slot, 0, keepdims=False)
            cv_s = jax.lax.dynamic_index_in_dim(cv_l, slot, 0, keepdims=False)
            kk = jax.lax.dynamic_update_slice(      # k is (n_kv, T, hs)
                ck_s.astype(compute_dtype), k, (0, start, 0))
            vv = jax.lax.dynamic_update_slice(
                cv_s.astype(compute_dtype), v, (0, start, 0))
            o = gqa_attention(q, kk, vv, start)
        o = o.transpose(1, 0, 2).reshape(T, n_heads * hs)
        x = x + proj(o, params.wo, l)

        h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
        x = x + _ffn(cfg, params, proj, h, l)
        return x, (k, v)

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)      # (L, n_kv, T, hs)

    from fastllama_tpu.quant.groupquant import quantize_rows
    ck, cv, ksc, vsc = cache.k, cache.v, cache.k_scale, cache.v_scale
    if cache.quantized:
        kq, ks_ = quantize_rows(ks)
        vq, vs_ = quantize_rows(vs)
        ksc = jax.lax.dynamic_update_slice(
            ksc, ks_[..., 0][:, None], (0, slot, 0, start))
        vsc = jax.lax.dynamic_update_slice(
            vsc, vs_[..., 0][:, None], (0, slot, 0, start))
    else:
        kq, vq = ks.astype(ck.dtype), vs.astype(cv.dtype)
    ck = jax.lax.dynamic_update_slice(ck, kq[:, None], (0, slot, 0, start, 0))
    cv = jax.lax.dynamic_update_slice(cv, vq[:, None], (0, slot, 0, start, 0))
    new_cache = BatchedKVCache(ck, cv, ksc, vsc)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    xl = jax.lax.dynamic_slice_in_dim(x, length - 1, 1, axis=0)
    logits = mm(xl, params.classifier)
    return logits[0].astype(jnp.float32), new_cache


def copy_slot_prefix(cache: BatchedKVCache, src, dst, n_rows
                     ) -> BatchedKVCache:
    """Device-side K/V row copy: slot ``dst`` rows [0, n_rows) :=
    slot ``src`` rows [0, n_rows) (all layers/heads) — the prefix-cache hit
    path.  ``src``/``dst``/``n_rows`` are traced; rows are selected by mask
    so one compiled program serves every prefix length."""
    S = cache.k.shape[3]
    keep = (jnp.arange(S, dtype=jnp.int32) < n_rows)      # (S,)

    def blend(arr, row_axis):
        src_rows = jax.lax.dynamic_index_in_dim(arr, src, 1, keepdims=True)
        dst_rows = jax.lax.dynamic_index_in_dim(arr, dst, 1, keepdims=True)
        shape = [1] * arr.ndim
        shape[row_axis] = S
        m = keep.reshape(shape)
        return jax.lax.dynamic_update_slice_in_dim(
            arr, jnp.where(m, src_rows, dst_rows), dst, axis=1)

    ck = blend(cache.k, 3)
    cv = blend(cache.v, 3)
    ksc = blend(cache.k_scale, 3) if cache.quantized else None
    vsc = blend(cache.v_scale, 3) if cache.quantized else None
    return BatchedKVCache(ck, cv, ksc, vsc)


def prefill_many(cfg: ModelConfig, params: LlamaParams,
                 tokens: jax.Array, lengths: jax.Array, slots: jax.Array,
                 cache: BatchedKVCache, *,
                 mm: Callable = qmatmul,
                 mm_idx: Optional[Callable] = None,
                 slot_writer: Optional[Callable] = None,
                 compute_dtype=jnp.float32
                 ) -> Tuple[jax.Array, BatchedKVCache]:
    """Prefill N prompts into N slots in ONE device call.

    tokens (N, T) at positions [0, T) per slot; lengths/slots (N,) traced.
    Matmuls see a (N*T, dim) activation (N times the MXU work per weight
    read — admission cost amortizes); attention is block-diagonal (each
    prompt attends itself only).  Duplicate slot ids are allowed when the
    caller pads N to a bucket by repeating a request: later writes simply
    overwrite identical rows.  Returns (last-token logits (N, vocab), cache).
    """
    N, T = tokens.shape
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    proj = _make_proj(mm, mm_idx, compute_dtype)

    x = embed_tokens(params.embedding, tokens.reshape(N * T),
                     compute_dtype)                       # (N*T, dim)
    cos, sin = rope_tables(cfg, jnp.arange(T, dtype=jnp.int32),
                           compute_dtype)
    kv_dtype = cache.k.dtype if not cache.quantized else compute_dtype

    def scan_fn(x, layer):
        l, attn_norm_l, ffn_norm_l = layer

        h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
        q, k, v = _split_qkv(cfg, params, proj, h, l)
        q = q.reshape(N, T, n_heads, hs).transpose(0, 2, 1, 3)
        k = k.reshape(N, T, n_kv, hs).transpose(0, 2, 1, 3)
        v = v.reshape(N, T, n_kv, hs).transpose(0, 2, 1, 3)
        q = apply_rope_half(q, cos[None, None], sin[None, None])
        k = apply_rope_half(k, cos[None, None], sin[None, None])

        # block-diagonal attention: each prompt over its own fresh K/V
        o = jax.vmap(lambda qq, kk, vv: gqa_attention(qq, kk, vv, 0))(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(N * T, n_heads * hs)
        x = x + proj(o, params.wo, l)

        h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
        x = x + _ffn(cfg, params, proj, h, l)
        return x, (k.astype(kv_dtype), v.astype(kv_dtype))

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)    # (L, N, n_kv, T, hs)

    if slot_writer is not None:
        # all N prompts' stacks land in ONE in-place kernel launch
        # (ops/pallas/kv_write.py) instead of 4·N slab updates
        from fastllama_tpu.quant.groupquant import quantize_rows
        if cache.quantized:
            kq, ks_ = quantize_rows(ks)
            vq, vs_ = quantize_rows(vs)
            new_cache = slot_writer(cache, kq, vq, ks_[..., 0], vs_[..., 0],
                                    slots)
        else:
            new_cache = slot_writer(cache, ks.astype(cache.k.dtype),
                                    vs.astype(cache.v.dtype), None, None,
                                    slots)
    else:
        new_cache = cache
        for n in range(N):
            new_cache = _write_slot(new_cache, ks[:, n], vs[:, n], slots[n])

    # classifier on each prompt's last valid row only
    x = rmsnorm(x, params.out_norm, cfg.norm_eps).reshape(N, T, -1)
    rows = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits = mm(rows, params.classifier)                  # (N, V)
    return logits.astype(jnp.float32), new_cache


def spec_decode_step(cfg: ModelConfig, params: LlamaParams,
                     tokens: jax.Array, pos: jax.Array,
                     cache: BatchedKVCache, *,
                     mm: Callable = qmatmul,
                     mm_idx: Optional[Callable] = None,
                     attn_sbidx: Optional[Callable] = None,
                     spec_writer: Optional[Callable] = None,
                     compute_dtype=jnp.float32
                     ) -> Tuple[jax.Array, BatchedKVCache]:
    """Batched speculative VERIFY: D tokens for every slot in one forward.

    tokens (B, D) — slot b's rows sit at absolute positions
    pos[b]..pos[b]+D-1 (row 0 is the slot's pending token, rows 1.. are its
    drafts); returns logits (B, D, vocab) — the target's prediction after
    each row — and the cache with the D fresh K/V rows written per slot
    (rows past the accepted prefix are stale and masked by position,
    exactly like the single-stream speculative engine's rounds).

    The matmuls see a (B*D, dim) activation — the weight stream is
    amortized over B*D rows, which is the whole point: at acceptance
    ``a`` each accepted token costs 1/(1+a) of a decode step's HBM
    traffic.  No reference analogue (one forward per token,
    transformer.cpp:92-101).
    """
    from fastllama_tpu.quant.groupquant import quantize_rows
    B, D = tokens.shape
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    proj = _make_proj(mm, mm_idx, compute_dtype)

    x = embed_tokens(params.embedding, tokens.reshape(B * D), compute_dtype)
    positions = pos[:, None] + jnp.arange(D, dtype=jnp.int32)[None]  # (B,D)
    cos, sin = rope_tables(cfg, positions.reshape(-1), compute_dtype)
    cos = cos.reshape(B, D, -1)
    sin = sin.reshape(B, D, -1)

    def scan_fn(x, layer):
        l, attn_norm_l, ffn_norm_l = layer

        h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
        q, k, v = _split_qkv(cfg, params, proj, h, l)
        q = q.reshape(B, D, n_heads, hs).transpose(0, 2, 1, 3)
        k = k.reshape(B, D, n_kv, hs).transpose(0, 2, 1, 3)
        v = v.reshape(B, D, n_kv, hs).transpose(0, 2, 1, 3)
        q = apply_rope_half(q, cos[:, None], sin[:, None])
        k = apply_rope_half(k, cos[:, None], sin[:, None])

        k_self = v_self = None
        if cache.quantized:
            # round-trip fresh rows through the cache quantizer BEFORE
            # attention: verify row d attends row d' < d exactly as the
            # sequential decode steps would (which read d' from the int8
            # cache), while the DIAGONAL keeps the exact row (sequential
            # attends its own fresh row pre-quantization).  The scan
            # outputs the quantized bytes themselves so the cache write is
            # the SAME quantization, not a re-quantization.
            from fastllama_tpu.quant.groupquant import dequantize_rows
            k_self, v_self = k, v
            kq_, ksc_ = quantize_rows(k)
            vq_, vsc_ = quantize_rows(v)
            k = dequantize_rows(kq_, ksc_, compute_dtype)
            v = dequantize_rows(vq_, vsc_, compute_dtype)
            out_kv = (kq_, vq_, ksc_[..., 0], vsc_[..., 0])
        else:
            out_kv = None

        o = attn_sbidx(q, cache, pos, l, k, v, k_self=k_self,
                       v_self=v_self) if attn_sbidx is not None else None
        if o is None:                              # jnp fallback
            from fastllama_tpu.ops.attention import gqa_attention_spec_batched
            ck_l, cv_l = _layer_slices(cache, l, compute_dtype)
            # the cache may carry MORE slots than the verify covers (the
            # multi-host engine's sink slot sits past the serving slots);
            # row b always addresses cache slot b
            o = gqa_attention_spec_batched(q, ck_l[:B], cv_l[:B], k, v, pos,
                                           k_self=k_self, v_self=v_self)
        o = o.transpose(0, 2, 1, 3).reshape(B * D, n_heads * hs)
        x = x + proj(o, params.wo, l)

        h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
        x = x + _ffn(cfg, params, proj, h, l)
        return x, (out_kv if out_kv is not None else (k, v))

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    if cache.quantized:
        x, (kq, vq, ks2, vs2) = jax.lax.scan(scan_fn, x, xs)
    else:
        x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)  # (L, B, n_kv, D, hs)
        kq, vq = ks.astype(cache.k.dtype), vs.astype(cache.v.dtype)
        ks2 = vs2 = None
    if spec_writer is not None:
        new_cache = spec_writer(cache, kq, vq, ks2, vs2, pos)
    else:
        ck, cv = cache.k, cache.v
        ksc, vsc = cache.k_scale, cache.v_scale
        for b in range(B):
            ck = jax.lax.dynamic_update_slice(
                ck, kq[:, b][:, None], (0, b, 0, pos[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[:, b][:, None], (0, b, 0, pos[b], 0))
            if cache.quantized:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks2[:, b][:, None], (0, b, 0, pos[b]))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs2[:, b][:, None], (0, b, 0, pos[b]))
        new_cache = BatchedKVCache(ck, cv, ksc, vsc)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    logits = mm(x, params.classifier)                    # (B*D, V)
    return logits.reshape(B, D, -1).astype(jnp.float32), new_cache


def decode_step(cfg: ModelConfig, params: LlamaParams, tokens: jax.Array,
                pos: jax.Array, cache: BatchedKVCache, *,
                mm: Callable = qmatmul,
                mm_idx: Optional[Callable] = None,
                attn_bidx: Optional[Callable] = None,
                kv_writer: Optional[Callable] = None,
                compute_dtype=jnp.float32
                ) -> Tuple[jax.Array, BatchedKVCache]:
    """One decode token for every slot: tokens (B,) at per-slot positions
    pos (B,).  Returns (logits (B, vocab), cache).

    Cache writes are DEFERRED: attention reads cache rows [0, pos[b])
    STRICTLY plus the fresh K/V row passed straight into the kernel, and
    every layer's new rows leave the scan as outputs, landing in the cache
    with B slab-updates after the scan.  Writing inside the scan was the
    dominant decode cost: a python loop of 2B dynamic_update_slices per
    layer measured 18 ms/step at B=24 on v5e (kernel-launch bound), and a
    one-scatter-per-layer variant made XLA copy the whole cache (HBM OOM).

    ``attn_bidx(q, cache, pos, l, k_new, v_new)`` is the batched
    layer-indexed decode attention (Pallas over the full stacked cache,
    int8-dequant in VMEM when quantized); the jnp fallback slices +
    dequantizes layer ``l`` (a copy — test path only).
    """
    from fastllama_tpu.quant.groupquant import quantize_rows
    B = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    proj = _make_proj(mm, mm_idx, compute_dtype)

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (B, dim)
    cos, sin = rope_tables(cfg, pos, compute_dtype)      # (B, hs/2)

    def scan_fn(x, layer):
        l, attn_norm_l, ffn_norm_l = layer
        q, k, v = _decode_layer_qkv(cfg, params, proj, x, l, attn_norm_l,
                                    cos, sin)
        if attn_bidx is not None:
            o = attn_bidx(q, cache, pos, l, k, v)            # (B, H, hs)
        else:
            from fastllama_tpu.ops.attention import \
                gqa_attention_decode_batched
            ck_l, cv_l = _layer_slices(cache, l, compute_dtype)
            # the cache may carry MORE slots than the step decodes (the
            # multi-host engine's sink slot sits past the serving slots so
            # serve_w stays divisible for the flash kernel's slot blocks);
            # row b always addresses cache slot b
            o = gqa_attention_decode_batched(q, ck_l[:B], cv_l[:B], k, v,
                                             pos)
        x = _decode_layer_tail(cfg, params, proj, x,
                               o.reshape(B, n_heads * hs), l, ffn_norm_l)
        return x, (k, v)

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)      # (L, B, n_kv, hs)

    # land all layers' new rows
    if cache.quantized:
        kq, ks_ = quantize_rows(ks)                 # (L, B, n_kv, hs/1)
        vq, vs_ = quantize_rows(vs)
        ks2, vs2 = ks_[..., 0], vs_[..., 0]
    else:
        kq, vq = ks.astype(cache.k.dtype), vs.astype(cache.v.dtype)
        ks2 = vs2 = None
    if kv_writer is not None:
        # one in-place kernel launch for every slot (ops/pallas/kv_write.py)
        new_cache = kv_writer(cache, kq, vq, ks2, vs2, pos)
    else:
        # fallback: B slab updates of (L, 1, n_kv, 1, hs)
        ck, cv = cache.k, cache.v
        ksc, vsc = cache.k_scale, cache.v_scale
        for b in range(B):
            ck = jax.lax.dynamic_update_slice(
                ck, kq[:, b][:, None, :, None], (0, b, 0, pos[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[:, b][:, None, :, None], (0, b, 0, pos[b], 0))
            if cache.quantized:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks2[:, b][:, None, :, None], (0, b, 0, pos[b]))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs2[:, b][:, None, :, None], (0, b, 0, pos[b]))
        new_cache = BatchedKVCache(ck, cv, ksc, vsc)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    logits = mm(x, params.classifier)                               # (B, V)
    return logits.astype(jnp.float32), new_cache


def make_staged(cfg: ModelConfig, cache: BatchedKVCache, B: int, K: int):
    """Empty staging buffers for a K-step deferred decode chunk.

    Layout (L, B, K, n_kv, hs): the per-step update slice
    ``staged[:, :, s]`` covers the FULL trailing (n_kv, hs) tile, so XLA
    writes exactly the fresh bytes in place — no sublane read-modify-write.
    The cache layout (L, B, n_kv, S, hs) can't do that: its int8 sublane
    tiling (32 rows/slab) makes any single-row write rewrite a whole slab
    per slot per layer — measured ~1.5 ms/step of pure slab traffic at
    serving batch (the motivation: amortize it to ONE spec_write landing
    per chunk; NEXT.md round-4 #4)."""
    L, hs, n_kv = cfg.n_layers, cfg.head_size, cfg.n_kv_heads
    sk = jnp.zeros((L, B, K, n_kv, hs), cache.k.dtype)
    sv = jnp.zeros((L, B, K, n_kv, hs), cache.v.dtype)
    if cache.quantized:
        return (sk, sv,
                jnp.zeros((L, B, K, n_kv), cache.k_scale.dtype),
                jnp.zeros((L, B, K, n_kv), cache.v_scale.dtype))
    return (sk, sv)


def land_staged(cache: BatchedKVCache, staged, pos0: jax.Array,
                spec_writer: Callable) -> BatchedKVCache:
    """Land a chunk's staged rows: slot b's K rows go to cache positions
    [pos0[b], pos0[b]+K) via spec_write launches of at most 8 rows each
    (all inside the chunk's jit — no extra dispatches).  D=8 is the
    measured-safe spec_write shape: the kernel blends one fresh row per
    unrolled step, and a D=16 unroll blew Mosaic's 16 MB scoped-vmem STACK
    at 7B/110m shapes (22 MB of live slab temporaries).  Each landing
    read-modify-writes at most two slabs per slot per layer, so a K-step
    chunk pays ~K/4 slab passes total vs K*1 for per-step writes.  The
    transposes to the writer's (L, B, n_kv, D, hs) layout are contiguous
    passes over the small staging buffers (~6 MB/step amortized at B=48)."""
    if cache.quantized:
        sk, sv, sks, svs = staged
    else:
        sk, sv = staged
        sks = svs = None
    K = sk.shape[2]
    D0 = min(8, K)
    for i in range(0, K, D0):
        d = min(D0, K - i)
        cache = spec_writer(
            cache,
            sk[:, :, i:i + d].transpose(0, 1, 3, 2, 4),
            sv[:, :, i:i + d].transpose(0, 1, 3, 2, 4),
            None if sks is None else sks[:, :, i:i + d].transpose(0, 1, 3, 2),
            None if svs is None else svs[:, :, i:i + d].transpose(0, 1, 3, 2),
            pos0 + i)
    return cache


def decode_step_deferred(cfg: ModelConfig, params: LlamaParams,
                         tokens: jax.Array, pos0: jax.Array, step_s,
                         staged, cache: BatchedKVCache, *,
                         mm: Callable = qmatmul,
                         mm_idx: Optional[Callable] = None,
                         attn_stats: Optional[Callable] = None,
                         compute_dtype=jnp.float32):
    """One decode token for every slot with chunk-deferred cache writes.

    Same math as :func:`decode_step`, but the fresh K/V rows of the whole
    chunk live in the ``staged`` buffers (see :func:`make_staged`) instead
    of being slab-written into the cache every step: ``pos0`` (B,) are the
    CHUNK-start positions (fixed for all K steps), ``step_s`` is the step
    index inside the chunk, and attention composes three pieces exactly as
    the sequential path would see them:

    * cache rows [0, pos0[b]) — the flash kernel, strict mask, returning
      its online-softmax (max, sum) stats;
    * staged rows [0, step_s) — the chunk's earlier tokens, attended in
      their CACHE dtype (int8 values x scale, dequantized here), exactly
      what a sequential step would read back from the cache;
    * the current fresh row — merged in full precision inside the kernel
      (same as decode_step's ``fresh`` path).

    The softmax merge of the kernel partial and the staged partial is
    exact (associativity of online softmax); only float rounding differs
    from the sequential path.  Returns (logits, staged') — the CACHE is
    untouched; the engine lands the whole chunk with :func:`land_staged`.
    """
    from fastllama_tpu.ops.attention import NEG_INF
    from fastllama_tpu.quant.groupquant import quantize_rows
    B = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    hgs = n_heads // n_kv
    proj = _make_proj(mm, mm_idx, compute_dtype)
    quant = cache.quantized
    if quant:
        sk, sv, sks, svs = staged
    else:
        sk, sv = staged
    Kp = sk.shape[2]
    scale = 1.0 / float(hs) ** 0.5
    tmask = (jnp.arange(Kp, dtype=jnp.int32) < step_s)[None, None, None]

    pos = pos0 + step_s
    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (B, dim)
    cos, sin = rope_tables(cfg, pos, compute_dtype)

    def scan_fn(x, layer):
        l, attn_norm_l, ffn_norm_l = layer
        q, k, v = _decode_layer_qkv(cfg, params, proj, x, l, attn_norm_l,
                                    cos, sin)

        # cache part + own fresh row (full precision), with softmax stats
        o1, m1, l1 = attn_stats(q, cache, pos0, l, k, v)
        o1 = o1.reshape(B, n_kv, hgs, hs).astype(jnp.float32)

        # staged part: this chunk's earlier rows, attended in cache dtype
        # (int8 values * scale — the same numbers a sequential step reads
        # back), masked to [0, step_s)
        sk_l = jax.lax.dynamic_index_in_dim(sk, l, 0, keepdims=False)
        sv_l = jax.lax.dynamic_index_in_dim(sv, l, 0, keepdims=False)
        qf = q.reshape(B, n_kv, hgs, hs).astype(jnp.float32)
        s2 = jnp.einsum("bngh,bknh->bngk", qf, sk_l.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
        if quant:
            # fold K scales after the dot, like the kernel's score lanes
            sks_l = jax.lax.dynamic_index_in_dim(sks, l, 0, keepdims=False)
            s2 = s2 * sks_l.transpose(0, 2, 1)[:, :, None, :]
        s2 = jnp.where(tmask, s2, NEG_INF)
        m2 = jnp.max(s2, axis=-1, keepdims=True)        # (B, n_kv, hgs, 1)
        e = jnp.where(tmask, jnp.exp(s2 - m2), 0.0)     # zero when empty
        l2 = jnp.sum(e, axis=-1, keepdims=True)
        if quant:
            svs_l = jax.lax.dynamic_index_in_dim(svs, l, 0, keepdims=False)
            e = e * svs_l.transpose(0, 2, 1)[:, :, None, :]
        acc2 = jnp.einsum("bngk,bknh->bngh", e, sv_l.astype(jnp.float32),
                          preferred_element_type=jnp.float32)

        # exact online-softmax merge of the two partials
        m1e = m1[..., None]                             # (B, n_kv, hgs, 1)
        mm_ = jnp.maximum(m1e, m2)
        w1 = l1[..., None] * jnp.exp(m1e - mm_)
        w2 = jnp.exp(m2 - mm_)                          # 0 when no staged rows
        o = (o1 * w1 + acc2 * w2) / (w1 + l2 * w2)

        o = o.reshape(B, n_heads * hs).astype(compute_dtype)
        x = _decode_layer_tail(cfg, params, proj, x, o, l, ffn_norm_l)

        if quant:
            kq_, ksc_ = quantize_rows(k)
            vq_, vsc_ = quantize_rows(v)
            out_kv = (kq_, vq_, ksc_[..., 0], vsc_[..., 0])
        else:
            out_kv = (k.astype(sk.dtype), v.astype(sv.dtype))
        return x, out_kv

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    x, out_kv = jax.lax.scan(scan_fn, x, xs)

    # stage this step's rows: full-tile leading-index updates (no RMW)
    if quant:
        kq, vq, ks2, vs2 = out_kv                       # (L, B, n_kv, ...)
        sk = jax.lax.dynamic_update_slice(sk, kq[:, :, None],
                                          (0, 0, step_s, 0, 0))
        sv = jax.lax.dynamic_update_slice(sv, vq[:, :, None],
                                          (0, 0, step_s, 0, 0))
        sks = jax.lax.dynamic_update_slice(sks, ks2[:, :, None],
                                           (0, 0, step_s, 0))
        svs = jax.lax.dynamic_update_slice(svs, vs2[:, :, None],
                                           (0, 0, step_s, 0))
        staged = (sk, sv, sks, svs)
    else:
        kq, vq = out_kv
        sk = jax.lax.dynamic_update_slice(sk, kq[:, :, None],
                                          (0, 0, step_s, 0, 0))
        sv = jax.lax.dynamic_update_slice(sv, vq[:, :, None],
                                          (0, 0, step_s, 0, 0))
        staged = (sk, sv)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    logits = mm(x, params.classifier)                               # (B, V)
    return logits.astype(jnp.float32), staged
