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
from fastllama_tpu.ops.rope import apply_rope_half, rope_cos_sin
from fastllama_tpu.quant.groupquant import QArray


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchedKVCache:
    """(L, B, n_kv, max_seq, head_size) per array; slot = independent stream."""

    k: jax.Array
    v: jax.Array

    @staticmethod
    def create(cfg: ModelConfig, batch_size: int,
               max_seq_len: Optional[int] = None,
               dtype=jnp.float32) -> "BatchedKVCache":
        S = max_seq_len or cfg.max_seq_len
        shape = (cfg.n_layers, batch_size, cfg.n_kv_heads, S, cfg.head_size)
        return BatchedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def _take_layer(w, l):
    """Fallback layer indexing of a stacked weight (dynamic-slice copy) —
    only used when no layer-indexed Pallas kernel is active (CPU tests)."""
    if isinstance(w, QArray):
        return QArray(w.data[l], w.scales[l], w.qtype, w.group_size,
                      w.group_axis)
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
    cos, sin = rope_cos_sin(jnp.arange(T, dtype=jnp.int32), hs,
                            cfg.rope_theta, compute_dtype)

    # K/V leave the scan as OUTPUTS (tiny (L, n_kv, T, hs) stacks) and hit
    # the big cache in ONE slice-update afterwards.  Carrying the cache
    # through the scan with per-layer updates defeats XLA's in-place
    # analysis — it copied the full cache every layer (measured 165 ms for
    # a 64-token 7B prefill vs ~4 ms this way).
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
        return x, (k.astype(cache.k.dtype), v.astype(cache.v.dtype))

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    x, (ks, vs) = jax.lax.scan(scan_fn, x, xs)      # (L, n_kv, T, hs)
    new_k = jax.lax.dynamic_update_slice(cache.k, ks[:, None],
                                         (0, slot, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(cache.v, vs[:, None],
                                         (0, slot, 0, 0, 0))

    # classifier only on the last valid row (transformer.cpp:140-142)
    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    xl = jax.lax.dynamic_slice_in_dim(x, length - 1, 1, axis=0)     # (1, dim)
    logits = mm(xl, params.classifier)                              # (1, V)
    return logits[0].astype(jnp.float32), BatchedKVCache(new_k, new_v)


def decode_step(cfg: ModelConfig, params: LlamaParams, tokens: jax.Array,
                pos: jax.Array, cache: BatchedKVCache, *,
                mm: Callable = qmatmul,
                mm_idx: Optional[Callable] = None,
                attn_bidx: Optional[Callable] = None,
                compute_dtype=jnp.float32
                ) -> Tuple[jax.Array, BatchedKVCache]:
    """One decode token for every slot: tokens (B,) at per-slot positions
    pos (B,).  Returns (logits (B, vocab), cache).

    ``attn_bidx(q, ck, cv, pos, l)`` is the batched layer-indexed decode
    attention (Pallas over the full stacked cache); the jnp fallback slices
    layer ``l`` out of the cache (a copy — test path only).
    """
    B = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads
    S = cache.k.shape[3]
    proj = _make_proj(mm, mm_idx, compute_dtype)

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (B, dim)
    cos, sin = rope_cos_sin(pos, hs, cfg.rope_theta, compute_dtype)  # (B, hs/2)

    def scan_fn(carry, layer):
        x, ck, cv = carry
        l, attn_norm_l, ffn_norm_l = layer

        h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
        q, k, v = _split_qkv(cfg, params, proj, h, l)
        q = q.reshape(B, n_heads, hs)
        k = k.reshape(B, n_kv, hs)
        v = v.reshape(B, n_kv, hs)
        q = apply_rope_half(q, cos[:, None], sin[:, None])
        k = apply_rope_half(k, cos[:, None], sin[:, None])

        # write each slot's new row at (l, b, :, pos[b], :); B is static and
        # small, so B tiny dynamic_update_slices stay in place under donation
        for b in range(B):
            ck = jax.lax.dynamic_update_slice(
                ck, k[b][None, None, :, None].astype(ck.dtype),
                (l, b, 0, pos[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v[b][None, None, :, None].astype(cv.dtype),
                (l, b, 0, pos[b], 0))

        if attn_bidx is not None:
            o = attn_bidx(q[:, :, None], ck, cv, pos, l)     # (B, H, 1, hs)
        else:
            ck_l = jax.lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
            cv_l = jax.lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
            o = gqa_attention_batched(q[:, :, None], ck_l, cv_l, pos)
        o = o.reshape(B, n_heads * hs)
        x = x + proj(o, params.wo, l)

        h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
        x = x + _ffn(cfg, params, proj, h, l)
        return (x, ck, cv), None

    xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
          params.attn_norm, params.ffn_norm)
    (x, new_k, new_v), _ = jax.lax.scan(scan_fn, (x, cache.k, cache.v), xs)

    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    logits = mm(x, params.classifier)                               # (B, V)
    return logits.astype(jnp.float32), BatchedKVCache(new_k, new_v)
