"""Fused single-token decode attention over the KV cache.

TPU counterpart of the reference's per-kv-head attention task
(``execute_attn``, transformer.cpp:397-455): per head, scores against the
whole cache, causal-masked softmax over positions <= pos, V-mix.  One Pallas
program per kv head (the grid is the GSPMD-friendly analogue of the
reference's ATTN thread group split); K/V stream HBM->VMEM per head, scores
and softmax never touch HBM.

Decode only (T = 1): prefill attention is a large batched matmul chain that
XLA already schedules well on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_attn_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    pos = pos_ref[0]
    q = q_ref[0].astype(jnp.float32)                    # (hgs, hs)
    k = k_ref[0].astype(jnp.float32)                    # (S, hs)
    v = v_ref[0].astype(jnp.float32)                    # (S, hs)
    hgs, hs = q.shape
    S = k.shape[0]

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # (hgs, S)
    col = jax.lax.broadcasted_iota(jnp.int32, (hgs, S), 1)
    scores = jnp.where(col <= pos, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def decode_attention_pallas(q: jax.Array, k_cache: jax.Array,
                            v_cache: jax.Array, pos,
                            interpret: bool = False) -> jax.Array:
    """q: (n_heads, 1, hs); caches: (n_kv, S, hs).  Returns (n_heads, 1, hs)
    in q.dtype.  Attends to absolute positions <= pos."""
    n_heads, T, hs = q.shape
    n_kv, S, _ = k_cache.shape
    hgs = n_heads // n_kv
    qh = q.reshape(n_kv, hgs, hs)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    kernel = functools.partial(_decode_attn_kernel,
                               scale=1.0 / float(hs) ** 0.5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_kv,),
        in_specs=[
            pl.BlockSpec((1, hgs, hs), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, hs), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, hs), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hgs, hs), lambda h, *_: (h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_kv, hgs, hs), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_heads * S * hs * 2,
            bytes_accessed=2 * n_kv * S * hs * k_cache.dtype.itemsize,
            transcendentals=n_heads * S),
        interpret=interpret,
    )(pos_arr, qh, k_cache, v_cache)
    return out.reshape(n_heads, 1, hs)


def _decode_attn_kernel_idx(scalars_ref, q_ref, k_ref, v_ref, o_ref, *,
                            scale: float):
    pos = scalars_ref[0]
    q = q_ref[0].astype(jnp.float32)                    # (hgs, hs)
    k = k_ref[0, 0].astype(jnp.float32)                 # (S, hs)
    v = v_ref[0, 0].astype(jnp.float32)
    hgs, hs = q.shape
    S = k.shape[0]

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (hgs, S), 1)
    scores = jnp.where(col <= pos, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def decode_attention_pallas_indexed(q: jax.Array, ck: jax.Array,
                                    cv: jax.Array, pos, layer,
                                    interpret: bool = False) -> jax.Array:
    """Layer-indexed decode attention: caches are the FULL stacked
    (L, n_kv, S, hs) buffers; the layer is selected by the kernel's
    scalar-prefetch index_map (no XLA slice copy of the cache)."""
    n_heads, T, hs = q.shape
    L, n_kv, S, _ = ck.shape
    hgs = n_heads // n_kv
    qh = q.reshape(n_kv, hgs, hs)
    scalars = jnp.stack([jnp.asarray(pos, jnp.int32),
                         jnp.asarray(layer, jnp.int32)])

    kernel = functools.partial(_decode_attn_kernel_idx,
                               scale=1.0 / float(hs) ** 0.5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_kv,),
        in_specs=[
            pl.BlockSpec((1, hgs, hs), lambda h, s: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, hs), lambda h, s: (s[1], h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, hs), lambda h, s: (s[1], h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hgs, hs), lambda h, s: (h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_kv, hgs, hs), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_heads * S * hs * 2,
            bytes_accessed=2 * n_kv * S * hs * ck.dtype.itemsize,
            transcendentals=n_heads * S),
        interpret=interpret,
    )(scalars, qh, ck, cv)
    return out.reshape(n_heads, 1, hs)


def _decode_attn_kernel_bidx(scalars_ref, q_ref, k_ref, v_ref, o_ref, *,
                             scale: float):
    """Batched layer-indexed decode attention: grid (slot, kv-head); slot b's
    position comes from the scalar-prefetch vector (scalars = [layer,
    pos_0..pos_{B-1}])."""
    b = pl.program_id(0)
    pos = scalars_ref[1 + b]
    q = q_ref[0, 0].astype(jnp.float32)                 # (hgs, hs)
    k = k_ref[0, 0, 0].astype(jnp.float32)              # (S, hs)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    hgs, hs = q.shape
    S = k.shape[0]

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (hgs, S), 1)
    scores = jnp.where(col <= pos, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def decode_attention_pallas_batched(q: jax.Array, ck: jax.Array,
                                    cv: jax.Array, pos: jax.Array, layer,
                                    interpret: bool = False) -> jax.Array:
    """Per-slot decode attention over the FULL stacked batched cache.

    q: (B, n_heads, 1, hs); caches: (L, B, n_kv, S, hs); pos: (B,) int32;
    layer: traced scalar.  Slot b attends to its own cache rows <= pos[b].
    Returns (B, n_heads, 1, hs) in q.dtype."""
    B, n_heads, T, hs = q.shape
    L, Bc, n_kv, S, _ = ck.shape
    hgs = n_heads // n_kv
    qh = q.reshape(B, n_kv, hgs, hs)
    scalars = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                               pos.astype(jnp.int32)])

    kernel = functools.partial(_decode_attn_kernel_bidx,
                               scale=1.0 / float(hs) ** 0.5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, hgs, hs), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S, hs), lambda b, h, s: (s[0], b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S, hs), lambda b, h, s: (s[0], b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hgs, hs), lambda b, h, s: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, hgs, hs), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_heads * S * hs * 2,
            bytes_accessed=2 * B * n_kv * S * hs * ck.dtype.itemsize,
            transcendentals=B * n_heads * S),
        interpret=interpret,
    )(scalars, qh, ck, cv)
    return out.reshape(B, n_heads, 1, hs)


def make_attn_batched(interpret: bool = False):
    """attn_bidx(q, cache, pos, layer, k_new, v_new) drop-in for
    models.batched.decode_step (deferred-write convention: cache rows
    [0, pos) strictly + the fresh row).  This always uses the jnp path —
    the fused always-stream kernel here predates deferred writes; the fast
    path is the bounded flash kernel (ops/pallas/flash_decode.py)."""
    from fastllama_tpu.ops.attention import gqa_attention_decode_batched

    def attn_bidx(q, cache, pos, layer, k_new, v_new):
        from fastllama_tpu.models.batched import _layer_slices
        ck_l, cv_l = _layer_slices(cache, layer, q.dtype)
        # the cache may carry MORE slots than the step decodes (multi-host
        # sink slot sits past the serving slots); row b = cache slot b
        B = q.shape[0]
        return gqa_attention_decode_batched(q, ck_l[:B], cv_l[:B],
                                            k_new, v_new, pos)

    return attn_bidx


def make_attn_indexed(interpret: bool = False):
    """attn_idx(q, ck_full, cv_full, pos, layer) — fused kernel for T=1,
    slice + jnp fallback for prefill."""
    from fastllama_tpu.ops.attention import gqa_attention

    def attn_idx(q, ck, cv, pos, layer):
        if q.shape[1] == 1 and q.shape[2] % 8 == 0:
            return decode_attention_pallas_indexed(q, ck, cv, pos, layer,
                                                   interpret)
        kc_l = jax.lax.dynamic_index_in_dim(ck, layer, 0, keepdims=False)
        vc_l = jax.lax.dynamic_index_in_dim(cv, layer, 0, keepdims=False)
        return gqa_attention(q, kc_l, vc_l, pos)

    return attn_idx


def make_attn(interpret: bool = False):
    """attention(q, k_cache, v_cache, pos) drop-in for models.llama.forward:
    the fused kernel for single-token decode, jnp fallback for prefill."""
    from fastllama_tpu.ops.attention import gqa_attention

    def attn(q, k_cache, v_cache, pos):
        if q.shape[1] == 1 and q.shape[2] % 8 == 0:
            return decode_attention_pallas(q, k_cache, v_cache, pos, interpret)
        return gqa_attention(q, k_cache, v_cache, pos)

    return attn
