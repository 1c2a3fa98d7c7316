"""GQA attention over a preallocated KV cache.

Reference behaviour (``execute_attn``, transformer.cpp:397-455): per kv-head,
append the new K/V rows at ``pos`` into a fixed-size cache, RoPE q/k, scores
= K . q * 1/sqrt(head_size), per-row softmax over the first ``pos+i+1``
entries (causal), output = scores-weighted sum of V.

TPU-native design: the cache is a static-shape array ``(n_kv, max_seq,
head_size)`` per layer, updated with ``lax.dynamic_update_slice`` (zero
reallocation — the GSPMD analogue of the reference's preallocated per-thread
cache, transformer.cpp:366-374).  Causality is a mask against absolute
positions, never a dynamic shape.  Heads shard over the mesh 'model' axis
(the analogue of the reference's kv-head split across its ATTN thread
group).  The fused single-token decode kernel lives in ops/pallas/.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def update_kv_cache(k_cache: jax.Array, v_cache: jax.Array,
                    k_new: jax.Array, v_new: jax.Array, pos) -> Tuple[jax.Array, jax.Array]:
    """Write T new rows at [pos, pos+T).  k_cache: (n_kv, S, hs);
    k_new: (n_kv, T, hs)."""
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype),
                                           (0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype),
                                           (0, pos, 0))
    return k_cache, v_cache


def gqa_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                  pos) -> jax.Array:
    """Masked GQA attention against the full cache.

    q:        (n_heads, T, hs) — already RoPE'd, T query tokens at absolute
              positions pos..pos+T-1.
    k_cache:  (n_kv, S, hs), v_cache: (n_kv, S, hs) — rows >= pos+T are stale.
    Returns   (n_heads, T, hs) in q.dtype.
    """
    n_heads, T, hs = q.shape
    n_kv, S, _ = k_cache.shape
    hgs = n_heads // n_kv

    qf = q.reshape(n_kv, hgs, T, hs).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)

    scores = jnp.einsum("kgth,ksh->kgts", qf, kf,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(hs)))

    # query at absolute position pos+t may attend cache index s <= pos+t
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    mask = s_idx <= (t_idx + pos)
    scores = jnp.where(mask[None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("kgts,ksh->kgth", probs, vf,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return out.reshape(n_heads, T, hs).astype(q.dtype)


def gqa_attention_decode_batched(q: jax.Array, k_cache: jax.Array,
                                 v_cache: jax.Array, k_new: jax.Array,
                                 v_new: jax.Array,
                                 pos: jax.Array) -> jax.Array:
    """Single-token per-slot attention with DEFERRED cache writes: attend
    cache rows [0, pos[b]) plus the freshly computed K/V row (not yet in
    the cache — batching the cache writes outside the layer scan is what
    keeps them in-place; see models/batched.decode_step).

    q: (B, n_heads, hs); caches (B, n_kv, S, hs); k_new/v_new (B, n_kv, hs);
    pos (B,).  Returns (B, n_heads, hs) in q.dtype."""
    B, n_heads, hs = q.shape
    _, n_kv, S, _ = k_cache.shape
    hgs = n_heads // n_kv

    qf = q.reshape(B, n_kv, hgs, hs).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(hs))

    scores = jnp.einsum("bkgh,bksh->bkgs", qf, kf,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32) * scale
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    mask = s_idx < pos[:, None]                         # STRICT: row pos is stale
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    s_new = jnp.einsum("bkgh,bkh->bkg", qf, k_new.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32) * scale

    all_scores = jnp.concatenate([scores, s_new[..., None]], axis=-1)
    probs = jax.nn.softmax(all_scores, axis=-1)
    out = jnp.einsum("bkgs,bksh->bkgh", probs[..., :S], vf,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    out = out + probs[..., -1:] * v_new.astype(jnp.float32)[:, :, None]
    return out.reshape(B, n_heads, hs).astype(q.dtype)


def gqa_attention_spec_batched(q: jax.Array, k_cache: jax.Array,
                               v_cache: jax.Array, k_new: jax.Array,
                               v_new: jax.Array, pos: jax.Array,
                               k_self=None, v_self=None) -> jax.Array:
    """T-row per-slot attention with DEFERRED cache writes — the batched
    speculative-verify primitive: slot b's T query rows sit at absolute
    positions pos[b]..pos[b]+T-1, attend cache rows [0, pos[b]) STRICTLY
    plus the causal prefix of the fresh K/V block (not yet written).

    q: (B, n_heads, T, hs); caches (B, n_kv, S, hs); k_new/v_new
    (B, n_kv, T, hs); pos (B,).  With a quantized cache, ``k_new/v_new``
    are the quantize-roundtripped rows (what the sequential steps would
    read back) while ``k_self/v_self`` carry the EXACT rows used only on
    the diagonal — matching sequential decode, where a step's own fresh
    row is attended pre-quantization.  Returns (B, n_heads, T, hs)."""
    B, n_heads, T, hs = q.shape
    _, n_kv, S, _ = k_cache.shape
    hgs = n_heads // n_kv

    qf = q.reshape(B, n_kv, hgs, T, hs).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(hs))

    scores = jnp.einsum("bkgth,bksh->bkgts", qf, kf,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32) * scale
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    mask = s_idx < pos[:, None]                     # strict: rows >= pos stale
    scores = jnp.where(mask[:, None, None, None], scores, NEG_INF)

    # causal fresh block: query t attends fresh rows j <= t
    s_new = jnp.einsum("bkgth,bkjh->bkgtj", qf, k_new.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32) * scale
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    if k_self is not None:
        # diagonal (self) scores from the exact rows
        s_diag = jnp.einsum("bkgth,bkth->bkgt", qf,
                            k_self.astype(jnp.float32),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32) * scale
        eye = (j_idx == t_idx)[None, None, None]
        s_new = jnp.where(eye, s_diag[..., None], s_new)
    s_new = jnp.where((j_idx <= t_idx)[None, None, None], s_new, NEG_INF)

    all_scores = jnp.concatenate([scores, s_new], axis=-1)  # (B,k,g,T,S+T)
    probs = jax.nn.softmax(all_scores, axis=-1)
    out = jnp.einsum("bkgts,bksh->bkgth", probs[..., :S], vf,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    pn = probs[..., S:]
    if v_self is not None:
        # self value from the exact row; zero the diagonal for the
        # quantized-block contribution
        eye = (j_idx == t_idx)[None, None, None]
        diag_p = jnp.sum(jnp.where(eye, pn, 0.0), axis=-1)      # (B,k,g,T)
        pn = jnp.where(eye, 0.0, pn)
        out = out + diag_p[..., None] * \
            v_self.astype(jnp.float32)[:, :, None, :, :]
    out = out + jnp.einsum("bkgtj,bkjh->bkgth", pn,
                           v_new.astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    return out.reshape(B, n_heads, T, hs).astype(q.dtype)


def gqa_attention_batched(q: jax.Array, k_cache: jax.Array,
                          v_cache: jax.Array, pos: jax.Array) -> jax.Array:
    """Per-slot masked GQA attention (the continuous-batching decode path).

    q:       (B, n_heads, T, hs) at absolute positions pos[b]..pos[b]+T-1,
    caches:  (B, n_kv, S, hs) — slot b's rows >= pos[b]+T are stale,
    pos:     (B,) int32.
    Returns  (B, n_heads, T, hs) in q.dtype.
    """
    B, n_heads, T, hs = q.shape
    _, n_kv, S, _ = k_cache.shape
    hgs = n_heads // n_kv

    qf = q.reshape(B, n_kv, hgs, T, hs).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)

    scores = jnp.einsum("bkgth,bksh->bkgts", qf, kf,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(hs)))

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    mask = (s_idx[None] <= t_idx[None] + pos[:, None, None])       # (B, T, S)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksh->bkgth", probs, vf,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, n_heads, T, hs).astype(q.dtype)
