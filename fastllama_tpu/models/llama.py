"""LLaMA-family forward pass, TPU-first.

Functional re-design of the reference's ``ParallelTransformer::forward``
(``/root/reference/src/transformer/transformer.cpp:105-161``): the per-layer
dataflow (rmsnorm -> QKV -> RoPE+attention -> O-proj+residual -> rmsnorm ->
SwiGLU FFN -> residual -> final rmsnorm -> classifier) is identical; the
mechanism is not.  Where the reference forks 6 thread-pool barriers per layer
over row-sharded weights, here the whole step is ONE jitted SPMD program:
layers run under ``lax.scan`` over layer-stacked weights, XLA's static
schedule is the barrier structure, and GSPMD shardings (parallel/sharding.py)
replace the thread-level row split.

Static shapes throughout: the KV cache is preallocated at ``max_seq_len``
(the analogue of the reference's zero-allocation ``SequentialAllocator``
arenas, alignmem.hpp:130) and positions are masked, never sliced dynamically.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastllama_tpu.config import ModelConfig, QuantType
from fastllama_tpu.ops.attention import gqa_attention, update_kv_cache
from fastllama_tpu.ops.norms import rmsnorm, swiglu
from fastllama_tpu.ops.qmatmul import qmatmul
from fastllama_tpu.ops.rope import apply_rope_half, rope_tables
from fastllama_tpu.quant.groupquant import QArray, dequantize, quantize


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LlamaParams:
    """Layer-stacked weights.  Quantized leaves are :class:`QArray` (int data
    + fp32 group scales); norms stay fp32 like the reference
    (TransformerWeights, model_loader.h:72-92).

    Projection matrices live in the TPU-native **transposed** layout
    ``(in, out)`` with quant groups along the contraction (in) axis
    (QArray.group_axis = -2): lanes carry output features, so matmuls are
    ``x @ w`` with no relayout and the Pallas kernel expands group scales
    along sublanes.  Checkpoint layout (out, in) is transposed once at load
    (build_params).  The embedding stays (vocab, dim) for row gathers."""

    embedding: Any        # (vocab, dim)            QArray(ga=-1) | f32
    attn_norm: jax.Array  # (L, dim)                f32
    wq: Any               # (L, dim, n_heads*hs)
    wk: Any               # (L, dim, kv_dim)
    wv: Any               # (L, dim, kv_dim)
    wo: Any               # (L, n_heads*hs, dim)
    ffn_norm: jax.Array   # (L, dim)
    w1: Any               # (L, dim, hidden)        gate (LAYER_MLP_GATE)
    w2: Any               # (L, hidden, dim)        down
    w3: Any               # (L, dim, hidden)        up
    out_norm: jax.Array   # (dim,)
    classifier: Any       # (dim, vocab)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Preallocated cache, (L, n_kv_heads, max_seq, head_size).

    The int8-quantized cache lives on :class:`~fastllama_tpu.models.
    batched.BatchedKVCache` (scales fields exist here only for pytree-shape
    compatibility); the single-stream paths keep fp/bf16 KV like the
    reference's fp32 (transformer.cpp:368), so create() rejects int8 —
    forward() would silently truncate K/V rows with no scales."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(cfg: ModelConfig, max_seq_len: Optional[int] = None,
               dtype=jnp.float32) -> "KVCache":
        S = max_seq_len or cfg.max_seq_len
        shape = (cfg.n_layers, cfg.n_kv_heads, S, cfg.head_size)
        if jnp.dtype(dtype) == jnp.int8:
            raise ValueError("int8 KV is a BatchedKVCache feature "
                             "(models/batched.py)")
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def embed_tokens(emb, tokens: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Gather + dequantize embedding rows (transformer.cpp:115-122)."""
    if isinstance(emb, QArray):
        rows = QArray(emb.data[tokens], emb.scales[tokens], emb.qtype,
                      emb.group_size)
        return dequantize(rows, dtype)
    return emb[tokens].astype(dtype)


def fuse_params(cfg: ModelConfig, params: LlamaParams) -> LlamaParams:
    """Concatenate QKV and gate/up projections along the out-features axis —
    the analogue of the reference's fused QKV rows (transformer.cpp:307-318)
    and fused FFN13 task (transformer.cpp:468-483).  Halves matmul dispatch
    count per layer; ``forward`` detects fusion via ``wk is None``.

    Only valid in the transposed layout: groups run along the shared
    contraction axis, so data AND scales concatenate along the last axis.
    Not used with naive TP sharding (an even split of the concat axis would
    straddle the q/k/v section boundaries)."""
    def cat(ws):
        if isinstance(ws[0], QArray):
            statics = {(w.qtype, w.group_size, w.group_axis, w.packed)
                       for w in ws}
            if len(statics) != 1:
                # e.g. INT4 where wq packs but kv_dim can't: refuse loudly
                # rather than concatenating incompatible layouts
                raise ValueError(
                    f"fuse_weights: projections have mixed quant layouts "
                    f"{statics}; load without fuse_weights")
            return QArray(jnp.concatenate([w.data for w in ws], axis=-1),
                          jnp.concatenate([w.scales for w in ws], axis=-1),
                          ws[0].qtype, ws[0].group_size, ws[0].group_axis,
                          ws[0].packed)
        return jnp.concatenate(ws, axis=-1)

    return dataclasses.replace(
        params,
        wq=cat([params.wq, params.wk, params.wv]), wk=None, wv=None,
        w1=cat([params.w1, params.w3]), w3=None)


def forward(cfg: ModelConfig, params: LlamaParams, tokens: jax.Array, pos,
            cache: KVCache, *, mm: Callable = qmatmul,
            attn: Callable = gqa_attention, unroll: bool = False,
            mm_idx: Optional[Callable] = None,
            attn_idx: Optional[Callable] = None,
            last_index=None,
            compute_dtype=jnp.float32) -> Tuple[jax.Array, KVCache]:
    """One transformer step over T tokens at absolute positions
    [pos, pos+T).  Returns per-token logits (T, vocab) and the updated cache.

    Works for prefill (T = prompt bucket) and decode (T = 1) — the same
    ``generate`` structure as transformer.cpp:92-101 where the whole prompt is
    one batched forward.

    Layer iteration modes (fastest first):

    * ``mm_idx`` given: ``lax.scan`` over layer indices; the Pallas kernel
      reads each layer's weights straight from the stacked HBM buffers via
      scalar-prefetch index_maps — no weight copies.
    * default: ``lax.scan`` over stacked weights (XLA dynamic-slices — i.e.
      copies — each layer's weights per step; profiled at ~50% of decode
      time on v5e, but needs no Pallas and compiles fastest).
    * ``unroll=True``: python loop with static indices (larger compile,
      measured slower than scan on v5e — XLA copies slices feeding custom
      calls).

    The pos==0 fresh-prefill fast path lives in models/batched.py
    (``prefill_into_slot``): attention over the prompt's own K/V only and
    one post-scan cache write (Engine._get_prefill routes there).
    """
    T = tokens.shape[0]
    hs, n_heads, n_kv = cfg.head_size, cfg.n_heads, cfg.n_kv_heads

    x = embed_tokens(params.embedding, tokens, compute_dtype)       # (T, dim)
    positions = pos + jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope_tables(cfg, positions, compute_dtype)

    fused = params.wk is None
    qdim, kvdim = n_heads * hs, cfg.kv_dim
    hdim = cfg.hidden_dim

    def layer_fn(x, weights_l, write_kv, proj=None, attn_fn=None):
        """write_kv(k, v) appends the new rows and returns the full layer
        cache slices to attend over.  ``proj(h, w)`` is the projection op —
        either mm over a sliced (I, O) weight or a layer-indexed kernel over
        the full (L, I, O) stack.  When the projection advertises
        ``supports_fusion`` (make_mm_indexed), the per-layer elementwise
        glue — the two rmsnorms and the two residual adds — folds into the
        matmul kernels as prologue/epilogue instead of standalone VPU ops
        between kernel launches (the ~0.4 ms/step decode epilogue named in
        NEXT.md round-4 #3)."""
        proj = proj or mm
        fuse_glue = getattr(proj, "supports_fusion", False)
        (attn_norm_l, wq_l, wk_l, wv_l, wo_l,
         ffn_norm_l, w1_l, w2_l, w3_l) = weights_l

        if fused and fuse_glue:
            qkv = proj(x, wq_l, norm_gain=attn_norm_l, eps=cfg.norm_eps)
            q = qkv[:, :qdim]
            k = qkv[:, qdim:qdim + kvdim]
            v = qkv[:, qdim + kvdim:]
        else:
            h = rmsnorm(x, attn_norm_l, cfg.norm_eps)
            if fused:
                qkv = proj(h, wq_l)                   # (T, qdim+2*kvdim)
                q = qkv[:, :qdim]
                k = qkv[:, qdim:qdim + kvdim]
                v = qkv[:, qdim + kvdim:]
            else:
                q, k, v = proj(h, wq_l), proj(h, wk_l), proj(h, wv_l)
        q = q.reshape(T, n_heads, hs).transpose(1, 0, 2)
        k = k.reshape(T, n_kv, hs).transpose(1, 0, 2)
        v = v.reshape(T, n_kv, hs).transpose(1, 0, 2)

        q = apply_rope_half(q, cos[None], sin[None])
        k = apply_rope_half(k, cos[None], sin[None])

        kc_l, vc_l = write_kv(k, v)
        o = (attn_fn or attn)(q, kc_l, vc_l, pos)               # (H, T, hs)
        o = o.transpose(1, 0, 2).reshape(T, n_heads * hs)
        if fuse_glue:
            x = proj(o, wo_l, residual=x)
        else:
            x = x + proj(o, wo_l)

        if fused and fuse_glue:
            g13 = proj(x, w1_l, norm_gain=ffn_norm_l, eps=cfg.norm_eps)
            hd = swiglu(g13[:, :hdim], g13[:, hdim:])
        else:
            h = rmsnorm(x, ffn_norm_l, cfg.norm_eps)
            if fused:
                g13 = proj(h, w1_l)                   # (T, 2*hidden)
                hd = swiglu(g13[:, :hdim], g13[:, hdim:])
            else:
                hd = swiglu(proj(h, w1_l), proj(h, w3_l))
        if fuse_glue:
            x = proj(hd, w2_l, residual=x)
        else:
            x = x + proj(hd, w2_l)
        return x

    weight_xs = (params.attn_norm, params.wq, params.wk, params.wv, params.wo,
                 params.ffn_norm, params.w1, params.w2, params.w3)

    if unroll:
        # static layer indices: weight slices alias the stacked buffers, and
        # only the T new KV rows are written per layer (in place under
        # donation) — zero weight copies, zero cache copies
        ck, cv = cache.k, cache.v
        for l in range(cfg.n_layers):
            weights_l = tuple(None if w is None else w[l] for w in weight_xs)

            def write_kv(k, v, l=l):
                nonlocal ck, cv
                ck = jax.lax.dynamic_update_slice(
                    ck, k[None].astype(ck.dtype), (l, 0, pos, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, v[None].astype(cv.dtype), (l, 0, pos, 0))
                return ck[l], cv[l]

            x = layer_fn(x, weights_l, write_kv)
        new_cache = KVCache(ck, cv)
    elif mm_idx is not None and attn_idx is not None:
        # fully layer-indexed: scan over layer indices with the FULL cache in
        # the carry (aliased in place by XLA); kernels select the layer via
        # scalar prefetch — neither weights nor cache are ever slice-copied
        stacked = (params.wq, params.wk, params.wv, params.wo,
                   params.w1, params.w2, params.w3)

        def scan_fn(carry, layer):
            x, ck, cv = carry
            l, attn_norm_l, ffn_norm_l = layer
            wq_s, wk_s, wv_s, wo_s, w1_s, w2_s, w3_s = stacked
            weights_l = (attn_norm_l, wq_s, wk_s, wv_s, wo_s,
                         ffn_norm_l, w1_s, w2_s, w3_s)
            captured = {}

            def write_kv(k, v):
                ck2 = jax.lax.dynamic_update_slice(
                    ck, k[None].astype(ck.dtype), (l, 0, pos, 0))
                cv2 = jax.lax.dynamic_update_slice(
                    cv, v[None].astype(cv.dtype), (l, 0, pos, 0))
                captured["k"], captured["v"] = ck2, cv2
                return ck2, cv2

            def proj(h, w_full, **kw):
                return mm_idx(h, w_full, l, **kw)
            proj.supports_fusion = getattr(mm_idx, "supports_fusion", False)

            def attn_fn(q, ckf, cvf, p):
                return attn_idx(q, ckf, cvf, p, l)

            x = layer_fn(x, weights_l, write_kv, proj, attn_fn)
            return (x, captured["k"], captured["v"]), None

        xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
              params.attn_norm, params.ffn_norm)
        (x, new_k, new_v), _ = jax.lax.scan(
            scan_fn, (x, cache.k, cache.v), xs)
        new_cache = KVCache(new_k, new_v)
    elif mm_idx is not None:
        # scan over layer INDICES: the kernel reads each layer's weights
        # straight out of the stacked HBM buffers via scalar-prefetch
        # index_maps — no XLA dynamic-slice copies.  Norms and the KV cache
        # (small) still travel through scan xs/ys.
        stacked = (params.wq, params.wk, params.wv, params.wo,
                   params.w1, params.w2, params.w3)

        def scan_fn(x, layer):
            l, attn_norm_l, ffn_norm_l, kc_l, vc_l = layer
            wq_s, wk_s, wv_s, wo_s, w1_s, w2_s, w3_s = stacked
            weights_l = (attn_norm_l, wq_s, wk_s, wv_s, wo_s,
                         ffn_norm_l, w1_s, w2_s, w3_s)

            def proj(h, w_full, **kw):
                return mm_idx(h, w_full, l, **kw)
            proj.supports_fusion = getattr(mm_idx, "supports_fusion", False)

            new_kc = {}

            def write_kv(k, v):
                kc, vc = update_kv_cache(kc_l, vc_l, k, v, pos)
                new_kc["k"], new_kc["v"] = kc, vc
                return kc, vc

            x = layer_fn(x, weights_l, write_kv, proj)
            return x, (new_kc["k"], new_kc["v"])

        xs = (jnp.arange(cfg.n_layers, dtype=jnp.int32),
              params.attn_norm, params.ffn_norm, cache.k, cache.v)
        x, (new_k, new_v) = jax.lax.scan(scan_fn, x, xs)
        new_cache = KVCache(new_k, new_v)
    else:
        def scan_fn(x, layer):
            weights_l, kc_l, vc_l = layer[:-2], layer[-2], layer[-1]

            new_kc = {}

            def write_kv(k, v):
                kc, vc = update_kv_cache(kc_l, vc_l, k, v, pos)
                new_kc["k"], new_kc["v"] = kc, vc
                return kc, vc

            x = layer_fn(x, weights_l, write_kv)
            return x, (new_kc["k"], new_kc["v"])

        x, (new_k, new_v) = jax.lax.scan(scan_fn, x,
                                         weight_xs + (cache.k, cache.v))
        new_cache = KVCache(new_k, new_v)

    if last_index is not None:
        # classifier on one row only (transformer.cpp:140-142 keeps just the
        # final row); saves the (T, vocab) matmul on padded prefills
        x = jax.lax.dynamic_slice_in_dim(x, last_index, 1, axis=0)
    x = rmsnorm(x, params.out_norm, cfg.norm_eps)
    logits = mm(x, params.classifier)                            # (T, vocab)
    return logits.astype(jnp.float32), new_cache


def logits_at(logits: jax.Array, length) -> jax.Array:
    """Logits of the last *valid* token of a padded prefill (the analogue of
    keeping only the final row, transformer.cpp:140-142)."""
    return jax.lax.dynamic_index_in_dim(logits, length - 1, 0, keepdims=False)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

_QUANTIZED_FIELDS = ("embedding", "wq", "wk", "wv", "wo", "w1", "w2", "w3",
                     "classifier")
_NORM_FIELDS = ("attn_norm", "ffn_norm", "out_norm")


def build_params(cfg: ModelConfig, raw: dict, qtype: Optional[QuantType] = None,
                 device_put=jnp.asarray) -> LlamaParams:
    """Assemble params from a loader's numpy dict (checkpoint layout:
    projections (…, out, in), groups along in).

    ``raw`` values are fp32 ndarrays, or ``(data, scales)`` tuples for
    pre-quantized tensors (FLM files store int8/int16 directly,
    flm_loader.cpp:493-559).  fp32 projection weights are quantized here to
    ``qtype`` — the analogue of quantize-on-load (llama2c_loader.cpp:117-124)
    — and all projections are transposed to the TPU-native (in, out) layout.
    """
    from fastllama_tpu.quant.groupquant import (pack_int4_rows_np,
                                                quantize_np, transpose_weight)
    qtype = qtype if qtype is not None else cfg.quant_type
    gs = cfg.group_size
    out = {}
    for f in dataclasses.fields(LlamaParams):
        v = raw[f.name]
        transpose = f.name not in ("embedding",)
        if f.name in _NORM_FIELDS:
            out[f.name] = device_put(np.asarray(v, dtype=np.float32))
            continue
        if isinstance(v, tuple):
            data, scales = v
        elif qtype == QuantType.NONE:
            w = np.asarray(v, dtype=np.float32)
            if transpose:
                w = np.ascontiguousarray(np.swapaxes(w, -1, -2))
            out[f.name] = device_put(w)
            continue
        else:
            data, scales = quantize_np(np.asarray(v, np.float32), qtype, gs)
        if transpose:
            data, scales = transpose_weight(data, scales)
            # INT4 projections ship nibble-packed (half the HBM bytes) when
            # the fused kernel can tile them; odd contraction extents (e.g.
            # an unpadded hidden_dim) stay int8-held
            from fastllama_tpu.ops.pallas.qmm import pack_supported
            packed = (qtype == QuantType.INT4
                      and pack_supported(data.shape[-2], data.shape[-1], gs))
            if packed:
                data = pack_int4_rows_np(data)
            out[f.name] = QArray(device_put(data),
                                 device_put(scales.astype(np.float32)),
                                 qtype, gs, group_axis=-2, packed=packed)
        else:
            out[f.name] = QArray(device_put(data),
                                 device_put(scales.astype(np.float32)),
                                 qtype, gs)
    return LlamaParams(**out)


def random_params_int(cfg: ModelConfig, seed: int = 0,
                      qtype: Optional[QuantType] = None,
                      scale: float = 0.02) -> LlamaParams:
    """Random quantized params generated directly as integers on device —
    no fp32 intermediate, so multi-GB models (7B+) can be materialized for
    benchmarking without host transfers or 4x memory spikes."""
    qtype = qtype if qtype is not None else cfg.quant_type
    if qtype == QuantType.NONE:
        return random_params(cfg, seed, qtype, scale)
    qmax = qtype.factor
    from fastllama_tpu.quant.groupquant import _QDTYPE
    dt = _QDTYPE[qtype]
    L, D, H, V = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.vocab_size
    kd, nh, hs = cfg.kv_dim, cfg.n_heads, cfg.head_size
    gs = cfg.group_size
    # transposed (in, out) layout; groups along in (axis -2)
    shapes = dict(
        embedding=(V, D), wq=(L, D, nh * hs), wk=(L, D, kd), wv=(L, D, kd),
        wo=(L, nh * hs, D), w1=(L, D, H), w2=(L, H, D), w3=(L, D, H),
        classifier=(D, V),
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), len(shapes))
    out = dict(
        attn_norm=jnp.ones((L, D), jnp.float32),
        ffn_norm=jnp.ones((L, D), jnp.float32),
        out_norm=jnp.ones((D,), jnp.float32),
    )
    sval = scale / qmax

    pack = qtype == QuantType.INT4

    @jax.jit
    def gen_all(keys):
        res = {}
        for key, (name, shape) in zip(keys, shapes.items()):
            data = jax.random.randint(key, shape, -qmax, qmax + 1,
                                      jnp.int32).astype(dt)
            if name == "embedding":
                sshape = (*shape[:-1], shape[-1] // gs)
                res[name] = QArray(data, jnp.full(sshape, sval, jnp.float32),
                                   qtype, gs, group_axis=-1)
                continue
            sshape = (*shape[:-2], shape[-2] // gs, shape[-1])
            from fastllama_tpu.ops.pallas.qmm import pack_supported
            packed = pack and pack_supported(shape[-2], shape[-1], gs)
            if packed:
                # pack on device in SPLIT-HALF order (pack_int4_rows_np):
                # low nibble = row i, high nibble = row i + I/2
                half = shape[-2] // 2
                lo = data[..., :half, :].astype(jnp.int32) & 0x0F
                hi = (data[..., half:, :].astype(jnp.int32) & 0x0F) << 4
                data = (lo | hi).astype(jnp.int8)
            res[name] = QArray(data, jnp.full(sshape, sval, jnp.float32),
                               qtype, gs, group_axis=-2, packed=packed)
        return res

    out.update(gen_all(keys))
    return LlamaParams(**out)


def truncate_params(cfg: ModelConfig, params: LlamaParams, n_layers: int
                    ) -> tuple:
    """(cfg', params') keeping only the FIRST ``n_layers`` layers — a
    correlated draft model for speculative decoding built from the target
    checkpoint itself (no second checkpoint needed; shares embedding /
    classifier / final norm, so early-exit-style drafting).  Slices copy
    n_layers/L of the stacked weights (extra HBM in that proportion)."""
    if not 0 < n_layers <= cfg.n_layers:
        raise ValueError(f"n_layers {n_layers} out of range")

    def take(w):
        if isinstance(w, QArray):
            return QArray(w.data[:n_layers], w.scales[:n_layers], w.qtype,
                          w.group_size, w.group_axis, w.packed)
        return w[:n_layers]

    p = LlamaParams(
        embedding=params.embedding,
        attn_norm=take(params.attn_norm), wq=take(params.wq),
        wk=take(params.wk), wv=take(params.wv), wo=take(params.wo),
        ffn_norm=take(params.ffn_norm), w1=take(params.w1),
        w2=take(params.w2), w3=take(params.w3),
        out_norm=params.out_norm, classifier=params.classifier)
    return cfg.replace(n_layers=n_layers), p


def requantize_params(cfg: ModelConfig, params: LlamaParams,
                      qtype: QuantType) -> LlamaParams:
    """Re-quantize every projection to ``qtype`` THROUGH the current
    quantization (dequant -> quant, per tensor on device) — the
    same-weights-lower-precision draft for speculative decoding.  Non-QArray
    leaves and norms pass through."""
    from fastllama_tpu.quant.groupquant import dequantize, quantize

    @jax.jit
    def requant_leaf(w):
        fp = dequantize(w)
        if w.group_axis == -2:       # groups along the contraction axis
            q = quantize(jnp.swapaxes(fp, -1, -2), qtype, w.group_size)
            return QArray(jnp.swapaxes(q.data, -1, -2),
                          jnp.swapaxes(q.scales, -1, -2), qtype,
                          w.group_size, -2, False)
        q = quantize(fp, qtype, w.group_size)
        return QArray(q.data, q.scales, qtype, w.group_size, w.group_axis,
                      False)

    def conv(w):
        if isinstance(w, QArray):
            if w.packed:
                raise ValueError("requantize of packed INT4 not supported")
            return requant_leaf(w)
        return w

    return LlamaParams(**{f.name: conv(getattr(params, f.name))
                          for f in dataclasses.fields(LlamaParams)})


def random_params(cfg: ModelConfig, seed: int = 0,
                  qtype: Optional[QuantType] = None,
                  scale: float = 0.02) -> LlamaParams:
    """Random (quantized) parameters, generated on-device — for tests and the
    synthetic-weights benchmark."""
    qtype = qtype if qtype is not None else cfg.quant_type
    L, D, H, V = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.vocab_size
    kd, nh, hs = cfg.kv_dim, cfg.n_heads, cfg.head_size
    shapes = dict(
        embedding=(V, D), wq=(L, D, nh * hs), wk=(L, D, kd), wv=(L, D, kd),
        wo=(L, nh * hs, D), w1=(L, D, H), w2=(L, H, D), w3=(L, D, H),
        classifier=(D, V),
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), len(shapes))
    out = dict(
        attn_norm=jnp.ones((L, D), jnp.float32),
        ffn_norm=jnp.ones((L, D), jnp.float32),
        out_norm=jnp.ones((D,), jnp.float32),
    )
    for key, (name, shape) in zip(keys, shapes.items()):
        w = jax.random.normal(key, shape, jnp.float32) * scale
        if qtype == QuantType.NONE:
            out[name] = w
        elif name == "embedding":
            out[name] = quantize(w, qtype, cfg.group_size)
        else:
            # quantize along the contraction axis (-2): quantize the
            # transposed view then swap data/scales back
            q = quantize(jnp.swapaxes(w, -1, -2), qtype, cfg.group_size)
            out[name] = QArray(jnp.swapaxes(q.data, -1, -2),
                               jnp.swapaxes(q.scales, -1, -2),
                               qtype, cfg.group_size, group_axis=-2)
    return LlamaParams(**out)
