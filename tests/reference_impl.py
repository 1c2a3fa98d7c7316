"""Straight-line numpy re-implementation of the reference C++ math, used as
the golden model in parity tests.

Follows the exact semantics of:
* group quantization with truncation (quant_operators.cpp:26-47),
* both-sides-quantized grouped int matmul (quant_operators.cpp:252-284),
* rmsnorm with eps=1e-5 (x86_simd.cpp:1750-1754),
* interleaved rope_v2 (tf_operators.cpp:355-402),
* per-layer dataflow of ParallelTransformer::forward (transformer.cpp:105-161).

Weights are fp32 in the reference's native **interleaved** RoPE convention.
This file deliberately mirrors C++ loop structure, not JAX idioms.
"""
from __future__ import annotations

import numpy as np

QF = {"int16": 5792, "int8": 127, "int4": 7}
NPT = {"int16": np.int16, "int8": np.int8, "int4": np.int8}


def quantize_ref(x: np.ndarray, qtype: str, gs: int = 64):
    g = x.astype(np.float32).reshape(*x.shape[:-1], x.shape[-1] // gs, gs)
    scales = np.abs(g).max(axis=-1) / QF[qtype]
    safe = np.where(scales > 0, scales, 1.0)
    q = np.trunc(g / safe[..., None]).astype(NPT[qtype])
    return q.reshape(x.shape), scales.astype(np.float32)


def qmatmul_ref(x: np.ndarray, wq: np.ndarray, ws: np.ndarray, qtype: str,
                gs: int = 64) -> np.ndarray:
    """out[b,o] = sum_g int_dot(w[o,g], x[b,g]) * ws[o,g] * xs[b,g]."""
    xqd, xs = quantize_ref(x, qtype, gs)
    O, I = wq.shape
    G = I // gs
    wg = wq.reshape(O, G, gs).astype(np.int64)
    xg = xqd.reshape(x.shape[0], G, gs).astype(np.int64)
    acc = np.einsum("ogk,bgk->bog", wg, xg).astype(np.float32)
    return (acc * ws[None] * xs[:, None, :]).sum(axis=-1)


def fmatmul_ref(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    return x.astype(np.float32) @ w.astype(np.float32).T


def rmsnorm_ref(x: np.ndarray, w: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    r = 1.0 / np.sqrt((x.astype(np.float32) ** 2).mean(axis=-1, keepdims=True) + eps)
    return w * (r * x)


def softmax_ref(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def rope_v2_ref(x: np.ndarray, pos: int, head_size: int) -> np.ndarray:
    """Interleaved-pair rotation, theta_p = pos * base^(-2p/head_size)
    (tf_operators.cpp:367-401). x: (head_size,) one head at one position."""
    out = x.astype(np.float32).copy()
    theta_scale = 10000.0 ** (-2.0 / head_size)
    theta = float(pos)
    for i in range(0, head_size, 2):
        c, s = np.cos(theta), np.sin(theta)
        x0, x1 = out[i], out[i + 1]
        out[i] = x0 * c - x1 * s
        out[i + 1] = x0 * s + x1 * c
        theta *= theta_scale
    return out


class RefLlama:
    """Single-sequence forward with a growing KV cache (per-head lists)."""

    def __init__(self, cfg, weights: dict, qtype: str | None, gs: int = 64):
        """weights: fp32 dict with keys embedding, attn_norm(L,D), wq(L,O,I),
        ... in interleaved convention.  qtype None = pure fp32 path."""
        self.cfg = cfg
        self.gs = gs
        self.qtype = qtype
        self.w = {}
        for name in ("embedding", "wq", "wk", "wv", "wo", "w1", "w2", "w3",
                     "classifier"):
            arr = weights[name].astype(np.float32)
            if qtype is None:
                self.w[name] = arr
            else:
                self.w[name] = quantize_ref(arr, qtype, gs)
        for name in ("attn_norm", "ffn_norm", "out_norm"):
            self.w[name] = weights[name].astype(np.float32)
        S = cfg.max_seq_len
        self.k_cache = np.zeros((cfg.n_layers, cfg.n_kv_heads, S, cfg.head_size),
                                np.float32)
        self.v_cache = np.zeros_like(self.k_cache)
        self.pos = 0

    def _mm(self, x, name, layer=None):
        if self.qtype is None:
            w = self.w[name] if layer is None else self.w[name][layer]
            return fmatmul_ref(x, w)
        wq, ws = self.w[name]
        if layer is not None:
            wq, ws = wq[layer], ws[layer]
        return qmatmul_ref(x, wq, ws, self.qtype, self.gs)

    def _embed(self, tokens):
        if self.qtype is None:
            return self.w["embedding"][tokens].astype(np.float32)
        eq, es = self.w["embedding"]
        g = eq[tokens].reshape(len(tokens), -1, self.gs).astype(np.float32)
        return (g * es[tokens][..., None]).reshape(len(tokens), -1)

    def forward(self, tokens) -> np.ndarray:
        """Process tokens at positions pos..pos+T-1; returns logits of the
        last token.  Mirrors transformer.cpp:105-161."""
        cfg = self.cfg
        T = len(tokens)
        hs, n_kv, hgs = cfg.head_size, cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads
        x = self._embed(np.asarray(tokens))
        for l in range(cfg.n_layers):
            h = rmsnorm_ref(x, self.w["attn_norm"][l])
            q = self._mm(h, "wq", l)          # (T, n_heads*hs)
            k = self._mm(h, "wk", l)          # (T, kv_dim)
            v = self._mm(h, "wv", l)
            att_out = np.zeros((T, cfg.n_heads * hs), np.float32)
            for t in range(T):
                p = self.pos + t
                for kh in range(n_kv):
                    kv = rope_v2_ref(k[t, kh * hs:(kh + 1) * hs], p, hs)
                    self.k_cache[l, kh, p] = kv
                    self.v_cache[l, kh, p] = v[t, kh * hs:(kh + 1) * hs]
                    for g in range(hgs):
                        qh = cfg.n_kv_heads * 0 + kh * hgs + g
                        qv = rope_v2_ref(q[t, qh * hs:(qh + 1) * hs], p, hs)
                        scores = (self.k_cache[l, kh, :p + 1] @ qv) / np.sqrt(hs)
                        probs = softmax_ref(scores[None])[0]
                        att_out[t, qh * hs:(qh + 1) * hs] = \
                            probs @ self.v_cache[l, kh, :p + 1]
            x = x + self._mm(att_out, "wo", l)
            h = rmsnorm_ref(x, self.w["ffn_norm"][l])
            g1 = self._mm(h, "w1", l)
            g3 = self._mm(h, "w3", l)
            hd = g1 / (1.0 + np.exp(-g1)) * g3
            x = x + self._mm(hd, "w2", l)
        self.pos += T
        xl = rmsnorm_ref(x[-1:], self.w["out_norm"])
        return self._mm(xl, "classifier")[0]
