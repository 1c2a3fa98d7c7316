"""Numeric debugging aids.

Counterpart of the reference's activation-fingerprinting tools
(``src/utils/ftdebug.{h,cpp}``: ``print_vector_feat`` fingerprint at
ftdebug.cpp:11-54, top-k probe at 56-127) and the tensor pretty-printer
(tensor.cpp:286-338) — used to chase numerics layer by layer.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def tensor_fingerprint(x, name: str = "", sample: int = 8) -> str:
    """Compact stats line: shape, dtype, mean/std/min/max, head sample,
    checksum — the equivalent of print_vector_feat (ftdebug.cpp:11-54)."""
    a = np.asarray(x, dtype=np.float32).reshape(-1)
    if a.size == 0:
        return f"{name}: <empty>"
    head = np.array2string(a[:sample], precision=4, separator=",")
    csum = float(np.sum(a, dtype=np.float64))
    return (f"{name} shape={tuple(np.shape(x))} "
            f"mean={a.mean():.5f} std={a.std():.5f} "
            f"min={a.min():.4f} max={a.max():.4f} sum={csum:.4f} head={head}")


def top_k(logits, k: int = 8, tokenizer=None) -> str:
    """Top-k logits probe (ftdebug.cpp:56-127)."""
    a = np.asarray(logits, dtype=np.float32).reshape(-1)
    idx = np.argsort(-a)[:k]
    parts = []
    for i in idx:
        piece = ""
        if tokenizer is not None:
            piece = repr(tokenizer.decode_one(int(i)))
        parts.append(f"{int(i)}{piece}:{a[i]:.4f}")
    return "  ".join(parts)


def assert_finite(x, name: str = "tensor") -> None:
    a = np.asarray(x)
    if not np.isfinite(a).all():
        n_nan = int(np.isnan(a).sum())
        n_inf = int(np.isinf(a).sum())
        raise FloatingPointError(f"{name}: {n_nan} NaNs, {n_inf} Infs "
                                 f"in {a.shape}")


def weight_stats(value, name: str = "weights", max_rows: int = 4096) -> str:
    """Weight-statistics probe — the ``analyze_weights`` analogue
    (transformer.cpp:173-207): per-row dynamic-range summary of a weight
    tensor (mean half-range ``midf``, mean max-magnitude ``maxf``) plus
    global min/max.  Accepts a plain array or a QArray (dequantized first);
    leading layer axes are flattened into rows."""
    from fastllama_tpu.quant.groupquant import QArray, dequantize
    if isinstance(value, QArray):
        value = dequantize(value, np.float32)
    a = np.asarray(value, np.float32)
    rows = a.reshape(-1, a.shape[-1]) if a.ndim > 1 else a.reshape(1, -1)
    if rows.shape[0] > max_rows:                 # sample evenly, stay cheap
        rows = rows[:: rows.shape[0] // max_rows + 1]
    rmin = rows.min(axis=1)
    rmax = rows.max(axis=1)
    midf = float(np.mean((rmax - rmin) / 2))
    maxf = float(np.mean(np.maximum(np.abs(rmax), np.abs(rmin))))
    return (f"{name} shape={tuple(np.shape(a))} rows={rows.shape[0]} "
            f"midf={midf:.5f} maxf={maxf:.5f} "
            f"min={float(a.min()):.4f} max={float(a.max()):.4f}")


def params_stats(params, print_fn=print) -> None:
    """Run :func:`weight_stats` over every LlamaParams leaf (the full-model
    numerics-chasing sweep the reference runs on attn_q only)."""
    import dataclasses
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        if v is not None:
            print_fn(weight_stats(v, name=f.name))


def compare(a, b, name: str = "", rtol: float = 1e-5) -> str:
    """Side-by-side diff summary (the test pattern of x86_simd.cpp:1923-1951)."""
    av = np.asarray(a, np.float32)
    bv = np.asarray(b, np.float32)
    diff = np.abs(av - bv)
    denom = max(np.abs(bv).max(), 1e-30)
    return (f"{name} max_abs_diff={diff.max():.3e} "
            f"rel={diff.max()/denom:.3e} "
            f"{'OK' if diff.max()/denom < rtol else 'MISMATCH'}")
