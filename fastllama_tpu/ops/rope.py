"""Rotary position embeddings — reference ``rope_v2`` semantics.

The reference rotates **adjacent pairs** ``(x[2p], x[2p+1])`` with
``theta_p = pos * base^(-2p/head_size)`` (``tf_operators.cpp:355-402``:
``theta_base`` starts at ``pos`` and is multiplied by
``theta_scale = base^(-2/n_dims)`` every pair; YaRN scaffolding is disabled,
``ext_factor = 0``).

TPU-first design: interleaved (stride-2) access on the minor axis is hostile
to the 8x128 VPU lanes, so at **load time** we permute the rows of Wq/Wk from
the interleaved convention into the "half" (rotate-half) convention
(``deinterleave_heads``) and apply standard rotate-half RoPE everywhere.
Attention only consumes q.k inner products, so any fixed permutation of head
dims is exact — verified in tests/test_rope.py against the interleaved
reference math.  HF checkpoints are natively in the half convention (the
reference's ``permute_qk``, convert_flm.py:1018-1023, converts HF ->
interleaved; we invert that choice).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_cos_sin(positions: jax.Array, head_size: int, theta: float = 10000.0,
                 dtype=jnp.float32):
    """cos/sin tables for given absolute positions. Shapes: (*pos, head_size//2)."""
    p = positions.astype(jnp.float32)
    freqs = theta ** (-jnp.arange(0, head_size // 2, dtype=jnp.float32)
                      * (2.0 / head_size))
    ang = p[..., None] * freqs
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def rope_tables(cfg, positions: jax.Array, dtype=jnp.float32):
    """cos/sin tables for a ModelConfig: plain RoPE unless the config's
    YaRN knobs are set (rope_ext_factor / rope_freq_scale)."""
    if cfg.rope_ext_factor != 0.0 or cfg.rope_freq_scale != 1.0 \
            or cfg.rope_attn_factor != 1.0:
        return rope_cos_sin_yarn(
            positions, cfg.head_size, cfg.rope_theta, cfg.rope_freq_scale,
            cfg.rope_ext_factor, cfg.rope_attn_factor, cfg.rope_beta_fast,
            cfg.rope_beta_slow, cfg.rope_orig_ctx or cfg.max_seq_len, dtype)
    return rope_cos_sin(positions, cfg.head_size, cfg.rope_theta, dtype)


def _yarn_corr_dim(n_dims: int, orig_ctx: int, n_rot: float,
                   base: float) -> float:
    """rope_yarn_corr_dim (tf_operators.cpp:352-354)."""
    return (n_dims * np.log(orig_ctx / (n_rot * 2.0 * np.pi))
            / (2.0 * np.log(base)))


def rope_cos_sin_yarn(positions: jax.Array, head_size: int,
                      theta: float = 10000.0, freq_scale: float = 1.0,
                      ext_factor: float = 0.0, attn_factor: float = 1.0,
                      beta_fast: float = 32.0, beta_slow: float = 1.0,
                      orig_ctx: int = 4096, dtype=jnp.float32):
    """YaRN-extended cos/sin tables — the reference's ``rope_v2`` scaling
    path (tf_operators.cpp:355-402; dormant there with ``ext_factor = 0``
    hardcoded at :358, live here for context extension).

    With ``ext_factor != 0``: per-frequency linear interpolation between the
    position-scaled angle (``freq_scale * ang``) and the raw angle, ramped
    between the YaRN correction dims; magnitudes scaled by
    ``attn_factor * (1 + 0.1 ln(1/freq_scale))``.  ``ext_factor == 0``
    degenerates to plain RoPE at ``freq_scale`` (matching the reference
    exactly, which gates only on ext_factor)."""
    n_dims = head_size
    p = positions.astype(jnp.float32)
    idx = jnp.arange(0, head_size // 2, dtype=jnp.float32)
    freqs = theta ** (-idx * (2.0 / head_size))
    ang_base = p[..., None] * freqs                     # theta_base per dim

    if ext_factor != 0.0:
        c0 = max(0.0, float(np.floor(_yarn_corr_dim(n_dims, orig_ctx,
                                                    beta_fast, theta))))
        c1 = min(float(n_dims - 1),
                 float(np.ceil(_yarn_corr_dim(n_dims, orig_ctx, beta_slow,
                                              theta))))
        ramp = 1.0 - jnp.clip((idx - c0) / max(1e-3, c1 - c0), 0.0, 1.0)
        ang = freq_scale * ang_base * (1.0 - ramp) + ang_base * ramp
        mscale = attn_factor * (1.0 + 0.1 * float(np.log(1.0 / freq_scale)))
    else:
        ang = freq_scale * ang_base
        mscale = attn_factor
    return ((jnp.cos(ang) * mscale).astype(dtype),
            (jnp.sin(ang) * mscale).astype(dtype))


def apply_rope_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE. ``x``: (..., head_size); cos/sin broadcastable to
    (..., head_size//2)."""
    h = x.shape[-1] // 2
    x1, x2 = x[..., :h], x[..., h:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Reference-layout RoPE on adjacent pairs (tf_operators.cpp:374-401).
    Used only in parity tests; the runtime path uses rotate-half on
    deinterleaved weights."""
    shape = x.shape
    xp = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    x0, x1 = xp[..., 0], xp[..., 1]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.stack([o0, o1], axis=-1).reshape(shape)


def deinterleave_perm(head_size: int) -> np.ndarray:
    """Permutation mapping interleaved dims -> half-layout dims:
    [0,2,4,...,1,3,5,...]."""
    return np.concatenate([np.arange(0, head_size, 2), np.arange(1, head_size, 2)])


def deinterleave_heads(w: np.ndarray, head_size: int) -> np.ndarray:
    """Reorder the output rows of a (..., n_heads*head_size, in_dim) weight so
    that interleaved-convention RoPE becomes rotate-half.  Applied at load to
    Wq/Wk of llama2c / FLM / GGUF checkpoints (which use the Meta interleaved
    convention, cf. the reference applying rope_v2 to them directly)."""
    out_dim = w.shape[-2]
    n_heads = out_dim // head_size
    perm = deinterleave_perm(head_size)
    idx = (np.arange(n_heads)[:, None] * head_size + perm[None, :]).reshape(-1)
    return np.take(w, idx, axis=-2)
