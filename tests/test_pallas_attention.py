"""Fused decode-attention kernel vs jnp reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.ops.attention import gqa_attention
from fastllama_tpu.ops.pallas.attention import decode_attention_pallas, make_attn


@pytest.mark.parametrize("n_heads,n_kv,S,hs,pos", [
    (8, 4, 64, 64, 0),
    (8, 4, 64, 64, 13),
    (4, 4, 128, 128, 63),
    (8, 2, 64, 64, 62),
])
def test_decode_attention_matches_jnp(n_heads, n_kv, S, hs, pos):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n_heads, 1, hs)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(n_kv, S, hs)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(n_kv, S, hs)), jnp.float32)
    ref = gqa_attention(q, kc, vc, pos)
    got = decode_attention_pallas(q, kc, vc, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_stale_cache_rows_masked():
    """Garbage beyond pos must not leak (causal mask vs absolute position)."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(4, 1, 64)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(2, 32, 64)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(2, 32, 64)), jnp.float32)
    pos = 5
    out1 = decode_attention_pallas(q, kc, vc, pos, interpret=True)
    kc2 = kc.at[:, pos + 1:].set(1e9)   # poison stale rows
    vc2 = vc.at[:, pos + 1:].set(-1e9)
    out2 = decode_attention_pallas(q, kc2, vc2, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_make_attn_prefill_fallback():
    attn = make_attn(interpret=True)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(4, 8, 64)), jnp.float32)  # T=8 prefill
    kc = jnp.asarray(rng.normal(size=(2, 32, 64)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(2, 32, 64)), jnp.float32)
    ref = gqa_attention(q, kc, vc, 0)
    got = attn(q, kc, vc, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_flash_block_tail_kernel_matches_jnp():
    """The T-row bounded-window kernel (prefix-cache tail prefill) must
    match the jnp copy-and-mask path: fp32/int8 caches, GQA, traced
    slot/layer/start."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from fastllama_tpu.config import ModelConfig
    from fastllama_tpu.models.batched import (BatchedKVCache,
                                              prefill_into_slot_at)
    from fastllama_tpu.models.llama import random_params
    from fastllama_tpu.ops.pallas.flash_decode import make_attn_tail

    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=256, max_seq_len=64,
                      group_size=16)
    params = random_params(cfg, seed=2)
    rng = np.random.default_rng(0)
    for kv in ("float32", "int8"):
        cache = BatchedKVCache.create(cfg, 3, dtype=jnp.dtype(kv))
        # populate slot 1 with a 24-token "prefix" via a fresh prefill
        from fastllama_tpu.models.batched import prefill_into_slot
        pref = jnp.asarray(rng.integers(1, 250, 24), jnp.int32)
        _, cache = prefill_into_slot(cfg, params, pref, 24, 1, cache,
                                     compute_dtype=jnp.float32)
        tail = jnp.asarray(rng.integers(1, 250, 16), jnp.int32)

        ref_lg, ref_cache = jax.jit(partial(
            prefill_into_slot_at, cfg, compute_dtype=jnp.float32))(
            params, tail, 13, 1, 24, cache)
        got_lg, got_cache = jax.jit(partial(
            prefill_into_slot_at, cfg,
            attn_tail=make_attn_tail(interpret=True),
            compute_dtype=jnp.float32))(params, tail, 13, 1, 24, cache)
        np.testing.assert_allclose(np.asarray(got_lg), np.asarray(ref_lg),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_cache.k),
                                   np.asarray(ref_cache.k),
                                   rtol=2e-3, atol=2e-3)
