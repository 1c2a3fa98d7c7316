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
