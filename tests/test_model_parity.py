"""End-to-end logit parity of the JAX model against the numpy re-implementation
of the C++ reference math (tests/reference_impl.py), plus incremental-decode
consistency (the step-3 correctness gate of SURVEY §7)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import ModelConfig, QuantType
from fastllama_tpu.models.llama import (KVCache, LlamaParams, build_params,
                                        forward, random_params)
from fastllama_tpu.ops.qmatmul import qmatmul, qmatmul_parity
from fastllama_tpu.ops.rope import deinterleave_heads
from tests.reference_impl import RefLlama

CFG = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
                  vocab_size=256, max_seq_len=32)


def make_weights(cfg, seed=0):
    """fp32 weights in the reference's interleaved convention."""
    rng = np.random.default_rng(seed)
    L, D, H, V = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.vocab_size
    kd, nh, hs = cfg.kv_dim, cfg.n_heads, cfg.head_size

    def w(*shape):
        return (rng.normal(size=shape) * 0.08).astype(np.float32)

    return dict(
        embedding=w(V, D), attn_norm=1 + 0.1 * w(L, D),
        wq=w(L, nh * hs, D), wk=w(L, kd, D), wv=w(L, kd, D), wo=w(L, D, nh * hs),
        ffn_norm=1 + 0.1 * w(L, D), w1=w(L, H, D), w2=w(L, D, H), w3=w(L, H, D),
        out_norm=1 + 0.1 * w(D), classifier=w(V, D),
    )


def to_params(cfg, weights, qtype):
    """Deinterleave wq/wk (the load-time convention change) and build params."""
    raw = dict(weights)
    raw["wq"] = deinterleave_heads(raw["wq"], cfg.head_size)
    raw["wk"] = deinterleave_heads(raw["wk"], cfg.head_size)
    return build_params(cfg, raw, qtype)


# Quantized tolerances are looser than fp32: the reference quantizes
# activations by truncation (quant_operators.cpp:33-45), so ~1e-6 float
# differences (rope table construction, softmax) flip individual quantized
# values by 1 LSB and diffuse through layers.  The C++ binary's own
# approximated softmax (tf_operators.cpp:188-209) diverges from exact math
# the same way.  Argmax must still agree.
@pytest.mark.parametrize("qtype,mm,tol", [
    (QuantType.NONE, qmatmul, 2e-4),
    (QuantType.INT8, qmatmul_parity, 3e-2),
    (QuantType.INT16, qmatmul_parity, 2e-3),
])
def test_logit_parity_vs_cpp_math(qtype, mm, tol):
    cfg = CFG
    weights = make_weights(cfg)
    params = to_params(cfg, weights, qtype)
    ref = RefLlama(cfg, weights,
                   None if qtype == QuantType.NONE else qtype.name.lower())

    tokens = [3, 17, 91, 200, 5]
    ref_logits = ref.forward(tokens)

    cache = KVCache.create(cfg)
    fwd = jax.jit(lambda p, t, pos, c: forward(cfg, p, t, pos, c, mm=mm),
                  static_argnames=())
    logits, cache = fwd(params, jnp.asarray(tokens, jnp.int32), 0, cache)
    got = np.asarray(logits[-1])
    scale = max(1.0, np.abs(ref_logits).max())
    assert np.abs(got - ref_logits).max() / scale < tol
    assert int(np.argmax(got)) == int(np.argmax(ref_logits))


def test_incremental_decode_matches_prefill():
    """forward(one token at a time) == forward(full prompt) — the static-cache
    indexing/masking correctness gate."""
    cfg = CFG
    params = random_params(cfg, seed=1, qtype=QuantType.INT8)
    tokens = jnp.asarray([3, 17, 91, 200, 5, 42], jnp.int32)

    cache = KVCache.create(cfg)
    full_logits, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, tokens, cache)

    cache = KVCache.create(cfg)
    step = jax.jit(lambda p, t, pos, c: forward(cfg, p, t, pos, c))
    for i in range(len(tokens)):
        logits, cache = step(params, tokens[i:i + 1], i, cache)
        np.testing.assert_allclose(np.asarray(logits[0]),
                                   np.asarray(full_logits[i]),
                                   rtol=2e-4, atol=2e-4)


def test_parity_mm_matches_ref_matmul():
    from tests.reference_impl import qmatmul_ref, quantize_ref
    from fastllama_tpu.quant.groupquant import QArray
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 128)).astype(np.float32)
    w = rng.normal(size=(16, 128)).astype(np.float32)  # (O, I) checkpoint layout
    for qt in ("int8", "int16"):
        wq, ws = quantize_ref(w, qt)
        ref = qmatmul_ref(x, wq, ws, qt)
        qa = QArray(jnp.asarray(wq.T), jnp.asarray(ws.T),
                    QuantType.parse(qt), 64, group_axis=-2)
        got = np.asarray(qmatmul_parity(jnp.asarray(x), qa))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_padded_prefill_logits_match():
    """Padded prompt + logits_at(length-1) == unpadded last-token logits."""
    from fastllama_tpu.models.llama import logits_at
    cfg = CFG
    params = random_params(cfg, seed=2, qtype=QuantType.INT8)
    tokens = jnp.asarray([9, 4, 100], jnp.int32)
    cache = KVCache.create(cfg)
    exact, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, tokens, cache)

    padded = jnp.concatenate([tokens, jnp.zeros(5, jnp.int32)])
    cache = KVCache.create(cfg)
    pl, cache2 = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, padded, cache)
    np.testing.assert_allclose(np.asarray(logits_at(pl, 3)),
                               np.asarray(exact[-1]), rtol=2e-4, atol=2e-4)

    # decode after padded prefill attends only to valid positions
    nxt, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 3, c))(
        params, jnp.asarray([7], jnp.int32), cache2)
    cache3 = KVCache.create(cfg)
    _, cache3 = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, tokens, cache3)
    nxt_ref, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 3, c))(
        params, jnp.asarray([7], jnp.int32), cache3)
    np.testing.assert_allclose(np.asarray(nxt), np.asarray(nxt_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_params_match_unfused():
    from fastllama_tpu.models.llama import fuse_params
    cfg = CFG
    params = random_params(cfg, seed=9, qtype=QuantType.INT8)
    fused = fuse_params(cfg, params)
    assert fused.wk is None and fused.w3 is None
    tokens = jnp.asarray([4, 99, 200], jnp.int32)
    ref, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, tokens, KVCache.create(cfg))
    got, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        fused, tokens, KVCache.create(cfg))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
