"""Deferred staged-KV decode chunks (EngineConfig.deferred_kv).

The staged path must produce the same numbers as the sequential per-step
slab writes: attention composes cache rows [0, pos0) (flash kernel, with
softmax stats), the chunk's earlier staged rows (attended in cache dtype,
exactly what a sequential step reads back), and the own fresh row (full
precision).  Checked teacher-forced at the step level (logits + landed
cache) and end-to-end through BatchedEngine against the plain chunk path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.models.batched import (BatchedKVCache, decode_step,
                                          decode_step_deferred, land_staged,
                                          make_staged, prefill_into_slot)
from fastllama_tpu.models.llama import random_params
from fastllama_tpu.runtime.batching import BatchedEngine
from fastllama_tpu.tools.synthetic import write_tiny_llama2c


def _cfg():
    # S=64: divisible by every kv sublane (int8 32 / bf16 16 / f32 8), so
    # the spec_write landing and the kv writers engage
    return ModelConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                       n_kv_heads=2, vocab_size=96, max_seq_len=64,
                       quant_type=QuantType.NONE, group_size=8)


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_deferred_steps_match_plain(kv_dtype):
    """K teacher-forced deferred steps == K plain decode_steps: per-step
    logits and the landed cache."""
    from fastllama_tpu.ops.pallas.flash_decode import \
        make_attn_batched_flash_stats
    from fastllama_tpu.ops.pallas.kv_write import make_spec_writer

    cfg = _cfg()
    params = random_params(cfg, seed=3, qtype=QuantType.NONE)
    B, K = 3, 4
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, size=n).tolist()
               for n in (3, 5, 2)]
    tokens = rng.integers(1, cfg.vocab_size, size=(K, B)).astype(np.int32)

    def fresh_cache():
        c = BatchedKVCache.create(cfg, B, dtype=jnp.dtype(kv_dtype))
        for b, p in enumerate(prompts):
            _, c = prefill_into_slot(cfg, params,
                                     jnp.asarray(p, jnp.int32), len(p), b, c)
        return c

    pos0 = jnp.asarray([len(p) for p in prompts], jnp.int32)

    # plain: sequential steps, per-step cache writes
    cache = fresh_cache()
    pos = pos0
    plain_logits = []
    for s in range(K):
        lg, cache = decode_step(cfg, params, jnp.asarray(tokens[s]), pos,
                                cache)
        plain_logits.append(np.asarray(lg))
        pos = pos + 1
    plain_cache = cache

    # deferred: staged rows + one landing
    cache = fresh_cache()
    attn_stats = make_attn_batched_flash_stats(interpret=True)
    staged = make_staged(cfg, cache, B, K)
    def_logits = []
    for s in range(K):
        lg, staged = decode_step_deferred(
            cfg, params, jnp.asarray(tokens[s]), pos0, jnp.int32(s),
            staged, cache, attn_stats=attn_stats)
        def_logits.append(np.asarray(lg))
    def_cache = land_staged(cache, staged, pos0,
                            make_spec_writer(interpret=True))

    for s in range(K):
        np.testing.assert_allclose(def_logits[s], plain_logits[s],
                                   rtol=2e-5, atol=2e-5, err_msg=f"step {s}")

    # landed rows equal the sequentially written ones (whole cache: rows
    # outside [pos0, pos0+K) were never touched by either path)
    for a, b in zip(jax.tree.leaves(def_cache), jax.tree.leaves(plain_cache)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("deferred_ckpt")
    return write_tiny_llama2c(str(d))


def _engine(ckpt, deferred: bool) -> BatchedEngine:
    return BatchedEngine.load(
        ckpt[0], ckpt[1], FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", kv_dtype="int8",
                     pallas_interpret=True, deferred_kv=deferred),
        decode_chunk=4)


def test_deferred_engine_matches_plain(ckpt):
    plain = _engine(ckpt, deferred=False)
    eng = _engine(ckpt, deferred=True)
    assert eng._deferred_ok, "deferred path did not engage"
    assert not plain._deferred_ok

    prompts = ["the cat sat", "a big dog", "once upon a"]
    want = [r.output_tokens for r in
            plain.generate_all(prompts, max_new_tokens=12, temperature=0.0)]
    got = [r.output_tokens for r in
           eng.generate_all(prompts, max_new_tokens=12, temperature=0.0)]
    assert got == want

    # sampled path: same seeds => same tokens when the logits agree
    plain2 = _engine(ckpt, deferred=False)
    eng2 = _engine(ckpt, deferred=True)
    want = [r.output_tokens for r in
            plain2.generate_all(prompts, max_new_tokens=10, temperature=0.8,
                                seed=7)]
    got = [r.output_tokens for r in
           eng2.generate_all(prompts, max_new_tokens=10, temperature=0.8,
                             seed=7)]
    assert got == want
