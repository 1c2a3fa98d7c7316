"""shard_map decode step (parallel/spmd_step.py) vs the replicated
decode_step on the virtual CPU mesh — the round-2 fast-multichip direction
validated for numerics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import ModelConfig, QuantType
from fastllama_tpu.models.batched import (BatchedKVCache, decode_step,
                                          prefill_into_slot)
from fastllama_tpu.models.llama import random_params
from fastllama_tpu.parallel.sharding import (make_mesh, shard_params,
                                             slot_cache_sharding)
from fastllama_tpu.parallel.spmd_step import spmd_decode_step
from fastllama_tpu.ops.qmatmul import qmatmul

# group_size 16 so row-parallel scale arrays (I/gs) divide the 4-way mesh
CFG = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, vocab_size=256, max_seq_len=32,
                  quant_type=QuantType.INT8, group_size=16)


@pytest.mark.parametrize("kv", ["float32", "int8"])
def test_spmd_decode_matches_replicated(kv):
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    mesh = make_mesh("data=1,model=4", jax.devices()[:4])
    params = random_params(CFG, seed=3)
    B = 2

    cache = BatchedKVCache.create(CFG, B, dtype=jnp.dtype(kv))
    toks = jnp.asarray([3, 9, 100, 17], jnp.int32)
    for b in range(B):
        _, cache = prefill_into_slot(CFG, params, toks, 4, b, cache,
                                     compute_dtype=jnp.float32)
    pend = jnp.asarray([7, 11], jnp.int32)
    pos = jnp.asarray([4, 4], jnp.int32)
    ref_lg, ref_cache = decode_step(CFG, params, pend, pos, cache,
                                    compute_dtype=jnp.float32)

    sp = shard_params(CFG, mesh, params)
    sh5, sh4 = slot_cache_sharding(CFG, mesh, B)
    sc = jax.tree.map(
        lambda a: jax.device_put(a, sh5 if a.ndim == 5 else sh4), cache)
    from functools import partial
    got_lg, got_cache = jax.jit(partial(
        spmd_decode_step, CFG, mesh, mm=qmatmul, mm_idx=None,
        attn_bidx=None, compute_dtype=jnp.float32))(sp, pend, pos, sc)

    np.testing.assert_allclose(np.asarray(got_lg), np.asarray(ref_lg),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_cache.k), np.asarray(ref_cache.k),
                               rtol=2e-4, atol=2e-4)


def test_spmd_decode_with_pallas_kernels_interpret():
    """The fused kernels (interpret mode) run PER SHARD under shard_map —
    the actual round-2 goal: multi-chip with the single-chip kernels."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from fastllama_tpu.ops.pallas.flash_decode import make_attn_batched_flash
    from fastllama_tpu.ops.pallas.qmm import make_mm, make_mm_indexed

    mesh = make_mesh("data=1,model=4", jax.devices()[:4])
    params = random_params(CFG, seed=3)
    B = 2
    cache = BatchedKVCache.create(CFG, B, dtype=jnp.float32)
    toks = jnp.asarray([3, 9, 100, 17], jnp.int32)
    for b in range(B):
        _, cache = prefill_into_slot(CFG, params, toks, 4, b, cache,
                                     compute_dtype=jnp.float32)
    pend = jnp.asarray([7, 11], jnp.int32)
    pos = jnp.asarray([4, 4], jnp.int32)
    ref_lg, _ = decode_step(CFG, params, pend, pos, cache,
                            compute_dtype=jnp.float32)

    sp = shard_params(CFG, mesh, params)
    sh5, sh4 = slot_cache_sharding(CFG, mesh, B)
    sc = jax.tree.map(
        lambda a: jax.device_put(a, sh5 if a.ndim == 5 else sh4), cache)
    from functools import partial
    got_lg, _ = jax.jit(partial(
        spmd_decode_step, CFG, mesh,
        mm=make_mm(compute_dtype=jnp.float32, interpret=True),
        mm_idx=make_mm_indexed(compute_dtype=jnp.float32, interpret=True),
        attn_bidx=make_attn_batched_flash(interpret=True),
        compute_dtype=jnp.float32))(sp, pend, pos, sc)
    np.testing.assert_allclose(np.asarray(got_lg), np.asarray(ref_lg),
                               rtol=2e-3, atol=2e-3)


def test_spmd_prefill_matches_replicated():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from fastllama_tpu.models.batched import prefill_many
    from fastllama_tpu.parallel.spmd_step import spmd_prefill_many

    mesh = make_mesh("data=1,model=4", jax.devices()[:4])
    params = random_params(CFG, seed=5)
    B, T = 3, 8
    toks = jnp.arange(1, B * T + 1, dtype=jnp.int32).reshape(B, T) % 200
    lens = jnp.asarray([8, 5, 3], jnp.int32)
    slots = jnp.asarray([0, 1, 2], jnp.int32)

    cache = BatchedKVCache.create(CFG, B)
    ref_lg, ref_cache = prefill_many(CFG, params, toks, lens, slots, cache,
                                     compute_dtype=jnp.float32)

    sp = shard_params(CFG, mesh, params)
    sh5, sh4 = slot_cache_sharding(CFG, mesh, B)
    sc = jax.tree.map(
        lambda a: jax.device_put(a, sh5 if a.ndim == 5 else sh4),
        BatchedKVCache.create(CFG, B))
    from functools import partial
    got_lg, got_cache = jax.jit(partial(
        spmd_prefill_many, CFG, mesh, mm=qmatmul, mm_idx=None,
        compute_dtype=jnp.float32))(sp, toks, lens, slots, sc)
    np.testing.assert_allclose(np.asarray(got_lg), np.asarray(ref_lg),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_cache.k),
                               np.asarray(ref_cache.k), rtol=2e-4, atol=2e-4)


def test_batched_engine_spmd_kernels_matches_default(tmp_path):
    """EngineConfig(spmd_kernels=True) on a mesh must serve the same greedy
    outputs as the GSPMD default path."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    # group_size 16: the spmd path needs row-parallel group counts (I/gs)
    # divisible by the model axis
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=512, max_seq_len=64,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompts = ["the cat sat", "a big dog"]

    base = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh="data=1,model=2"),
        decode_chunk=4)
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=8, temperature=0.0, stop_tokens=())]

    spmd = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh="data=1,model=2",
                     spmd_kernels=True),
        decode_chunk=4)
    assert spmd._spmd
    got = [r.output_tokens for r in spmd.generate_all(
        prompts, max_new_tokens=8, temperature=0.0, stop_tokens=())]
    assert got == want


def test_batched_engine_spmd_pallas_interpret_matches_default(tmp_path):
    """spmd_kernels + pallas_interpret: the fused kernels (interpret mode)
    run inside shard_map at the ENGINE level — dims sized so the kernels
    actually engage per shard (O_local % 128 == 0, hs % 8 == 0)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=256, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=512, max_seq_len=64,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompts = ["the cat sat", "a big dog"]

    base = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32"),
        decode_chunk=4)
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]

    spmd = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh="data=1,model=2",
                     spmd_kernels=True, pallas_interpret=True),
        decode_chunk=4)
    assert spmd._spmd and spmd.ec.use_pallas
    assert spmd._attn_bidx is not None and spmd._mm_idx is not None
    got = [r.output_tokens for r in spmd.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want


def test_single_engine_spmd_pallas_interpret_matches_default(tmp_path):
    """Single-stream Engine under spmd_kernels: prefill via
    spmd_prefill_many(N=1), decode via spmd_decode_step(B=1), fused
    interpret-mode kernels per shard."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.engine import Engine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=256, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=512, max_seq_len=64,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)

    base = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                       EngineConfig(max_seq_len=64, compute_dtype="float32"))
    want, _ = base.generate("the cat sat", max_new_tokens=6,
                            temperature=0.0, stop_tokens=(), decode_chunk=3)

    spmd = Engine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, compute_dtype="float32",
                     mesh="data=1,model=2", spmd_kernels=True,
                     pallas_interpret=True))
    assert spmd._spmd and spmd._sp_attn_bidx is not None
    got, _ = spmd.generate("the cat sat", max_new_tokens=6,
                           temperature=0.0, stop_tokens=(), decode_chunk=3)
    assert got == want


def test_batched_engine_spmd_int8kv_matches_default(tmp_path):
    """spmd_kernels with the int8 KV cache: quantized per-row scales shard
    over the model axis and dequantize inside the shard_map body."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=512, max_seq_len=64,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompts = ["the cat sat", "a big dog"]

    base = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", kv_dtype="int8"),
        decode_chunk=4)
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]

    spmd = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", kv_dtype="int8",
                     mesh="data=1,model=2", spmd_kernels=True),
        decode_chunk=4)
    got = [r.output_tokens for r in spmd.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want


def test_batched_engine_spmd_prefix_cache_matches_default(tmp_path):
    """prefix_cache + spmd_kernels (round-2 flagged hazard): the tail
    prefill runs through spmd_prefill_tail under shard_map with the
    interpret-mode Pallas tail kernel; hit-path outputs must equal the
    plain single-device engine's."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=256, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=512, max_seq_len=128,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    system = [(i * 5) % 400 + 2 for i in range(40)]
    p1 = system + [7, 9]
    p2 = system + [11, 13, 15]

    def run(mesh, spmd):
        eng = BatchedEngine.load(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
            EngineConfig(max_seq_len=128, max_batch_size=3,
                         compute_dtype="float32", prefix_cache=True,
                         mesh=mesh, spmd_kernels=spmd,
                         pallas_interpret=spmd), decode_chunk=4)
        r1 = eng.submit(p1, max_new_tokens=40, temperature=0.0,
                        stop_tokens=())
        eng.step()
        r2 = eng.submit(p2, max_new_tokens=6, temperature=0.0,
                        stop_tokens=())
        eng.run()
        return r1.output_tokens, r2.output_tokens, eng.stats

    o1_base, o2_base, st_base = run("", False)
    o1_sp, o2_sp, st_sp = run("data=1,model=2", True)
    assert st_base.prefix_hits == st_sp.prefix_hits == 1
    assert o1_sp == o1_base
    assert o2_sp == o2_base
