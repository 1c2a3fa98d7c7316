"""GSPMD sharding tests on the 8-device virtual CPU mesh (SURVEY §4):
TP-sharded forward must equal single-device forward; dryrun entry must run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import ModelConfig, QuantType
from fastllama_tpu.models.llama import KVCache, forward, random_params
from fastllama_tpu.parallel.sharding import (cache_sharding, make_mesh,
                                             pad_hidden_for_sharding,
                                             param_shardings, shard_cache,
                                             shard_params)

CFG = ModelConfig(dim=128, hidden_dim=256 * 4, n_layers=2, n_heads=8,
                  n_kv_heads=4, vocab_size=512, max_seq_len=32,
                  quant_type=QuantType.INT8)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return make_mesh("data=1,model=4", jax.devices()[:4])


def test_tp_forward_matches_single_device(mesh):
    cfg = CFG
    params = random_params(cfg, seed=3)
    tokens = jnp.asarray([3, 9, 100, 17], jnp.int32)

    ref, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, tokens, KVCache.create(cfg))

    sp = shard_params(cfg, mesh, params)
    sc = shard_cache(cfg, mesh, KVCache.create(cfg))
    got, new_cache = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        sp, tokens, sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # sharded decode step after sharded prefill
    nxt_ref, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 4, c))(
        params, jnp.asarray([7], jnp.int32), _prefill_cache(cfg, params, tokens))
    nxt, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 4, c))(
        sp, jnp.asarray([7], jnp.int32), new_cache)
    np.testing.assert_allclose(np.asarray(nxt), np.asarray(nxt_ref),
                               rtol=2e-4, atol=2e-4)


def _prefill_cache(cfg, params, tokens):
    _, cache = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, tokens, KVCache.create(cfg))
    return cache


def test_weights_actually_sharded(mesh):
    cfg = CFG
    params = random_params(cfg, seed=3)
    sp = shard_params(cfg, mesh, params)
    # column-parallel wq (L, D, O): each device holds O/4 of the out-features
    shard_shapes = [s.data.shape for s in sp.wq.data.addressable_shards]
    O = cfg.n_heads * cfg.head_size
    assert all(s[2] == O // 4 for s in shard_shapes)
    # row-parallel w2 (L, H, D): input axis split, scales split on group axis
    assert all(s.data.shape[1] == cfg.hidden_dim // 4
               for s in sp.w2.data.addressable_shards)
    assert all(s.data.shape[1] == cfg.hidden_dim // cfg.group_size // 4
               for s in sp.w2.scales.addressable_shards)


def test_kv_head_mismatch_raises():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh8 = make_mesh("data=1,model=8", jax.devices()[:8])
    cfg = CFG  # n_kv_heads=4 < 8 and 8 % 4 == 0 -> allowed (replicated kv)
    params = random_params(cfg, seed=0)
    sh = param_shardings(cfg, mesh8, params)  # should not raise
    cs = cache_sharding(cfg, mesh8)
    assert cs is not None
    bad = cfg.replace(n_kv_heads=3, n_heads=6, dim=96)
    with pytest.raises(ValueError):
        param_shardings(bad, mesh8, random_params(bad, seed=0))


def test_pad_hidden_for_sharding():
    cfg = ModelConfig(dim=64, hidden_dim=11008 % 704 + 704, n_layers=1,
                      n_heads=4, n_kv_heads=4, vocab_size=128, max_seq_len=8)
    # any H not aligned to 64*8=512
    cfg = cfg.replace(hidden_dim=704)
    from fastllama_tpu.tools.synthetic import tiny_weights
    w = tiny_weights(cfg, seed=1)
    ref_out = None
    cfg2 = pad_hidden_for_sharding(cfg, w, model_parallel=8)
    assert cfg2.hidden_dim == 1024
    assert w["w1"].shape == (1, 1024, 64)
    assert w["w2"].shape == (1, 64, 1024)
    # padding is exact: forward with padded weights == unpadded
    from fastllama_tpu.models.llama import build_params
    w0 = tiny_weights(cfg, seed=1)
    p0 = build_params(cfg, w0, QuantType.INT8)
    p1 = build_params(cfg2, w, QuantType.INT8)
    toks = jnp.asarray([1, 5], jnp.int32)
    l0, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        p0, toks, KVCache.create(cfg))
    l1, _ = jax.jit(lambda p, t, c: forward(cfg2, p, t, 0, c))(
        p1, toks, KVCache.create(cfg2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)


def test_dryrun_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(min(8, len(jax.devices())))


def test_batched_engine_on_mesh_matches_single(tmp_path):
    """Continuous batching with a GSPMD mesh (EngineConfig.mesh) must give
    the same greedy outputs as the single-device batched engine."""
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    prompts = ["the cat sat", "a big dog"]

    ref_eng = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32"), decode_chunk=4)
    want = [r.output_tokens for r in ref_eng.generate_all(
        prompts, max_new_tokens=8, temperature=0.0, stop_tokens=())]

    mesh_eng = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh="data=1,model=2"),
        decode_chunk=4)
    assert mesh_eng.mesh is not None
    got = [r.output_tokens for r in mesh_eng.generate_all(
        prompts, max_new_tokens=8, temperature=0.0, stop_tokens=())]
    assert got == want


def test_engine_on_mesh_matches_single(tmp_path):
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.engine import Engine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    ref = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                      EngineConfig(max_seq_len=64, compute_dtype="float32"))
    want, _ = ref.generate("the cat", max_new_tokens=8, temperature=0.0,
                           stop_tokens=())
    mesh_eng = Engine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, compute_dtype="float32",
                     mesh="data=1,model=2"))
    got, _ = mesh_eng.generate("the cat", max_new_tokens=8, temperature=0.0,
                               stop_tokens=())
    assert got == want


def test_distributed_single_host_noop():
    """distributed.initialize is a safe no-op off-pod; global_mesh covers
    local devices."""
    from fastllama_tpu.parallel import distributed

    distributed.initialize()
    assert not distributed.is_multiprocess()
    mesh = distributed.global_mesh(f"data=1,model={min(4, len(jax.devices()))}")
    assert mesh.shape["model"] >= 1


def test_gqa_oversharding_groupwise_kv(tmp_path):
    """model axis > n_kv_heads (TinyLlama-style GQA): KV projections and the
    cache shard groupwise over the 'kv' sub-axis (each head replicated only
    within its query-head group) instead of full replication, and engine
    outputs still match the single-device run."""
    import jax
    import numpy as np
    from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.parallel.sharding import make_mesh, param_shardings
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=2, vocab_size=512, max_seq_len=64,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompts = ["the cat sat", "a big dog"]

    base = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32"), decode_chunk=4)
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]

    eng = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh="data=1,model=4"),
        decode_chunk=4)
    # the cache's kv-head axis is SHARDED over the 2 kv heads: each device
    # holds exactly 1 head (groupwise replication across the other axis)
    shard_shape = eng.cache.k.addressable_shards[0].data.shape
    assert shard_shape[2] == 1
    # wk's out-features shard is kv_dim / n_kv (one head's columns)
    wk_shard = eng.params.wk.data.addressable_shards[0].data.shape
    assert wk_shard[2] == cfg.kv_dim // cfg.n_kv_heads
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want
