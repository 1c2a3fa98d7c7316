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
