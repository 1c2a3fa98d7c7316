"""Continuous-batching tests: batched forward parity with the single-stream
engine, staggered admission through slots, per-slot sampling params, and the
batched Pallas decode-attention kernel (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.models.batched import (BatchedKVCache, decode_step,
                                          prefill_into_slot)
from fastllama_tpu.models.llama import random_params
from fastllama_tpu.ops import sampling
from fastllama_tpu.ops.attention import gqa_attention_batched
from fastllama_tpu.runtime.batching import BatchedEngine
from fastllama_tpu.runtime.engine import Engine
from fastllama_tpu.tools.synthetic import write_tiny_llama2c

PROMPTS = ["the cat sat", "a big dog", "once upon a", "hello world",
           "the end of"]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("batch_ckpt")
    return write_tiny_llama2c(str(d))


# fp32 compute: single-stream and batched paths reduce over different shapes
# (prefill attends the 64-row cache vs the prompt bucket), so bf16 rounding
# can flip near-ties of this random tiny model; fp32 keeps greedy bit-stable.
@pytest.fixture(scope="module")
def single(ckpt):
    return Engine.load(ckpt[0], ckpt[1], FileType.LLAMA2C, QuantType.INT8,
                       EngineConfig(max_seq_len=64, compute_dtype="float32"))


@pytest.fixture(scope="module")
def batched(ckpt):
    return BatchedEngine.load(
        ckpt[0], ckpt[1], FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32"), decode_chunk=4)


def _reset(eng: BatchedEngine):
    eng.queue.clear()
    eng.slot_req = [None] * eng.B
    eng.pos[:] = 0
    eng.pending[:] = 0


def test_batched_matches_single_greedy(single, batched):
    _reset(batched)
    want = {p: single.generate(p, max_new_tokens=10, temperature=0.0,
                               stop_tokens=())[0] for p in PROMPTS[:2]}
    reqs = batched.generate_all(PROMPTS[:2], max_new_tokens=10,
                                temperature=0.0, stop_tokens=())
    for req, p in zip(reqs, PROMPTS[:2]):
        assert req.done
        assert req.output_tokens == want[p], p


def test_staggered_admission(single, batched):
    """5 requests through 2 slots: later requests join as earlier ones free
    their slot; every output must still match the single-stream engine."""
    _reset(batched)
    want = {p: single.generate(p, max_new_tokens=8, temperature=0.0,
                               stop_tokens=())[0] for p in PROMPTS}
    reqs = [batched.submit(p, max_new_tokens=8, temperature=0.0,
                           stop_tokens=()) for p in PROMPTS]
    batched.run()
    for req, p in zip(reqs, PROMPTS):
        assert req.done
        assert req.output_tokens == want[p], p
    assert batched.stats.completed >= 5
    assert batched.stats.total_output_tokens >= 5 * 8


def test_stop_token_frees_slot(single, batched):
    _reset(batched)
    base = single.generate(PROMPTS[0], max_new_tokens=12, temperature=0.0,
                           stop_tokens=())[0]
    stop = base[3]
    req = batched.submit(PROMPTS[0], max_new_tokens=12, temperature=0.0,
                         stop_tokens=(stop,))
    batched.run()
    assert req.done
    assert req.output_tokens == base[:base.index(stop) + 1]
    assert all(r is None for r in batched.slot_req)


def test_mixed_sampling_params(batched):
    """Greedy and sampled requests coexist in one batch; the greedy one must
    be deterministic regardless of its neighbour."""
    _reset(batched)
    greedy_alone = batched.generate_all([PROMPTS[1]], max_new_tokens=8,
                                        temperature=0.0, stop_tokens=())
    _reset(batched)
    r_greedy = batched.submit(PROMPTS[1], max_new_tokens=8, temperature=0.0,
                              stop_tokens=())
    r_sampled = batched.submit(PROMPTS[2], max_new_tokens=8, temperature=0.9,
                               topp=0.8, seed=7, stop_tokens=())
    batched.run()
    assert r_greedy.output_tokens == greedy_alone[0].output_tokens
    assert len(r_sampled.output_tokens) == 8
    assert all(0 <= t < batched.config.vocab_size
               for t in r_sampled.output_tokens)


def test_callback_and_ttft(batched):
    _reset(batched)
    seen = []
    req = batched.submit(PROMPTS[3], max_new_tokens=6, temperature=0.0,
                         stop_tokens=(), callback=lambda txt, tok: seen.append(tok))
    batched.run()
    assert seen == req.output_tokens
    assert req.ttft >= 0.0
    assert req.finish_s >= req.first_token_s


# -- model-level parity ------------------------------------------------------

def _tiny_cfg():
    return ModelConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                       n_kv_heads=2, vocab_size=96, max_seq_len=24,
                       quant_type=QuantType.NONE, group_size=8)


def test_decode_step_matches_forward():
    """decode_step over B slots == B independent single-stream forwards."""
    from fastllama_tpu.models.llama import KVCache, forward

    cfg = _tiny_cfg()
    params = random_params(cfg, seed=3, qtype=QuantType.NONE)
    B = 3
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, size=n).tolist()
               for n in (3, 5, 2)]

    # single-stream references
    refs = []
    for p in prompts:
        cache = KVCache.create(cfg)
        lg, cache = forward(cfg, params, jnp.asarray(p, jnp.int32), 0, cache)
        toks = [int(jnp.argmax(lg[-1]))]
        pos = len(p)
        for _ in range(4):
            lg, cache = forward(cfg, params,
                                jnp.asarray([toks[-1]], jnp.int32), pos, cache)
            toks.append(int(jnp.argmax(lg[0])))
            pos += 1
        refs.append(toks)

    # batched: prefill each prompt into its slot, then joint decode steps
    bc = BatchedKVCache.create(cfg, B)
    pending = np.zeros(B, np.int32)
    pos = np.zeros(B, np.int32)
    for b, p in enumerate(prompts):
        logits, bc = prefill_into_slot(cfg, params, jnp.asarray(p, jnp.int32),
                                       len(p), b, bc)
        pending[b] = int(jnp.argmax(logits))
        pos[b] = len(p)
    outs = [[int(pending[b])] for b in range(B)]
    for _ in range(4):
        lg, bc = decode_step(cfg, params, jnp.asarray(pending),
                             jnp.asarray(pos), bc)
        pending = np.asarray(jnp.argmax(lg, axis=-1), np.int32)
        pos += 1
        for b in range(B):
            outs[b].append(int(pending[b]))

    assert outs == refs


def test_prefill_pads_are_harmless():
    """Padded prefill (T > length) must give the same last-token logits."""
    cfg = _tiny_cfg()
    params = random_params(cfg, seed=5, qtype=QuantType.NONE)
    toks = [5, 9, 2]
    bc1 = BatchedKVCache.create(cfg, 2)
    lg1, _ = prefill_into_slot(cfg, params, jnp.asarray(toks, jnp.int32),
                               3, 0, bc1)
    padded = jnp.asarray(toks + [7, 7, 7, 7, 7], jnp.int32)
    bc2 = BatchedKVCache.create(cfg, 2)
    lg2, _ = prefill_into_slot(cfg, params, padded, 3, 0, bc2)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=2e-5, atol=2e-5)


def test_sample_dynamic_semantics():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (50,)) * 3.0
    g = sampling.greedy(logits)
    assert int(sampling.sample_dynamic(logits, key, jnp.float32(0.0),
                                       jnp.float32(0.9))) == int(g)
    s_static = sampling.sample_top_p(logits, key, 0.8, 0.7)
    s_dyn = sampling.sample_dynamic(logits, key, jnp.float32(0.8),
                                    jnp.float32(0.7))
    assert int(s_static) == int(s_dyn)


def test_batched_pallas_attention_interpret():
    from fastllama_tpu.ops.pallas.attention import \
        decode_attention_pallas_batched

    B, L, n_kv, hgs, S, hs = 3, 2, 2, 2, 16, 8
    n_heads = n_kv * hgs
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, n_heads, 1, hs), jnp.float32)
    ck = jax.random.normal(ks[1], (L, B, n_kv, S, hs), jnp.float32)
    cv = jax.random.normal(ks[2], (L, B, n_kv, S, hs), jnp.float32)
    pos = jnp.asarray([3, 0, 15], jnp.int32)
    for layer in (0, 1):
        got = decode_attention_pallas_batched(q, ck, cv, pos, layer,
                                              interpret=True)
        want = gqa_attention_batched(q, ck[layer], cv[layer], pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_flash_decode_interpret():
    """Bounded-window flash kernel vs jnp reference: multi-block online
    softmax, per-slot positions, layer selection, s_bound windows."""
    from fastllama_tpu.ops.pallas.flash_decode import (flash_decode_batched,
                                                       flash_decode_single)
    from fastllama_tpu.ops.attention import gqa_attention

    B, L, n_kv, hgs, S, hs = 3, 2, 2, 2, 64, 8
    n_heads = n_kv * hgs
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (B, n_heads, 1, hs), jnp.float32)
    ck = jax.random.normal(ks[1], (L, B, n_kv, S, hs), jnp.float32)
    cv = jax.random.normal(ks[2], (L, B, n_kv, S, hs), jnp.float32)
    pos = jnp.asarray([3, 0, 63], jnp.int32)
    for layer in (0, 1):
        got = flash_decode_batched(q, ck, cv, pos, layer, block_s=16,
                                   interpret=True)
        want = gqa_attention_batched(q, ck[layer], cv[layer], pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    # bounded window: positions < s_bound, identical result
    pos2 = jnp.asarray([3, 0, 30], jnp.int32)
    got = flash_decode_batched(q, ck, cv, pos2, 1, s_bound=32, block_s=16,
                               interpret=True)
    want = gqa_attention_batched(q, ck[1], cv[1], pos2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # single-stream wrapper
    got = flash_decode_single(q[0], ck[:, 0], cv[:, 0], 3, 1, s_bound=16,
                              block_s=16, interpret=True)
    want = gqa_attention(q[0], ck[1, 0], cv[1, 0], 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_round_bound():
    from fastllama_tpu.ops.pallas.flash_decode import round_bound
    assert round_bound(0, 1024) == 1024
    assert round_bound(1, 1024) == 256
    assert round_bound(256, 1024) == 256
    assert round_bound(257, 1024) == 512
    assert round_bound(2000, 1024) == 1024
    assert round_bound(5, 64) == 64  # S < block: whole cache


def test_int8_kv_cache_close_to_fp32(ckpt):
    """Engine-level: int8 per-row-quantized KV cache produces logits close
    to the fp32 cache (same weights, same prompts)."""
    be_f = BatchedEngine.load(
        ckpt[0], ckpt[1], FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32"), decode_chunk=4)
    be_q = BatchedEngine.load(
        ckpt[0], ckpt[1], FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", kv_dtype="int8"),
        decode_chunk=4)
    assert be_q.cache.quantized and be_q.cache.k.dtype == jnp.int8
    rf = be_f.generate_all(PROMPTS[:2], max_new_tokens=8, temperature=0.0,
                           stop_tokens=())
    rq = be_q.generate_all(PROMPTS[:2], max_new_tokens=8, temperature=0.0,
                           stop_tokens=())
    # int8 KV perturbs logits slightly; greedy tokens should mostly agree
    agree = sum(a == b for r1, r2 in zip(rf, rq)
                for a, b in zip(r1.output_tokens, r2.output_tokens))
    total = sum(len(r.output_tokens) for r in rf)
    assert agree >= total * 0.7, f"only {agree}/{total} tokens agree"
    for r in rq:
        assert r.done and len(r.output_tokens) == 8


def test_quantize_rows_roundtrip():
    from fastllama_tpu.quant.groupquant import dequantize_rows, quantize_rows

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 32)) * 3.0
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 6, 1)
    back = dequantize_rows(q, s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=float(jnp.max(jnp.abs(x))) / 127 * 0.51)
    # zero rows stay zero (no div-by-zero)
    q0, s0 = quantize_rows(jnp.zeros((2, 8)))
    assert not np.any(np.asarray(q0))


def test_flash_decode_quantized_interpret():
    """int8-cache flash kernel == jnp attention over the dequantized cache."""
    from fastllama_tpu.ops.pallas.flash_decode import flash_decode_batched
    from fastllama_tpu.quant.groupquant import dequantize_rows, quantize_rows

    B, L, n_kv, hgs, S, hs = 2, 2, 2, 2, 64, 8
    n_heads = n_kv * hgs
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (B, n_heads, 1, hs), jnp.float32)
    ckf = jax.random.normal(ks[1], (L, B, n_kv, S, hs), jnp.float32)
    cvf = jax.random.normal(ks[2], (L, B, n_kv, S, hs), jnp.float32)
    ck, ck_s = quantize_rows(ckf)
    cv, cv_s = quantize_rows(cvf)
    ck_s4, cv_s4 = ck_s[..., 0], cv_s[..., 0]   # cache stores 4D scales
    pos = jnp.asarray([5, 63], jnp.int32)
    for layer in (0, 1):
        got = flash_decode_batched(q, ck, cv, pos, layer, block_s=16,
                                   interpret=True, k_scale=ck_s4,
                                   v_scale=cv_s4)
        want = gqa_attention_batched(q, dequantize_rows(ck[layer], ck_s[layer]),
                                     dequantize_rows(cv[layer], cv_s[layer]),
                                     pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_callback_cancel_frees_slot(batched):
    """Returning False from the streaming callback cancels the request
    (Engine.generate's contract) and frees the slot."""
    _reset(batched)
    seen = []

    def cb(text, tok):
        seen.append(tok)
        return len(seen) < 3

    req = batched.submit(PROMPTS[0], max_new_tokens=20, temperature=0.0,
                         stop_tokens=(), callback=cb)
    batched.run()
    assert req.done
    assert len(req.output_tokens) == 3
    assert all(r is None for r in batched.slot_req)


def test_packed_int4_fallback_paths():
    """decode_step/prefill_into_slot on packed INT4 params with NO Pallas
    kernels (mm_idx=None) — the CPU/mesh fallback — must work and match the
    unpacked params exactly."""
    cfg = ModelConfig(dim=1024, hidden_dim=1024, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=128, max_seq_len=16,
                      quant_type=QuantType.INT4)
    from fastllama_tpu.models.llama import random_params_int
    import dataclasses
    from fastllama_tpu.quant.groupquant import unpack_int4_rows

    params = random_params_int(cfg, seed=1)
    assert params.wq.packed
    unp = jax.tree_util.tree_map(
        lambda x: x, params)
    def unpack_leaf(v):
        from fastllama_tpu.quant.groupquant import QArray
        if isinstance(v, QArray) and v.packed:
            return QArray(unpack_int4_rows(v.data), v.scales, v.qtype,
                          v.group_size, v.group_axis, packed=False)
        return v
    fields = {f.name: unpack_leaf(getattr(params, f.name))
              for f in dataclasses.fields(params)}
    params_unp = type(params)(**fields)

    toks = jnp.asarray([3, 9, 2], jnp.int32)
    bc1 = BatchedKVCache.create(cfg, 2)
    bc2 = BatchedKVCache.create(cfg, 2)
    lg1, bc1 = prefill_into_slot(cfg, params, toks, 3, 0, bc1)
    lg2, bc2 = prefill_into_slot(cfg, params_unp, toks, 3, 0, bc2)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=1e-5, atol=1e-5)
    pend = jnp.asarray([5, 0], jnp.int32)
    pos = jnp.asarray([3, 0], jnp.int32)
    d1, _ = decode_step(cfg, params, pend, pos, bc1)
    d2, _ = decode_step(cfg, params_unp, pend, pos, bc2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)


def test_packed_int4_shard_params():
    """shard_params on a packed INT4 model must preserve the packed flag
    (static treedef field) and produce a usable tree."""
    from fastllama_tpu.models.llama import random_params_int
    from fastllama_tpu.parallel.sharding import make_mesh, shard_params

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg = ModelConfig(dim=1024, hidden_dim=1024, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=256, max_seq_len=16,
                      quant_type=QuantType.INT4)
    params = random_params_int(cfg, seed=0)
    assert params.wq.packed
    mesh = make_mesh("data=1,model=2", jax.devices()[:2])
    sp = shard_params(cfg, mesh, params)
    assert sp.wq.packed
    assert sp.wq.data.shape == params.wq.data.shape


def test_flash_decode_fresh_interpret():
    """Deferred-write mode: kernel attends rows [0,pos) strictly + the
    fresh row; checked against the jnp decode helper, with 8-divisible and
    odd head counts, plain and int8-quantized caches."""
    from fastllama_tpu.ops.attention import gqa_attention_decode_batched
    from fastllama_tpu.ops.pallas.flash_decode import flash_decode_batched
    from fastllama_tpu.quant.groupquant import dequantize_rows, quantize_rows

    for n_kv, hgs in ((8, 1), (2, 2), (4, 2)):
        B, L, S, hs = 3, 2, 64, 8
        n_heads = n_kv * hgs
        ks = jax.random.split(jax.random.PRNGKey(n_kv * 7 + hgs), 6)
        q = jax.random.normal(ks[0], (B, n_heads, hs), jnp.float32)
        ckf = jax.random.normal(ks[1], (L, B, n_kv, S, hs), jnp.float32)
        cvf = jax.random.normal(ks[2], (L, B, n_kv, S, hs), jnp.float32)
        k_new = jax.random.normal(ks[3], (B, n_kv, hs), jnp.float32)
        v_new = jax.random.normal(ks[4], (B, n_kv, hs), jnp.float32)
        pos = jnp.asarray([0, 5, 63], jnp.int32)

        got = flash_decode_batched(q[:, :, None], ckf, cvf, pos, 1,
                                   block_s=16, interpret=True,
                                   k_new=k_new, v_new=v_new)[:, :, 0]
        want = gqa_attention_decode_batched(q, ckf[1], cvf[1], k_new, v_new,
                                            pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=f"{n_kv}")

        ck, ck_s = quantize_rows(ckf)
        cv, cv_s = quantize_rows(cvf)
        got = flash_decode_batched(q[:, :, None], ck, cv, pos, 0,
                                   block_s=16, interpret=True,
                                   k_scale=ck_s[..., 0], v_scale=cv_s[..., 0],
                                   k_new=k_new, v_new=v_new)[:, :, 0]
        want = gqa_attention_decode_batched(
            q, dequantize_rows(ck[0], ck_s[0]), dequantize_rows(cv[0], cv_s[0]),
            k_new, v_new, pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=f"q{n_kv}")


def test_context_limit_exact_fill(batched):
    """A request whose prompt nearly fills the window is clamped to
    S - prompt - 1 new tokens, decodes through tail chunks (non-pow2 K
    buckets), and never overruns slot positions."""
    _reset(batched)
    S = batched.S
    long_prompt = list(range(2, 2 + S - 5))     # S-5 prompt tokens
    req = batched.submit(long_prompt, max_new_tokens=999, temperature=0.0,
                         stop_tokens=())
    assert req.max_new_tokens == S - len(long_prompt) - 1
    batched.run()
    assert req.done
    assert len(req.output_tokens) == req.max_new_tokens
    assert batched.pos.max() <= S - 1
    assert all(r is None for r in batched.slot_req)


def test_mixed_lengths_through_slots(batched):
    """Short and near-window requests interleave: the chunk K honours the
    tightest live slot without starving the long one."""
    _reset(batched)
    S = batched.S
    long_prompt = list(range(2, 2 + S - 8))
    r_long = batched.submit(long_prompt, max_new_tokens=7, temperature=0.0,
                            stop_tokens=())
    r_short = batched.submit([5, 7, 9], max_new_tokens=30, temperature=0.0,
                             stop_tokens=())
    batched.run()
    assert r_long.done and len(r_long.output_tokens) == 7
    assert r_short.done and len(r_short.output_tokens) == 30


def test_prefix_cache_hit_matches_full_prefill(tmp_path):
    """Shared-system-prompt admission: the second request copies the donor
    slot's K/V rows and prefills only its tail; outputs must equal the
    no-prefix-cache engine exactly."""
    import numpy as np
    from fastllama_tpu.config import EngineConfig, ModelConfig
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=512, max_seq_len=128,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    system = [(i * 5) % 400 + 2 for i in range(40)]     # shared 40-token prefix
    p1 = system + [7, 9]
    p2 = system + [11, 13, 15]

    def run(prefix_cache):
        eng = BatchedEngine.load(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
            EngineConfig(max_seq_len=128, max_batch_size=3,
                         compute_dtype="float32",
                         prefix_cache=prefix_cache), decode_chunk=4)
        r1 = eng.submit(p1, max_new_tokens=40, temperature=0.0,
                        stop_tokens=())
        eng.step()                       # admit + register r1 (stays live)
        assert not r1.done
        r2 = eng.submit(p2, max_new_tokens=6, temperature=0.0,
                        stop_tokens=())
        eng.run()
        return r1.output_tokens, r2.output_tokens, eng.stats

    o1_base, o2_base, st_base = run(False)
    o1_pc, o2_pc, st_pc = run(True)
    assert st_base.prefix_hits == 0
    assert st_pc.prefix_hits == 1
    # the shared prefix is reused at block granularity (40 -> 32 rows)
    assert st_pc.prefix_rows_reused == 32
    assert o1_pc == o1_base
    assert o2_pc == o2_base


def test_prefix_cache_released_on_completion(tmp_path):
    """Entries donated by a finished slot must not be used (idle-slot decode
    clobbers row 0): after the donor completes, the same prompt re-prefills
    fully and still decodes correctly."""
    from fastllama_tpu.config import EngineConfig, ModelConfig
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=512, max_seq_len=128,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompt = [(i * 5) % 400 + 2 for i in range(40)] + [7]

    eng = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=128, max_batch_size=2,
                     compute_dtype="float32", prefix_cache=True),
        decode_chunk=4)
    r1 = eng.submit(prompt, max_new_tokens=4, temperature=0.0,
                    stop_tokens=())
    eng.run()                            # r1 completes -> entries released
    assert r1.done and not eng._prefix_index
    r2 = eng.submit(prompt, max_new_tokens=4, temperature=0.0,
                    stop_tokens=())
    eng.run()
    assert eng.stats.prefix_hits == 0
    assert r2.output_tokens == r1.output_tokens


def test_prefix_hit_rejected_when_tail_bucket_overflows(tmp_path):
    """A hit whose plen + bucket(tail) exceeds the context must fall back
    to a full prefill: the tail prefill writes a full BUCKET of rows at
    start=plen, and dynamic_update_slice silently CLAMPS an out-of-range
    start — the tail rows would land over the copied prefix (misaligned
    KV, silently wrong output).  Regression for the round-3 review."""
    from fastllama_tpu.config import EngineConfig, ModelConfig
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=512, max_seq_len=128,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    shared = [(i * 5) % 400 + 2 for i in range(16)]      # one shared block
    donor_p = shared + [(i * 7) % 400 + 3 for i in range(104)]  # 120 tokens
    # 120 tokens sharing ONLY the first block: tail 104 -> bucket 128,
    # 16 + 128 = 144 > S=128 -> the hit must be refused
    hit_p = shared + [(i * 11) % 400 + 5 for i in range(104)]

    def run(prefix_cache):
        eng = BatchedEngine.load(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
            EngineConfig(max_seq_len=128, max_batch_size=2,
                         compute_dtype="float32",
                         prefix_cache=prefix_cache), decode_chunk=4)
        r1 = eng.submit(donor_p, max_new_tokens=7, temperature=0.0,
                        stop_tokens=())
        eng.step()                      # admit + register donor (stays live)
        r2 = eng.submit(hit_p, max_new_tokens=4, temperature=0.0,
                        stop_tokens=())
        eng.run()
        return r2.output_tokens, eng.stats

    o_base, st_base = run(False)
    o_pc, st_pc = run(True)
    assert st_pc.prefix_hits == 0       # refused, not mis-admitted
    assert o_pc == o_base


def test_scale_dtype_bf16_matches_prerounded(ckpt):
    """EngineConfig.scale_dtype="bfloat16" serving equals an f32-scale
    engine whose scale VALUES were pre-rounded to bf16, token for token:
    the kernels cast scales to bf16 before the dequant multiply either
    way, and every jnp consumer upcasts bf16 scales exactly — so bf16
    STORAGE (half the HBM scale stream) changes no math."""
    from fastllama_tpu.quant.groupquant import QArray

    ec = EngineConfig(max_seq_len=64, max_batch_size=2,
                      compute_dtype="float32", scale_dtype="bfloat16")
    eng_bf = BatchedEngine.load(ckpt[0], ckpt[1], FileType.LLAMA2C,
                                QuantType.INT8, ec, decode_chunk=4)

    eng_f32 = BatchedEngine.load(
        ckpt[0], ckpt[1], FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32"), decode_chunk=4)

    def preround(x):
        if isinstance(x, QArray):
            return QArray(x.data,
                          x.scales.astype(jnp.bfloat16).astype(jnp.float32),
                          x.qtype, x.group_size, x.group_axis, x.packed)
        return x

    eng_f32.params = jax.tree.map(
        preround, eng_f32.params,
        is_leaf=lambda x: isinstance(x, QArray))

    a = eng_bf.generate_all(PROMPTS[:2], max_new_tokens=10, temperature=0.0,
                            stop_tokens=())
    b = eng_f32.generate_all(PROMPTS[:2], max_new_tokens=10, temperature=0.0,
                             stop_tokens=())
    for ra, rb in zip(a, b):
        assert ra.done and rb.done
        assert ra.output_tokens == rb.output_tokens
