"""Batched speculative decoding (runtime/spec_batching.py): greedy outputs
must equal the plain BatchedEngine's for ANY draft quality; the verify step
must match sequential decode steps; repetitive prompts must actually
accept."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.models.batched import (BatchedKVCache, decode_step,
                                          prefill_into_slot, spec_decode_step)
from fastllama_tpu.models.llama import random_params

CFG = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, vocab_size=512, max_seq_len=128,
                  group_size=16)


@pytest.mark.parametrize("kv", ["float32", "int8"])
def test_spec_decode_step_matches_sequential(kv):
    """Verify-step logits row d must equal the d-th sequential decode step
    when fed the same tokens (teacher-forced equivalence)."""
    params = random_params(CFG, seed=3)
    B, D = 2, 4
    cache_a = BatchedKVCache.create(CFG, B, dtype=jnp.dtype(kv))
    toks = jnp.asarray([3, 9, 100, 17], jnp.int32)
    for b in range(B):
        _, cache_a = prefill_into_slot(CFG, params, toks, 4, b, cache_a,
                                       compute_dtype=jnp.float32)
    cache_b = jax.tree.map(lambda a: a.copy() if a is not None else None,
                           cache_a)

    batch = jnp.asarray([[7, 11, 13, 2], [5, 19, 23, 29]], jnp.int32)
    pos0 = jnp.asarray([4, 4], jnp.int32)

    lg_spec, cache_a = spec_decode_step(CFG, params, batch, pos0, cache_a,
                                        compute_dtype=jnp.float32)

    seq_logits = []
    pos = pos0
    for d in range(D):
        lg, cache_b = decode_step(CFG, params, batch[:, d], pos, cache_b,
                                  compute_dtype=jnp.float32)
        seq_logits.append(np.asarray(lg))
        pos = pos + 1
    seq = np.stack(seq_logits, axis=1)                   # (B, D, V)
    np.testing.assert_allclose(np.asarray(lg_spec), seq, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k),
                               rtol=1e-5, atol=1e-5)


def _engines(tmp_path, spec_kwargs=None):
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    ec = EngineConfig(max_seq_len=128, max_batch_size=3,
                      compute_dtype="float32")
    base = BatchedEngine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                              ec, decode_chunk=8)
    spec = SpecBatchedEngine.load_spec(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8, ec, decode_chunk=8,
        **(spec_kwargs or {}))
    return base, spec


def test_spec_batched_matches_plain_greedy(tmp_path):
    base, spec = _engines(tmp_path, dict(width=4, rounds_per_chunk=3))
    prompts = [[1, 5, 9, 13, 80, 200, 31], [2, 4, 6], [7, 7, 7, 7]]
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=20, temperature=0.0, stop_tokens=())]
    got = [r.output_tokens for r in spec.generate_all(
        prompts, max_new_tokens=20, temperature=0.0, stop_tokens=())]
    assert got == want


def test_spec_batched_repetitive_accepts(tmp_path):
    """Forcing a cyclic continuation: generate twice from the same engine;
    the second pass re-serves a prompt containing the first pass's output,
    so n-gram lookups hit and acceptance must rise above zero."""
    base, spec = _engines(tmp_path, dict(width=4, rounds_per_chunk=4))
    prompt = [1, 5, 9, 13, 80, 200, 31]
    want, = (r.output_tokens for r in base.generate_all(
        [prompt], max_new_tokens=30, temperature=0.0, stop_tokens=()))
    # prompt extended by the greedy continuation repeated: the tail repeats
    # earlier content so prompt-lookup drafts match
    rep = prompt + want[:20] + prompt
    want2, = (r.output_tokens for r in base.generate_all(
        [rep], max_new_tokens=20, temperature=0.0, stop_tokens=()))
    got2, = (r.output_tokens for r in spec.generate_all(
        [rep], max_new_tokens=20, temperature=0.0, stop_tokens=()))
    assert got2 == want2
    assert spec.spec_drafted > 0


def test_spec_batched_staggered_and_stop(tmp_path):
    """Mid-stream admissions + a request finishing inside a spec chunk."""
    base, spec = _engines(tmp_path, dict(width=3, rounds_per_chunk=2))
    p1 = [1, 5, 9, 13]
    p2 = [2, 4, 6, 8, 10]
    p3 = [11, 3]

    def run(eng):
        r1 = eng.submit(p1, max_new_tokens=9, temperature=0.0,
                        stop_tokens=())
        eng.step()
        r2 = eng.submit(p2, max_new_tokens=17, temperature=0.0,
                        stop_tokens=())
        r3 = eng.submit(p3, max_new_tokens=5, temperature=0.0,
                        stop_tokens=())
        eng.run()
        return [r1.output_tokens, r2.output_tokens, r3.output_tokens]

    assert run(spec) == run(base)


def test_spec_batched_near_context_limit(tmp_path):
    """Falls back to plain chunks when no D-row block fits; still emits the
    full generation."""
    base, spec = _engines(tmp_path, dict(width=4, rounds_per_chunk=8))
    prompt = list(range(2, 110))                     # 108 of max_seq 128
    want = [r.output_tokens for r in base.generate_all(
        [prompt], max_new_tokens=19, temperature=0.0, stop_tokens=())]
    got = [r.output_tokens for r in spec.generate_all(
        [prompt], max_new_tokens=19, temperature=0.0, stop_tokens=())]
    assert got == want
    assert len(got[0]) == 19


@pytest.mark.parametrize("kv", ["float32", "int8"])
def test_flash_spec_kernel_matches_jnp(kv):
    """flash_spec_batched (interpret) vs the jnp spec attention, incl. the
    exact-diagonal path on quantized caches."""
    from fastllama_tpu.ops.attention import gqa_attention_spec_batched
    from fastllama_tpu.ops.pallas.flash_decode import flash_spec_batched
    from fastllama_tpu.quant.groupquant import dequantize_rows, quantize_rows

    rng = np.random.RandomState(1)
    L, B, n_kv, S, hs = 2, 3, 4, 64, 8
    n_heads, T = 8, 4
    layer = 1
    ck = jnp.asarray(rng.randn(L, B, n_kv, S, hs), jnp.float32)
    cv = jnp.asarray(rng.randn(L, B, n_kv, S, hs), jnp.float32)
    ksc = vsc = None
    if kv == "int8":
        ckq, ksc4 = quantize_rows(ck)
        cvq, vsc4 = quantize_rows(cv)
        ksc, vsc = ksc4[..., 0], vsc4[..., 0]
        ck_d = dequantize_rows(ckq, ksc4, jnp.float32)
        cv_d = dequantize_rows(cvq, vsc4, jnp.float32)
        ck_use, cv_use = ckq, cvq
    else:
        ck_use, cv_use = ck, cv
        ck_d, cv_d = ck, cv
    q = jnp.asarray(rng.randn(B, n_heads, T, hs), jnp.float32)
    kn = jnp.asarray(rng.randn(B, n_kv, T, hs), jnp.float32)
    vn = jnp.asarray(rng.randn(B, n_kv, T, hs), jnp.float32)
    ke = jnp.asarray(rng.randn(B, n_kv, T, hs), jnp.float32)
    ve = jnp.asarray(rng.randn(B, n_kv, T, hs), jnp.float32)
    pos = jnp.asarray([5, 0, 37], jnp.int32)

    want = gqa_attention_spec_batched(
        q, ck_d[layer], cv_d[layer], kn, vn, pos,
        k_self=ke if kv == "int8" else None,
        v_self=ve if kv == "int8" else None)
    got = flash_spec_batched(
        q, ck_use, cv_use, pos, layer, 0, 32, True,
        k_scale=ksc, v_scale=vsc, k_new=kn, v_new=vn,
        k_self=ke if kv == "int8" else None,
        v_self=ve if kv == "int8" else None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_spec_batched_pallas_interpret_matches_plain(tmp_path):
    """SpecBatchedEngine with interpret-mode kernels (fused qmm + the
    batched spec-verify flash kernel) must equal the plain engine."""
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=256, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=512, max_seq_len=128,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompts = [[1, 5, 9, 13, 80, 200, 31], [2, 4, 6]]
    ec = EngineConfig(max_seq_len=128, max_batch_size=2,
                      compute_dtype="float32", kv_dtype="int8")
    base = BatchedEngine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                              ec, decode_chunk=8)
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=16, temperature=0.0, stop_tokens=())]

    ecp = EngineConfig(max_seq_len=128, max_batch_size=2,
                       compute_dtype="float32", kv_dtype="int8",
                       pallas_interpret=True)
    spec = SpecBatchedEngine.load_spec(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8, ecp, decode_chunk=8,
        width=4, rounds_per_chunk=3)
    assert spec._attn_sbidx_factory is not None
    got = [r.output_tokens for r in spec.generate_all(
        prompts, max_new_tokens=16, temperature=0.0, stop_tokens=())]
    assert got == want


@pytest.mark.parametrize("mesh", ["data=1,model=2", "data=2,model=2"])
def test_spec_batched_spmd_matches_plain(tmp_path, mesh):
    """SpecBatchedEngine under spmd_kernels (shard_map TP with interpret
    -mode fused kernels, incl. the per-shard flash spec-verify kernel and
    per-shard spec_write) must equal the plain single-device engine —
    VERDICT r3 #1: the fastest loop runs on every shard."""
    import jax as _jax
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    need = 2 if mesh == "data=1,model=2" else 4
    if len(_jax.devices()) < need:
        pytest.skip(f"needs >= {need} virtual devices")
    cfg = ModelConfig(dim=256, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=512, max_seq_len=128,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompts = [[1, 5, 9, 13, 80, 200, 31], [2, 4, 6]]

    base = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=128, max_batch_size=2,
                     compute_dtype="float32", kv_dtype="int8"),
        decode_chunk=8)
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=16, temperature=0.0, stop_tokens=())]

    spec = SpecBatchedEngine.load_spec(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=128, max_batch_size=2,
                     compute_dtype="float32", kv_dtype="int8",
                     mesh=mesh, spmd_kernels=True, pallas_interpret=True),
        decode_chunk=8, width=4, rounds_per_chunk=3)
    assert spec._spmd and spec._attn_sbidx_factory is not None
    assert spec._spec_writer is not None
    got = [r.output_tokens for r in spec.generate_all(
        prompts, max_new_tokens=16, temperature=0.0, stop_tokens=())]
    assert got == want


def test_spec_batched_mixed_sampling(tmp_path):
    """Mixed greedy + sampled slots run the sampled spec rounds: greedy
    requests stay bit-exact vs plain serving, sampled requests are
    deterministic for fixed seeds and complete."""
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    ec = EngineConfig(max_seq_len=128, max_batch_size=3,
                      compute_dtype="float32")
    base = BatchedEngine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                              ec, decode_chunk=8)
    g1 = base.submit([1, 5, 9, 13], max_new_tokens=14, temperature=0.0,
                     stop_tokens=())
    base.submit([2, 4, 6], max_new_tokens=10, temperature=0.8, topp=0.9,
                seed=7, stop_tokens=())
    base.run()

    def run_spec():
        # spec_auto=False: the SpecAutoTuner picks spec-vs-plain chunks by
        # measured wall time, so the sampled RNG stream (which differs
        # between chunk kinds) is only run-to-run deterministic with the
        # tuner off; greedy outputs are mode-independent either way
        spec = SpecBatchedEngine.load_spec(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8, ec,
            decode_chunk=8, width=4, rounds_per_chunk=2, spec_auto=False)
        a = spec.submit([1, 5, 9, 13], max_new_tokens=14, temperature=0.0,
                        stop_tokens=())
        b = spec.submit([2, 4, 6], max_new_tokens=10, temperature=0.8,
                        topp=0.9, seed=7, stop_tokens=())
        spec.run()
        return a.output_tokens, b.output_tokens, spec.spec_drafted

    a1, b1, drafted = run_spec()
    a2, b2, _ = run_spec()
    assert a1 == g1.output_tokens          # greedy slot: bit-exact
    assert (a1, b1) == (a2, b2)            # sampled slot: deterministic
    assert len(b1) == 10
    assert drafted > 0                     # sampled rounds actually ran


def test_spec_batched_onehot_accept_preserves_target():
    """Monte-Carlo check of the batched rounds' accept/residual-resample
    rule for ONE-HOT drafts (the n-gram drafter's q): accept draft y iff
    u < p(y); on rejection resample from norm(max(p - e_y, 0)).  The
    emitted marginal must equal the target p for ANY draft-proposal
    distribution — the identity the sampled spec chunk implements
    per slot/row (runtime/spec_batching.py)."""
    rng = np.random.default_rng(0)
    V = 6
    p = rng.random(V); p /= p.sum()
    d = rng.random(V); d /= d.sum()          # arbitrary drafter behaviour
    N = 200_000
    ys = rng.choice(V, size=N, p=d)
    u = rng.random(N)
    accept = u < p[ys]
    resid = np.maximum(p[None, :] - np.eye(V)[ys], 0.0)
    resid /= resid.sum(axis=1, keepdims=True)
    resample = np.array([rng.choice(V, p=resid[i]) for i in range(N)
                         if not accept[i]])
    out = np.concatenate([ys[accept], resample])
    emp = np.bincount(out, minlength=V) / N
    np.testing.assert_allclose(emp, p, atol=5e-3)


def test_spec_width_arms_tuner_unit():
    """Width-arm SpecAutoTuner (VERDICT r4 next #7): arms are plain (0) and
    spec@D for each candidate width; every arm is measured once, the
    fastest runs, and probes rotate round-robin over the losers."""
    from fastllama_tpu.runtime.spec_batching import SpecAutoTuner

    t = SpecAutoTuner(probe_every=4, widths=(4, 2))
    assert t.arms == [2, 4, 0]
    assert t.choose() == 2                 # measure every arm once...
    t.record(2, 200, 1.0)
    assert t.choose() == 4
    t.record(4, 260, 1.0)
    assert t.choose() == 0                 # ...plain last
    t.record(0, 230, 1.0)
    assert t.choose() == 0                 # count=4: probe fires (loser 0)
    assert t.choose() == 4                 # winner: spec@4
    # probes rotate over BOTH losers — sparser over time (each probe that
    # confirms the winner doubles the interval, capped at 8x probe_every)
    probes = set()
    for _ in range(40):
        a = t.choose()
        if a != 4:
            probes.add(a)
    assert probes == {0, 2}
    # alpha collapsing (spec@4 slowing) flips the width preference to 2,
    # and plain (230) becomes the overall winner — both from measurement
    for _ in range(30):
        t.record(4, 120, 1.0)
        t.record(2, 200, 1.0)
    assert t.ema[2] > t.ema[4]
    assert max(t.arms, key=lambda a: t.ema[a]) == 0


def test_spec_batched_width_arms_correct(tmp_path):
    """The engine's alpha-aware width arms ({2,4}+plain at width=4) mix
    chunk kinds by measured throughput — greedy outputs must still equal
    plain serving, and chunks must compile under more than one D."""
    base, spec = _engines(tmp_path, dict(width=4, rounds_per_chunk=2))
    assert spec._tuner is not None and spec._tuner.arms == [2, 4, 0]
    prompts = [[1, 5, 9, 13, 80, 200, 31], [2, 4, 6], [7, 7, 7, 7]]
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=24, temperature=0.0, stop_tokens=())]
    got = [r.output_tokens for r in spec.generate_all(
        prompts, max_new_tokens=24, temperature=0.0, stop_tokens=())]
    assert got == want
    # unmeasured-first arbitration ran spec at both widths
    widths_run = {k[2] for k in spec._spec_fns}
    assert widths_run == {2, 4}
    assert spec.spec_drafted > 0
