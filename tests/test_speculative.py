"""Speculative decoding (runtime/speculative.py): output must equal plain
greedy decode for ANY draft — a perfect draft, a garbage draft, and the
draft-free n-gram drafter — acceptance only changes speed."""
import math

import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.runtime.engine import Engine
from fastllama_tpu.runtime.speculative import SpeculativeEngine, _ngram_draft

CFG = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, vocab_size=512, max_seq_len=128,
                  group_size=16)


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c
    d = tmp_path_factory.mktemp("spec")
    ckpt, tokp = write_tiny_llama2c(str(d), cfg=CFG)
    target = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                         EngineConfig(max_seq_len=128,
                                      compute_dtype="float32"))
    same = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                       EngineConfig(max_seq_len=128,
                                    compute_dtype="float32"))
    d2 = tmp_path_factory.mktemp("spec_other")
    ckpt2, tokp2 = write_tiny_llama2c(str(d2), cfg=CFG, seed=99)
    other = Engine.load(ckpt2, tokp2, FileType.LLAMA2C, QuantType.INT8,
                        EngineConfig(max_seq_len=128,
                                     compute_dtype="float32"))
    return target, same, other


PROMPT = [1, 5, 9, 13, 80, 200, 31]
N = 24


def _plain(target):
    toks, _ = target.generate(PROMPT, max_new_tokens=N, temperature=0.0,
                              stop_tokens=(), decode_chunk=8)
    return toks


def test_spec_same_draft_matches_greedy_and_accepts(engines):
    target, same, _ = engines
    want = _plain(target)
    spec = SpeculativeEngine(target, draft=same, width=4)
    got, st = spec.generate(PROMPT, max_new_tokens=N, stop_tokens=())
    assert got == want
    # identical draft weights -> every draft token accepted
    assert st.acceptance == 1.0
    assert st.rounds <= math.ceil((N - 1) / 4) + 1


def test_spec_unrelated_draft_matches_greedy(engines):
    target, _, other = engines
    want = _plain(target)
    spec = SpeculativeEngine(target, draft=other, width=4)
    got, st = spec.generate(PROMPT, max_new_tokens=N, stop_tokens=())
    assert got == want            # rejected drafts never corrupt the output
    assert st.rounds >= st.accepted / 3  # sanity: stats populated


def test_spec_ngram_draft_matches_greedy(engines):
    target, _, _ = engines
    want = _plain(target)
    spec = SpeculativeEngine(target, draft=None, width=4, ngram=2)
    got, st = spec.generate(PROMPT, max_new_tokens=N, stop_tokens=())
    assert got == want
    # tiny random models loop quickly -> the n-gram drafter should land
    # at least some acceptances once the output becomes periodic
    assert st.drafted > 0


def test_spec_stop_token_mid_round(engines):
    target, same, _ = engines
    want, _ = target.generate(PROMPT, max_new_tokens=N, temperature=0.0,
                              decode_chunk=8)   # default stops (0, eos)
    spec = SpeculativeEngine(target, draft=same, width=4)
    got, _ = spec.generate(PROMPT, max_new_tokens=N)
    assert got == want


def test_ngram_draft_lookup():
    hist = np.asarray([7, 8, 9, 4, 5, 7, 8], np.int32)
    # trailing 2-gram (7, 8) occurred at start; next tokens were 9, 4, 5
    np.testing.assert_array_equal(_ngram_draft(hist, 2, 3), [9, 4, 5])
    # no match -> zeros
    np.testing.assert_array_equal(
        _ngram_draft(np.asarray([1, 2, 3], np.int32), 2, 2), [0, 0])


def test_spec_accept_resample_preserves_target_distribution():
    """Monte-Carlo check of the accept/residual-resample rule on a tiny
    vocab: the emitted first token's marginal must equal the target
    distribution p regardless of the draft distribution q."""
    rng = np.random.default_rng(0)
    V = 6
    p = rng.random(V); p /= p.sum()
    q = rng.random(V); q /= q.sum()
    N = 200_000
    ys = rng.choice(V, size=N, p=q)
    u = rng.random(N)
    accept = u * q[ys] < p[ys]
    resid = np.maximum(p - q, 0.0)
    resid = resid / resid.sum()
    out = np.where(accept, ys, rng.choice(V, size=N, p=resid))
    emp = np.bincount(out, minlength=V) / N
    np.testing.assert_allclose(emp, p, atol=5e-3)


def test_spec_sampled_same_draft_full_acceptance(engines):
    """temperature > 0 with draft == target: q == p, so every draft is
    accepted (u*q < p always) and speculative sampling reaches maximum
    speed; output is deterministic per seed."""
    target, same, _ = engines
    spec = SpeculativeEngine(target, draft=same, width=4)
    a, sa = spec.generate(PROMPT, max_new_tokens=N, stop_tokens=(),
                          temperature=0.8, topp=1.0, seed=11)
    b, sb = spec.generate(PROMPT, max_new_tokens=N, stop_tokens=(),
                          temperature=0.8, topp=1.0, seed=11)
    assert a == b and len(a) == N
    assert sa.acceptance == 1.0
    c, _ = spec.generate(PROMPT, max_new_tokens=N, stop_tokens=(),
                         temperature=0.8, topp=1.0, seed=12)
    assert c != a                      # seed actually matters


def test_spec_sampled_ngram_and_unrelated_draft(engines):
    """Sampled mode with rejections: n-gram (q = one-hot) and an unrelated
    draft model both produce full-length, in-vocab outputs."""
    target, _, other = engines
    for spec in (SpeculativeEngine(target, draft=None, width=4, ngram=2),
                 SpeculativeEngine(target, draft=other, width=4)):
        toks, st = spec.generate(PROMPT, max_new_tokens=N, stop_tokens=(),
                                 temperature=0.9, topp=0.9, seed=3)
        assert len(toks) == N
        assert all(0 <= t < target.config.vocab_size for t in toks)
        assert st.drafted > 0


def test_nucleus_dist_matches_sample_top_p_filter():
    """nucleus_dist's support must be exactly the token set sample_top_p
    can emit (same cutoff rule), so spec-sampling's p/q vectors describe
    the same distribution plain sampling draws from."""
    import jax
    import jax.numpy as jnp
    from fastllama_tpu.ops.sampling import nucleus_dist, sample_top_p

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 3)
    for topp in (0.3, 0.9):
        dist = np.asarray(nucleus_dist(logits, 0.7, topp))
        support = set(np.nonzero(dist > 0)[0].tolist())
        # sample many times; every emitted token must lie in the support
        seen = set()
        for s in range(300):
            t = int(sample_top_p(logits, jax.random.PRNGKey(s), 0.7, topp))
            seen.add(t)
        assert seen <= support
        np.testing.assert_allclose(dist.sum(), 1.0, rtol=1e-5)


def test_spec_near_context_limit_matches_greedy(engines):
    """ADVICE r2 regression: with < R*D tokens of room before max_seq the
    engine must still emit the full generation (shrunken final chunk +
    plain-decode tail), not just the prefill token."""
    target, same, _ = engines
    long_prompt = (PROMPT * 16)[:90]              # 90 of max_seq 128
    want, _ = target.generate(long_prompt, max_new_tokens=38,
                              temperature=0.0, stop_tokens=(),
                              decode_chunk=8)
    spec = SpeculativeEngine(target, draft=same, width=8, rounds_per_call=8)
    got, st = spec.generate(long_prompt, max_new_tokens=38, stop_tokens=())
    assert got == want
    assert len(got) == 38


def test_spec_near_context_limit_sampled_completes(engines):
    target, same, _ = engines
    long_prompt = (PROMPT * 16)[:100]
    spec = SpeculativeEngine(target, draft=same, width=8, rounds_per_call=8)
    got, _ = spec.generate(long_prompt, max_new_tokens=27, stop_tokens=(),
                           temperature=0.7, topp=0.9, seed=7)
    assert len(got) == 27
