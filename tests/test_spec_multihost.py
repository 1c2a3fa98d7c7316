"""Batched speculation in the lockstep multi-host engine
(runtime/spec_multihost.py): greedy outputs must equal plain serving for
any draft quality, through the shard_map spmd path, the single-device
degenerate, the near-context-limit plain fallback, and the measured
spec-vs-plain auto-arbitration.  The REAL 2-process spec run lives in
test_multihost.py::test_multihost_two_processes[spec]."""
import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType

CFG = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, vocab_size=512, max_seq_len=64,
                  group_size=16)


def _reference_outputs(ckpt, tokp, prompts, max_new=6, **kw):
    from fastllama_tpu.runtime.batching import BatchedEngine
    eng = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=4,
                     compute_dtype="float32"),
        decode_chunk=4)
    return [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=max_new, temperature=0.0, stop_tokens=(),
        **kw)]


def _spec_engine(ckpt, tokp, mesh, spmd, **kw):
    from fastllama_tpu.runtime.spec_multihost import MultiHostSpecEngine
    return MultiHostSpecEngine.load_spec(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh=mesh,
                     spmd_kernels=spmd, pallas_interpret=spmd),
        decode_chunk=4, **kw)


def test_spec_multihost_spmd_matches_plain(tmp_path):
    """data=1 x model=2 mesh, spmd_kernels + interpret Pallas: the
    shard_map verify rounds (spmd_spec_decode_step, data_sharded) emit
    exactly the plain engine's greedy tokens, and drafting ran."""
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompts = ["the cat sat", "a big dog ran", "one two three"]
    want = _reference_outputs(ckpt, tokp, prompts)

    eng = _spec_engine(ckpt, tokp, "data=1,model=2", True,
                       width=4, rounds_per_chunk=2, spec_auto=False)
    assert eng._spmd and eng._spec_on
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want
    assert eng.spec_drafted > 0
    assert eng.global_stats().completed == 3


def test_spec_multihost_single_device(tmp_path):
    """Degenerate 1-device mesh: the spec engine routes through the plain
    spec_decode_step and still matches plain serving."""
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompts = ["the cat sat", "a big dog ran"]
    want = _reference_outputs(ckpt, tokp, prompts)

    eng = _spec_engine(ckpt, tokp, "data=1,model=1", False,
                       width=3, rounds_per_chunk=2, spec_auto=False)
    assert eng._spec_on and not eng._spmd
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want
    assert eng.spec_drafted > 0


def test_spec_multihost_downgrades_without_spmd(tmp_path):
    """Multi-device mesh WITHOUT spmd_kernels: the GSPMD jnp fallback
    can't run the per-slot verify writes — the engine must warn, serve
    plain decode, and still be correct."""
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompts = ["the cat sat"]
    want = _reference_outputs(ckpt, tokp, prompts)

    with pytest.warns(UserWarning, match="spmd_kernels"):
        eng = _spec_engine(ckpt, tokp, "data=1,model=2", False,
                           width=4, rounds_per_chunk=2)
    assert not eng._spec_on
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want
    assert eng.spec_drafted == 0


def test_spec_multihost_near_context_limit(tmp_path):
    """No D-row block fits fleet-wide: lockstep plain chunks keep the
    generation contract to the last token."""
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompt = list(range(2, 56))                      # 54 of max_seq 64
    want = _reference_outputs(ckpt, tokp, [prompt], max_new=8)

    eng = _spec_engine(ckpt, tokp, "data=1,model=2", True,
                       width=4, rounds_per_chunk=8, spec_auto=False)
    got = [r.output_tokens for r in eng.generate_all(
        [prompt], max_new_tokens=8, temperature=0.0, stop_tokens=())]
    assert got == want
    assert len(got[0]) == 8


def test_spec_multihost_sampled_deterministic(tmp_path):
    """Temperature > 0 through the lockstep spec rounds: fixed seeds give
    identical outputs across runs (tuner off), and requests complete."""
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)

    def run():
        eng = _spec_engine(ckpt, tokp, "data=1,model=2", True,
                           width=3, rounds_per_chunk=2, spec_auto=False)
        reqs = eng.generate_all(["the cat sat", "a big dog"],
                                max_new_tokens=6, temperature=0.8, topp=0.9,
                                seed=42, stop_tokens=())
        return [r.output_tokens for r in reqs]

    a, b = run(), run()
    assert a == b
    assert all(len(t) == 6 for t in a)


def test_spec_multihost_auto_tuner_correct(tmp_path):
    """With the SpecAutoTuner ON the engine mixes spec and plain chunks by
    measured throughput — greedy outputs must STILL equal plain serving
    (the mode choice may change speed, never tokens)."""
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompts = ["the cat sat", "a big dog ran", "one two three"]
    want = _reference_outputs(ckpt, tokp, prompts, max_new=10)

    eng = _spec_engine(ckpt, tokp, "data=1,model=2", True,
                       width=4, rounds_per_chunk=2)   # spec_auto defaults on
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=10, temperature=0.0, stop_tokens=())]
    assert got == want


def test_multihost_sampled_cold_start_not_greedy(tmp_path):
    """REGRESSION (round 4): the lockstep plan's GREEDY flag was computed
    from live slots only, so a sampled request admitted on a cold start
    decoded its first chunk greedily.  A hot request's output must differ
    from the greedy output."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)

    def run(temp):
        eng = MultiHostEngine.load(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
            EngineConfig(max_seq_len=64, max_batch_size=2,
                         compute_dtype="float32", mesh="data=1,model=2"),
            decode_chunk=8)
        req = eng.submit("the cat sat", max_new_tokens=8, temperature=temp,
                         topp=1.0, seed=3, stop_tokens=())
        eng.run()
        return req.output_tokens

    greedy = run(0.0)
    hot = run(5.0)           # hot sampling on random weights: near-uniform
    assert len(hot) == 8
    assert hot != greedy, "cold-start sampled request decoded greedily"


def test_spec_auto_tuner_unit():
    """SpecAutoTuner: measures both modes once, then runs the winner and
    probes the loser every probe_every chunks; compile-polluted samples
    are discarded."""
    from fastllama_tpu.runtime.spec_batching import SpecAutoTuner

    t = SpecAutoTuner(probe_every=4)
    assert t.choose() == 1                 # measure spec first
    t.record(True, 100, 1.0)               # spec: 100 tok/s
    assert t.choose() == 0                 # then plain once
    t.record(False, 300, 1.0)              # plain: 300 tok/s -> plain wins
    assert t.choose() == 0
    assert t.choose() == 1                 # count=4: probe the loser
    t.record(True, 100, 1.0)
    assert t.choose() == 0                 # winner again
    # compile-polluted sample is a no-op
    ema = dict(t.ema)
    t.record(False, 1, 100.0, compiled=True)
    assert t.ema == ema
    # the loser improving past the winner flips the decision
    for _ in range(30):
        t.record(True, 500, 1.0)
    assert t.ema[True] > t.ema[False]
    assert t.choose() in (True, False)     # next non-probe chunk runs spec
    assert np.mean([t.choose() for _ in range(8)]) > 0.5
