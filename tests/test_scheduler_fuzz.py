"""Scheduler fuzz: random request mixes through BatchedEngine must produce
EXACTLY the single-stream engine's output for every request, across feature
combinations (prefix cache, slot churn, mixed prompt lengths, staggered
submission, stop tokens, mixed greedy/sampled slots).

Greedy requests are compared token-for-token against the single-stream
oracle (fp32 on CPU: batch membership must not change any sequence's
logits).  Sampled requests are checked for determinism and length bounds
(their RNG stream legitimately differs from the single-stream engine's).
"""
import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.runtime.batching import BatchedEngine
from fastllama_tpu.runtime.engine import Engine

CFG = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, vocab_size=512, max_seq_len=128,
                  group_size=16)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c
    d = tmp_path_factory.mktemp("fuzz")
    return write_tiny_llama2c(str(d), cfg=CFG, seed=5)


@pytest.fixture(scope="module")
def oracle(ckpt):
    c, t = ckpt
    return Engine.load(c, t, FileType.LLAMA2C, QuantType.INT8,
                       EngineConfig(max_seq_len=128,
                                    compute_dtype="float32"))


def _random_requests(rng, n):
    reqs = []
    for i in range(n):
        plen = int(rng.integers(1, 60))
        prompt = [int(x) for x in rng.integers(1, 500, size=plen)]
        max_new = int(rng.integers(1, 40))
        greedy = rng.random() < 0.7
        # token-0 stops arise naturally from the random model; also give
        # some requests explicit random stop tokens
        stops = ((0,) if rng.random() < 0.5
                 else (0, int(rng.integers(1, 500))))
        reqs.append(dict(prompt=prompt, max_new_tokens=max_new,
                         temperature=0.0 if greedy else 0.8,
                         topp=0.9, seed=1000 + i, stop_tokens=stops))
    return reqs


@pytest.mark.parametrize("trial", range(4))
def test_batched_scheduler_matches_oracle(ckpt, oracle, trial):
    c, t = ckpt
    rng = np.random.default_rng(trial)
    n_req = int(rng.integers(5, 12))
    reqs = _random_requests(rng, n_req)
    eng = BatchedEngine.load(
        c, t, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=128,
                     max_batch_size=int(rng.integers(2, 5)),
                     compute_dtype="float32",
                     kv_dtype="float32",
                     prefix_cache=bool(rng.random() < 0.5)),
        decode_chunk=int(rng.integers(1, 9)))

    handles = []
    pending = list(reqs)
    # staggered submission: a few requests per scheduler step
    while pending or handles and not all(h.done for h in handles):
        k = int(rng.integers(0, 4))
        for spec in pending[:k]:
            handles.append(eng.submit(**spec))
        pending = pending[k:]
        if not eng.step() and pending:
            continue
    eng.run()

    for spec, h in zip(reqs, handles):
        assert h.done
        assert 1 <= len(h.output_tokens) <= spec["max_new_tokens"]
        if spec["temperature"] == 0.0:
            want, _ = oracle.generate(
                spec["prompt"], max_new_tokens=spec["max_new_tokens"],
                temperature=0.0, stop_tokens=spec["stop_tokens"],
                decode_chunk=4)
            assert h.output_tokens == want, (
                f"trial {trial}: greedy request diverged from the "
                f"single-stream oracle (prompt len {len(spec['prompt'])})")


def test_batched_scheduler_sampled_deterministic(ckpt):
    """The same staggered sampled workload twice -> identical outputs."""
    c, t = ckpt
    rng = np.random.default_rng(99)
    reqs = _random_requests(rng, 6)
    for r in reqs:
        r["temperature"] = 0.8

    def run():
        eng = BatchedEngine.load(
            c, t, FileType.LLAMA2C, QuantType.INT8,
            EngineConfig(max_seq_len=128, max_batch_size=3,
                         compute_dtype="float32"), decode_chunk=4)
        hs = [eng.submit(**spec) for spec in reqs]
        eng.run()
        return [h.output_tokens for h in hs]

    assert run() == run()


@pytest.mark.parametrize("trial", range(3))
def test_spec_batched_scheduler_matches_oracle(ckpt, oracle, trial):
    """Same fuzz through SpecBatchedEngine: speculation must never change
    a greedy request's output under slot churn / staggered submission /
    stop tokens / mixed sampled slots (which force plain-chunk fallbacks
    interleaved with spec chunks)."""
    from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine

    c, t = ckpt
    rng = np.random.default_rng(100 + trial)
    reqs = _random_requests(rng, int(rng.integers(5, 10)))
    eng = SpecBatchedEngine.load_spec(
        c, t, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=128,
                     max_batch_size=int(rng.integers(2, 5)),
                     compute_dtype="float32",
                     kv_dtype="float32"),
        decode_chunk=int(rng.integers(1, 9)),
        width=int(rng.integers(2, 6)),
        rounds_per_chunk=int(rng.integers(1, 5)))

    handles = []
    pending = list(reqs)
    while pending or handles and not all(h.done for h in handles):
        k = int(rng.integers(0, 4))
        for spec in pending[:k]:
            handles.append(eng.submit(**spec))
        pending = pending[k:]
        if not eng.step() and pending:
            continue
    eng.run()

    for spec, h in zip(reqs, handles):
        assert h.done
        assert 1 <= len(h.output_tokens) <= spec["max_new_tokens"]
        if spec["temperature"] == 0.0:
            want, _ = oracle.generate(
                spec["prompt"], max_new_tokens=spec["max_new_tokens"],
                temperature=0.0, stop_tokens=spec["stop_tokens"],
                decode_chunk=4)
            assert h.output_tokens == want, (
                f"trial {trial}: spec-batched greedy request diverged "
                f"(prompt len {len(spec['prompt'])})")


@pytest.mark.parametrize("trial", range(2))
def test_multihost_scheduler_matches_oracle(ckpt, oracle, trial):
    """Same fuzz through the lockstep MultiHostEngine (single-process
    degenerate, random data-axis width / spmd kernels / prefix cache /
    priorities): greedy outputs must equal the single-stream oracle —
    admission waves, hit waves, and QoS reordering may change WHEN a
    request runs, never WHAT it generates."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine

    c, t = ckpt
    rng = np.random.default_rng(200 + trial)
    reqs = _random_requests(rng, int(rng.integers(5, 10)))
    for r in reqs:
        r["priority"] = int(rng.integers(0, 3))
    spmd = bool(rng.random() < 0.5)
    mesh = "data=1,model=2"        # data axis must equal the process count
    eng = MultiHostEngine.load(
        c, t, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=128,
                     max_batch_size=int(rng.integers(2, 5)),
                     compute_dtype="float32", kv_dtype="float32",
                     mesh=mesh, spmd_kernels=spmd,
                     pallas_interpret=spmd,
                     prefix_cache=bool(rng.random() < 0.5)),
        decode_chunk=int(rng.integers(1, 9)))

    handles = []
    pending = list(reqs)
    while pending or handles and not all(h.done for h in handles):
        k = int(rng.integers(0, 4))
        for spec in pending[:k]:
            handles.append(eng.submit(**spec))
        pending = pending[k:]
        if not eng.step() and pending:
            continue
    eng.run()

    for spec, h in zip(reqs, handles):
        assert h.done
        assert 1 <= len(h.output_tokens) <= spec["max_new_tokens"]
        if spec["temperature"] == 0.0:
            want, _ = oracle.generate(
                spec["prompt"], max_new_tokens=spec["max_new_tokens"],
                temperature=0.0, stop_tokens=spec["stop_tokens"],
                decode_chunk=4)
            assert h.output_tokens == want, (
                f"trial {trial}: multihost greedy request diverged "
                f"(mesh {mesh}, spmd={spmd})")
