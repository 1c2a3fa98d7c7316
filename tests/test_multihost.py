"""Multi-host serving (runtime/multihost.py): single-process protocol test
plus a REAL 2-process jax.distributed run (CPU emulation, SURVEY §4) — each
process admits its own prompts into its own slot range; outputs must match
the single-process BatchedEngine."""
import json
import os
import socket
import subprocess
import sys

import jax
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType

CFG = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, vocab_size=512, max_seq_len=64,
                  group_size=16)


def _reference_outputs(ckpt, tokp, prompts, max_new=6):
    from fastllama_tpu.runtime.batching import BatchedEngine
    eng = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=4,
                     compute_dtype="float32"),
        decode_chunk=4)
    return [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=max_new, temperature=0.0, stop_tokens=())]


def test_multihost_engine_single_process(tmp_path):
    """MultiHostEngine degenerates to a correct single-process engine
    (allgather of one host, sink-slot padding, lockstep chunks)."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompts = ["the cat sat", "a big dog ran", "one two three"]
    want = _reference_outputs(ckpt, tokp, prompts)

    eng = MultiHostEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh="data=1,model=2"),
        decode_chunk=4)
    # 2 serving slots, 3 prompts: exercises queueing + a second admission wave
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want
    assert eng.stats.completed == 3


@pytest.mark.parametrize("spmd", ["0", "1", "spec"])
def test_multihost_two_processes(tmp_path, spmd):
    """Spawn 2 jax.distributed CPU processes (2 virtual devices each,
    mesh data=2 x model=2); each serves its own prompts; greedy outputs
    must equal the single-process reference.  ``spmd=1`` runs the
    production hot path: spmd_kernels + interpret-mode Pallas under
    shard_map with data-sharded slots (VERDICT r2 #1); ``spec`` serves
    through MultiHostSpecEngine — lockstep batched-speculation rounds on
    the same shard_map path (VERDICT r3 #1)."""
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c
    from tests.multihost_worker import PROMPTS

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for rank in range(2):
        out = str(tmp_path / f"rank{rank}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(rank), "2", str(port),
             ckpt, tokp, out, spmd],
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    want = _reference_outputs(ckpt, tokp, PROMPTS[0] + PROMPTS[1])
    got = results[0]["outputs"] + results[1]["outputs"]
    assert got == want
    assert results[0]["completed"] == results[1]["completed"] >= 2
    if spmd in ("1", "spec"):
        # phase-2 prefix hits: each host admitted TWO requests through ONE
        # batched collective hit wave; tokens must equal full prefills'
        from tests.multihost_worker import (PREFIX_DONOR, PREFIX_TAILS,
                                            PREFIX_TAILS2)
        for rank in (0, 1):
            assert results[rank]["prefix_hits"] == 2
            assert results[rank]["prefix_rows"] == 32
            hit_prompts = [PREFIX_DONOR[:16] + PREFIX_TAILS[rank],
                           PREFIX_DONOR[:16] + PREFIX_TAILS2[rank]]
            want_hits = _reference_outputs(ckpt, tokp, hit_prompts,
                                           max_new=4)
            assert results[rank]["hit_outputs"] == want_hits
    if spmd == "spec":
        # the speculative verify rounds actually ran on both hosts
        assert results[0]["spec_drafted"] > 0
        assert results[1]["spec_drafted"] > 0
    # cross-host aggregate stats agree on both ranks and cover all jobs
    assert results[0]["global_completed"] == results[1]["global_completed"]
    assert results[0]["global_completed"] >= 4
    assert results[0]["global_decode_tokens"] == \
        results[1]["global_decode_tokens"] > 0


def test_multihost_sampled_path(tmp_path):
    """Temperature > 0 goes through the host-built chunk keys; results are
    deterministic for a fixed seed and requests complete."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)

    def run():
        eng = MultiHostEngine.load(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
            EngineConfig(max_seq_len=64, max_batch_size=2,
                         compute_dtype="float32", mesh="data=1,model=2"),
            decode_chunk=4)
        reqs = eng.generate_all(["the cat sat", "a big dog"],
                                max_new_tokens=6, temperature=0.8, topp=0.9,
                                seed=42, stop_tokens=())
        return [r.output_tokens for r in reqs]

    a, b = run(), run()
    assert a == b
    assert all(len(t) == 6 for t in a)


def test_multihost_single_process_spmd_kernels(tmp_path):
    """Single process, 2-device model axis, spmd_kernels + interpret
    Pallas: the degenerate multi-host engine runs the per-shard fused hot
    loop and still matches the plain BatchedEngine outputs."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompts = ["the cat sat", "a big dog ran", "one two three"]
    want = _reference_outputs(ckpt, tokp, prompts)

    eng = MultiHostEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", mesh="data=1,model=2",
                     spmd_kernels=True, pallas_interpret=True),
        decode_chunk=4)
    assert eng._spmd
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want
    assert eng.global_stats().completed == 3


def test_multihost_single_process_int8_kv_spmd(tmp_path):
    """spmd multi-host path with the int8 KV cache (quantized per-row
    scales shard over model, slots over data)."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    prompts = ["the cat sat", "a big dog ran"]
    from fastllama_tpu.runtime.batching import BatchedEngine
    base = BatchedEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=4,
                     compute_dtype="float32", kv_dtype="int8"),
        decode_chunk=4)
    want = [r.output_tokens for r in base.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]

    eng = MultiHostEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", kv_dtype="int8",
                     mesh="data=1,model=2", spmd_kernels=True,
                     pallas_interpret=True),
        decode_chunk=4)
    assert eng._spmd
    got = [r.output_tokens for r in eng.generate_all(
        prompts, max_new_tokens=6, temperature=0.0, stop_tokens=())]
    assert got == want


def test_multihost_prefix_cache_spmd(tmp_path):
    """Host-local prefix cache through the collective hit wave
    (spmd_prefill_tail_hits) on a single-process data=1 x model=2 mesh:
    TWO planned hits admit in ONE batched wave (k=2, VERDICT r3 Weak #4),
    their tokens equal a full prefill's, and the hit counters show the
    donor rows were reused."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    donor_prompt = list(range(3, 35))                  # 32 tokens
    hit_prompts = [donor_prompt[:16] + [40, 41, 42],
                   donor_prompt[:16] + [44, 45]]

    want = _reference_outputs(ckpt, tokp, hit_prompts, max_new=4)

    eng = MultiHostEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=3,
                     compute_dtype="float32", mesh="data=1,model=2",
                     spmd_kernels=True, pallas_interpret=True,
                     prefix_cache=True),
        decode_chunk=4)
    assert eng._spmd and eng._prefix_enabled
    donor = eng.submit(donor_prompt, max_new_tokens=12, stop_tokens=())
    eng.step()                          # admit donor; registers its prefix
    hits = [eng.submit(p, max_new_tokens=4, stop_tokens=())
            for p in hit_prompts]
    eng.step()                          # ONE lockstep round admits both
    assert eng.stats.prefix_hits == 2, "both hits must land in one round"
    eng.run()
    assert donor.done and all(h.done for h in hits)
    assert [h.output_tokens for h in hits] == want
    assert eng.stats.prefix_rows_reused == 32
    # both tails bucket together -> exactly one (bucket, k=2) program
    assert any(k[1] == 2 for k in eng._tail_fns), eng._tail_fns.keys()


def test_multihost_qos(tmp_path):
    """Host-local QoS in the lockstep engine: a priority-5 request jumps
    the queue; a lapsed queued deadline rejects without running (same
    contract as BatchedEngine, test_qos.py)."""
    from fastllama_tpu.runtime.multihost import MultiHostEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    eng = MultiHostEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=1,
                     compute_dtype="float32", mesh="data=1,model=2"),
        decode_chunk=4)
    lo1 = eng.submit([4, 5], max_new_tokens=2, stop_tokens=())
    lo2 = eng.submit([4, 6], max_new_tokens=2, stop_tokens=())
    hi = eng.submit([7, 8], max_new_tokens=2, stop_tokens=(), priority=5)
    doomed = eng.submit([9, 10], max_new_tokens=2, stop_tokens=(),
                        deadline_s=1e-9)
    eng.run()
    assert all(r.done for r in (lo1, lo2, hi))
    assert hi.first_token_s < lo1.first_token_s < lo2.first_token_s
    assert doomed.rejected and doomed.output_tokens == []
    assert eng.stats.rejected == 1


def test_multihost_admission_fills_before_first_chunk(tmp_path):
    """A cold backlog larger than _ADMIT_CAP must be admitted with
    back-to-back waves in ONE lockstep round — BEFORE the first decode
    chunk runs.  The one-wave-per-round cap left slots filling across
    chunks (33% average occupancy, measured 839 vs 2514 tok/s on chip)."""
    from fastllama_tpu.runtime import multihost as mh
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=CFG)
    eng = mh.MultiHostEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2 * mh._ADMIT_CAP + 3,
                     compute_dtype="float32", mesh="data=1,model=1"),
        decode_chunk=4)
    n = 2 * mh._ADMIT_CAP + 3                    # needs 3 waves (8+8+4 pads)
    for i in range(n):
        # max_new 12 > prefill-emit + one K=4 chunk so no slot completes
        # (and frees) inside the first round
        eng.submit([3, 5 + i, 7], max_new_tokens=12, temperature=0.0,
                   stop_tokens=())
    assert eng.step()                            # ONE lockstep round
    live = sum(r is not None for r in eng.slot_req)
    assert live == n, f"only {live}/{n} slots live after one round"
    assert not eng.queue
    # and the engine still completes everything
    while eng.step():
        pass
    assert eng.stats.completed == n
