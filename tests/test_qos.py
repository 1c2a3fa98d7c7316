"""Serving QoS (runtime/batching.py): priority admission order, queued
deadline rejection, and the qos_chunk TTFT cap.  No reference analogue —
the reference serves one interactive session (main.cpp); these are the
production-serving knobs the brief's perf/serving mandate adds."""
import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.runtime.batching import BatchedEngine

CFG = dict(dim=64, hidden_dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
           vocab_size=256, max_seq_len=128)


def _engine(tmp_path, batch=1, **ec_kw):
    from fastllama_tpu.config import ModelConfig
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=ModelConfig(**CFG))
    ec = EngineConfig(max_seq_len=128, max_batch_size=batch,
                      compute_dtype="float32", **ec_kw)
    return BatchedEngine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                              ec, decode_chunk=8)


def test_priority_admission_order(tmp_path):
    """With one slot, a high-priority request queued BEHIND a normal one
    must be admitted first once the slot frees; FIFO within a class."""
    eng = _engine(tmp_path, batch=1)
    lo1 = eng.submit([4, 5], max_new_tokens=2, stop_tokens=())
    lo2 = eng.submit([4, 6], max_new_tokens=2, stop_tokens=())
    hi = eng.submit([7, 8], max_new_tokens=2, stop_tokens=(), priority=5)
    eng.run()
    assert all(r.done for r in (lo1, lo2, hi))
    # admission order shows in first-token timestamps: the priority-5
    # request jumps the whole queue; priority-0 stays submission order
    assert hi.first_token_s < lo1.first_token_s < lo2.first_token_s


def test_deadline_rejects_queued_request(tmp_path):
    """A queued request whose deadline lapses is rejected without running;
    admitted requests always finish."""
    eng = _engine(tmp_path, batch=1)
    holder = eng.submit([1, 2, 3], max_new_tokens=8, stop_tokens=(),
                        deadline_s=60.0)  # meets its deadline: must run
    doomed = eng.submit([4, 5], max_new_tokens=2, stop_tokens=(),
                        deadline_s=1e-9)
    eng.run()
    assert holder.done and not holder.rejected
    assert len(holder.output_tokens) == 8
    assert doomed.rejected and doomed.done
    assert doomed.output_tokens == []
    assert eng.stats.rejected == 1


def test_qos_chunk_caps_decode_while_queue_waits(tmp_path):
    """_plan_chunk returns qos_chunk-length chunks while requests queue
    behind a full batch, and full decode_chunk once the queue drains."""
    eng = _engine(tmp_path, batch=1, qos_chunk=2)
    eng.submit([1, 2, 3], max_new_tokens=64, stop_tokens=())
    eng.step()                                   # admit; slot now busy
    eng.submit([4, 5], max_new_tokens=2, stop_tokens=())
    K_wait, _ = eng._plan_chunk(eng._live_slots())
    assert K_wait == 2
    eng.queue.clear()
    K_free, _ = eng._plan_chunk(eng._live_slots())
    assert K_free == 8


def test_spec_qos_chunk_caps_rounds_while_queue_waits(tmp_path):
    """The qos_chunk TTFT bound must bind on the SPEC path too (VERDICT r4
    Weak #2): while a request queues, each speculative chunk runs at most
    max(1, qos_chunk // width) rounds — ~qos_chunk emitted tokens per slot —
    not the full rounds_per_chunk budget."""
    from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=ModelConfig(**CFG))
    ec = EngineConfig(max_seq_len=128, max_batch_size=1,
                      compute_dtype="float32", qos_chunk=2)
    eng = SpecBatchedEngine.load_spec(ckpt, tokp, FileType.LLAMA2C,
                                      QuantType.INT8, ec, decode_chunk=8,
                                      width=2, rounds_per_chunk=32,
                                      spec_auto=False)
    long_ = eng.submit([1, 2, 3], max_new_tokens=64, stop_tokens=())
    queued = eng.submit([4, 5], max_new_tokens=2, stop_tokens=())
    eng.step()                    # admit long_ + one CAPPED spec chunk
    # R = max(1, qos_chunk // width) = 1 round of width 2: at most 2 new
    # tokens on top of the prefill-sampled one.  Uncapped, R would be
    # min(32, budget) and the chunk could emit the full 64-token request.
    assert 1 <= len(long_.output_tokens) <= 3
    eng.run()                     # generation contract unchanged
    assert len(long_.output_tokens) == 64
    assert queued.done and len(queued.output_tokens) == 2


def test_qos_off_keeps_order_and_chunks(tmp_path):
    """Default config: no reordering, no chunk capping — outputs equal a
    pre-QoS engine run (the QoS pass must be inert for plain traffic)."""
    eng = _engine(tmp_path, batch=2)
    a = eng.submit([1, 2], max_new_tokens=6, stop_tokens=())
    b = eng.submit([3, 4], max_new_tokens=6, stop_tokens=())
    c = eng.submit([5, 6], max_new_tokens=6, stop_tokens=())
    eng._admit_pending()                         # a, b admitted; c queued
    K, _ = eng._plan_chunk(eng._live_slots())
    assert K == 5                                # EXACT remaining budget
    # (6 requested - the prefill-sampled token), NOT pow2-bucketed
    eng.run()
    assert a.first_token_s < c.first_token_s     # FIFO kept
    assert b.first_token_s < c.first_token_s
    assert [len(r.output_tokens) for r in (a, b, c)] == [6, 6, 6]
