"""Profiling utilities: StepTimer stats and the trace context manager."""
import os

from fastllama_tpu.utils.profiling import StepTimer, trace


def test_step_timer():
    t = StepTimer()
    for i in range(10):
        with t.step("decode"):
            pass
    t.add("prefill", 0.5)
    s = t.stats("decode")
    assert s["count"] == 10
    assert s["p50_ms"] >= 0
    assert "prefill" in t.report() and "decode" in t.report()
    assert t.stats("missing") == {}


def test_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "xprof")
    with trace(d):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found, "no trace files written"
