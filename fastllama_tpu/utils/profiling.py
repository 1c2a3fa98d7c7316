"""Tracing and timing — the observability layer.

The reference's only profiling tool is a microsecond wall-clock ``Timer``
wrapped around the generate callback to split first-token vs steady-state
latency (``src/utils/utility.h:68-89``, ``src/main.cpp:98-126``).  The TPU
build keeps that (:class:`StepTimer`) and adds what the hardware actually
needs: ``jax.profiler`` device traces (:func:`trace`) viewable in
Perfetto/XProf/TensorBoard, which show per-kernel HBM/MXU utilization —
the equivalent of knowing which AVX loop is hot.

Usage::

    from fastllama_tpu.utils.profiling import trace, StepTimer

    with trace("/tmp/xprof"):          # device + host trace
        engine.generate(...)

    t = StepTimer()
    with t.step("prefill"): ...
    with t.step("decode"): ...
    print(t.report())

CLI: ``--profile-dir DIR`` wraps the whole run; ``bench.py`` honours
``BENCH_PROFILE=DIR``.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler device+host trace into ``log_dir`` (open with XProf /
    TensorBoard profile plugin / Perfetto).  No-op if the profiler is
    unavailable on the backend (e.g. some emulated CPU runs)."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:                      # pragma: no cover
        print(f"# trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the host timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with per-phase stats — the reference ``Timer``
    (utility.h:68-89) generalized to named phases and percentiles."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def step(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples.setdefault(name, []).append(
                time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._samples.setdefault(name, []).append(seconds)

    def stats(self, name: str) -> dict:
        xs = sorted(self._samples.get(name, ()))
        if not xs:
            return {}
        n = len(xs)
        return {
            "count": n,
            "total_s": sum(xs),
            "mean_ms": 1e3 * sum(xs) / n,
            "min_ms": 1e3 * xs[0],
            "p50_ms": 1e3 * xs[n // 2],
            "p99_ms": 1e3 * xs[min(n - 1, int(n * 0.99))],
            "max_ms": 1e3 * xs[-1],
        }

    def report(self) -> str:
        lines = []
        for name in self._samples:
            s = self.stats(name)
            lines.append(
                f"{name}: n={s['count']} mean={s['mean_ms']:.2f}ms "
                f"p50={s['p50_ms']:.2f}ms p99={s['p99_ms']:.2f}ms "
                f"max={s['max_ms']:.2f}ms total={s['total_s']:.3f}s")
        return "\n".join(lines)
