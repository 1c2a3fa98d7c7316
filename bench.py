"""Benchmark harness — prints the headline metric as the FIRST JSON line,
then frontier metrics (speculative serving, long-context) as secondary
JSON lines.

Measures steady-state greedy decode throughput of LLaMA2-7B-architecture
INT8 on the available TPU chip(s), with synthetic on-device weights (no
checkpoint download; generation is pure int8 on device so no fp32 memory
spike).  Baseline: the reference C++ engine's LLaMA2-7B INT8 headline of
~25 tok/s on a 56-core Xeon (reference README.md:6; BASELINE.md).

Env knobs: BENCH_CONFIG=7b|1b|110m (default 7b), BENCH_TOKENS (default 128),
BENCH_CHUNK (default 64), BENCH_PROMPT (default 43 tokens, the reference's
benchmark prompt length), BENCH_BATCH (default 48: continuous-batching slots
for the aggregate-throughput headline; 1 = single-stream engine only),
BENCH_SEQ (slot context class; default 512 for 7b), BENCH_QUANT
(int8/int4/int16), BENCH_KV (int8/bfloat16/float32), BENCH_FUSE (default 1),
BENCH_SCALES (float32/bfloat16 group-scale storage), BENCH_EXTRA (default 1:
the secondary frontier lines; 0 = headline only), BENCH_SPEC_BATCH (32),
BENCH_LC_BATCH (12), BENCH_LC_SEQ (2048).
"""
import json
import os
import sys
import time

import jax

# persistent compile cache: the axon-tunnel compiles are slow (minutes for
# 32-layer programs); cached reruns are near-instant
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.models.llama import random_params_int
from fastllama_tpu.runtime.engine import Engine
from fastllama_tpu.loaders.tokenizer import Tokenizer

CONFIGS = {
    # LLaMA2-7B architecture (the reference's headline config)
    "7b": ModelConfig(dim=4096, hidden_dim=11008, n_layers=32, n_heads=32,
                      n_kv_heads=32, vocab_size=32000, max_seq_len=1024,
                      quant_type=QuantType.INT8, name="llama2-7b-synthetic"),
    # TinyLlama-1.1B-class
    "1b": ModelConfig(dim=2048, hidden_dim=5632, n_layers=22, n_heads=32,
                      n_kv_heads=4, vocab_size=32000, max_seq_len=1024,
                      quant_type=QuantType.INT8, name="tinyllama-1b-synthetic"),
    # stories110M architecture
    "110m": ModelConfig(dim=768, hidden_dim=2048, n_layers=12, n_heads=12,
                        n_kv_heads=12, vocab_size=32000, max_seq_len=1024,
                        quant_type=QuantType.INT8, name="stories110m-synthetic"),
}

BASELINE_TPS = {"7b": 25.0, "1b": 155.0, "110m": 440.0}  # reference README.md:98-100


def bench_single(cfg, params, n_tokens, chunk, prompt, scales="float32"):
    """Single-stream decode tok/s (the reference's own benchmark shape)."""
    eng = Engine(cfg, params, Tokenizer().finalize(),
                 EngineConfig(max_seq_len=cfg.max_seq_len,
                              kv_dtype="bfloat16", fuse_weights=False,
                              scale_dtype=scales))
    # warmup: compiles prefill + decode chunk and pays the tunnel's
    # first-execution overhead on every executable
    t0 = time.perf_counter()
    eng.generate(prompt, max_new_tokens=n_tokens, temperature=0.0,
                 stop_tokens=(), decode_chunk=chunk)
    print(f"# warmup (compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    toks, st = eng.generate(prompt, max_new_tokens=n_tokens, temperature=0.0,
                            stop_tokens=(), decode_chunk=chunk)
    assert len(toks) == n_tokens
    print(f"# single-stream decode {st.decode_tps:.1f} tok/s, prefill "
          f"{st.prefill_tps:.1f} tok/s (prompt={st.prompt_tokens}, "
          f"out={st.output_tokens})", file=sys.stderr)
    del eng
    return st.decode_tps, st.prefill_tps


def bench_batched(cfg, params, n_tokens, chunk, prompt, batch, kv_dtype,
                  profile_dir="", scales="float32"):
    """Aggregate decode tok/s serving ``batch`` concurrent streams through
    the continuous-batching engine (a capability the reference lacks —
    it serves exactly one stream, transformer.cpp:76-103)."""
    from fastllama_tpu.runtime.batching import BatchedEngine

    eng = BatchedEngine(cfg, params, Tokenizer().finalize(),
                        EngineConfig(max_seq_len=cfg.max_seq_len,
                                     kv_dtype=kv_dtype,
                                     max_batch_size=batch,
                                     fuse_weights=False,
                                     scale_dtype=scales),
                        decode_chunk=chunk)
    # warmup: compile prefill + one full-size chunk
    t0 = time.perf_counter()
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=chunk + 1, temperature=0.0,
                   stop_tokens=())
    eng.run()
    print(f"# batched warmup (compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0
    # n_tokens % chunk == 0 keeps every decode chunk at full size
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                   stop_tokens=())
    if profile_dir:
        # measured (post-compile) run only — tracing the warmup compile
        # makes the file unreadably large
        from fastllama_tpu.utils.profiling import trace
        with trace(profile_dir):
            eng.run()
        print(f"# batched trace in {profile_dir} (tools/trace_ops.py)",
              file=sys.stderr)
    else:
        eng.run()
    agg = eng.stats.aggregate_tps
    print(f"# aggregate decode {agg:.1f} tok/s over {batch} streams "
          f"({eng.stats.total_output_tokens} tokens, "
          f"prefill {eng.stats.prefill_s:.2f}s)", file=sys.stderr)
    del eng
    return agg


def _clear_device():
    """Drop the last engine's cache buffers before allocating the next
    multi-GB one (same fix as tools/spec_batch_ab.py: cached executables +
    GC lag pin HBM and RESOURCE_EXHAUSTED the follow-on engine)."""
    import gc
    gc.collect()
    jax.clear_caches()
    gc.collect()


def bench_spec_serving(cfg, params, batch, n_tokens, prompt, scales):
    """Speculative serving at its measured-best shipping config (tuner ON —
    the never-lose arbiter with alpha-aware width arms {2,4}+plain) on
    repetitive traffic, the n-gram drafter's favourable case."""
    from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine

    eng = SpecBatchedEngine(cfg, params, Tokenizer().finalize(),
                            EngineConfig(max_seq_len=cfg.max_seq_len,
                                         kv_dtype="int8",
                                         max_batch_size=batch,
                                         fuse_weights=False,
                                         scale_dtype=scales),
                            decode_chunk=64, width=4, rounds_per_chunk=32)
    # tuner-on engines warm up until the compiled-program set stops
    # growing: the tuner's arm sequence differs between passes, so a fixed
    # number of passes can leave programs cold that the measured pass then
    # compiles in the timed region (tools/spec_batch_ab.py)
    def n_programs():
        return len(eng._spec_fns) + len(eng._chunk_fns) + \
            len(eng._prefill_fns)

    for i in range(6):
        before = n_programs()
        t0 = time.perf_counter()
        for _ in range(batch):
            eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                       stop_tokens=())
        eng.run()
        print(f"# spec warmup (compile) {time.perf_counter()-t0:.1f}s "
              f"({n_programs()} programs)", file=sys.stderr)
        if i >= 1 and n_programs() == before:
            break
    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                   stop_tokens=())
    eng.run()
    agg, acc = eng.stats.aggregate_tps, eng.acceptance
    print(f"# spec serving {agg:.1f} tok/s (alpha={acc:.3f})",
          file=sys.stderr)
    del eng
    _clear_device()
    return agg, acc


def bench_longctx(cfg, params, batch, seq, plen, scales):
    """Long-context plain serving: decode sweeps positions plen..seq so the
    measured number integrates the KV-heavy tail (tools/longctx_bench.py;
    the reference hard-clamps S to 1024, transformer.cpp:32)."""
    from fastllama_tpu.runtime.batching import BatchedEngine

    cfg = cfg.replace(max_seq_len=seq)
    n_tokens = seq - plen - 2
    prompt = ([7, 121, 3088, 59, 1024, 88] * (plen // 6 + 1))[:plen]
    eng = BatchedEngine(cfg, params, Tokenizer().finalize(),
                        EngineConfig(max_seq_len=seq, kv_dtype="int8",
                                     max_batch_size=batch,
                                     fuse_weights=False,
                                     scale_dtype=scales),
                        decode_chunk=64)
    # warmup must cover the FULL position range: decode chunks compile per
    # s_bound bucket (longctx_bench.py's compile-in-timed-region lesson)
    t0 = time.perf_counter()
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens, temperature=0.0,
                   stop_tokens=())
    eng.run()
    print(f"# longctx warmup (compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens, temperature=0.0,
                   stop_tokens=())
    eng.run()
    agg = eng.stats.aggregate_tps
    print(f"# longctx {agg:.1f} tok/s (B={batch}, S={seq})", file=sys.stderr)
    del eng
    _clear_device()
    return agg


def main():
    name = os.environ.get("BENCH_CONFIG", "7b")
    n_tokens = int(os.environ.get("BENCH_TOKENS", "128"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    prompt_len = int(os.environ.get("BENCH_PROMPT", "43"))
    # B=48 x S=512 slot class measured 2409 tok/s on v5e (B=24/S=1024: 1561;
    # B=32/S=768: 1896; B=64/S=384: 825 — HBM-pressure cliff past ~13 GB)
    batch = int(os.environ.get("BENCH_BATCH", "48"))
    # int8 per-row-quantized KV cache: fits 3x the slots of bf16 (the
    # single-stream run keeps bf16 KV)
    kv_dtype = os.environ.get("BENCH_KV", "int8")
    quant = os.environ.get("BENCH_QUANT", "int8")
    # bf16 group-scale storage halves the 416 MB/step f32 scale stream
    # (quant/groupquant.compress_scales; NEXT.md r4 "the one remaining
    # idea") — measured A/B via BENCH_SCALES=float32/bfloat16; default
    # "auto" = the engine's measured per-engine resolution (bf16 only on
    # the single-stream INT8 Pallas path, config.resolve_scale_dtype)
    scales = os.environ.get("BENCH_SCALES", "auto")
    cfg = CONFIGS[name]
    # serving-slot context class (NEXT.md #8): shorter slots fit more of
    # them in HBM — e.g. 7b int8+kv8 B=48 fits at S=512 (OOM at 1024)
    seq = int(os.environ.get("BENCH_SEQ", "512" if name == "7b" else "1024"))
    if seq != cfg.max_seq_len:
        cfg = cfg.replace(max_seq_len=seq)
    if quant != "int8":
        cfg = cfg.replace(quant_type=QuantType.parse(quant))
    if cfg.quant_type == QuantType.INT4 and cfg.hidden_dim % 512:
        # split-half nibble packing needs a 512-aligned contraction
        # (loaders pad real checkpoints the same way, registry.py).
        # Padding further to 1024 (for the 1024x1024 w2 decode tiling) is a
        # measured NEGATIVE: XLA relayouts the padded (32,176,4096) w2
        # scales with ~122us/step of async slices inside the decode loop,
        # 95.8 -> 70.2 tok/s (profiled 2026-08-18, tools/trace_ops.py)
        cfg = cfg.replace(hidden_dim=-(-cfg.hidden_dim // 512) * 512)

    t0 = time.perf_counter()
    params = random_params_int(cfg, seed=0)
    jax.block_until_ready(params.wq.data)
    if int(os.environ.get("BENCH_FUSE", "1")):
        # fuse ONCE here and share across both engines (each engine fusing
        # its own copy doubled weight HBM and OOM'd the B=48 cache)
        from fastllama_tpu.models.llama import fuse_params
        try:
            params = fuse_params(cfg, params)
            jax.block_until_ready(params.wq.data)
        except ValueError:
            pass                        # mixed INT4 pack layouts: unfused
    print(f"# params materialized in {time.perf_counter()-t0:.1f}s "
          f"on {jax.devices()[0]}", file=sys.stderr)

    prompt = list(range(1, prompt_len + 1))
    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        from fastllama_tpu.utils.profiling import trace
        with trace(profile_dir):
            tps, prefill_tps = bench_single(cfg, params, n_tokens, chunk,
                                            prompt, scales)
        print(f"# trace written to {profile_dir}", file=sys.stderr)
    else:
        tps, prefill_tps = bench_single(cfg, params, n_tokens, chunk, prompt,
                                        scales)

    baseline = BASELINE_TPS[name]
    qname = cfg.quant_type.name.lower()
    if batch > 1:
        agg = bench_batched(cfg, params, n_tokens - n_tokens % chunk or chunk,
                            chunk, prompt, batch, kv_dtype,
                            profile_dir and profile_dir + "_batched", scales)
        kvtag = {"int8": "_kv8", "bfloat16": "", "float32": "_kvf32"}.get(
            kv_dtype, f"_{kv_dtype}")
        print(json.dumps({
            "metric": f"aggregate_decode_tok_s_{name}_{qname}{kvtag}"
                      f"_1chip_b{batch}_s{cfg.max_seq_len}",
            "value": round(agg, 2),
            "unit": "tok/s",
            "vs_baseline": round(agg / baseline, 3),
            "single_stream_tok_s": round(tps, 2),
            "single_stream_vs_baseline": round(tps / baseline, 3),
        }))
        # frontier metrics AFTER the headline (VERDICT r4 next #3): the
        # round-4/5 capabilities — speculative serving and long-context —
        # as secondary JSON lines; each guarded so a failure can't take
        # down the already-printed headline
        if (int(os.environ.get("BENCH_EXTRA", "1")) and name == "7b"
                and quant == "int8"):
            _clear_device()
            try:
                sb = int(os.environ.get("BENCH_SPEC_BATCH", "32"))
                sagg, acc = bench_spec_serving(
                    cfg, params, sb, n_tokens - n_tokens % chunk or chunk,
                    ([7, 121, 3088, 59] * 11)[:43], scales)
                print(json.dumps({
                    "metric": f"spec_serving_tok_s_{name}_{qname}_kv8"
                              f"_1chip_b{sb}_s{cfg.max_seq_len}_repetitive",
                    "value": round(sagg, 2), "unit": "tok/s",
                    "vs_baseline": round(sagg / baseline, 3),
                    "acceptance": round(acc, 3),
                }))
            except Exception as e:                    # noqa: BLE001
                print(f"# spec frontier metric failed: {e}", file=sys.stderr)
            try:
                lb = int(os.environ.get("BENCH_LC_BATCH", "12"))
                ls = int(os.environ.get("BENCH_LC_SEQ", "2048"))
                lagg = bench_longctx(CONFIGS[name], params, lb, ls, 256,
                                     scales)
                print(json.dumps({
                    "metric": f"longctx_decode_tok_s_{name}_{qname}_kv8"
                              f"_1chip_b{lb}_s{ls}",
                    "value": round(lagg, 2), "unit": "tok/s",
                    "vs_baseline": round(lagg / baseline, 3),
                }))
            except Exception as e:                    # noqa: BLE001
                print(f"# longctx frontier metric failed: {e}",
                      file=sys.stderr)
    else:
        print(json.dumps({
            "metric": f"decode_tok_s_{name}_{qname}_1chip",
            "value": round(tps, 2),
            "unit": "tok/s",
            "vs_baseline": round(tps / baseline, 3),
        }))


if __name__ == "__main__":
    main()
