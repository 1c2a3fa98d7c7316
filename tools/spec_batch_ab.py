"""Aggregate A/B: SpecBatchedEngine vs BatchedEngine on repetitive traffic.

Batched speculation (runtime/spec_batching.py) amortizes the KV-cache
stream over accepted tokens — the only lever left at serving batch where
plain decode already amortizes the weight stream over B slots.  This tool
serves B identical-pattern prompts (the n-gram drafter's favourable case,
matching tools/spec_bench.py's loop mode) through both engines and prints
aggregate decode tok/s + measured acceptance.

Run on the TPU:  python tools/spec_batch_ab.py
Env: SB_CONFIG=7b|1b|110m, SB_BATCH (default 32), SB_TOKENS (default 128),
SB_SEQ (default 512), SB_KV (default int8), SB_ENGINE=both|plain|spec,
SB_WIDTH (default 4: draft depth D), SB_ROUNDS (8), SB_SPMD=1 (run the
spec engine's shard_map verify path over a 1-device mesh — the spmd
program A/B'd against plain on one chip), SB_AUTO=1 (SpecAutoTuner on:
the never-lose arbitration), SB_MULTIHOST=1 (serve through the lockstep
MultiHostSpecEngine instead).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
from fastllama_tpu.loaders.tokenizer import Tokenizer
from fastllama_tpu.models.llama import fuse_params, random_params_int

CONFIGS = {
    "7b": ModelConfig(dim=4096, hidden_dim=11008, n_layers=32, n_heads=32,
                      n_kv_heads=32, vocab_size=32000, max_seq_len=1024,
                      quant_type=QuantType.INT8),
    "1b": ModelConfig(dim=2048, hidden_dim=5632, n_layers=22, n_heads=32,
                      n_kv_heads=4, vocab_size=32000, max_seq_len=1024,
                      quant_type=QuantType.INT8),
    "110m": ModelConfig(dim=768, hidden_dim=2048, n_layers=12, n_heads=12,
                        n_kv_heads=12, vocab_size=32000, max_seq_len=1024,
                        quant_type=QuantType.INT8),
}


def drive(eng, prompt, batch, n_tokens, warmups=None):
    # tuner engines warm up until the compiled-program set stops growing:
    # the tuner's arm sequence differs between passes (its chunk counter
    # carries over), so a FIXED number of warmups can leave (s_bound, D)
    # combos cold that the measured pass then compiles IN the timed region
    # (first tuner-on A/B measured "spec 562 tok/s" at B=48/W=2 — mostly
    # compile/cache-load stalls)
    def n_programs():
        return (len(getattr(eng, "_spec_fns", {}))
                + len(getattr(eng, "_chunk_fns", {}))
                + len(getattr(eng, "_prefill_fns", {})))

    if warmups is None:
        warmups = 6 if getattr(eng, "_tuner", None) is not None else 1
    for w in range(warmups):
        before = n_programs()
        for _ in range(batch):
            eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                       stop_tokens=())
        t0 = time.perf_counter()
        eng.run()
        print(f"# warmup {time.perf_counter()-t0:.1f}s "
              f"({n_programs()} programs)", file=sys.stderr)
        if w >= 1 and n_programs() == before:
            break
    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                   stop_tokens=())
    prof = os.environ.get("SB_PROFILE", "")
    if prof:
        from fastllama_tpu.utils.profiling import trace
        with trace(prof):
            eng.run()
    else:
        eng.run()
    tuner = getattr(eng, "_tuner", None)
    if tuner is not None:
        # arbitration diagnostics: per-arm EMA tok/s at end of run
        ema = {k: round(v, 1) for k, v in tuner.ema.items() if v is not None}
        print(f"# tuner ema (arm -> tok/s): {ema}", file=sys.stderr)
    return eng.stats.aggregate_tps


def main():
    name = os.environ.get("SB_CONFIG", "7b")
    batch = int(os.environ.get("SB_BATCH", "32"))
    n_tokens = int(os.environ.get("SB_TOKENS", "128"))
    seq = int(os.environ.get("SB_SEQ", "512"))
    kv = os.environ.get("SB_KV", "int8")
    width = int(os.environ.get("SB_WIDTH", "4"))
    which = os.environ.get("SB_ENGINE", "both")
    cfg = CONFIGS[name].replace(max_seq_len=seq)
    tok = Tokenizer().finalize()
    prompt = ([7, 121, 3088, 59] * 11)[:43]        # periodic: drafter's case

    spmd = os.environ.get("SB_SPMD", "") == "1"
    auto = os.environ.get("SB_AUTO", "") == "1"
    multihost = os.environ.get("SB_MULTIHOST", "") == "1"
    params = random_params_int(cfg, seed=0)
    if not spmd:
        # the shard_map TP body projects q/k/v separately — fused QKV /
        # gate-up layouts are a non-spmd (single-program) optimization
        params = fuse_params(cfg, params)
    jax.block_until_ready(params.wq.data)
    ec = EngineConfig(max_seq_len=seq, kv_dtype=kv, max_batch_size=batch,
                      fuse_weights=False,
                      mesh="data=1,model=1" if (spmd or multihost) else "",
                      spmd_kernels=spmd)

    def clear_device():
        # the next engine allocates its own multi-GB cache while the last
        # one's buffers (pinned by cached executables + GC lag) are still
        # resident: measured RESOURCE_EXHAUSTED at 7B/B=48 without the
        # explicit drop (same fix as tools/deferred_ab.py).  The caller
        # must `del eng` FIRST — its binding is what keeps the cache alive
        import gc
        gc.collect()
        jax.clear_caches()
        gc.collect()

    out = {"config": name, "batch": batch, "width": width, "spmd": spmd,
           "auto": auto, "multihost": multihost}
    rounds = int(os.environ.get("SB_ROUNDS", "8"))
    if which in ("both", "plain"):
        from fastllama_tpu.runtime.batching import BatchedEngine
        eng = BatchedEngine(cfg, params, tok, ec, decode_chunk=64)
        out["plain_tok_s"] = round(drive(eng, prompt, batch, n_tokens), 1)
        del eng
        clear_device()
    if which in ("both", "spec"):
        if multihost:
            from fastllama_tpu.runtime.spec_multihost import \
                MultiHostSpecEngine
            eng = MultiHostSpecEngine(cfg, params, tok, ec, width=width,
                                      rounds_per_chunk=rounds,
                                      spec_auto=auto)
        else:
            from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine
            eng = SpecBatchedEngine(cfg, params, tok, ec, width=width,
                                    rounds_per_chunk=rounds, spec_auto=auto)
        if spmd:
            assert eng._spmd, "spmd path must engage for the SB_SPMD A/B"
        out["spec_tok_s"] = round(drive(eng, prompt, batch, n_tokens), 1)
        out["acceptance"] = round(eng.acceptance, 3)
        del eng
        clear_device()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
