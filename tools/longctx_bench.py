"""Long-context serving bench: decode throughput where the KV stream bites.

Every headline serving number so far sat at S=512, where the weight stream
and the KV stream are comparable.  This tool measures the regime the int8
KV cache, the bounded-window flash decode and batched speculation were
built for — decode sweeping positions from the prompt length up to S, so
the measured number integrates over the KV-heavy tail (the reference
cannot reach it at all: hard 1024 clamp, transformer.cpp:32).

Capacity note (one v5e chip, ~13 GB usable): 7B INT8 weights are ~6.7 GB,
so B*S is capped at about 6 GB of int8 cache — the 7B KV stream can reach
~35-50% of traffic but never dominate ON ONE CHIP.  The truly KV-dominated
regime is reachable with the 1B GQA model (n_kv=4: 11 KB/row) at B>=64,
S>=2048 — run LC_CONFIG=1b for that point.  The tool prints the measured
tok/s next to the HBM roofline split (weight bytes vs ideal KV bytes at
the mean decode position) so the regime is explicit.

Usage: python tools/longctx_bench.py
Env: LC_CONFIG=7b|1b (default 7b), LC_SEQ (2048), LC_BATCH (12 for 7b,
96 for 1b), LC_PROMPT (256), LC_TOKENS (default S-LC_PROMPT-2),
LC_ENGINE=both|plain|spec|fleet ("fleet" = single-process lockstep
MultiHostSpecEngine — the SPECR/vote protocol at long context), LC_KV
(int8), LC_WIDTH (4), LC_ROUNDS (32), LC_SCALES (float32|bfloat16).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fastllama_tpu.config import EngineConfig  # noqa: E402
from fastllama_tpu.loaders.tokenizer import Tokenizer  # noqa: E402
from fastllama_tpu.models.llama import fuse_params, random_params_int  # noqa: E402
from tools.spec_batch_ab import CONFIGS  # noqa: E402

BW = 750e9            # measured realizable HBM read bandwidth (hbm_peak.py)


def roofline(cfg, params, batch, kv_itemsize, mean_pos):
    """HBM traffic per decode step: full weight stream + each slot's KV
    read at the mean position (ideal — the bounded-window kernel rounds to
    blocks).  Returns (weight_bytes, kv_bytes, ceiling tok/s)."""
    w_bytes = sum(a.nbytes for a in jax.tree.leaves(params))
    row = cfg.n_kv_heads * cfg.head_size * kv_itemsize + cfg.n_kv_heads * 4
    kv_bytes = cfg.n_layers * row * mean_pos * 2 * batch      # K and V
    return w_bytes, kv_bytes, batch * BW / (w_bytes + kv_bytes)


def drive(eng, prompt, batch, n_tokens):
    # the warmup pass must cover the FULL position range: decode chunks
    # compile per s_bound bucket, so a short warmup leaves every deeper
    # bucket's compile INSIDE the timed region (first measured: plain
    # "485", spec "166" at S=2048 — both numbers were mostly compile time;
    # spec chunks are whole-model R-round scans that take minutes each)
    # tuner engines warm up until the compiled-program set stops growing:
    # the tuner's arm sequence differs between passes, so a fixed number of
    # passes can leave (s_bound, D) combos cold that the measured pass then
    # compiles in the timed region (measured: EMAs ~1080 tok/s but 296
    # end-to-end — 50 s of cache-load stalls in one measured pass)
    def n_programs():
        return (len(getattr(eng, "_spec_fns", {}))
                + len(getattr(eng, "_chunk_fns", {}))
                + len(getattr(eng, "_prefill_fns", {})))

    tuned = getattr(eng, "_tuner", None) is not None
    for i in range(6 if tuned else 1):
        before = n_programs()
        for _ in range(batch):
            eng.submit(prompt, max_new_tokens=n_tokens, temperature=0.0,
                       stop_tokens=())
        t0 = time.perf_counter()
        eng.run()
        print(f"# warmup {time.perf_counter()-t0:.1f}s "
              f"({n_programs()} programs)", file=sys.stderr)
        if i >= 1 and n_programs() == before:
            break
    tuner = getattr(eng, "_tuner", None)
    if tuner is not None:
        ema = {k: round(v, 1) for k, v in tuner.ema.items() if v is not None}
        print(f"# tuner ema after warmup (arm -> tok/s): {ema}",
              file=sys.stderr)
    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens, temperature=0.0,
                   stop_tokens=())
    eng.run()
    if tuner is not None:
        ema = {k: round(v, 1) for k, v in tuner.ema.items() if v is not None}
        print(f"# tuner ema after measure (arm -> tok/s): {ema}",
              file=sys.stderr)
    return eng.stats.aggregate_tps, eng.stats.decode_tokens


def main():
    name = os.environ.get("LC_CONFIG", "7b")
    seq = int(os.environ.get("LC_SEQ", "2048"))
    batch = int(os.environ.get("LC_BATCH", "96" if name == "1b" else "12"))
    plen = int(os.environ.get("LC_PROMPT", "256"))
    n_tokens = int(os.environ.get("LC_TOKENS", str(seq - plen - 2)))
    kv = os.environ.get("LC_KV", "int8")
    width = int(os.environ.get("LC_WIDTH", "4"))
    rounds = int(os.environ.get("LC_ROUNDS", "32"))
    which = os.environ.get("LC_ENGINE", "both")

    cfg = CONFIGS[name].replace(max_seq_len=seq)
    tok = Tokenizer().finalize()
    prompt = ([7, 121, 3088, 59, 1024, 88] * (plen // 6 + 1))[:plen]

    scales = os.environ.get("LC_SCALES", "float32")
    params = fuse_params(cfg, random_params_int(cfg, seed=0))
    jax.block_until_ready(params.wq.data)
    ec = EngineConfig(max_seq_len=seq, kv_dtype=kv, max_batch_size=batch,
                      fuse_weights=False, scale_dtype=scales)

    mean_pos = plen + n_tokens / 2
    wb, kb, ceil = roofline(cfg, params, batch,
                            jnp.dtype(kv).itemsize, mean_pos)
    out = {"config": name, "batch": batch, "seq": seq, "prompt": plen,
           "tokens_per_slot": n_tokens, "kv": kv,
           "weight_gb_per_step": round(wb / 1e9, 2),
           "kv_gb_per_step_at_mean_pos": round(kb / 1e9, 2),
           "kv_share_pct": round(100 * kb / (wb + kb), 1),
           "roofline_tok_s": round(ceil, 1)}
    print(f"# {json.dumps(out)}", file=sys.stderr)

    def fresh_engines():
        import gc
        gc.collect()
        jax.clear_caches()
        gc.collect()

    profile_dir = os.environ.get("LC_PROFILE", "")

    if which in ("both", "plain"):
        from fastllama_tpu.runtime.batching import BatchedEngine
        eng = BatchedEngine(cfg, params, tok, ec, decode_chunk=64)
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                tps, toks = drive(eng, prompt, batch, n_tokens)
        else:
            tps, toks = drive(eng, prompt, batch, n_tokens)
        out["plain_tok_s"] = round(tps, 1)
        out["plain_vs_roofline_pct"] = round(100 * tps / ceil, 1)
        print(f"plain: {tps:.1f} tok/s ({toks} tokens, "
              f"{100*tps/ceil:.0f}% of roofline)")
        del eng
        fresh_engines()
    if which in ("both", "spec"):
        from fastllama_tpu.runtime.spec_batching import SpecBatchedEngine
        # LC_AUTO=1: SpecAutoTuner on (never-lose arbitration + alpha-aware
        # width arms); default off so the row measures PURE speculation at
        # the given static width
        eng = SpecBatchedEngine(cfg, params, tok, ec, decode_chunk=64,
                                width=width, rounds_per_chunk=rounds,
                                spec_auto=os.environ.get("LC_AUTO") == "1")
        tps, toks = drive(eng, prompt, batch, n_tokens)
        out["spec_tok_s"] = round(tps, 1)
        out["acceptance"] = round(eng.acceptance, 3)
        print(f"spec:  {tps:.1f} tok/s (alpha={eng.acceptance:.3f}, "
              f"{toks} tokens)")
        del eng
        fresh_engines()
    if which in ("fleet",):
        # long-context speculation through the lockstep fleet protocol
        # (VERDICT r4 next #6): single-process MultiHostSpecEngine — the
        # SPECR plan rounds, per-chunk history fetch and spec-vs-plain
        # fleet vote all engage; shows the protocol doesn't eat the
        # single-host spec win at S>=2048
        from fastllama_tpu.runtime.spec_multihost import MultiHostSpecEngine
        import dataclasses
        ecf = dataclasses.replace(ec, mesh="data=1,model=1")
        eng = MultiHostSpecEngine(cfg, params, tok, ecf, decode_chunk=64,
                                  width=width, rounds_per_chunk=rounds,
                                  spec_auto=False)
        tps, toks = drive(eng, prompt, batch, n_tokens)
        out["fleet_spec_tok_s"] = round(tps, 1)
        out["acceptance"] = round(eng.acceptance, 3)
        print(f"fleet: {tps:.1f} tok/s (alpha={eng.acceptance:.3f}, "
              f"{toks} tokens)")
        del eng
        fresh_engines()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
