"""Speculative-decoding acceptance/throughput sweep on the real chip.

VERDICT r2 #5: the round-2 speculation numbers were measured at alpha ~ 0
(uncorrelated random draft).  This sweep builds CORRELATED drafts from the
target checkpoint itself — layer-truncated variants (early-exit drafts
sharing embedding/classifier) — plus the draft-free n-gram drafter, and
reports measured acceptance alpha and end-to-end tok/s for each, against
the plain-decode baseline.

Run on the TPU:  python tools/spec_bench.py
Env: SPEC_CONFIG=7b|1b|110m, SPEC_TOKENS (default 256), SPEC_WIDTH (8),
SPEC_DRAFT_LAYERS (comma list, default "4,8"), SPEC_PROMPT_MODE=random|loop
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
from fastllama_tpu.models.llama import random_params_int, truncate_params
from fastllama_tpu.runtime.engine import Engine
from fastllama_tpu.runtime.speculative import SpeculativeEngine

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


def run(engine_like, prompt, n, label):
    # warmup: compiles prefill/decode/draft/verify outside the measurement
    # (without it the first generate's decode_s is dominated by tunnel
    # compiles - the 2026-08-18 pre-warmup sweep read plain 7B at 35 tok/s
    # vs its true 96)
    engine_like.generate(prompt, max_new_tokens=n, temperature=0.0,
                         stop_tokens=())
    t0 = time.perf_counter()
    toks, st = engine_like.generate(prompt, max_new_tokens=n,
                                    temperature=0.0, stop_tokens=())
    wall = time.perf_counter() - t0
    tps = st.output_tokens / st.decode_s if st.decode_s else 0.0
    alpha = getattr(st, "acceptance", None)
    print(f"# {label}: {tps:7.1f} tok/s"
          + (f"  alpha={alpha:.3f} rounds={st.rounds}"
             if alpha is not None else "")
          + f"  ({st.output_tokens} toks, wall {wall:.1f}s)",
          file=sys.stderr)
    return {"label": label, "tok_s": round(tps, 1),
            "alpha": round(alpha, 3) if alpha is not None else None}


def main():
    name = os.environ.get("SPEC_CONFIG", "7b")
    n = int(os.environ.get("SPEC_TOKENS", "256"))
    width = int(os.environ.get("SPEC_WIDTH", "8"))
    layer_list = [int(x) for x in
                  os.environ.get("SPEC_DRAFT_LAYERS", "4,8").split(",")
                  if x.strip()]
    cfg = CONFIGS[name]
    tok = Tokenizer().finalize()

    t0 = time.perf_counter()
    params = random_params_int(cfg, seed=0)
    jax.block_until_ready(params.wq.data)
    print(f"# params in {time.perf_counter()-t0:.1f}s on {jax.devices()[0]}",
          file=sys.stderr)

    ec = EngineConfig(max_seq_len=cfg.max_seq_len, kv_dtype="bfloat16",
                      fuse_weights=False)
    target = Engine(cfg, params, tok, ec)
    # prompt modes: "random" = arbitrary distinct ids (worst case for the
    # n-gram drafter, alpha ~ 0); "loop" = a short repeated pattern, which
    # greedy continuation on most checkpoints extends periodically - the
    # n-gram prompt-lookup drafter then accepts nearly every draft
    # (alpha -> 1), measuring the high end of the alpha-throughput curve
    if os.environ.get("SPEC_PROMPT_MODE", "random") == "loop":
        prompt = ([7, 121, 3088, 59] * 11)[:43]
    else:
        prompt = list(range(1, 44))

    results = [run(target, prompt, n, "plain")]

    sp_ng = SpeculativeEngine(target, draft=None, width=width)
    results.append(run(sp_ng, prompt, n, "ngram"))

    for dl in layer_list:
        dcfg, dparams = truncate_params(cfg, params, dl)
        draft = Engine(dcfg, dparams, tok, ec)
        sp = SpeculativeEngine(target, draft=draft, width=width)
        results.append(run(sp, prompt, n, f"trunc{dl}"))
        del draft, sp

    print(json.dumps({"config": name, "width": width, "tokens": n,
                      "results": results}))


if __name__ == "__main__":
    main()
