"""Perplexity evaluation — the accuracy gate for quantization parity
(SURVEY §7 step 8: ppl parity per bit-width vs fp32).

Usage:
  python -m fastllama_tpu.tools.eval_ppl -c model.flm -f text.txt
  python -m fastllama_tpu.tools.eval_ppl -c hfdir -q int8,int16,none -f text.txt
"""
from __future__ import annotations

import argparse
import math
import sys
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def perplexity_from_logits(logits: np.ndarray, targets: np.ndarray) -> float:
    lg = np.asarray(logits, np.float64)
    lg = lg - lg.max(axis=-1, keepdims=True)
    logp = lg - np.log(np.exp(lg).sum(axis=-1, keepdims=True))
    nll = -logp[np.arange(len(targets)), targets]
    return float(np.exp(nll.mean()))


def evaluate(engine, token_ids: List[int], window: int = 512) -> float:
    """Sliding-window ppl: each window prefills fresh and scores next-token
    predictions for its tokens."""
    from fastllama_tpu.models.llama import forward

    cfg = engine.config
    window = min(window, cfg.max_seq_len)
    total_nll, total_n = 0.0, 0
    fwd = jax.jit(lambda p, t, c: forward(
        cfg, p, t, 0, c, mm=engine._mm, attn=engine._attn,
        compute_dtype=engine._cdt))
    for start in range(0, max(len(token_ids) - 1, 1), window - 1):
        chunk = token_ids[start:start + window]
        if len(chunk) < 2:
            break
        pad = np.zeros(window, np.int32)
        pad[:len(chunk)] = chunk
        logits, _ = fwd(engine.params, jnp.asarray(pad), engine.new_cache())
        lg = np.asarray(logits, np.float64)[:len(chunk) - 1]
        tgt = np.asarray(chunk[1:], np.int64)
        lg = lg - lg.max(axis=-1, keepdims=True)
        logp = lg - np.log(np.exp(lg).sum(axis=-1, keepdims=True))
        total_nll += float(-logp[np.arange(len(tgt)), tgt].sum())
        total_n += len(tgt)
    return math.exp(total_nll / max(total_n, 1))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fastllama-eval-ppl", description=__doc__)
    p.add_argument("-c", "--checkpoint", required=True)
    p.add_argument("-z", "--tokenizer", default="")
    p.add_argument("-f", "--file", required=True, help="UTF-8 text file")
    p.add_argument("-q", "--quant", default="int8",
                   help="comma-separated list: int8,int16,int4,none")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--max-chars", type=int, default=20000)
    args = p.parse_args(argv)

    from fastllama_tpu.config import EngineConfig, QuantType
    from fastllama_tpu.runtime.engine import Engine

    with open(args.file, encoding="utf-8") as f:
        text = f.read()[:args.max_chars]

    results = {}
    for qname in args.quant.split(","):
        qt = QuantType.parse(qname)
        eng = Engine.load(args.checkpoint, args.tokenizer, qtype=qt,
                          engine_config=EngineConfig())
        toks = eng.tokenizer.encode(text, add_bos=True)
        ppl = evaluate(eng, toks, args.window)
        results[qname] = ppl
        print(f"{qname:>6}: ppl = {ppl:.4f}  ({len(toks)} tokens)")
    if "none" in results:
        base = results["none"]
        for qname, ppl in results.items():
            if qname != "none":
                print(f"{qname:>6}: delta vs fp32 = {ppl - base:+.4f} "
                      f"({(ppl/base - 1)*100:+.2f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
