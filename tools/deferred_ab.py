"""A/B the deferred staged-KV decode chunks vs per-step slab writes ON CHIP.

Serving shape (7B INT8 + int8 KV, B slots, S context) at several decode
chunk lengths: the deferred path replaces the per-step int8 slab
read-modify-write (~1.5 ms/step of pure cache-write traffic at serving
batch; NEXT.md round-4 #4) with exact-tile staging writes plus ONE
spec_write landing per chunk, at the cost of re-reading the <=K staged rows
each step.  Traffic model says K=16 is the sweet spot (staged re-reads grow
with K, landing amortization shrinks with 1/K).

Usage: python tools/deferred_ab.py [7b|1b|110m]
Env: AB_BATCH (48), AB_SEQ (512), AB_TOKENS (128), AB_CHUNKS ("16,32"),
AB_KV (int8).
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import CONFIGS  # noqa: E402
from fastllama_tpu.config import EngineConfig  # noqa: E402
from fastllama_tpu.loaders.tokenizer import Tokenizer  # noqa: E402
from fastllama_tpu.models.llama import (fuse_params,  # noqa: E402
                                        random_params_int)
from fastllama_tpu.runtime.batching import BatchedEngine  # noqa: E402


def run(cfg, params, batch, chunk, n_tokens, prompt, kv, deferred):
    eng = BatchedEngine(cfg, params, Tokenizer().finalize(),
                        EngineConfig(max_seq_len=cfg.max_seq_len,
                                     kv_dtype=kv, max_batch_size=batch,
                                     fuse_weights=False,
                                     deferred_kv=deferred),
                        decode_chunk=chunk)
    if deferred and not eng._deferred_ok:
        print(f"!! deferred requested but not engaged (chunk={chunk})",
              file=sys.stderr)
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=chunk + 1, temperature=0.0,
                   stop_tokens=())
    t0 = time.perf_counter()
    eng.run()
    print(f"# warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                   stop_tokens=())
    eng.run()
    agg = eng.stats.aggregate_tps
    del eng
    # the next engine allocates its own multi-GB cache while this one's
    # buffers (pinned by cached executables + GC lag) are still resident:
    # measured RESOURCE_EXHAUSTED on the second engine at 7B/B=48 without
    # the explicit drop
    import gc
    gc.collect()
    jax.clear_caches()
    gc.collect()
    return agg


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "7b"
    batch = int(os.environ.get("AB_BATCH", "48"))
    seq = int(os.environ.get("AB_SEQ", "512"))
    n_tokens = int(os.environ.get("AB_TOKENS", "128"))
    chunks = [int(c) for c in os.environ.get("AB_CHUNKS", "16,32").split(",")]
    kv = os.environ.get("AB_KV", "int8")
    cfg = CONFIGS[name].replace(max_seq_len=seq)
    print(f"backend={jax.default_backend()} cfg={name} B={batch} S={seq} "
          f"kv={kv}", file=sys.stderr)

    params = random_params_int(cfg, seed=0)
    params = fuse_params(cfg, params)
    jax.block_until_ready(params.wq.data)

    rng_prompt = list(range(2, 45))
    results = {}
    for chunk in chunks:
        for deferred in (False, True):
            tag = f"chunk={chunk} deferred={int(deferred)}"
            agg = run(cfg, params, batch, chunk, n_tokens, rng_prompt, kv,
                      deferred)
            results[tag] = agg
            print(f"{tag}: {agg:.1f} tok/s")
    best_plain = max(v for k, v in results.items() if "deferred=0" in k)
    best_def = max(v for k, v in results.items() if "deferred=1" in k)
    print(f"best plain {best_plain:.1f} vs best deferred {best_def:.1f} "
          f"({(best_def / best_plain - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
