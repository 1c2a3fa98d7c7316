#!/usr/bin/env python
"""Prefix-cache serve benchmark: N requests sharing one long system prompt,
admitted with and without EngineConfig.prefix_cache — reports per-request
prefill time (the hit path device-copies the shared rows and prefills only
the tail).  Usage: python tools/bench_prefix.py [config]  (default 7b)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    from bench import CONFIGS  # repo-root bench.py
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.loaders.tokenizer import Tokenizer
    from fastllama_tpu.models.llama import random_params_int
    from fastllama_tpu.runtime.batching import BatchedEngine

    name = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("BENCH_CONFIG", "7b")
    cfg = CONFIGS[name].replace(max_seq_len=1024)
    params = random_params_int(cfg, seed=0)
    jax.block_until_ready(params.wq.data)

    system = [(i * 3) % 31000 + 2 for i in range(896)]   # 896-token shared prefix
    n_req = 12

    def serve(prefix_cache: bool):
        eng = BatchedEngine(cfg, params, Tokenizer().finalize(),
                            EngineConfig(max_seq_len=1024, max_batch_size=4,
                                         kv_dtype="int8",
                                         # params shared across both runs; a
                                         # per-engine fused copy would
                                         # double weight HBM
                                         fuse_weights=False,
                                         prefix_cache=prefix_cache),
                            decode_chunk=8)

        def pattern(base: int):
            """One resident donor + n_req-1 short admissions sharing the
            system prefix.  Returns wall seconds for the short requests."""
            donor = eng.submit(system + [base], max_new_tokens=300,
                               temperature=0.0, stop_tokens=())
            eng.step()
            t0 = time.perf_counter()
            reqs = [eng.submit(system + [base + 1 + i, base + 100 + i],
                               max_new_tokens=8, temperature=0.0,
                               stop_tokens=())
                    for i in range(n_req - 1)]
            while any(not r.done for r in reqs):
                eng.step()
            wall = time.perf_counter() - t0
            eng.run()                       # drain the donor
            return wall

        pattern(500)                        # warmup: compiles every shape
        eng.stats.prefill_s = 0.0
        eng.stats.prefix_hits = eng.stats.prefix_rows_reused = 0
        wall = pattern(900)
        return eng.stats, wall

    st_off, wall_off = serve(False)
    st_on, wall_on = serve(True)
    n = n_req - 1
    print(f"# {name}: {n} requests sharing a {len(system)}-token prefix")
    print(f"# prefix_cache=off: prefill {st_off.prefill_s:.3f}s total "
          f"({st_off.prefill_s/n*1e3:.1f} ms/req), wall {wall_off:.2f}s")
    print(f"# prefix_cache=on : prefill {st_on.prefill_s:.3f}s total "
          f"({st_on.prefill_s/n*1e3:.1f} ms/req), wall {wall_on:.2f}s, "
          f"hits {st_on.prefix_hits}, rows reused {st_on.prefix_rows_reused}")
    import json
    print(json.dumps({
        "metric": f"prefix_cache_prefill_ms_per_req_{name}",
        "value": round(st_on.prefill_s / n * 1e3, 2),
        "unit": "ms",
        "vs_baseline": round(st_off.prefill_s / max(st_on.prefill_s, 1e-9),
                             2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
