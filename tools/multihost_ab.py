"""Same-chip A/B: MultiHostEngine (single-process degenerate) vs
BatchedEngine on identical work — VERDICT r2 #1's second done-criterion
(multi-host step time within ~10% of the single-host engine when both run
the same hot path on one chip).

Run on the TPU:  python tools/multihost_ab.py
Env: AB_CONFIG=7b|1b|110m (default 7b), AB_BATCH (default 48), AB_TOKENS
(default 128), AB_SEQ (default 512), AB_KV (default int8).
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
from fastllama_tpu.models.llama import random_params_int

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


def drive(eng, prompt, batch, n_tokens):
    # warm with the SAME token budget so every decode-chunk variant (K=64,
    # tail K) compiles/loads outside the timed segment
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                   stop_tokens=())
    t0 = time.perf_counter()
    eng.run()
    print(f"# warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    eng.stats.decode_s = eng.stats.prefill_s = 0.0
    eng.stats.total_output_tokens = eng.stats.decode_tokens = 0
    for _ in range(batch):
        eng.submit(prompt, max_new_tokens=n_tokens + 1, temperature=0.0,
                   stop_tokens=())
    prof = os.environ.get("AB_PROFILE", "")
    if prof:
        from fastllama_tpu.utils.profiling import trace
        with trace(prof):
            eng.run()
    else:
        eng.run()
    return eng.stats.aggregate_tps


def main():
    name = os.environ.get("AB_CONFIG", "7b")
    # 40 (not the headline 48): the multi-host engine adds a sink slot and
    # 48+1 slots of int8 KV next to the 7B weights tips the ~13 GB HBM
    # cliff; the A/B ratio is the point here, not peak throughput
    batch = int(os.environ.get("AB_BATCH", "40"))
    n_tokens = int(os.environ.get("AB_TOKENS", "128"))
    seq = int(os.environ.get("AB_SEQ", "512"))
    kv = os.environ.get("AB_KV", "int8")
    chunk = int(os.environ.get("AB_CHUNK", "64"))
    cfg = CONFIGS[name].replace(max_seq_len=seq)
    tok = Tokenizer().finalize()
    prompt = list(range(1, 44))

    params = random_params_int(cfg, seed=0)
    jax.block_until_ready(params.wq.data)
    from fastllama_tpu.models.llama import fuse_params
    # fuse ONCE and share (rebinding frees the unfused copy; two resident
    # weight sets would blow the ~13 GB HBM cliff with the B=48 cache)
    params = fuse_params(cfg, params)
    fused = params
    jax.block_until_ready(fused.wq.data)

    # AB_ENGINE selects ONE engine per process: running both in one process
    # OOMs on the real chip (the first engine's compiled executables and
    # cache buffers are not reliably freed before the second allocates its
    # 7B-sized cache next to the shared weights).  Run each side separately
    # and compare the two JSON lines.
    which = os.environ.get("AB_ENGINE", "batched")
    if which == "batched":
        from fastllama_tpu.runtime.batching import BatchedEngine
        eng = BatchedEngine(cfg, fused, tok,
                            EngineConfig(max_seq_len=seq, kv_dtype=kv,
                                         max_batch_size=batch,
                                         fuse_weights=False),
                            decode_chunk=chunk)
    else:
        # single process, one-device mesh -> degenerate lockstep, same
        # kernels as the batched engine
        from fastllama_tpu.runtime.multihost import MultiHostEngine
        eng = MultiHostEngine(cfg, fused, tok,
                              EngineConfig(max_seq_len=seq, kv_dtype=kv,
                                           max_batch_size=batch,
                                           fuse_weights=False,
                                           mesh="data=1,model=1"),
                              decode_chunk=chunk)
    tps = drive(eng, prompt, batch, n_tokens)
    st = eng.stats
    print(json.dumps({"config": name, "engine": which, "batch": batch,
                      "tok_s": round(tps, 1),
                      "decode_s": round(st.decode_s, 3),
                      "prefill_s": round(st.prefill_s, 3),
                      "decode_tokens": st.decode_tokens,
                      "output_tokens": st.total_output_tokens,
                      "completed": st.completed}))


if __name__ == "__main__":
    main()
