"""Subprocess worker for the 2-process multi-host serving test.

Usage: python tests/multihost_worker.py <rank> <nprocs> <port> <ckpt> <tok>
       <outfile> [spmd]

Each rank serves its OWN prompts through MultiHostEngine (per-host admission
over the 'data' axis, TP over 'model') and writes its outputs as JSON.
``spmd=1`` switches on spmd_kernels + interpret-mode Pallas: the fused hot
loop runs per shard under shard_map (the production multi-host path)."""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# rank 1's long prompt lands in a different prefill bucket than rank 0's —
# exercising cross-host admission-wave agreement (bucket = max over hosts)
PROMPTS = {
    0: ["the cat sat", "a big dog ran"],
    1: ["one two three " * 4, "hello there world"],
}

# phase 2 (spmd only): host-local prefix-cache hit — a 32-token donor stays
# live while a second prompt sharing its first 16 tokens admits via the
# collective hit wave (spmd_prefill_tail_hits); per-rank distinct tails
PREFIX_DONOR = list(range(3, 35))                      # 32 tokens
PREFIX_TAILS = {0: [40, 41, 42], 1: [50, 51, 52, 53]}


def main() -> None:
    rank, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt, tokp, outfile = sys.argv[4], sys.argv[5], sys.argv[6]
    spmd = len(sys.argv) > 7 and sys.argv[7] == "1"
    jax.distributed.initialize(f"localhost:{port}", num_processes=n,
                               process_id=rank)
    assert jax.process_count() == n

    from fastllama_tpu.config import EngineConfig, QuantType
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.multihost import MultiHostEngine

    eng = MultiHostEngine.load(
        ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
        EngineConfig(max_seq_len=64, max_batch_size=2,
                     compute_dtype="float32", spmd_kernels=spmd,
                     pallas_interpret=spmd, prefix_cache=spmd),
        decode_chunk=4)
    if spmd:
        assert eng._spmd, "spmd path must engage in the 2-process test"
    reqs = eng.generate_all(PROMPTS[rank], max_new_tokens=6,
                            temperature=0.0, stop_tokens=())

    hit_outputs, hits, rows = [], 0, 0
    if spmd:
        # phase 2: lockstep hit wave (both ranks run the SAME schedule)
        donor = eng.submit(PREFIX_DONOR, max_new_tokens=12, stop_tokens=())
        eng.step()                      # admit donor; registers its prefix
        hit = eng.submit(PREFIX_DONOR[:16] + PREFIX_TAILS[rank],
                         max_new_tokens=4, stop_tokens=())
        eng.run()
        assert donor.done and hit.done
        hit_outputs = [hit.output_tokens]
        hits, rows = eng.stats.prefix_hits, eng.stats.prefix_rows_reused

    gstats = eng.global_stats()
    with open(outfile, "w") as f:
        json.dump({"rank": rank,
                   "outputs": [r.output_tokens for r in reqs],
                   "hit_outputs": hit_outputs,
                   "prefix_hits": hits, "prefix_rows": rows,
                   "completed": eng.stats.completed,
                   "global_completed": gstats.completed,
                   "global_decode_tokens": gstats.decode_tokens}, f)


if __name__ == "__main__":
    main()
