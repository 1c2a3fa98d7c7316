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
# per-process virtual device count (default 2 -> the 2x2 test mesh);
# __graft_entry__.dryrun_multichip sets it to n_devices//2 so the fleet
# covers the driver's full virtual-device budget (data=2 x model=n//2)
_NDEV = int(os.environ.get("FTL_WORKER_DEVICES", "2"))
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={_NDEV}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# rank 1's long prompt lands in a different prefill bucket than rank 0's —
# exercising cross-host admission-wave agreement (bucket = max over hosts)
PROMPTS = {
    0: ["the cat sat", "a big dog ran"],
    1: ["one two three " * 4, "hello there world"],
}

# phase 2 (spmd only): host-local prefix-cache hits — a 32-token donor
# stays live while TWO prompts sharing its first 16 tokens admit via ONE
# batched collective hit wave (spmd_prefill_tail_hits, k=2); per-rank
# distinct tails
PREFIX_DONOR = list(range(3, 35))                      # 32 tokens
PREFIX_TAILS = {0: [40, 41, 42], 1: [50, 51, 52, 53]}
PREFIX_TAILS2 = {0: [60, 61], 1: [70, 71, 72]}


def main() -> None:
    rank, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt, tokp, outfile = sys.argv[4], sys.argv[5], sys.argv[6]
    mode = sys.argv[7] if len(sys.argv) > 7 else "0"
    spmd = mode in ("1", "spec")
    jax.distributed.initialize(f"localhost:{port}", num_processes=n,
                               process_id=rank)
    assert jax.process_count() == n

    from fastllama_tpu.config import EngineConfig, QuantType
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.multihost import MultiHostEngine

    # 3 serving slots: phase 2 needs the donor live PLUS two hit admissions
    # in one batched wave
    ec = EngineConfig(max_seq_len=64, max_batch_size=3,
                      compute_dtype="float32", spmd_kernels=spmd,
                      pallas_interpret=spmd, prefix_cache=spmd)
    if mode == "spec":
        # batched speculation in the lockstep fleet: every host's shards
        # run the shard_map verify rounds on their own slots (greedy
        # outputs must stay identical to plain serving)
        from fastllama_tpu.runtime.spec_multihost import MultiHostSpecEngine
        eng = MultiHostSpecEngine.load_spec(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8, ec,
            decode_chunk=4, width=4, rounds_per_chunk=2, spec_auto=False)
        assert eng._spec_on, "spec path must engage in the 2-process test"
    else:
        eng = MultiHostEngine.load(
            ckpt, tokp, FileType.LLAMA2C, QuantType.INT8, ec,
            decode_chunk=4)
    if spmd:
        assert eng._spmd, "spmd path must engage in the 2-process test"
    reqs = eng.generate_all(PROMPTS[rank], max_new_tokens=6,
                            temperature=0.0, stop_tokens=())

    hit_outputs, hits, rows = [], 0, 0
    if spmd:
        # phase 2: lockstep batched hit wave (both ranks run the SAME
        # schedule; both of a rank's hits admit in ONE k=2 collective)
        donor = eng.submit(PREFIX_DONOR, max_new_tokens=12, stop_tokens=())
        eng.step()                      # admit donor; registers its prefix
        hreqs = [eng.submit(PREFIX_DONOR[:16] + t, max_new_tokens=4,
                            stop_tokens=())
                 for t in (PREFIX_TAILS[rank], PREFIX_TAILS2[rank])]
        eng.run()
        assert donor.done and all(h.done for h in hreqs)
        hit_outputs = [h.output_tokens for h in hreqs]
        hits, rows = eng.stats.prefix_hits, eng.stats.prefix_rows_reused

    gstats = eng.global_stats()
    with open(outfile, "w") as f:
        json.dump({"rank": rank,
                   "outputs": [r.output_tokens for r in reqs],
                   "hit_outputs": hit_outputs,
                   "prefix_hits": hits, "prefix_rows": rows,
                   "completed": eng.stats.completed,
                   "spec_drafted": getattr(eng, "spec_drafted", 0),
                   "global_completed": gstats.completed,
                   "global_decode_tokens": gstats.decode_tokens}, f)


if __name__ == "__main__":
    main()
