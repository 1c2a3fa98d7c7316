"""Measure peak sustained HBM read bandwidth on the attached chip.

Streams a large resident buffer through a trivially cheap reduction inside a
scan whose carry depends on the previous sum (so XLA cannot dedupe or hoist
the reads), and computes bandwidth from the delta between an N-iteration and
a 3N-iteration run — cancelling the axon tunnel's fixed per-dispatch latency
the same way tools/qmm_sweep.py does.

This is the denominator for every "x% of roofline" claim in the repo: the
nameplate 819 GB/s (v5e) is not necessarily realizable by any access
pattern; the number printed here is the honest ceiling.

Run:  python tools/hbm_peak.py
Env:  HBM_MB=512 (buffer size), HBM_ITERS=32
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    for mb in [int(s) for s in
               os.environ.get("HBM_MB", "128,512,1024").split(",")]:
        _one(mb)


def _one(mb):
    iters = int(os.environ.get("HBM_ITERS", "32"))
    n = mb * 1024 * 1024 // 2                     # bf16 elements
    rows = n // 1024
    # generate on device: pushing hundreds of MB through the axon tunnel
    # takes minutes, and the values don't matter for a bandwidth test
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (rows, 1024), jnp.bfloat16))()
    x.block_until_ready()

    def step(c, _):
        # c is a scalar folded into the read so each iteration depends on
        # the last — the whole buffer must be re-read every step
        s = jnp.sum(x, dtype=jnp.float32) + c
        return s * 1e-30, None

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def run(c0, k):
        c, _ = jax.lax.scan(step, c0, length=k)
        return c

    def timed(k):
        run(jnp.float32(0.0), k).block_until_ready()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run(jnp.float32(0.0), k).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    d1, d3 = timed(iters), timed(3 * iters)
    dt = (d3 - d1) / 2
    gb = iters * (rows * 1024 * 2) / 1e9
    print(f"buffer {mb} MB, {iters} iters (delta-timed): "
          f"{gb / dt:7.1f} GB/s sustained read")


if __name__ == "__main__":
    main()
