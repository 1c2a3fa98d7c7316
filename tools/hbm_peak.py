"""Measure peak sustained HBM read bandwidth on the attached chip.

Streams a resident buffer through a reduction whose input depends on the
scan carry (``x + c``) so XLA can neither hoist the read out of the loop
nor dedupe iterations, and computes bandwidth from the delta between an
N-iteration and a 3N-iteration run — cancelling the axon tunnel's fixed
per-dispatch cost.

Tunnel pitfalls this script works around (verified 2026-08-17):
- ``block_until_ready()`` does NOT block on the axon backend — timings
  must fetch the result to host (``float(r)``).  A dependent-matmul
  calibration run measured 193.9 TFLOP/s bf16 vs the ~197 nameplate with
  the fetch, and "infinite" without it.
- An arg-less jitted computation (constant PRNG key) is constant-folded
  on the single host core at compile time — minutes for a 512 MB buffer.
  The key must be a traced argument.
- A loop whose body doesn't depend on the carry is hoisted: one read
  total, not N.

This is the denominator for every "x% of roofline" claim in the repo: the
nameplate 819 GB/s (v5e) is not necessarily realizable by any access
pattern; the number printed here is the honest ceiling.

Run:  python tools/hbm_peak.py
Env:  HBM_MB=128,512,1024 (buffer sizes), HBM_ITERS=16
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=2)
def _run(x, c0, k):
    def step(c, _):
        # x + c: the read depends on the carry (no hoisting); the add
        # fuses into the reduce so no extra HBM traffic
        return jnp.sum(x + c.astype(jnp.bfloat16),
                       dtype=jnp.float32) * 1e-30, None
    c, _ = jax.lax.scan(step, c0, length=k)
    return c


def _one(mb, iters):
    rows = mb * 1024 * 1024 // 2 // 1024
    x = jax.jit(lambda k: jax.random.normal(k, (rows, 1024), jnp.bfloat16))(
        jax.random.PRNGKey(0))
    float(x[0, 0])                                # materialize

    def timed(k):
        float(_run(x, jnp.float32(0), k))         # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(_run(x, jnp.float32(0), k))     # fetch = the only real sync
            best = min(best, time.perf_counter() - t0)
        return best

    d1, d3 = timed(iters), timed(3 * iters)
    dt = (d3 - d1) / 2
    gb = iters * (rows * 1024 * 2) / 1e9
    print(f"buffer {mb:5d} MB, {iters} iters (delta-timed): "
          f"{gb / dt:7.1f} GB/s sustained read", flush=True)


def main():
    iters = int(os.environ.get("HBM_ITERS", "16"))
    for mb in [int(s) for s in
               os.environ.get("HBM_MB", "128,512,1024").split(",")]:
        _one(mb, iters)


if __name__ == "__main__":
    main()
