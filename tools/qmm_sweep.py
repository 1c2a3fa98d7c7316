"""Steady-state HBM-efficiency sweep of the fused dequant-matmul — the
single-stream roofline hunt (VERDICT r2 #4: the decode-dominant wo-shaped
4096x4096 stream measured 74% of bandwidth; fused QKV ~90%).

Chains the matmul through a lax.scan with a data dependency (x_{i+1} =
normalize(qmm(x_i, w)) padded/sliced back to (T, I)) so the tunnel cannot
dedupe dispatches and the weight stream repeats every step — the only
microbenchmark shape that gives truthful numbers here (NEXT.md gotchas).

Each scan runs in ONE dispatch, and the axon tunnel adds ~25 ms of fixed
per-dispatch latency — at 64 iterations (~1.3 ms of real compute) that
overhead is 95% of the wall time (measured 2026-08-17: 42 GB/s apparent vs
~600 real).  So every variant is timed at BOTH iters and 2*iters and the
bandwidth is computed from the DELTA, which cancels any fixed per-dispatch
cost exactly.

Run on the TPU:  python tools/qmm_sweep.py
Env: SWEEP_SHAPES="4096x4096,4096x12288,11264x4096", SWEEP_T=1,
SWEEP_ITERS=128, SWEEP_PEAK_GBS=819 (v5e chip).
"""
import functools
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

import jax.numpy as jnp
import numpy as np

from fastllama_tpu.ops.pallas.qmm import qmatmul_pallas
from fastllama_tpu.quant.groupquant import QArray

PEAK = float(os.environ.get("SWEEP_PEAK_GBS", "819"))
QUANT = os.environ.get("SWEEP_QUANT", "int8")
# group-scale storage dtype: the INT8 kernel casts scales to bf16 before the
# dequant multiply anyway (_qmm_chunk), so bf16 STORAGE halves the scale
# stream (1/16 of the int8 weight bytes at gs=64) with bit-identical math —
# this knob A/Bs that (SWEEP_SCALE_DTYPE=bfloat16)
SCALE_DTYPE = os.environ.get("SWEEP_SCALE_DTYPE", "float32")


def bench_variant(I, O, T, iters, tiles, k_inner, gs=64, groupdot=False,
                  quant="int8"):
    rng = np.random.RandomState(0)
    from fastllama_tpu.config import QuantType
    # weights generated ON DEVICE (key as a traced arg — a constant key
    # would be constant-folded on the host): uploading 90-131 MB through
    # the tunnel per variant dominated the sweep's wall time
    key = jax.random.PRNGKey(0)
    if quant == "int4":
        # packed wire format: two int4 values per int8 lane, any byte works
        data = jax.jit(lambda k: jax.random.randint(
            k, (I // 2, O), -128, 128, jnp.int32).astype(jnp.int8))(key)
        w = QArray(data, jnp.full((I // gs, O), 0.01, SCALE_DTYPE),
                   QuantType.INT4, gs, -2, True)
    else:
        data = jax.jit(lambda k: jax.random.randint(
            k, (I, O), -127, 128, jnp.int32).astype(jnp.int8))(key)
        w = QArray(data, jnp.full((I // gs, O), 0.01, SCALE_DTYPE),
                   QuantType.INT8, gs, -2, False)
    jax.block_until_ready(data)   # dispatch before timing (cheap; see timed)
    x0 = jnp.asarray(rng.randn(T, I), jnp.bfloat16)

    def step(x, _):
        y = qmatmul_pallas(x, w, tiles=tiles, k_inner=k_inner,
                           groupdot=groupdot)  # (T, O)
        y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-6)
        if O >= I:
            x = y[:, :I].astype(jnp.bfloat16)
        else:
            reps = -(-I // O)
            x = jnp.tile(y, (1, reps))[:, :I].astype(jnp.bfloat16)
        return x, ()

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, n):
        x, _ = jax.lax.scan(step, x, length=n)
        return x

    def timed(n):
        # block_until_ready does NOT block through the axon tunnel
        # (verified 2026-08-17 with a dependent-matmul calibration: 193.9
        # TFLOP/s bf16 vs ~197 nameplate with a host fetch, "infinite"
        # without one) — a scalar fetch is the only real sync
        float(run(x0, n)[0, 0])                       # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(x0, n)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    # two-point: bandwidth from the iters->3*iters delta (cancels the
    # tunnel's fixed per-dispatch latency); the wide 2*iters span keeps the
    # delta well above dispatch jitter (~ms), which at a 1x span produced
    # nonsense (same-config variants measured 97 vs 572 GB/s, and negative
    # deltas reported as infinite bandwidth)
    d1, d3 = timed(iters), timed(3 * iters)
    dt = (d3 - d1) / 2
    wbytes = I * O // 2 if quant == "int4" else I * O
    sbytes = I * O // gs * jnp.dtype(SCALE_DTYPE).itemsize
    gb = iters * (wbytes + sbytes) / 1e9
    if dt <= 0:
        return float("nan")
    return gb / dt


def main():
    T = int(os.environ.get("SWEEP_T", "1"))
    iters = int(os.environ.get("SWEEP_ITERS", "128"))
    shapes = [tuple(int(v) for v in s.split("x")) for s in os.environ.get(
        "SWEEP_SHAPES", "4096x4096").split(",")]
    results = []
    for I, O in shapes:
        variants = [("auto", None, 0)]
        for tk in (4096, 2048, 1024, 512):
            if I % tk == 0 and (tk // 64) % 8 == 0:
                for to in (1024, 640, 512, 256):
                    if O % to == 0:
                        variants.append((f"tk{tk}_to{to}", (min(256, T), to, tk), 0))
        variants += [("auto_ki512", None, 512), ("auto_ki1024", None, 1024),
                     ("tk4096_to1024_ki512",
                      (min(256, T), 1024, 4096) if O % 1024 == 0 else None,
                      512)]
        if not any(I % tk == 0 and (tk // 64) % 8 == 0
                   for tk in (4096, 2048, 1024, 512)):
            # non-dividing contraction (the unpadded 11008 w2): full-K is
            # forced, but the auto TO (128, bounded by _W_TILE_BYTES) may be
            # too narrow to stream well — try wider output tiles with
            # chunked in-kernel dequant bounding the VMEM intermediates
            for to in (512, 256):
                if O % to == 0:
                    variants.append((f"tkfull_to{to}_ki512",
                                     (min(256, T), to, I), 512))
            if O % 256 == 0:
                variants.append(("tkfull_to256", (min(256, T), 256, I), 0))
            # small sliced-K tiles (e.g. tk=256 divides 11008 = 256*43)
            # only legalize when the scale block keeps 8 sublanes —
            # (tk/gs)%8==0 — which at the engine's gs=64 demands tk%512==0,
            # impossible for 11008; kept here for other group sizes
            for tk in (256, 128):
                if I % tk == 0 and (tk // 64) % 8 == 0:
                    for to in (2048, 1024):
                        if O % to == 0:
                            variants.append((f"tk{tk}_to{to}",
                                             (min(256, T), to, tk), 0))
        gd = [("groupdot_auto", None, 0)]
        if I % 4096 == 0:
            for to in (1024, 512, 256):
                if O % to == 0:
                    gd.append((f"groupdot_tk4096_to{to}",
                               (min(256, T), to, 4096), 0))
        variants += [(l, t, k, True) for l, t, k in gd]
        for entry in variants:
            label, tiles, ki = entry[:3]
            groupdot = len(entry) > 3 and entry[3]
            if tiles is None and label.startswith("tk4096_to1024"):
                continue
            try:
                gbs = bench_variant(I, O, T, iters, tiles, ki,
                                    groupdot=groupdot, quant=QUANT)
            except Exception as e:          # noqa: BLE001 - sweep robustness
                print(f"# {I}x{O} {label}: FAIL {type(e).__name__}",
                      file=sys.stderr)
                continue
            if gbs != gbs:                  # NaN: negative delta = pure noise
                print(f"# {I}x{O} {label}: NOISY (non-positive delta)",
                      file=sys.stderr)
                continue
            eff = gbs / PEAK
            print(f"# {I}x{O} T={T} {label}: {gbs:7.1f} GB/s  "
                  f"({eff*100:4.1f}% of {PEAK:.0f})", file=sys.stderr)
            results.append({"shape": f"{I}x{O}", "variant": label,
                            "gbs": round(gbs, 1), "eff": round(eff, 3)})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
