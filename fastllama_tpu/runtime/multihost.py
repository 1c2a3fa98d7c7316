"""Multi-host continuous-batching serving — per-host admission over the DCN
``data`` axis, tensor parallelism over the within-host ``model`` axis.

The reference is strictly single-process (SURVEY §5: no distributed backend);
this is the capability the TPU build adds on top.  Design:

* One process per host (``jax.distributed.initialize``), a single global
  ``('data', 'model')`` mesh (parallel/distributed.global_mesh): the ``data``
  axis spans hosts (slots/activations cross DCN only at admission), the
  ``model`` axis spans each host's local chips (weight collectives ride ICI).
* Every host owns a contiguous range of KV-cache slots — the slot axis is
  sharded over ``data`` so a host's slot K/V rows live on its own chips —
  plus one reserved **sink slot** that absorbs the padded admissions of
  lockstep waves (a host with nothing to admit still participates in the
  global program; its dummy rows land in the sink, never in a serving slot).
* **Lockstep protocol**: SPMD requires every process to issue the same
  compiled calls with the same static shapes.  Each ``step()`` starts with
  ONE tiny ``process_allgather`` of the per-host plan (queued count, bucket,
  live flags, chunk bound, greedy flag, max position); every host then
  derives the same global decision (admission wave shape, decode chunk
  length, sampling mode, attention window bound) and issues identical jit
  calls, feeding its own local shard of the global arrays
  (``jax.make_array_from_process_local_data``) and reading back only its
  local columns (``global_array_to_host_local_array``).
* **The hot loop runs on every shard** (the reference's design point:
  every worker executes the SIMD hot loop on its slice,
  transformer.cpp:253-384, x86_simd.cpp:1647-1674).  With
  ``EngineConfig.spmd_kernels`` (and compatible dims) prefill and decode go
  through ``parallel/spmd_step`` with ``data_sharded=True``: each host's
  chips run the SAME fused Pallas kernels (layer-indexed qmm, bounded
  -window flash decode, one-launch cache writer) on their local slot range
  — the identical compute path BatchedEngine runs single-host.  Off-mesh
  or with incompatible dims it falls back to the GSPMD jnp path (where
  Pallas is disabled: GSPMD cannot partition a single-device kernel).

Single-process degenerates cleanly: the allgather is a no-op, the mesh is
local, and behavior matches BatchedEngine's scheduler (minus the per-slot
RNG-key device state: chunk keys are host-built ``[seed, counter]`` pairs —
any uint32 pair is a valid threefry key, and this keeps admission free of
device round-trips).

Scaling model (BASELINE.json's >=85% multi-host target): decode work per
host is constant in the number of hosts — weights are replicated over
``data`` (each host holds a full TP copy on its own chips), a host's slots'
KV traffic is host-local, and the only cross-host costs are the per-step
plan allgather (a few hundred bytes over DCN, amortized over a whole decode
chunk) plus XLA's logits resharding.  Aggregate throughput should therefore
scale ~linearly with hosts; the 2-process CPU test asserts the protocol
(including through the spmd+interpret-kernel path), real-pod numbers must
come from hardware — read them off :meth:`global_stats`.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from collections import deque
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

from fastllama_tpu.config import (EngineConfig, ModelConfig,
                                  QuantType, resolve_scale_dtype)
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.loaders.tokenizer import Tokenizer
from fastllama_tpu.models.batched import (BatchedKVCache, decode_step,
                                          prefill_many)
from fastllama_tpu.models.llama import LlamaParams
from fastllama_tpu.ops import sampling
from fastllama_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS
from fastllama_tpu.runtime.batching import BatchStats, Request

# lockstep plan vector layout (int32): one row per host; the fixed fields
# are followed by a per-bucket admission histogram (one wave runs per
# bucket with any admissions fleet-wide, so one host's long prompt no
# longer forces every host's wave into the big bucket)
_PLAN_LIVE = 0       # 1 if host has live slots after admission
_PLAN_KMAX = 1       # host's max safe decode-chunk length
_PLAN_GREEDY = 2     # 1 if all of host's live requests are greedy
_PLAN_MAXPOS = 3     # host's max position after planned HIT admissions
_PLAN_NFIX = 4       # then: NB full-prefill counts, NB prefix-hit counts

# max admissions per host per wave.  Each distinct (wave width, bucket)
# pair compiles its own prefill program; capping the width bounds the
# compile-key space to |buckets| * log2(cap)-ish while a backlog still
# drains at cap*hosts prompts per step.  MEASURED (1B INT8, 48 queued
# 43-token prompts, one lockstep round, warm, v5e 2026-08-19): cap=8
# 1.44 s, cap=16 1.17 s, cap=32 2.0 s of admission prefill — 16 drains a
# 48-slot cold start fastest (fewer dispatches than 8, less wave padding
# waste than 32).
_ADMIT_CAP = 16

# max prefix-cache hits per host per collective hit wave.  The tail flow
# is unrolled k times inside one program (each hit's donor copy + layer
# scan), so compile time grows ~linearly with k — 4 keeps it bounded while
# a typical hit burst still lands in one or two collectives.
_HIT_CAP = 4


class MultiHostEngine:
    """Continuous batching across ``jax.process_count()`` hosts.

    Each host calls :meth:`submit` with its own clients' prompts and then
    drives :meth:`step`/:meth:`run` — all hosts must call them in lockstep
    (they already do when every host runs the same serving loop)."""

    def __init__(self, config: ModelConfig, params: LlamaParams,
                 tokenizer: Tokenizer,
                 engine_config: Optional[EngineConfig] = None,
                 decode_chunk: int = 16, mesh=None):
        ec = engine_config or EngineConfig()
        if ec.max_seq_len:
            config = config.replace(max_seq_len=min(config.max_seq_len,
                                                    ec.max_seq_len))
        config.validate()
        self.config = config
        self.tokenizer = tokenizer
        self.decode_chunk = decode_chunk
        self.kv_dtype = jnp.dtype(ec.kv_dtype)
        self._cdt = jnp.dtype(ec.compute_dtype)
        self.rank = jax.process_index()
        self.n_hosts = max(1, jax.process_count())

        if mesh is None:
            from fastllama_tpu.parallel.distributed import global_mesh
            mesh = global_mesh(ec.mesh or
                               f"data={self.n_hosts},"
                               f"model={jax.local_device_count()}")
        self.mesh = mesh
        if mesh.shape[DATA_AXIS] != self.n_hosts:
            raise ValueError(
                f"data axis ({mesh.shape[DATA_AXIS]}) must equal the process "
                f"count ({self.n_hosts}): slots are per-host")

        if len(mesh.devices.flat) == 1:
            # degenerate single-device mesh: fused QKV / gate|up layouts are
            # legal (they don't match TP shardings on a real mesh, where
            # BatchedEngine disables fusion too), and sharding is a plain
            # device_put (fused params have None leaves param_shardings
            # doesn't describe)
            if ec.fuse_weights and not ec.parity_mode:
                from fastllama_tpu.models.llama import fuse_params
                try:
                    params = fuse_params(config, params)
                except ValueError:
                    pass
            scale_dt = resolve_scale_dtype(ec, config, batched=True)
            if scale_dt != "float32" and not ec.parity_mode:
                from fastllama_tpu.quant.groupquant import compress_scales
                params = compress_scales(params, jnp.dtype(scale_dt))
            self.params = jax.device_put(params, mesh.devices.flat[0])
        else:
            from fastllama_tpu.parallel.sharding import shard_params
            scale_dt = resolve_scale_dtype(ec, config, batched=True)
            if scale_dt != "float32" and not ec.parity_mode:
                from fastllama_tpu.quant.groupquant import compress_scales
                params = compress_scales(params, jnp.dtype(scale_dt))
            self.params = shard_params(config, mesh, params)

        # slots: W per host = serving slots + 1 sink for padded admissions
        self.W = max(2, ec.max_batch_size + 1)
        self.B = self.W * self.n_hosts
        self.serve_w = self.W - 1
        self.slot0 = self.rank * self.W            # first global local slot

        mp = mesh.shape[MODEL_AXIS]
        multi_dev = len(mesh.devices.flat) > 1

        # the round-3 cornerstone: run the fused hot loop on every shard.
        # spmd needs heads/hidden/quant-groups divisible by the model axis
        # and the batch by the data axis (parallel/spmd_step._check_dims).
        self._spmd = False
        if ec.spmd_kernels and multi_dev:
            from fastllama_tpu.parallel.spmd_step import _check_dims
            try:
                _check_dims(config, mesh, self.B, True)
                self._spmd = True
            except ValueError as e:
                import warnings
                warnings.warn(f"spmd_kernels requested but unavailable: {e}; "
                              f"falling back to the GSPMD jnp path")
        if multi_dev and not self._spmd:
            # GSPMD cannot partition single-device Pallas programs
            ec = dataclasses.replace(ec, use_pallas=False)
        self.ec = ec

        # decode skips the sink slot whenever slot ids stay aligned (spmd:
        # shard-local rows; single host: global==local): the sink is the
        # LAST slot, so a serve_w-row dispatch addresses cache slots
        # [0, serve_w) exactly, and serve_w (the user's max_batch_size)
        # keeps the flash kernel's slot-block divisible — W = mbs+1 is
        # often odd/prime, which forced BB=1 and a per-(slot, head-block)
        # program explosion measured at 3.3x whole-engine slowdown on v5e
        # (751 vs 2497 tok/s aggregate, 7B INT8 B=40).  The multi-host
        # GSPMD jnp path keeps full-W dispatch: its q row ids are GLOBAL
        # (row i = slot i), and skipping each host's sink would leave
        # non-contiguous global rows — decode would need a row->slot index
        # array, i.e. a gather over the whole sharded cache per layer (a
        # full cache copy under GSPMD).  Cost of NOT skipping, bounded:
        # n_hosts extra rows of W*n_hosts dispatched = 1/W of the per-row
        # MXU work (QKV/FFN/logits rows) and ZERO extra weight/KV stream
        # (the decode bottleneck) — ~2% row compute at W=49 on a fallback
        # path only taken when the spmd dims check fails (spmd_kernels,
        # the recommended mode everywhere, skips sinks).
        self._decode_w = (self.serve_w
                          if (self._spmd or self.n_hosts == 1) else self.W)

        from fastllama_tpu.runtime.kernels import select_kernels
        self._kb = select_kernels(
            ec, self._cdt, config.max_seq_len, self.kv_dtype,
            n_layers=config.n_layers,
            n_kv_bytes=config.n_kv_heads * config.head_size
            * self.kv_dtype.itemsize)

        head_ax = MODEL_AXIS if config.n_kv_heads % mp == 0 else None
        sh5 = NamedSharding(mesh, P(None, DATA_AXIS, head_ax, None, None))
        sh4 = NamedSharding(mesh, P(None, DATA_AXIS, head_ax, None))
        S = config.max_seq_len
        shape = (config.n_layers, self.B, config.n_kv_heads, S,
                 config.head_size)
        if self.kv_dtype == jnp.int8:
            self.cache = BatchedKVCache(
                jax.jit(lambda: jnp.zeros(shape, jnp.int8),
                        out_shardings=sh5)(),
                jax.jit(lambda: jnp.zeros(shape, jnp.int8),
                        out_shardings=sh5)(),
                jax.jit(lambda: jnp.ones(shape[:-1], jnp.float32),
                        out_shardings=sh4)(),
                jax.jit(lambda: jnp.ones(shape[:-1], jnp.float32),
                        out_shardings=sh4)())
        else:
            z = jax.jit(lambda: jnp.zeros(shape, self.kv_dtype),
                        out_shardings=sh5)
            self.cache = BatchedKVCache(z(), z())
        self.S = S

        # host-local slot state (serving slots only; the sink is never live)
        self.slot_req: List[Optional[Request]] = [None] * self.serve_w
        self.pos = np.zeros(self.W, np.int32)
        self.pending = np.zeros(self.W, np.int32)
        self.temps = np.zeros(self.W, np.float32)
        self.topps = np.ones(self.W, np.float32)
        self.keys = np.zeros((self.W, 2), np.uint32)

        # admission-wave bucket levels (ascending; S is always last)
        self._buckets = sorted({min(b, S) for b in ec.prefill_buckets
                                if b <= S} | {S})

        # host-LOCAL prefix cache (same rolling-hash index as
        # BatchedEngine — the methods are borrowed below): admissions
        # whose prompt shares a block prefix with a live slot ON THIS HOST
        # copy that slot's rows and prefill only the tail, one hit per
        # host per collective call (spmd_prefill_tail_hits).  Cross-host
        # donors would need a DCN row copy — out of scope, documented.
        # The multi-dev GSPMD jnp path can't express per-host scalars in
        # one collective program, so hits need spmd kernels (or one host).
        self._prefix_enabled = bool(ec.prefix_cache) and (
            self._spmd or not multi_dev)
        if ec.prefix_cache and not self._prefix_enabled:
            import warnings
            warnings.warn("prefix_cache on a multi-device mesh needs "
                          "spmd_kernels; disabled")
        self._prefix_block = 16
        self._prefix_index = {}
        self._slot_prefix_keys = [[] for _ in range(self.serve_w)]
        self._planned_hits = {}

        self.queue = deque()
        self.stats = BatchStats()
        self._next_id = 0
        self._chunk_counter = 0
        self._prefill_fns = {}
        self._chunk_fns = {}
        self._tail_fns = {}
        self._sh_slot_i32 = NamedSharding(mesh, P(DATA_AXIS))
        self._sh_slot_f32 = self._sh_slot_i32
        self._sh_rows2 = NamedSharding(mesh, P(DATA_AXIS, None))

    @staticmethod
    def load(ckpt_path: str, tokenizer_path: str = "",
             file_type: FileType = FileType.UNKNOWN,
             qtype: Optional[QuantType] = None,
             engine_config: Optional[EngineConfig] = None,
             decode_chunk: int = 16, mesh=None) -> "MultiHostEngine":
        from fastllama_tpu.loaders.registry import resolve_and_build
        ec = engine_config or EngineConfig()
        if not ec.mesh:
            ec = dataclasses.replace(
                ec, mesh=f"data={max(1, jax.process_count())},"
                         f"model={jax.local_device_count()}")
        # device_put=None + ec.mesh => registry pads hidden_dim for the
        # model axis and keeps weights host-side; __init__ shards them
        cfg, params, tok = resolve_and_build(
            ckpt_path, tokenizer_path, file_type, qtype, ec, None)
        return MultiHostEngine(cfg, params, tok, ec, decode_chunk, mesh)

    # -- global/local array plumbing ----------------------------------------

    def _to_global(self, local: np.ndarray, sharding) -> jax.Array:
        return jax.make_array_from_process_local_data(sharding, local)

    def _to_local(self, garr: jax.Array, spec: P) -> np.ndarray:
        host = multihost_utils.global_array_to_host_local_array(
            garr, self.mesh, spec)
        return np.asarray(host)

    # -- compiled steps ------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.ec.prefill_buckets:
            if b >= n and b <= self.S:
                return b
        return self.S

    # host-local prefix index: IDENTICAL semantics to the single-host
    # engine — borrow the methods (they only touch _prefix_block/_index/
    # _slot_prefix_keys/slot_req, all mirrored here)
    from fastllama_tpu.runtime.batching import BatchedEngine as _BE
    _prefix_hashes = staticmethod(_BE._prefix_hashes)
    _prefix_register = _BE._prefix_register
    _prefix_release = _BE._prefix_release
    _prefix_lookup = _BE._prefix_lookup
    del _BE

    def _get_prefill(self, bucket: int, a: int):
        key_ = (bucket, a)
        if key_ not in self._prefill_fns:
            cfg, cdt, kb = self.config, self._cdt, self._kb

            if self._spmd:
                from fastllama_tpu.parallel.spmd_step import spmd_prefill_many
                mesh = self.mesh

                def f(params, tokens, lengths, slots, cache, keys, temps,
                      topps):
                    logits, cache = spmd_prefill_many(
                        cfg, mesh, params, tokens, lengths, slots, cache,
                        mm=kb.mm, mm_idx=kb.mm_idx,
                        slot_writer=kb.slot_writer, data_sharded=True,
                        compute_dtype=cdt)
                    toks = sampling.sample_batched(logits, keys, temps, topps)
                    return toks, cache
            else:
                def f(params, tokens, lengths, slots, cache, keys, temps,
                      topps):
                    logits, cache = prefill_many(
                        cfg, params, tokens, lengths, slots, cache,
                        mm=kb.mm, mm_idx=kb.mm_idx,
                        slot_writer=kb.slot_writer, compute_dtype=cdt)
                    toks = sampling.sample_batched(logits, keys, temps, topps)
                    return toks, cache

            self._prefill_fns[key_] = jax.jit(
                f, donate_argnums=(4,) if self.ec.donate_cache else ())
        return self._prefill_fns[key_]

    def _get_tail_hit(self, bucket: int, k: int = 1):
        """Collective prefix-HIT admission: donor-row copies + tail
        prefills, up to ``k`` hits per host per call (hosts with fewer
        pass sink ids) — a burst of N planned hits costs ceil(N/k)
        collectives instead of N one-hit dispatches."""
        key_ = (bucket, k)
        if key_ not in self._tail_fns:
            cfg, cdt, kb = self.config, self._cdt, self._kb
            at = None
            if kb.attn_bidx is not None:
                from fastllama_tpu.ops.pallas.flash_decode import \
                    make_attn_tail
                at = make_attn_tail(interpret=self.ec.pallas_interpret)

            if self._spmd:
                from fastllama_tpu.parallel.spmd_step import \
                    spmd_prefill_tail_hits
                mesh = self.mesh

                def f(params, tokens, lengths, slots, donors, starts,
                      cache, keys, temps, topps):
                    logits, cache = spmd_prefill_tail_hits(
                        cfg, mesh, params, tokens, lengths, slots, donors,
                        starts, cache, mm=kb.mm, mm_idx=kb.mm_idx,
                        attn_tail=at, compute_dtype=cdt)
                    toks = sampling.sample_batched(logits, keys, temps,
                                                   topps)
                    return toks, cache
            else:
                # single-host degenerate (H == 1): the scalar tail path,
                # looped over the wave's k hits inside one jit
                from fastllama_tpu.models.batched import (
                    copy_slot_prefix, prefill_into_slot_at)

                def f(params, tokens, lengths, slots, donors, starts,
                      cache, keys, temps, topps):
                    logits = []
                    for i in range(k):
                        cache = copy_slot_prefix(cache, donors[i], slots[i],
                                                 starts[i])
                        lg, cache = prefill_into_slot_at(
                            cfg, params, tokens[i], lengths[i], slots[i],
                            starts[i], cache, mm=kb.mm, mm_idx=kb.mm_idx,
                            attn_tail=at, compute_dtype=cdt)
                        logits.append(lg)
                    toks = sampling.sample_batched(jnp.stack(logits), keys,
                                                   temps, topps)
                    return toks, cache

            self._tail_fns[key_] = jax.jit(
                f, donate_argnums=(6,) if self.ec.donate_cache else ())
        return self._tail_fns[key_]

    def _get_chunk(self, n_steps: int, greedy_only: bool, s_bound: int = 0,
                   dynamic: bool = False):
        """``dynamic=True``: the one program whose step count is a runtime
        scalar (lax.while_loop trip count, k_dyn <= n_steps; output rows
        past k_dyn are zero).  Fleet chunks shorter than decode_chunk run
        through it — K is derived from the allgathered plans, so every
        host passes the same operand and lockstep holds with FEWER distinct
        programs (the per-K buckets measured as 37 s p95 probe TTFT in
        tools/qos_bench.py: drain-K compiles landing in the probe window)."""
        key_ = (("dyn", greedy_only, s_bound) if dynamic
                else (n_steps, greedy_only, s_bound))
        if key_ not in self._chunk_fns:
            cfg, cdt, S, kb = self.config, self._cdt, self.S, self._kb
            ab = kb.attn_bidx
            if s_bound and kb.attn_bidx_factory is not None:
                ab = kb.attn_bidx_factory(s_bound)

            def make_body(params, temps, topps):
                def body(carry, _):
                    tok, pos, cache, keys = carry
                    if self._spmd:
                        from fastllama_tpu.parallel.spmd_step import \
                            spmd_decode_step
                        logits, cache = spmd_decode_step(
                            cfg, self.mesh, params, tok, pos, cache,
                            mm=kb.mm, mm_idx=kb.mm_idx, attn_bidx=ab,
                            kv_writer=kb.kv_writer, data_sharded=True,
                            compute_dtype=cdt)
                    else:
                        logits, cache = decode_step(
                            cfg, params, tok, pos, cache,
                            mm=kb.mm, mm_idx=kb.mm_idx, attn_bidx=ab,
                            kv_writer=kb.kv_writer, compute_dtype=cdt)
                    if greedy_only:
                        nxt = sampling.greedy(logits)
                    else:
                        splits = jax.vmap(jax.random.split)(keys)
                        keys = splits[:, 0]
                        nxt = sampling.sample_batched(
                            logits, splits[:, 1], temps, topps)
                    pos = jnp.minimum(pos + 1, S - 1)
                    return (nxt, pos, cache, keys), nxt
                return body

            def shard_out(toks):
                # slot-major so hosts read their own columns off DCN
                return jax.lax.with_sharding_constraint(
                    toks, NamedSharding(self.mesh, P(None, DATA_AXIS)))

            def chunk(params, cache, tokens, pos, keys, temps, topps):
                (tok, pos, cache, keys), toks = jax.lax.scan(
                    make_body(params, temps, topps),
                    (tokens, pos, cache, keys), length=n_steps)
                return shard_out(toks), cache

            def chunk_dyn(params, cache, tokens, pos, keys, temps, topps,
                          k_dyn):
                body = make_body(params, temps, topps)
                toks0 = jnp.zeros((n_steps, tokens.shape[0]), tokens.dtype)

                def cond_fn(c):
                    return c[0] < k_dyn

                def body_fn(c):
                    k, st, toks = c
                    st, nxt = body(st, None)
                    return k + 1, st, toks.at[k].set(nxt)

                _, (tok, pos, cache, keys), toks = jax.lax.while_loop(
                    cond_fn, body_fn,
                    (jnp.int32(0), (tokens, pos, cache, keys), toks0))
                return shard_out(toks), cache

            self._chunk_fns[key_] = jax.jit(
                chunk_dyn if dynamic else chunk,
                donate_argnums=(1,) if self.ec.donate_cache else ())
        return self._chunk_fns[key_]

    # -- scheduling ------------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 256,
               temperature: float = 0.0, topp: float = 0.9,
               seed: int = 128391297,
               stop_tokens: Optional[Sequence[int]] = None,
               callback=None, priority: int = 0,
               deadline_s: float = 0.0) -> Request:
        tokens = (self.tokenizer.encode(prompt, add_bos=True)
                  if isinstance(prompt, str) else list(prompt))
        if not tokens:
            raise ValueError("empty prompt")
        if len(tokens) >= self.S:
            raise ValueError(f"prompt too long: {len(tokens)} >= {self.S}")
        if stop_tokens is None:
            stop_tokens = (0, self.tokenizer.eos_token_id)
        req = Request(
            id=self._next_id * self.n_hosts + self.rank,
            prompt_tokens=tokens,
            max_new_tokens=min(max_new_tokens, self.S - len(tokens) - 1),
            temperature=temperature, topp=topp, seed=seed,
            callback=callback, stop_tokens=tuple(int(t) for t in stop_tokens),
            priority=priority, deadline_s=deadline_s,
            submit_s=time.perf_counter())
        self._next_id += 1
        self.queue.append(req)
        return req

    def _qos_queue_pass(self) -> None:
        """Host-LOCAL QoS before planning (each host orders its own queue;
        the lockstep plan only exchanges counts, so no cross-host state):
        expire deadlines, then stable-sort by priority class."""
        if any(r.deadline_s > 0 for r in self.queue):
            now = time.perf_counter()
            kept = deque()
            for r in self.queue:
                if r.deadline_s > 0 and now - r.submit_s > r.deadline_s:
                    r.rejected = r.done = True
                    r.finish_s = now
                    self.stats.rejected += 1
                else:
                    kept.append(r)
            self.queue = kept
        if any(r.priority for r in self.queue):
            self.queue = deque(sorted(self.queue,
                                      key=lambda r: -r.priority))

    def _emit(self, slot: int, tok: int, from_decode: bool = True) -> None:
        req = self.slot_req[slot]
        if not req.output_tokens:
            req.first_token_s = time.perf_counter()
        req.output_tokens.append(tok)
        self.stats.total_output_tokens += 1
        if from_decode:
            self.stats.decode_tokens += 1
        cancelled = False
        if req.callback is not None and tok not in req.stop_tokens:
            if req._stream is None:
                from fastllama_tpu.loaders.tokenizer import StreamDecoder
                req._stream = StreamDecoder(self.tokenizer)
            text = req._stream.piece(tok, req._prev_token)
            cancelled = req.callback(text, tok) is False
        req._prev_token = tok
        if cancelled or tok in req.stop_tokens \
                or len(req.output_tokens) >= req.max_new_tokens:
            req.done = True
            req.finish_s = time.perf_counter()
            self.slot_req[slot] = None
            if self._prefix_enabled:
                # freed slot's rows are no longer stable (idle decode
                # writes row 0) — drop any prefixes it donated
                self._prefix_release(slot)
            self.pos[slot] = 0
            self.pending[slot] = 0
            self.stats.completed += 1

    def _local_plan(self) -> np.ndarray:
        self._qos_queue_pass()
        NB = len(self._buckets)
        plan = np.zeros(_PLAN_NFIX + 2 * NB, np.int32)
        free = [i for i, r in enumerate(self.slot_req) if r is None]
        # plan the FULL backlog this round (bounded by free slots);
        # _ADMIT_CAP bounds the per-WAVE compile key, not the round —
        # capping the round at 8 made startup admissions trickle across
        # decode chunks: B=40 took 5 rounds x 64-step chunks to fill, 33%
        # average occupancy, measured 839 vs 2514 tok/s on the same chip
        take = min(len(free), len(self.queue))
        # prefix hits plan into the SECOND bucket bank (counts by TAIL
        # bucket); the fleet runs max-over-hosts hit waves before the
        # full-prefill waves.  Hits are remembered so admission consumes
        # exactly what was planned.
        self._planned_hits = {}
        hit_ids = set()
        if self._prefix_enabled:
            for i in range(take):
                req = self.queue[i]
                donor, plen = self._prefix_lookup(req.prompt_tokens)
                if donor is not None:
                    tb = self._bucket(len(req.prompt_tokens) - plen)
                    self._planned_hits.setdefault(tb, []).append(
                        (req, donor, plen))
                    hit_ids.add(req.id)
                    plan[_PLAN_NFIX + NB + self._buckets.index(tb)] += 1
        for i in range(take):
            req = self.queue[i]
            if req.id in hit_ids:
                continue
            b = self._bucket(len(req.prompt_tokens))
            plan[_PLAN_NFIX + self._buckets.index(b)] += 1
        live = [i for i, r in enumerate(self.slot_req) if r is not None]
        will_live = bool(live) or take > 0
        plan[_PLAN_LIVE] = int(will_live)
        if live:
            kmax = min(self.decode_chunk,
                       min(self.S - 1 - int(self.pos[i]) for i in live),
                       max(r.max_new_tokens - len(r.output_tokens)
                           for r in (self.slot_req[i] for i in live)))
            if self.ec.qos_chunk and self.queue:
                # this host has requests waiting on a full batch: cap the
                # FLEET's chunk (plan K = min over hosts) so the next
                # admission point comes sooner — same TTFT bound as the
                # single-host engine's qos_chunk
                kmax = min(kmax, self.ec.qos_chunk)
            plan[_PLAN_KMAX] = max(1, kmax)
        else:
            plan[_PLAN_KMAX] = self.decode_chunk
        # GREEDY must cover the requests this plan ADMITS too, not just the
        # already-live slots: the decode chunk after the admission waves uses
        # the allgathered flag, so a sampled request admitted on a cold start
        # would otherwise decode its first chunk greedily (regression-tested:
        # test_multihost.py::test_multihost_sampled_cold_start)
        plan[_PLAN_GREEDY] = int(
            all(self.slot_req[i].temperature <= 0.0 for i in live) and
            all(self.queue[i].temperature <= 0.0 for i in range(take)))
        # MAXPOS must upper-bound this host's max position AFTER the
        # admissions this plan triggers, because every host derives the
        # flash-window s_bound from the ALLGATHERED plans alone — mixing in
        # host-local state (the old max(plans, self.pos.max())) let hosts
        # compile DIFFERENT collective programs in the same lockstep round
        # (a 1000-token admission on host A widened only A's s_bound:
        # mismatched Pallas grids around the shard_map psums = hang).
        # Hit admissions land at pos = full prompt length (exact, known
        # here); full-prefill admissions are bounded by their wave's bucket,
        # which step() adds from the shared bucket histograms.
        maxpos = max((int(self.pos[i]) for i in live), default=0)
        for hits in self._planned_hits.values():
            for req, _donor, _plen in hits:
                maxpos = max(maxpos, len(req.prompt_tokens))
        plan[_PLAN_MAXPOS] = maxpos
        return plan

    def _admit_wave(self, a: int, bucket: int) -> None:
        """All hosts run one (a, bucket) admission wave; this host fills its
        first ``n`` rows with its queued requests OF THIS BUCKET, the rest
        with sink-slot dummies (a host with nothing in the bucket still
        participates — SPMD lockstep).

        The spmd path addresses slots SHARD-LOCALLY (this host's wave rows
        land on its own chips); the GSPMD path uses global slot ids."""
        free = [i for i, r in enumerate(self.slot_req) if r is None]
        items = []
        kept = deque()
        while self.queue and len(items) < min(len(free), a):
            req = self.queue.popleft()
            if self._bucket(len(req.prompt_tokens)) == bucket:
                items.append((req, free[len(items)]))
            else:
                kept.append(req)
        kept.extend(self.queue)
        self.queue = kept
        n = len(items)

        base = 0 if self._spmd else self.slot0
        toks_np = np.zeros((a, bucket), np.int32)
        lens = np.ones(a, np.int32)
        slots_np = np.full(a, base + self.serve_w, np.int32)  # sink
        temps = np.zeros(a, np.float32)
        topps = np.ones(a, np.float32)
        keys = np.zeros((a, 2), np.uint32)
        for i, (req, slot) in enumerate(items):
            toks_np[i, :len(req.prompt_tokens)] = req.prompt_tokens
            lens[i] = len(req.prompt_tokens)
            slots_np[i] = base + slot
            temps[i] = req.temperature
            topps[i] = req.topp
            keys[i] = (req.seed & 0xFFFFFFFF, req.id & 0xFFFFFFFF)

        t0 = time.perf_counter()
        fn = self._get_prefill(bucket, a)
        firsts, self.cache = fn(
            self.params,
            self._to_global(toks_np, self._sh_rows2),
            self._to_global(lens, self._sh_slot_i32),
            self._to_global(slots_np, self._sh_slot_i32),
            self.cache,
            self._to_global(keys, self._sh_rows2),
            self._to_global(temps, self._sh_slot_f32),
            self._to_global(topps, self._sh_slot_f32))
        firsts = self._to_local(firsts, P(DATA_AXIS))
        self.stats.prefill_s += time.perf_counter() - t0

        for i, (req, slot) in enumerate(items):
            self.slot_req[slot] = req
            self.pos[slot] = lens[i]
            self.temps[slot] = req.temperature
            self.topps[slot] = req.topp
            self.pending[slot] = int(firsts[i])
            self.keys[slot] = (req.seed & 0xFFFFFFFF,
                               (req.id * 65537 + 1) & 0xFFFFFFFF)
            req._prev_token = req.prompt_tokens[-1]
            self.stats.total_prompt_tokens += int(lens[i])
            if self._prefix_enabled:
                self._prefix_register(slot, req.prompt_tokens)
            self._emit(slot, int(firsts[i]), from_decode=False)

    def _admit_hit_wave(self, bucket: int, idx0: int, k: int = 1) -> None:
        """One collective hit wave: this host admits its planned hits
        [idx0, idx0+k) of tail-bucket ``bucket`` (padding with sink ids
        where it has fewer — SPMD lockstep)."""
        hits = self._planned_hits.get(bucket, [])
        items = [hits[i] if i < len(hits) else None
                 for i in range(idx0, idx0 + k)]
        toks_np = np.zeros((k, bucket), np.int32)
        lens = np.ones(k, np.int32)
        slots_np = np.full(k, self.serve_w, np.int32)      # sink (local id)
        donors_np = np.full(k, self.serve_w, np.int32)
        starts_np = np.zeros(k, np.int32)
        temps = np.zeros(k, np.float32)
        topps = np.ones(k, np.float32)
        keys = np.zeros((k, 2), np.uint32)
        slots = [-1] * k
        free = iter(i for i, r in enumerate(self.slot_req) if r is None)
        for i, item in enumerate(items):
            if item is None:
                continue
            req, donor, plen = item
            slots[i] = slot = next(free)
            self.queue.remove(req)
            tail = req.prompt_tokens[plen:]
            toks_np[i, :len(tail)] = tail
            lens[i] = len(tail)
            slots_np[i] = slot
            donors_np[i] = donor
            starts_np[i] = plen
            temps[i] = req.temperature
            topps[i] = req.topp
            keys[i] = (req.seed & 0xFFFFFFFF, req.id & 0xFFFFFFFF)
            # claim the slot NOW so the next hit of this wave can't take it
            self.slot_req[slot] = req

        t0 = time.perf_counter()
        fn = self._get_tail_hit(bucket, k)
        firsts, self.cache = fn(
            self.params,
            self._to_global(toks_np, self._sh_rows2),
            self._to_global(lens, self._sh_slot_i32),
            self._to_global(slots_np, self._sh_slot_i32),
            self._to_global(donors_np, self._sh_slot_i32),
            self._to_global(starts_np, self._sh_slot_i32),
            self.cache,
            self._to_global(keys, self._sh_rows2),
            self._to_global(temps, self._sh_slot_f32),
            self._to_global(topps, self._sh_slot_f32))
        firsts = self._to_local(firsts, P(DATA_AXIS))
        self.stats.prefill_s += time.perf_counter() - t0

        for i, item in enumerate(items):
            if item is None:
                continue
            req, donor, plen = item
            slot = slots[i]
            self.pos[slot] = len(req.prompt_tokens)
            self.temps[slot] = req.temperature
            self.topps[slot] = req.topp
            self.pending[slot] = int(firsts[i])
            self.keys[slot] = (req.seed & 0xFFFFFFFF,
                               (req.id * 65537 + 1) & 0xFFFFFFFF)
            req._prev_token = req.prompt_tokens[-1]
            self.stats.total_prompt_tokens += len(req.prompt_tokens)
            self.stats.prefix_hits += 1
            self.stats.prefix_rows_reused += plen
            self._prefix_register(slot, req.prompt_tokens)
            self._emit(slot, int(firsts[i]), from_decode=False)

    def _gather_plans(self) -> np.ndarray:
        """ONE tiny collective: allgather every host's local plan vector."""
        plan = self._local_plan()
        plans = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(plan)))
        return plans.reshape(self.n_hosts, plan.shape[0])

    def _run_admissions(self, plans: np.ndarray) -> None:
        """Drain the fleet's planned admissions in lockstep waves (every
        host derives the same wave sequence from the allgathered plans)."""
        NB = len(self._buckets)
        # prefix-hit waves first (cheapest admissions; donors are live at
        # plan time and nothing frees a slot before these run), batched k
        # hits per host per collective call (power-of-two widths capped at
        # _HIT_CAP bound the compile keys; sink padding is free)
        for j in range(NB - 1, -1, -1):
            h = int(plans[:, _PLAN_NFIX + NB + j].max())
            w = 0
            while w < h:
                k = min(1 << (h - w - 1).bit_length(), _HIT_CAP)
                self._admit_hit_wave(self._buckets[j], w, k)
                w += k

        # one admission wave per bucket with fleet-wide demand, largest
        # first (its requests have the least slack to spare); wave width
        # padded to a power of two so (bucket, a) compile keys stay
        # log2(_ADMIT_CAP)-bounded (sink rows make padding free), same as
        # the single-host engine's _admit_pending
        for j in range(NB - 1, -1, -1):
            d = int(plans[:, _PLAN_NFIX + j].max())
            while d > 0:
                # back-to-back waves drain the whole fleet demand BEFORE
                # the decode chunk runs; every host derives the same wave
                # count from the allgathered max, so collective calls stay
                # in lockstep (hosts that run out fill with sink rows)
                a = min(1 << (d - 1).bit_length(), _ADMIT_CAP)
                self._admit_wave(a, self._buckets[j])
                d -= a

    def _plans_max_pos(self, plans: np.ndarray) -> int:
        """Fleet max position after this round's admissions, derived from
        the ALLGATHERED plans ONLY (identical arithmetic on identical data
        on every host — never from host-local self.pos, see _local_plan's
        MAXPOS comment).  Plan MAXPOS covers live slots + hit admissions;
        full-prefill admissions are bounded by their wave's bucket."""
        NB = len(self._buckets)
        max_pos = int(plans[:, _PLAN_MAXPOS].max())
        for j in range(NB):
            if plans[:, _PLAN_NFIX + j].max() > 0:
                max_pos = max(max_pos, self._buckets[j])
        return max_pos

    def step(self) -> bool:
        """One lockstep scheduling round across all hosts.  Returns True
        while ANY host still has work."""
        plans = self._gather_plans()
        self._run_admissions(plans)
        if not plans[:, _PLAN_LIVE].any():
            return False
        self._decode_round(plans)
        return bool(self.queue) or any(r is not None for r in self.slot_req)

    def _decode_round(self, plans: np.ndarray) -> None:
        """One lockstep decode chunk (every host derives the same K/greedy/
        s_bound from the allgathered plans and issues the same jit call)."""
        # EXACT fleet K (min over hosts) — short chunks are a runtime
        # operand of the one dynamic program, so no pow2 bucketing and no
        # per-K compile; every host derives the same K from the same plans
        K = max(1, int(plans[:, _PLAN_KMAX].min()))
        greedy = bool(plans[:, _PLAN_GREEDY].all())
        # bounded flash window: every host must compile the same s_bound
        s_bound = 0
        if self._kb.attn_bidx_factory is not None:
            from fastllama_tpu.ops.pallas.flash_decode import round_bound
            s_bound = round_bound(self._plans_max_pos(plans) + K, self.S)

        # fresh chunk keys: any uint32 pair is a valid threefry key; vary the
        # counter so resampling differs per chunk
        self._chunk_counter += 1
        dw = self._decode_w
        kv = self.keys[:dw].copy()
        kv[:, 1] = (kv[:, 1] + self._chunk_counter) & 0xFFFFFFFF

        t0 = time.perf_counter()
        dyn = K < self.decode_chunk
        fn = self._get_chunk(self.decode_chunk if dyn else K, greedy,
                             s_bound, dynamic=dyn)
        t1 = time.perf_counter()
        args = (self.params, self.cache,
                self._to_global(self.pending[:dw], self._sh_slot_i32),
                self._to_global(self.pos[:dw], self._sh_slot_i32),
                self._to_global(kv, self._sh_rows2),
                self._to_global(self.temps[:dw], self._sh_slot_f32),
                self._to_global(self.topps[:dw], self._sh_slot_f32))
        if dyn:
            args = args + (np.int32(K),)
        t2 = time.perf_counter()
        toks, self.cache = fn(*args)
        t3 = time.perf_counter()
        toks_np = self._to_local(toks, P(None, DATA_AXIS))     # (K, dw)
        t4 = time.perf_counter()
        if os.environ.get("FASTLLAMA_MH_DEBUG"):
            print(f"# chunk K={K} s_bound={s_bound} get={t1-t0:.3f} "
                  f"puts={t2-t1:.3f} dispatch={t3-t2:.3f} "
                  f"fetch={t4-t3:.3f}", file=sys.stderr)
        self.stats.decode_s += time.perf_counter() - t0

        live = [i for i, r in enumerate(self.slot_req) if r is not None]
        self.pos[:dw] = np.minimum(self.pos[:dw] + K, self.S - 1)
        # row K-1, NOT -1: the dynamic short-chunk buffer has decode_chunk
        # rows with rows >= K zero
        self.pending[:dw] = toks_np[K - 1]
        for w in range(dw):
            if w >= self.serve_w or self.slot_req[w] is None:
                self.pos[w] = 0
                self.pending[w] = 0

        for w in live:
            for k in range(K):
                if self.slot_req[w] is None:
                    break
                self._emit(w, int(toks_np[k, w]))

    def run(self) -> BatchStats:
        """Drain ALL hosts' queues (keeps stepping while any host works)."""
        while True:
            more = self.step()
            flag = np.asarray(multihost_utils.process_allgather(
                jnp.asarray([int(more or bool(self.queue))], jnp.int32)))
            if not flag.any():
                return self.stats

    def global_stats(self) -> BatchStats:
        """Cross-host aggregate: sums token/request counters over every
        host, takes the max wall times (hosts run in lockstep, so the max is
        the fleet's wall clock).  ``aggregate_tps`` of the result is the
        whole-pod decode throughput — the number the >=85% scaling gate
        reads.  Collective: every host must call it."""
        s = self.stats
        vec = np.asarray([s.completed, s.total_prompt_tokens,
                          s.total_output_tokens, s.decode_tokens,
                          s.prefix_hits, s.prefix_rows_reused,
                          s.rejected], np.int64)
        times = np.asarray([s.decode_s, s.prefill_s], np.float64)
        all_counts = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(vec))).reshape(self.n_hosts, -1).sum(axis=0)
        all_times = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(times))).reshape(self.n_hosts, -1).max(axis=0)
        return BatchStats(
            completed=int(all_counts[0]),
            total_prompt_tokens=int(all_counts[1]),
            total_output_tokens=int(all_counts[2]),
            decode_tokens=int(all_counts[3]),
            prefix_hits=int(all_counts[4]),
            prefix_rows_reused=int(all_counts[5]),
            rejected=int(all_counts[6]),
            decode_s=float(all_times[0]),
            prefill_s=float(all_times[1]))

    def generate_all(self, prompts: Sequence, **kw) -> List[Request]:
        reqs = [self.submit(p, **kw) for p in prompts]
        self.run()
        return reqs
