"""Continuous batching: a slot-based scheduler over the batched forward.

The reference engine serves exactly one stream (``generate``,
transformer.cpp:76-103).  On TPU, decode throughput is HBM-bound — every step
streams all weights once regardless of batch — so serving B streams costs
barely more than one until KV-cache traffic dominates.  This module is the
aggregate-throughput serving layer:

* :class:`Request` — one generation job (prompt, sampling params, stream
  callback, collected output).
* :class:`BatchedEngine` — owns ``B`` cache slots.  Each :meth:`step` admits
  queued requests into free slots (one padded prefill per admission, writing
  K/V into that slot from position 0) and then runs ONE decode chunk of K
  tokens for ALL slots (a ``lax.scan`` with on-device per-slot sampling —
  traced temperature/top-p vectors, so mixed sampling params never
  recompile).  Requests join and leave at chunk boundaries; idle slots decode
  garbage that is discarded on host (SPMD can't skip them, and the cost is
  amortized across the live slots).

Slot-state invariants (host mirrors device exactly):
  ``pos[b]``  = number of K/V rows valid in slot b's cache,
  ``pending[b]`` = last sampled token, NOT yet written to the cache; the next
  decode step writes its K/V row at ``pos[b]`` and samples the following
  token.  Device positions advance ``min(pos+1, S-1)`` per step and the host
  replays the same arithmetic.
"""
from __future__ import annotations

import dataclasses
import time
from collections import deque
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastllama_tpu.config import (EngineConfig, ModelConfig,
                                  QuantType, resolve_scale_dtype)
from fastllama_tpu.loaders.registry import FileType, load_model
from fastllama_tpu.loaders.tokenizer import Tokenizer
from fastllama_tpu.models.batched import (BatchedKVCache, decode_step,
                                          decode_step_deferred, land_staged,
                                          make_staged, prefill_many)
from fastllama_tpu.models.llama import LlamaParams
from fastllama_tpu.ops import sampling
from fastllama_tpu.ops.qmatmul import qmatmul

DEFAULT_CHUNK = 16


def host_prng_key(seed: int) -> np.ndarray:
    """``jax.random.PRNGKey(seed)``'s bytes built on the HOST: the threefry
    key under disabled x64 is ``[0, seed & 0xffffffff]`` (uint32).  Calling
    the real PRNGKey in the admission loop cost one full device round-trip
    per request (~27 ms through a remote-TPU tunnel; 0.85 s per 32-request
    admission batch before this)."""
    return np.array([0, seed & 0xFFFFFFFF], dtype=np.uint32)


@dataclasses.dataclass
class Request:
    """One generation job tracked through the scheduler."""

    id: int
    prompt_tokens: List[int]
    max_new_tokens: int
    temperature: float = 0.0
    topp: float = 0.9
    seed: int = 128391297
    callback: Optional[Callable[[str, int], object]] = None
    stop_tokens: Tuple[int, ...] = ()
    # QoS: higher priority admits first (FIFO within a class); a nonzero
    # deadline rejects the request if it is still QUEUED deadline_s seconds
    # after submit (admitted requests always run to completion — their slot
    # is already paid for)
    priority: int = 0
    deadline_s: float = 0.0

    # filled by the engine
    output_tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    rejected: bool = False         # deadline expired while queued
    submit_s: float = 0.0
    first_token_s: float = 0.0     # TTFT (submit -> first emitted token)
    finish_s: float = 0.0
    _prev_token: int = -1
    _stream: object = None      # lazy StreamDecoder (byte-fallback UTF-8)

    @property
    def ttft(self) -> float:
        return self.first_token_s - self.submit_s

    def text(self, tokenizer: Tokenizer) -> str:
        return tokenizer.decode(self.output_tokens)


@dataclasses.dataclass
class BatchStats:
    """Aggregate serving statistics."""

    completed: int = 0
    total_prompt_tokens: int = 0
    total_output_tokens: int = 0    # all emitted tokens (incl. prefill-sampled)
    decode_tokens: int = 0          # tokens produced by decode chunks only
    decode_s: float = 0.0
    prefill_s: float = 0.0
    prefix_hits: int = 0            # admissions served from the prefix cache
    prefix_rows_reused: int = 0     # K/V rows copied instead of prefilled
    rejected: int = 0               # requests dropped at an expired deadline

    @property
    def aggregate_tps(self) -> float:
        """Decode throughput: decode-produced tokens over decode wall time
        (each request's first token is sampled during prefill and its cost
        sits in prefill_s — counting it here would overstate tok/s)."""
        return self.decode_tokens / self.decode_s if self.decode_s else 0.0


class BatchedEngine:
    """Continuous-batching engine over ``max_batch_size`` KV-cache slots."""

    def __init__(self, config: ModelConfig, params: LlamaParams,
                 tokenizer: Tokenizer,
                 engine_config: Optional[EngineConfig] = None,
                 decode_chunk: int = DEFAULT_CHUNK):
        ec = engine_config or EngineConfig()
        if ec.max_seq_len:
            config = config.replace(max_seq_len=min(config.max_seq_len,
                                                    ec.max_seq_len))
        config.validate()
        self.config = config
        self.B = max(1, ec.max_batch_size)
        self.mesh = None
        if ec.mesh:
            from fastllama_tpu.parallel.sharding import (make_mesh,
                                                         shard_params)
            self.mesh = make_mesh(ec.mesh)
            params = shard_params(config, self.mesh, params)
            if len(self.mesh.devices.flat) > 1:
                # GSPMD can't partition a single-device Pallas call, so the
                # fused kernels are only legal under the explicit shard_map
                # path (spmd_kernels), where each device traces them on its
                # LOCAL shard shapes.  fuse_weights' concatenated layouts
                # don't match the TP shardings either way.
                ec = dataclasses.replace(
                    ec, fuse_weights=False,
                    use_pallas=ec.use_pallas and ec.spmd_kernels)
        if ec.fuse_weights and not ec.parity_mode:
            from fastllama_tpu.models.llama import fuse_params
            try:
                params = fuse_params(config, params)
            except ValueError:          # mixed INT4 pack layouts: keep unfused
                ec = dataclasses.replace(ec, fuse_weights=False)
        scale_dt = resolve_scale_dtype(ec, config, batched=True)
        if scale_dt != "float32" and not ec.parity_mode:
            from fastllama_tpu.quant.groupquant import compress_scales
            params = compress_scales(params, jnp.dtype(scale_dt))
        self.params = params
        self.tokenizer = tokenizer
        self.ec = ec
        self.decode_chunk = decode_chunk
        self.kv_dtype = jnp.dtype(ec.kv_dtype)
        self._cdt = jnp.dtype(ec.compute_dtype)

        from fastllama_tpu.runtime.kernels import select_kernels
        kb = select_kernels(
            ec, self._cdt, config.max_seq_len, self.kv_dtype,
            n_layers=config.n_layers,
            n_kv_bytes=config.n_kv_heads * config.head_size
            * self.kv_dtype.itemsize)
        self._mm = kb.mm
        self._mm_idx = kb.mm_idx
        self._attn_bidx = kb.attn_bidx
        self._attn_bidx_factory = kb.attn_bidx_factory
        # one-launch in-place cache writers (replace the O(B) slab-update
        # loop; None when Mosaic can't tile S — loop fallback)
        self._kv_writer = kb.kv_writer
        self._slot_writer = kb.slot_writer

        # opt-in explicit-TP path: shard_map over the mesh with per-shard
        # kernels (parallel/spmd_step.py); default = GSPMD auto-partitioning.
        # A 1-device mesh is allowed (psums over size-1 axes are free): it
        # lets the shard_map program be A/B'd against the plain path on one
        # chip — the wrapper must cost nothing (tools/spec_batch_ab.py
        # SB_SPMD=1)
        self._spmd = bool(ec.spmd_kernels and self.mesh is not None)

        # deferred staged-KV decode chunks (EngineConfig.deferred_kv): gate
        # on everything the stats kernel + spec_write landing need, decided
        # once here so _dispatch_chunk's per-chunk check is just K bounds
        self._deferred_ok = False
        self._spec_writer = None
        self._attn_stats_factory = None
        if (ec.deferred_kv and not self._spmd
                and kb.attn_bidx_factory is not None
                and kb.kv_writer is not None
                and config.head_size % 8 == 0):
            from fastllama_tpu.ops.pallas.flash_decode import (
                _block_size, make_attn_batched_flash_stats)
            from fastllama_tpu.ops.pallas.kv_write import make_spec_writer
            if _block_size(config.max_seq_len):
                self._deferred_ok = True
                self._spec_writer = make_spec_writer(
                    interpret=ec.pallas_interpret)
                self._attn_stats_factory = partial(
                    make_attn_batched_flash_stats,
                    interpret=ec.pallas_interpret)

        # device state
        self.cache = BatchedKVCache.create(config, self.B, dtype=self.kv_dtype)
        if self.mesh is not None:
            from fastllama_tpu.parallel.sharding import slot_cache_sharding
            sh5, sh4 = slot_cache_sharding(config, self.mesh, self.B)
            self.cache = jax.tree.map(
                lambda a: jax.device_put(a, sh5 if a.ndim == 5 else sh4),
                self.cache)
        self._keys = jax.random.split(jax.random.PRNGKey(0), self.B)

        # host slot state
        S = config.max_seq_len
        self.S = S
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self.pos = np.zeros(self.B, np.int32)
        self.pending = np.zeros(self.B, np.int32)
        self.temps = np.zeros(self.B, np.float32)
        self.topps = np.ones(self.B, np.float32)

        self.queue = deque()
        self.stats = BatchStats()
        self._next_id = 0
        self._prefill_fns = {}
        self._tail_fns = {}
        self._chunk_fns = {}

        # prefix cache: (plen, hash(prefix)) -> donor slot; donor rows
        # [0, plen) are immutable while the donor is live (decode writes at
        # pos >= plen) and invalidated on slot release (idle-slot decode
        # clobbers row 0)
        self._prefix_block = 16
        self._prefix_index = {}
        self._slot_prefix_keys = [[] for _ in range(self.B)]
        self._prefix_enabled = bool(ec.prefix_cache)

        @jax.jit
        def _fold_keys(keys, slots, seeds, ids):
            new = jax.vmap(lambda s, i: jax.random.fold_in(
                jax.random.PRNGKey(s), i + 1))(seeds, ids)
            return keys.at[slots].set(new)

        # one device call updates every admitted slot's RNG key (a per-slot
        # .at[].set + fold_in pair costs a full dispatch round-trip each —
        # 24 admits spent ~1 s in host->device latency before batching)
        self._fold_keys = _fold_keys

    # -- loading -------------------------------------------------------------

    @staticmethod
    def load(ckpt_path: str, tokenizer_path: str = "",
             file_type: FileType = FileType.UNKNOWN,
             qtype: Optional[QuantType] = None,
             engine_config: Optional[EngineConfig] = None,
             decode_chunk: int = DEFAULT_CHUNK,
             device_put=None) -> "BatchedEngine":
        from fastllama_tpu.loaders.registry import resolve_and_build
        cfg, params, tok = resolve_and_build(
            ckpt_path, tokenizer_path, file_type, qtype, engine_config,
            device_put)
        return BatchedEngine(cfg, params, tok, engine_config, decode_chunk)

    # -- compiled steps --------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.ec.prefill_buckets:
            if b >= n and b <= self.S:
                return b
        return self.S

    def _get_prefill_many(self, bucket: int, n: int):
        """N prompts of one bucket admitted in ONE device call (the
        sequential-admission prefill was becoming the serving bottleneck:
        24 x 43-token admits cost ~1.1 s while their whole decode ran 2 s)."""
        key_ = ("many", bucket, n)
        if key_ not in self._prefill_fns:
            cfg, mm, mi, cdt = self.config, self._mm, self._mm_idx, self._cdt

            sw = self._slot_writer
            if self._spmd:
                from fastllama_tpu.parallel.spmd_step import spmd_prefill_many
                mesh = self.mesh

                def f(params, tokens, lengths, slots, cache, keys, temps,
                      topps):
                    logits, cache = spmd_prefill_many(
                        cfg, mesh, params, tokens, lengths, slots, cache,
                        mm=mm, mm_idx=mi, slot_writer=sw, compute_dtype=cdt)
                    toks = sampling.sample_batched(logits, keys, temps, topps)
                    return toks, cache
            else:
                def f(params, tokens, lengths, slots, cache, keys, temps,
                      topps):
                    logits, cache = prefill_many(
                        cfg, params, tokens, lengths, slots, cache,
                        mm=mm, mm_idx=mi, slot_writer=sw, compute_dtype=cdt)
                    toks = sampling.sample_batched(logits, keys, temps, topps)
                    return toks, cache

            self._prefill_fns[key_] = jax.jit(
                f, donate_argnums=(4,) if self.ec.donate_cache else ())
        return self._prefill_fns[key_]

    def _get_tail_prefill(self, bucket: int):
        """Mid-sequence single-slot prefill (the prefix-cache tail path)."""
        if bucket not in self._tail_fns:
            cfg, mm, mi, cdt = self.config, self._mm, self._mm_idx, self._cdt
            from fastllama_tpu.models.batched import (copy_slot_prefix,
                                                      prefill_into_slot_at)
            at = None
            if self._attn_bidx is not None:     # pallas attention active
                from fastllama_tpu.ops.pallas.flash_decode import \
                    make_attn_tail
                at = make_attn_tail(interpret=self.ec.pallas_interpret)

            if self._spmd:
                # shard_map tail: the single-device Pallas tail under GSPMD
                # would compile on the interpret CPU mesh but cannot be
                # auto-partitioned on real chips (round-2 flagged hazard)
                from fastllama_tpu.parallel.spmd_step import spmd_prefill_tail
                mesh = self.mesh

                def f(params, tokens, length, slot, donor, start, cache, key,
                      temp, topp):
                    cache = copy_slot_prefix(cache, donor, slot, start)
                    logits, cache = spmd_prefill_tail(
                        cfg, mesh, params, tokens, length, slot, start,
                        cache, mm=mm, mm_idx=mi, attn_tail=at,
                        compute_dtype=cdt)
                    tok = sampling.sample_batched(
                        logits[None], key[None], temp[None], topp[None])[0]
                    return tok, cache
            else:
                def f(params, tokens, length, slot, donor, start, cache, key,
                      temp, topp):
                    # donor-row copy + tail prefill in ONE device call: a
                    # separate copy dispatch cost a full tunnel round-trip
                    # and erased the hit path's latency win
                    cache = copy_slot_prefix(cache, donor, slot, start)
                    logits, cache = prefill_into_slot_at(
                        cfg, params, tokens, length, slot, start, cache,
                        mm=mm, mm_idx=mi, attn_tail=at, compute_dtype=cdt)
                    tok = sampling.sample_batched(
                        logits[None], key[None], temp[None], topp[None])[0]
                    return tok, cache

            self._tail_fns[bucket] = jax.jit(
                f, donate_argnums=(6,) if self.ec.donate_cache else ())
        return self._tail_fns[bucket]

    # -- prefix cache ----------------------------------------------------------

    @staticmethod
    def _prefix_hashes(prompt: List[int], BL: int) -> List[int]:
        """Rolling hash per BL-token prefix level: O(len) total for ALL
        levels and O(1) ints stored per level (storing the token tuples
        themselves was O(L^2/16) host memory on long prompts — ADVICE r2).
        Hits are verified against the donor's actual tokens, so collisions
        cost a wasted compare, never a wrong admission."""
        hashes, h = [], 0
        for l in range(BL, len(prompt) + 1, BL):
            h = hash((h, tuple(prompt[l - BL:l])))
            hashes.append(h)
        return hashes

    def _prefix_register(self, slot: int, prompt: List[int]) -> None:
        BL = self._prefix_block
        for i, h in enumerate(self._prefix_hashes(prompt, BL)):
            key = ((i + 1) * BL, h)
            # first registration wins: overwriting would re-point a shared
            # prefix at a shorter-lived slot, losing the entry when that
            # slot frees even though the original donor is still resident
            if key not in self._prefix_index:
                self._prefix_index[key] = slot
                self._slot_prefix_keys[slot].append(key)

    def _prefix_release(self, slot: int) -> None:
        for key in self._slot_prefix_keys[slot]:
            if self._prefix_index.get(key) == slot:
                del self._prefix_index[key]
        self._slot_prefix_keys[slot] = []

    def _prefix_lookup(self, prompt: List[int]):
        """Longest block-aligned live prefix strictly shorter than the
        prompt (>= 1 tail token must remain to produce first logits).
        Hash hits are confirmed token-by-token against the DONOR's live
        request before use — exactness is preserved.

        A candidate is usable only if plen + bucket(tail) fits the context:
        the tail prefill writes a full BUCKET of rows at start=plen, and
        dynamic_update_slice would silently CLAMP an out-of-range start,
        landing the tail rows over the copied prefix (misaligned KV,
        silently wrong output).  Not monotone in plen (shorter prefix =>
        longer tail => bigger bucket), so each candidate is checked."""
        BL = self._prefix_block
        top = (len(prompt) - 1) // BL
        hashes = self._prefix_hashes(prompt, BL)
        for i in range(min(top, len(hashes)) - 1, -1, -1):
            l = (i + 1) * BL
            slot = self._prefix_index.get((l, hashes[i]))
            if slot is not None:
                donor = self.slot_req[slot]
                if donor is not None and \
                        donor.prompt_tokens[:l] == prompt[:l] and \
                        l + self._bucket(len(prompt) - l) <= self.S:
                    return slot, l
        return None, 0

    def _get_chunk(self, n_steps: int, greedy_only: bool, s_bound: int = 0,
                   deferred: bool = False, dynamic: bool = False):
        """``dynamic=True`` returns the ONE program whose step count is a
        runtime scalar operand (``k_dyn`` <= n_steps, a lax.while_loop trip
        count; output rows past k_dyn are zero).  Every drain/qos chunk
        shorter than decode_chunk runs through it, so short chunks never
        compile their own whole-model K-step scan — under the spec engine's
        tuner the drain K values depend on the measured arm sequence, and
        the old per-K buckets kept compiling inside measured benchmark
        passes.  The steady K == decode_chunk chunk keeps its static
        lax.scan program (the serving headline path, byte-identical to
        before)."""
        key_ = (("dyn", greedy_only, s_bound) if dynamic
                else (n_steps, greedy_only, s_bound, deferred))
        if key_ not in self._chunk_fns:
            cfg, mm, mi, ab = (self.config, self._mm, self._mm_idx,
                               self._attn_bidx)
            if s_bound and self._attn_bidx_factory is not None:
                ab = self._attn_bidx_factory(s_bound)
            cdt, S = self._cdt, self.S

            if deferred:
                fn = self._build_deferred_chunk(n_steps, greedy_only,
                                                s_bound)
                self._chunk_fns[key_] = fn
                return fn

            def make_body(params, temps, topps):
                # one decode step; shared by the static scan and the
                # dynamic while_loop programs below
                def body(carry, _):
                    tok, pos, cache, keys = carry
                    if self._spmd:
                        from fastllama_tpu.parallel.spmd_step import \
                            spmd_decode_step
                        logits, cache = spmd_decode_step(
                            cfg, self.mesh, params, tok, pos, cache,
                            mm=mm, mm_idx=mi, attn_bidx=ab,
                            kv_writer=self._kv_writer, compute_dtype=cdt)
                    else:
                        logits, cache = decode_step(
                            cfg, params, tok, pos, cache,
                            mm=mm, mm_idx=mi, attn_bidx=ab,
                            kv_writer=self._kv_writer, compute_dtype=cdt)
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

            def chunk(params, cache, tokens, pos, keys, temps, topps):
                (tok, pos, cache, keys), toks = jax.lax.scan(
                    make_body(params, temps, topps),
                    (tokens, pos, cache, keys), length=n_steps)
                return toks, cache, keys

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
                return toks, cache, keys

            self._chunk_fns[key_] = jax.jit(
                chunk_dyn if dynamic else chunk,
                donate_argnums=(1,) if self.ec.donate_cache else ())
        return self._chunk_fns[key_]

    def _build_deferred_chunk(self, n_steps: int, greedy_only: bool,
                              s_bound: int):
        """K-step decode chunk with chunk-deferred cache writes: fresh K/V
        rows accumulate in the exact-tile staging buffers
        (models/batched.make_staged) and land with ONE spec_write at chunk
        end — the per-step int8 slab read-modify-write (~1.5 ms/step of
        pure cache-slab traffic at serving batch) collapses to at most two
        slabs per slot per layer per CHUNK.  ``pos`` here is the chunk
        START position (fixed across the scan); the host guarantees
        max(pos) + K <= S - 1 (_plan_chunk) so the landing never wraps."""
        cfg, mm, mi, cdt = self.config, self._mm, self._mm_idx, self._cdt
        ast = self._attn_stats_factory(s_bound)
        sw = self._spec_writer
        K = n_steps

        def chunk(params, cache, tokens, pos0, keys, temps, topps):
            B = tokens.shape[0]
            staged0 = make_staged(cfg, cache, B, K)

            def body(carry, s):
                tok, keys, staged = carry
                logits, staged = decode_step_deferred(
                    cfg, params, tok, pos0, s, staged, cache,
                    mm=mm, mm_idx=mi, attn_stats=ast, compute_dtype=cdt)
                if greedy_only:
                    nxt = sampling.greedy(logits)
                else:
                    splits = jax.vmap(jax.random.split)(keys)
                    keys = splits[:, 0]
                    nxt = sampling.sample_batched(
                        logits, splits[:, 1], temps, topps)
                return (nxt, keys, staged), nxt

            (tok, keys, staged), toks = jax.lax.scan(
                body, (tokens, keys, staged0),
                jnp.arange(K, dtype=jnp.int32))
            cache = land_staged(cache, staged, pos0, sw)
            return toks, cache, keys

        return jax.jit(
            chunk, donate_argnums=(1,) if self.ec.donate_cache else ())

    # -- scheduling ------------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 256,
               temperature: float = 0.0, topp: float = 0.9,
               seed: int = 128391297,
               stop_tokens: Optional[Sequence[int]] = None,
               callback=None, priority: int = 0,
               deadline_s: float = 0.0) -> Request:
        """Queue a generation job; returns the live Request handle.

        ``priority``: admission order class (higher first, FIFO within);
        ``deadline_s``: > 0 rejects the request if still queued that many
        seconds after submit (``req.rejected``)."""
        tokens = (self.tokenizer.encode(prompt, add_bos=True)
                  if isinstance(prompt, str) else list(prompt))
        if not tokens:
            raise ValueError("empty prompt")
        if len(tokens) >= self.S:
            raise ValueError(f"prompt too long: {len(tokens)} >= {self.S}")
        if stop_tokens is None:
            stop_tokens = (0, self.tokenizer.eos_token_id)
        req = Request(
            id=self._next_id, prompt_tokens=tokens,
            max_new_tokens=min(max_new_tokens, self.S - len(tokens) - 1),
            temperature=temperature, topp=topp, seed=seed,
            callback=callback, stop_tokens=tuple(int(t) for t in stop_tokens),
            priority=priority, deadline_s=deadline_s,
            submit_s=time.perf_counter())
        self._next_id += 1
        self.queue.append(req)
        return req

    def _qos_queue_pass(self) -> None:
        """Deadline-expire queued requests, then order the queue by
        priority class (stable: FIFO within a class — submission order is
        the tiebreak, so priority-0 traffic behaves exactly as before)."""
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

    def _free_slots(self) -> List[int]:
        return [b for b, r in enumerate(self.slot_req) if r is None]

    def _live_slots(self) -> List[int]:
        return [b for b, r in enumerate(self.slot_req) if r is not None]

    def _emit(self, slot: int, tok: int, from_decode: bool = True) -> None:
        """Append one accepted token to slot's request; free on stop/limit,
        or when the callback returns False (cancel — same contract as
        Engine.generate's streaming callback)."""
        req = self.slot_req[slot]
        if not req.output_tokens:
            req.first_token_s = time.perf_counter()
        req.output_tokens.append(tok)
        self.stats.total_output_tokens += 1
        if from_decode:
            self.stats.decode_tokens += 1
        cancelled = False
        # stop tokens are recorded but not streamed (see Engine.generate)
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
            # park the idle slot at position 0: under the flash-decode
            # kernel an idle slot then streams one KV block, not max_seq.
            # Its rows are no longer stable (idle decode writes row 0), so
            # drop any prefix-cache entries donated by this slot.
            self._prefix_release(slot)
            self.pos[slot] = 0
            self.pending[slot] = 0
            self.stats.completed += 1

    def _admit_pending(self) -> None:
        """Admit queued requests into free slots, one device call per
        prefill bucket (N padded to a power of two by repeating the last
        request — duplicate slot writes are identical, so harmless)."""
        self._qos_queue_pass()
        free = self._free_slots()
        take = min(len(free), len(self.queue))
        if take == 0:
            return
        items = [(self.queue.popleft(), slot) for slot in free[:take]]

        # prefix-cache hits first: copy the donor's K/V rows device-side and
        # prefill only the tail (one call per hit; the tail is short)
        if self._prefix_enabled:
            rest = []
            for req, slot in items:
                donor, plen = self._prefix_lookup(req.prompt_tokens)
                if donor is not None:
                    self._admit_prefix_hit(req, slot, donor, plen)
                else:
                    rest.append((req, slot))
            items = rest
            if not items:
                return

        groups = {}
        for req, slot in items:
            groups.setdefault(self._bucket(len(req.prompt_tokens)),
                              []).append((req, slot))
        # prefill_many stacks every layer's fresh K/V as scan outputs
        # ((L, N, n_kv, T, hs)); cap N*T so that stack stays ~1-2 GB for 7B
        # (N=32 x T=512 measured 8.6 GB -> HBM OOM)
        _ROWS_CAP = 2048
        waves = []
        for bucket, grp in sorted(groups.items()):
            # per-wave size is a power of two so the Np padding below can
            # never overshoot the row cap (42 -> 64 would have)
            per = max(1, _ROWS_CAP // bucket)
            per = 1 << (per.bit_length() - 1)
            for i in range(0, len(grp), per):
                waves.append((bucket, grp[i:i + per]))
        for bucket, grp in waves:
            t0 = time.perf_counter()
            N = len(grp)
            Np = 1 << (N - 1).bit_length()
            grp_p = grp + [grp[-1]] * (Np - N)
            toks_np = np.zeros((Np, bucket), np.int32)
            lens = np.zeros(Np, np.int32)
            slots_np = np.zeros(Np, np.int32)
            temps = np.zeros(Np, np.float32)
            topps = np.ones(Np, np.float32)
            keys = np.zeros((Np, 2), np.uint32)
            for i, (req, slot) in enumerate(grp_p):
                toks_np[i, :len(req.prompt_tokens)] = req.prompt_tokens
                lens[i] = len(req.prompt_tokens)
                slots_np[i] = slot
                temps[i] = req.temperature
                topps[i] = req.topp
                keys[i] = host_prng_key(req.seed)
            fn = self._get_prefill_many(bucket, Np)
            firsts, self.cache = fn(
                self.params, jnp.asarray(toks_np), jnp.asarray(lens),
                jnp.asarray(slots_np), self.cache, jnp.asarray(keys),
                jnp.asarray(temps), jnp.asarray(topps))
            firsts = np.asarray(firsts)
            self._keys = self._fold_keys(
                self._keys,
                jnp.asarray([slot for _, slot in grp], jnp.int32),
                jnp.asarray([req.seed for req, _ in grp], jnp.uint32),
                jnp.asarray([req.id for req, _ in grp], jnp.uint32))
            self.stats.prefill_s += time.perf_counter() - t0
            for i, (req, slot) in enumerate(grp):
                self.slot_req[slot] = req
                self.pos[slot] = lens[i]
                self.temps[slot] = req.temperature
                self.topps[slot] = req.topp
                self.pending[slot] = int(firsts[i])
                req._prev_token = req.prompt_tokens[-1]
                self.stats.total_prompt_tokens += int(lens[i])
                if self._prefix_enabled:
                    self._prefix_register(slot, req.prompt_tokens)
                self._emit(slot, int(firsts[i]), from_decode=False)

    def _admit_prefix_hit(self, req: Request, slot: int, donor: int,
                          plen: int) -> None:
        """Admission via prefix cache: device-copy donor rows [0, plen) into
        ``slot``, then prefill only the prompt tail at start=plen."""
        t0 = time.perf_counter()
        tail = req.prompt_tokens[plen:]
        bucket = self._bucket(len(tail))
        padded = np.zeros(bucket, np.int32)
        padded[:len(tail)] = tail
        fn = self._get_tail_prefill(bucket)
        first, self.cache = fn(
            self.params, jnp.asarray(padded),
            jnp.asarray(len(tail), jnp.int32),
            jnp.asarray(slot, jnp.int32), jnp.asarray(donor, jnp.int32),
            jnp.asarray(plen, jnp.int32),
            self.cache, jnp.asarray(host_prng_key(req.seed)),
            jnp.asarray(req.temperature, jnp.float32),
            jnp.asarray(req.topp, jnp.float32))
        first = int(np.asarray(first))
        self._keys = self._fold_keys(
            self._keys, jnp.asarray([slot], jnp.int32),
            jnp.asarray([req.seed], jnp.uint32),
            jnp.asarray([req.id], jnp.uint32))
        self.stats.prefill_s += time.perf_counter() - t0
        self.stats.prefix_hits += 1
        self.stats.prefix_rows_reused += plen
        self.slot_req[slot] = req
        self.pos[slot] = len(req.prompt_tokens)
        self.temps[slot] = req.temperature
        self.topps[slot] = req.topp
        self.pending[slot] = first
        req._prev_token = req.prompt_tokens[-1]
        self.stats.total_prompt_tokens += len(req.prompt_tokens)
        self._prefix_register(slot, req.prompt_tokens)
        self._emit(slot, first, from_decode=False)

    def _plan_chunk(self, live):
        """(K, greedy_only): EXACT chunk length — K shorter than
        decode_chunk is a runtime operand of the one dynamic program
        (_get_chunk dynamic=True), so drains and qos caps run exactly the
        steps they need with no per-K compile."""
        K = min(self.decode_chunk,
                min(self.S - 1 - int(self.pos[b]) for b in live),
                max(req.max_new_tokens - len(req.output_tokens)
                    for req in (self.slot_req[b] for b in live)))
        if self.ec.qos_chunk and self.queue:
            # requests are waiting on a full batch: shorter chunks reach
            # the next admission point sooner (a slot freed by a stop
            # token at step k of a K-step chunk otherwise idles K-k steps
            # while the queued request's TTFT clock runs)
            K = min(K, self.ec.qos_chunk)
        K = max(K, 1)
        greedy_only = all(self.slot_req[b].temperature <= 0.0 for b in live)
        return K, greedy_only

    def _dispatch_chunk(self, K: int, greedy_only: bool, pending, pos,
                        max_pos: int):
        """Launch one K-step decode chunk (async); returns the tokens
        handle.  ``pending``/``pos`` may be device values (pipelining)."""
        s_bound = 0
        if self._attn_bidx_factory is not None:
            from fastllama_tpu.ops.pallas.flash_decode import round_bound
            s_bound = round_bound(max_pos + K, self.S)
        # deferred staged-KV chunks need >= 2 steps to amortize the landing;
        # past K=32 the per-step staged re-reads outgrow the slab savings.
        # MEASURED on chip (tools/deferred_ab.py, 7B INT8+kv8 B=48 S=512,
        # 2026-08-19): deferred NEVER wins — K=4: 1946.5 vs 1988.1 plain,
        # K=8: 2358.0 vs 2351.5 (+0.3%, noise), K=16: 2526.0 vs 2586.6,
        # K=32: 2437.7 vs 2757.1 (-11.6%) — the per-step staged re-read +
        # jnp merge epilogue costs what the one-landing amortization saves.
        # deferred_kv therefore stays DEFAULT-OFF; the machinery is kept
        # (tested) because the balance may flip on parts with different
        # HBM:VPU ratios.  Staging memory bound: L*B*K*n_kv*hs bytes x2
        # (K+V) + scales — ~430 MB at 7B/B=48/K=32 int8, carried through
        # the chunk scan on top of the multi-GB cache (the K <= 32 cap is
        # a memory bound too, not just a traffic tradeoff).
        deferred = bool(self._deferred_ok and 2 <= K <= 32)
        if K == self.decode_chunk or deferred:
            fn = self._get_chunk(K, greedy_only, s_bound, deferred)
            toks, self.cache, self._keys = fn(
                self.params, self.cache, pending, pos, self._keys,
                jnp.asarray(self.temps), jnp.asarray(self.topps))
        else:
            # short (drain/qos) chunk: the one dynamic program, K as a
            # runtime operand — no per-K whole-model compile
            fn = self._get_chunk(self.decode_chunk, greedy_only, s_bound,
                                 dynamic=True)
            toks, self.cache, self._keys = fn(
                self.params, self.cache, pending, pos, self._keys,
                jnp.asarray(self.temps), jnp.asarray(self.topps),
                np.int32(K))
        return toks

    def _apply_chunk(self, toks_np: np.ndarray, K: int, live) -> None:
        """Host bookkeeping for one consumed chunk: mirror the device
        position arithmetic, park idle slots, emit tokens."""
        self.pos = np.minimum(self.pos + K, self.S - 1)
        # row K-1, NOT -1: the dynamic short-chunk program's buffer is
        # decode_chunk rows with rows >= K zero
        self.pending = toks_np[K - 1].copy()
        for b in range(self.B):
            if self.slot_req[b] is None:        # park idle slots at 0 so the
                self.pos[b] = 0                 # bounded attention window
                self.pending[b] = 0             # stays tight
        for b in live:
            for k in range(K):
                if self.slot_req[b] is None:
                    break                               # finished mid-chunk
                self._emit(b, int(toks_np[k, b]))

    def step(self) -> bool:
        """Admit queued requests, run one decode chunk.  Returns True while
        any work (live or queued) remains."""
        self._admit_pending()

        live = self._live_slots()
        if not live:
            return bool(self.queue)

        K, greedy_only = self._plan_chunk(live)
        t0 = time.perf_counter()
        toks = self._dispatch_chunk(K, greedy_only,
                                    jnp.asarray(self.pending),
                                    jnp.asarray(self.pos),
                                    int(self.pos.max()))
        toks_np = np.asarray(toks)                      # (K, B)
        self.stats.decode_s += time.perf_counter() - t0
        self._apply_chunk(toks_np, K, live)
        return bool(self.queue) or bool(self._live_slots())

    def _pipelined_stretch(self) -> None:
        """EXPERIMENTAL (FASTLLAMA_PIPELINE=1; measured SLOWER here —
        see run()): dispatch-ahead decode while the schedule is
        predictable: no queued admissions and every live request certainly
        needs >= 2 more full chunks (by max_new_tokens budget).  Chunk
        k+1's input token row is chunk k's toks[-1] — a device value — so
        the next chunk is launched before the previous one's tokens are
        read, hiding the host<->device round-trip per chunk (the trick
        that sped up Engine.generate and the speculative rounds).

        A/B on v5e (7B INT8, B=48): ON 1981 tok/s vs OFF 2684 — queueing a
        second executable whose donated input (the 6.4 GB KV cache) is the
        still-in-flight output of the first makes PJRT copy the cache
        defensively, costing far more than the ~8 ms round-trip it hides.
        The small-state engines (single-stream bf16 cache, spec rounds)
        win from the same trick; the big-cache batched engine loses.
        Unpredictable stop tokens only waste the in-flight chunk's lanes:
        slots are independent in decode, so a finished slot's lanes are
        ignored while other slots' tokens remain exactly what sequential
        chunks would have produced."""
        if self.queue:
            return
        live = self._live_slots()
        if not live:
            return
        K, greedy_only = self._plan_chunk(live)
        if K < self.decode_chunk:
            return                                  # tail region: plain steps
        budget = min(self.slot_req[b].max_new_tokens
                     - len(self.slot_req[b].output_tokens) for b in live)
        room = self.S - 1 - int(self.pos.max())
        n_chunks = min(budget, room) // K
        if n_chunks < 2:
            return

        PIPE = 2
        inflight = []
        pend_dev = jnp.asarray(self.pending)
        pos_np = self.pos.copy()
        t0 = time.perf_counter()
        stop_dispatch = False
        dispatched = 0
        completed_before = self.stats.completed
        while inflight or (dispatched < n_chunks and not stop_dispatch):
            while len(inflight) < PIPE and dispatched < n_chunks \
                    and not stop_dispatch:
                toks = self._dispatch_chunk(
                    K, greedy_only, pend_dev, jnp.asarray(pos_np),
                    int(pos_np.max()))
                pend_dev = toks[K - 1]              # device row, no sync
                # (row K-1, not -1: short chunks run the dynamic program
                # whose buffer has decode_chunk rows, rows >= K zero)
                pos_np = np.minimum(pos_np + K, self.S - 1)
                inflight.append(toks)
                dispatched += 1
            toks_np = np.asarray(inflight.pop(0))
            live_now = self._live_slots()
            self._apply_chunk(toks_np, K, live_now)
            if self.stats.completed != completed_before:
                # a request finished (stop token): its slot should go back
                # to admission; stop dispatching ahead and drain
                stop_dispatch = True
        self.stats.decode_s += time.perf_counter() - t0

    def run(self) -> BatchStats:
        """Drain the queue to completion.  FASTLLAMA_PIPELINE=1 enables the
        experimental dispatch-ahead stretch — measured 26% SLOWER on v5e
        for the big donated KV cache (see _pipelined_stretch); default off.
        """
        import os
        pipe = os.environ.get("FASTLLAMA_PIPELINE", "0") == "1"
        while True:
            if pipe:
                self._admit_pending()
                self._pipelined_stretch()   # no-op unless >= 2 sure chunks
            if not self.step():
                return self.stats

    def generate_all(self, prompts: Sequence, **kw) -> List[Request]:
        """Convenience: submit prompts, run to completion, return requests."""
        reqs = [self.submit(p, **kw) for p in prompts]
        self.run()
        return reqs
