"""Inference engine: the TPU-native ``ParallelTransformer``.

Orchestration counterpart of the reference's runtime
(``/root/reference/src/transformer/transformer.{h,cpp}``):

* ``load`` = checkpoint -> device params (+ optional GSPMD shardings) —
  replacing per-thread weight sharding (transformer.cpp:253-384),
* ``generate`` = prefill the whole prompt in one forward then step
  (transformer.cpp:76-103), with the reference's max_seq_len clamp
  (transformer.cpp:32) and stop-on-token-0 semantics (transformer.cpp:93),
* zero allocation per token: static shapes, bucketed prefill, donated KV
  cache (the jit analogue of the SequentialAllocator arenas).

TPU-specific design: decoding runs in **chunks of K tokens per device
call** — a ``lax.scan`` over the fused step with on-device sampling — so
host<->device dispatch latency (1-2s through the axon tunnel, ~10-100us on a
local runtime) is amortized across K tokens instead of paid per token.
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastllama_tpu.config import (EngineConfig, ModelConfig,
                                  QuantType, resolve_scale_dtype)
from fastllama_tpu.loaders.registry import FileType, LoadedModel, load_model
from fastllama_tpu.loaders.tokenizer import Tokenizer
from fastllama_tpu.models.llama import (KVCache, LlamaParams, forward,
                                        logits_at)
from fastllama_tpu.ops.qmatmul import qmatmul, qmatmul_parity
from fastllama_tpu.ops import sampling
from fastllama_tpu.runtime.sampler import HostSampler

DEFAULT_DECODE_CHUNK = 32


@dataclasses.dataclass
class GenerationStats:
    prompt_tokens: int = 0
    output_tokens: int = 0
    prefill_s: float = 0.0
    decode_s: float = 0.0

    @property
    def prefill_tps(self) -> float:
        return self.prompt_tokens / self.prefill_s if self.prefill_s else 0.0

    @property
    def decode_tps(self) -> float:
        return self.output_tokens / self.decode_s if self.decode_s else 0.0


class Engine:
    def __init__(self, config: ModelConfig, params: LlamaParams,
                 tokenizer: Tokenizer,
                 engine_config: Optional[EngineConfig] = None):
        ec = engine_config or EngineConfig()
        if ec.max_seq_len:
            config = config.replace(max_seq_len=min(config.max_seq_len,
                                                    ec.max_seq_len))
        config.validate()
        self.config = config
        self.mesh = None
        if ec.mesh:
            from fastllama_tpu.parallel.sharding import (make_mesh,
                                                         shard_params)
            self.mesh = make_mesh(ec.mesh)
            params = shard_params(config, self.mesh, params)
            if len(self.mesh.devices.flat) > 1:
                # fused kernels are only legal under shard_map (spmd_kernels):
                # GSPMD can't partition a single-device Pallas call
                ec = dataclasses.replace(
                    ec, fuse_weights=False,
                    use_pallas=ec.use_pallas and ec.spmd_kernels)
        if ec.fuse_weights and not ec.parity_mode:
            from fastllama_tpu.models.llama import fuse_params
            try:
                params = fuse_params(config, params)
            except ValueError:          # mixed INT4 pack layouts: keep unfused
                ec = dataclasses.replace(ec, fuse_weights=False)
        # "auto" narrows scales only on the plain single-device Pallas
        # path: under a mesh the GSPMD-jit legs (prefill, _get_step) keep
        # jnp f32 dequant, where bf16 storage rounding would show
        single_dev = self.mesh is None or len(self.mesh.devices.flat) == 1
        scale_dt = resolve_scale_dtype(
            ec, config, batched=False,
            pallas_live=single_dev and ec.use_pallas and (
                ec.pallas_interpret
                or jax.default_backend() not in ("cpu",)))
        if scale_dt != "float32" and not ec.parity_mode:
            from fastllama_tpu.quant.groupquant import compress_scales
            params = compress_scales(params, jnp.dtype(scale_dt))
        self.params = params
        self.tokenizer = tokenizer
        self.ec = ec
        self.kv_dtype = jnp.dtype(ec.kv_dtype)
        if self.kv_dtype == jnp.int8:
            raise NotImplementedError(
                "kv_dtype='int8' is a BatchedEngine feature (per-row "
                "quantized cache); the single-stream engine keeps fp/bf16")
        self._cdt = jnp.dtype(jnp.float32 if ec.parity_mode else ec.compute_dtype)
        self._attn_idx_factory = None
        # explicit-TP (shard_map) mode: per-shard fused kernels, see below
        self._spmd = bool(ec.spmd_kernels and self.mesh is not None
                          and len(self.mesh.devices.flat) > 1)
        interp = ec.pallas_interpret
        pallas_ok = ec.use_pallas and (interp or
                                       jax.default_backend() not in ("cpu",))
        if ec.parity_mode:
            self._mm = qmatmul_parity
        elif pallas_ok and not self._spmd:
            from fastllama_tpu.ops.pallas.attention import make_attn
            from fastllama_tpu.ops.pallas.qmm import make_mm, make_mm_indexed
            self._mm = make_mm(compute_dtype=self._cdt, interpret=interp)
            self._mm_idx = make_mm_indexed(compute_dtype=self._cdt,
                                           interpret=interp)
            self._attn = make_attn(interpret=interp)
            if ec.flash_attention:
                from fastllama_tpu.ops.pallas.flash_decode import \
                    make_attn_indexed_flash
                self._attn_idx = make_attn_indexed_flash(interpret=interp)
                self._attn_idx_factory = partial(make_attn_indexed_flash,
                                                 interpret=interp)
            else:
                from fastllama_tpu.ops.pallas.attention import \
                    make_attn_indexed
                self._attn_idx = make_attn_indexed(interpret=interp)
        else:
            self._mm = partial(qmatmul, compute_dtype=self._cdt)
        # spmd kernel set: used ONLY inside shard_map bodies, where each
        # device traces them on its local shard shapes.  The GSPMD-jit paths
        # (mid-sequence prefill, _get_step) keep the jnp self._mm above —
        # XLA can't partition a single-device Pallas custom call.
        self._sp_mm = self._sp_mm_idx = self._sp_attn_bidx = None
        self._sp_attn_bidx_factory = None
        if self._spmd:
            self._sp_mm = partial(qmatmul, compute_dtype=self._cdt)
            if pallas_ok:
                from fastllama_tpu.ops.pallas.qmm import (make_mm,
                                                          make_mm_indexed)
                self._sp_mm = make_mm(compute_dtype=self._cdt,
                                      interpret=interp)
                self._sp_mm_idx = make_mm_indexed(compute_dtype=self._cdt,
                                                  interpret=interp)
                if ec.flash_attention:
                    from fastllama_tpu.ops.pallas.flash_decode import \
                        make_attn_batched_flash
                    self._sp_attn_bidx = make_attn_batched_flash(
                        interpret=interp)
                    self._sp_attn_bidx_factory = partial(
                        make_attn_batched_flash, interpret=interp)
                else:
                    from fastllama_tpu.ops.pallas.attention import \
                        make_attn_batched
                    self._sp_attn_bidx = make_attn_batched(interpret=interp)
        if not hasattr(self, "_attn"):
            from fastllama_tpu.ops.attention import gqa_attention
            self._attn = gqa_attention
        if not hasattr(self, "_mm_idx"):
            self._mm_idx = None
        if not hasattr(self, "_attn_idx"):
            self._attn_idx = None
        self._prefill_fns = {}
        self._decode_fns = {}
        self._step_fn = None

    # -- loading -----------------------------------------------------------

    @staticmethod
    def load(ckpt_path: str, tokenizer_path: str = "",
             file_type: FileType = FileType.UNKNOWN,
             qtype: Optional[QuantType] = None,
             engine_config: Optional[EngineConfig] = None,
             device_put=None) -> "Engine":
        from fastllama_tpu.loaders.registry import resolve_and_build
        cfg, params, tok = resolve_and_build(
            ckpt_path, tokenizer_path, file_type, qtype, engine_config,
            device_put)
        return Engine(cfg, params, tok, engine_config)

    # -- compiled steps ----------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.ec.prefill_buckets:
            if b >= n and b <= self.config.max_seq_len:
                return b
        return self.config.max_seq_len

    def _get_prefill(self, bucket: int, fresh: bool = True):
        """``fresh=True`` = prompt starts at pos 0 in an empty cache:
        attention sees only the prompt's own K/V (no cache reads, K/V land
        in the cache as one post-scan slice update) and the classifier runs
        on the last valid row only.  ``fresh=False`` is the mid-sequence
        variant (ChatSession.feed at pos > 0), which attends over the
        existing cache."""
        key_ = (bucket, fresh)
        if key_ not in self._prefill_fns:
            cfg, mm, at = self.config, self._mm, self._attn
            mi, ai, cdt = self._mm_idx, self._attn_idx, self._cdt

            if fresh and self._spmd:
                from fastllama_tpu.models.batched import BatchedKVCache
                from fastllama_tpu.parallel.spmd_step import spmd_prefill_many
                mesh, smm, smi = self.mesh, self._sp_mm, self._sp_mm_idx

                def f(params, tokens, cache, length, pos):
                    L, H, S, hs = cache.k.shape
                    bc = BatchedKVCache(cache.k.reshape(L, 1, H, S, hs),
                                        cache.v.reshape(L, 1, H, S, hs))
                    logits, bc = spmd_prefill_many(
                        cfg, mesh, params, tokens[None],
                        jnp.asarray(length, jnp.int32).reshape(1),
                        jnp.zeros(1, jnp.int32), bc,
                        mm=smm, mm_idx=smi, compute_dtype=cdt)
                    return logits[0], KVCache(bc.k.reshape(L, H, S, hs),
                                              bc.v.reshape(L, H, S, hs))
            elif fresh:
                from fastllama_tpu.models.batched import (BatchedKVCache,
                                                          prefill_into_slot)

                def f(params, tokens, cache, length, pos):
                    L, H, S, hs = cache.k.shape
                    bc = BatchedKVCache(cache.k.reshape(L, 1, H, S, hs),
                                        cache.v.reshape(L, 1, H, S, hs))
                    logits, bc = prefill_into_slot(
                        cfg, params, tokens, length, 0, bc,
                        mm=mm, mm_idx=mi, compute_dtype=cdt)
                    return logits, KVCache(bc.k.reshape(L, H, S, hs),
                                           bc.v.reshape(L, H, S, hs))
            else:
                def f(params, tokens, cache, length, pos):
                    lg, cache = forward(cfg, params, tokens, pos, cache,
                                        mm=mm, attn=at, mm_idx=mi,
                                        attn_idx=ai, last_index=length - 1,
                                        compute_dtype=cdt)
                    return lg[0], cache

            self._prefill_fns[key_] = jax.jit(f, donate_argnums=(2,))
        return self._prefill_fns[key_]

    def _get_decode_chunk(self, n_steps: int, temperature: float, topp: float,
                          s_bound: int = 0, dynamic: bool = False):
        """``dynamic=True``: n_steps sizes the output buffer and the actual
        step count is the runtime scalar ``k_dyn`` (lax.while_loop trip
        count; rows past k_dyn are zero).  The tail chunk of a generation
        (max_new_tokens % decode_chunk) used to compile a fresh whole-model
        scan PER DISTINCT TAIL LENGTH — ~30-100 s at 7B for every new
        ``-n`` a user passes."""
        key_ = (("dyn", n_steps, temperature, topp, s_bound) if dynamic
                else (n_steps, temperature, topp, s_bound))
        if key_ not in self._decode_fns:
            cfg, mm, at = self.config, self._mm, self._attn
            mi, ai, cdt = self._mm_idx, self._attn_idx, self._cdt
            if s_bound and self._attn_idx_factory is not None:
                ai = self._attn_idx_factory(s_bound)

            if self._spmd:
                from fastllama_tpu.models.batched import BatchedKVCache
                from fastllama_tpu.parallel.spmd_step import spmd_decode_step
                mesh, smm, smi = self.mesh, self._sp_mm, self._sp_mm_idx
                sab = self._sp_attn_bidx
                if s_bound and self._sp_attn_bidx_factory is not None:
                    sab = self._sp_attn_bidx_factory(s_bound)

                def step_fn(params, tok, pos, cache):
                    L, H, S, hs = cache.k.shape
                    bc = BatchedKVCache(cache.k.reshape(L, 1, H, S, hs),
                                        cache.v.reshape(L, 1, H, S, hs))
                    lg, bc = spmd_decode_step(
                        cfg, mesh, params, tok[None],
                        jnp.asarray(pos, jnp.int32).reshape(1), bc,
                        mm=smm, mm_idx=smi, attn_bidx=sab, compute_dtype=cdt)
                    return lg, KVCache(bc.k.reshape(L, H, S, hs),
                                       bc.v.reshape(L, H, S, hs))
            else:
                def step_fn(params, tok, pos, cache):
                    return forward(cfg, params, tok[None], pos, cache,
                                   mm=mm, attn=at, mm_idx=mi, attn_idx=ai,
                                   compute_dtype=cdt)

            def make_body(params):
                def body(carry, _):
                    tok, pos, cache, rng = carry
                    lg, cache = step_fn(params, tok, pos, cache)
                    rng, sub = jax.random.split(rng)
                    nxt = sampling.sample(lg[0], sub, temperature, topp)
                    return (nxt, pos + 1, cache, rng), nxt
                return body

            def chunk(params, cache, token, pos0, rng):
                (tok, pos, cache, rng), toks = jax.lax.scan(
                    make_body(params), (token, pos0, cache, rng),
                    length=n_steps)
                return toks, cache, rng

            def chunk_dyn(params, cache, token, pos0, rng, k_dyn):
                body = make_body(params)
                toks0 = jnp.zeros((n_steps,), token.dtype)

                def cond_fn(c):
                    return c[0] < k_dyn

                def body_fn(c):
                    k, st, toks = c
                    st, nxt = body(st, None)
                    return k + 1, st, toks.at[k].set(nxt)

                _, (tok, pos, cache, rng), toks = jax.lax.while_loop(
                    cond_fn, body_fn,
                    (jnp.int32(0), (token, pos0, cache, rng), toks0))
                return toks, cache, rng

            self._decode_fns[key_] = jax.jit(chunk_dyn if dynamic else chunk,
                                             donate_argnums=(1,))
        return self._decode_fns[key_]

    def _get_step(self):
        """Single forward step returning full logits (parity/host-sampling)."""
        if self._step_fn is None:
            cfg, mm, at = self.config, self._mm, self._attn
            mi, ai, cdt = self._mm_idx, self._attn_idx, self._cdt

            def f(params, tokens, pos, cache):
                return forward(cfg, params, tokens, pos, cache, mm=mm,
                               attn=at, mm_idx=mi, attn_idx=ai,
                                    compute_dtype=cdt)

            self._step_fn = jax.jit(f, donate_argnums=(3,))
        return self._step_fn

    def new_cache(self) -> KVCache:
        cache = KVCache.create(self.config, dtype=self.kv_dtype)
        if self.mesh is not None:
            from fastllama_tpu.parallel.sharding import shard_cache
            cache = shard_cache(self.config, self.mesh, cache)
        return cache

    # -- generation --------------------------------------------------------

    def encode(self, prompt: str) -> List[int]:
        return self.tokenizer.encode(prompt, add_bos=True)

    def generate(self, prompt, max_new_tokens: int = 512,
                 temperature: float = 0.0, topp: float = 0.9,
                 seed: int = 128391297,
                 stop_tokens: Optional[Sequence[int]] = None,
                 callback: Optional[Callable[[str, int], bool]] = None,
                 decode_chunk: int = DEFAULT_DECODE_CHUNK,
                 host_sampling: bool = False,
                 ) -> Tuple[List[int], GenerationStats]:
        """Greedy/temperature/top-p generation.  Returns generated token ids
        (prompt excluded) and timing stats.  ``callback(text, token)`` is
        invoked per decoded token; returning False stops generation."""
        cfg = self.config
        decode_chunk = max(1, decode_chunk)
        tokens = self.encode(prompt) if isinstance(prompt, str) else list(prompt)
        if not tokens:
            raise ValueError("empty prompt")
        if len(tokens) >= cfg.max_seq_len:
            raise ValueError(f"prompt too long: {len(tokens)} >= {cfg.max_seq_len}")
        max_new_tokens = min(max_new_tokens, cfg.max_seq_len - len(tokens))
        if stop_tokens is None:
            # reference stops only on token 0 (transformer.cpp:93); we add EOS
            stop_tokens = (0, self.tokenizer.eos_token_id)
        stop_set = set(int(t) for t in stop_tokens)
        stats = GenerationStats(prompt_tokens=len(tokens))

        # prefill: whole prompt in one padded forward, or fixed-size chunks
        # through the mid-sequence path for long prompts (bounded compile
        # time + activation memory on long-context configs, NEXT.md #6)
        t0 = time.perf_counter()
        cache = self.new_cache()
        C = self.ec.prefill_chunk
        if C and len(tokens) > C:
            for s in range(0, len(tokens), C):
                blk = tokens[s:s + C]       # only the LAST block is padded,
                padded = np.zeros(C, np.int32)  # so no padding row is ever
                padded[:len(blk)] = blk         # attended by a later block
                last_logits, cache = self._get_prefill(C, fresh=(s == 0))(
                    self.params, jnp.asarray(padded), cache, len(blk), s)
        else:
            bucket = self._bucket(len(tokens))
            padded = np.zeros(bucket, np.int32)
            padded[:len(tokens)] = tokens
            last_logits, cache = self._get_prefill(bucket)(
                self.params, jnp.asarray(padded), cache, len(tokens), 0)
        pos = len(tokens)
        prev_token = tokens[-1]

        out: List[int] = []
        host = HostSampler(cfg.vocab_size, seed) if host_sampling else None
        from fastllama_tpu.loaders.tokenizer import StreamDecoder
        stream = StreamDecoder(self.tokenizer) if callback is not None else None

        def emit(tok: int) -> bool:
            nonlocal prev_token
            out.append(tok)
            ok = True
            # stop tokens are recorded in the returned ids but never shown:
            # streaming '</s>' to the user is noise (the reference's cb also
            # fires only for continuing tokens, transformer.cpp:93-101)
            if callback is not None and tok not in stop_set:
                text = stream.piece(tok, prev_token)
                ok = callback(text, tok) is not False
            prev_token = tok
            return ok

        if host_sampling:
            first = host.sample(np.asarray(last_logits), temperature, topp)
        else:
            rng = jax.random.PRNGKey(seed)
            rng, sub = jax.random.split(rng)
            first = int(sampling.sample(last_logits, sub, temperature, topp))
        stats.prefill_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        if not emit(first) or first in stop_set:
            stats.output_tokens = len(out)
            stats.decode_s = time.perf_counter() - t0
            return out, stats

        tok = jnp.asarray(first, jnp.int32)
        if host_sampling:
            step = self._get_step()
            while len(out) < max_new_tokens:
                lg, cache = step(self.params, tok[None], pos, cache)
                pos += 1
                nxt = host.sample(np.asarray(lg[0]), temperature, topp)
                if not emit(nxt) or nxt in stop_set:
                    break
                tok = jnp.asarray(nxt, jnp.int32)
        else:
            from fastllama_tpu.ops.pallas.flash_decode import round_bound
            # pipeline chunk dispatch: the next chunk's input token is the
            # previous chunk's toks[-1] — a device value — so chunk k+1 is
            # dispatched before chunk k's tokens are read, hiding the
            # host<->device round-trip (measured ~8 ms/chunk through the
            # TPU tunnel).  On a stop token the in-flight chunk is dropped
            # (its cache rows sit past the stop and are never attended).
            # depth 2 hides one chunk round trip; deeper is an on-chip
            # A/B knob (VERDICT r4 next #5b: the ~0.35 ms/step host gap)
            PIPE = int(os.environ.get("FASTLLAMA_PIPE", "2"))
            inflight = []
            planned = 0                 # tokens dispatched so far
            pos_base = pos              # dispatch cursor (emission moves pos)
            stop = False
            while not stop and (len(out) < max_new_tokens or inflight):
                while len(inflight) < PIPE and planned < max_new_tokens - 1:
                    n = min(decode_chunk, max_new_tokens - 1 - planned)
                    p0 = pos_base + planned
                    sb = (round_bound(p0 + n, cfg.max_seq_len)
                          if (self._attn_idx_factory or
                              self._sp_attn_bidx_factory) else 0)
                    if n == decode_chunk:
                        fn = self._get_decode_chunk(n, temperature, topp, sb)
                        toks, cache, rng = fn(self.params, cache, tok, p0,
                                              rng)
                    else:
                        # tail chunk: the ONE dynamic program (step count
                        # is a runtime operand), not a per-length compile
                        fn = self._get_decode_chunk(decode_chunk,
                                                    temperature, topp, sb,
                                                    dynamic=True)
                        toks, cache, rng = fn(self.params, cache, tok, p0,
                                              rng, np.int32(n))
                    tok = toks[n - 1]   # device slice, no host sync
                    planned += n
                    inflight.append((toks, n))
                if not inflight:
                    break
                toks, n = inflight.pop(0)
                for t in np.asarray(toks)[:n].tolist():
                    pos += 1
                    if not emit(int(t)) or int(t) in stop_set:
                        stop = True
                        break
        stats.output_tokens = len(out)
        stats.decode_s = time.perf_counter() - t0
        return out, stats

    def generate_text(self, prompt: str, **kw) -> str:
        toks, _ = self.generate(prompt, **kw)
        return self.tokenizer.decode(toks)


class ChatSession:
    """Multi-turn session with a persistent KV cache (the CLI chat mode's
    backend; the reference's Mode::CHAT re-runs the whole history each turn —
    here history stays resident in the cache)."""

    def __init__(self, engine: Engine, system_prompt: str = ""):
        self.engine = engine
        self.cache = engine.new_cache()
        self.pos = 0
        self._last_logits = None
        if system_prompt:
            self.feed(engine.tokenizer.encode(system_prompt, add_bos=True))
        else:
            self.feed([engine.tokenizer.bos_token_id])

    def remaining(self) -> int:
        return self.engine.config.max_seq_len - self.pos

    def feed(self, tokens: Sequence[int]) -> None:
        """Prefill tokens at the current position (no sampling).  Long
        turns run as fixed-size blocks when EngineConfig.prefill_chunk is
        set (same bounded-compile contract as Engine.generate)."""
        eng = self.engine
        if not tokens:
            return
        C = eng.ec.prefill_chunk
        if C and len(tokens) > C:
            # only the FINAL block may be padded, so no padding row is ever
            # attended by a later block
            for s in range(0, len(tokens), C):
                self._feed_block(list(tokens[s:s + C]), C)
            return
        self._feed_block(list(tokens), eng._bucket(len(tokens)))

    def _feed_block(self, tokens: List[int], bucket: int) -> None:
        eng = self.engine
        # the PADDED bucket must fit: the prefill writes `bucket` K/V rows
        # at self.pos, and dynamic_update_slice CLAMPS an out-of-range start
        # — an unchecked overflow would silently overwrite valid history
        if len(tokens) >= self.remaining() or self.pos + bucket > \
                eng.config.max_seq_len:
            raise ValueError("context window exhausted")
        padded = np.zeros(bucket, np.int32)
        padded[:len(tokens)] = tokens
        self._last_logits, self.cache = eng._get_prefill(
            bucket, fresh=(self.pos == 0))(
            eng.params, jnp.asarray(padded), self.cache, len(tokens), self.pos)
        self.pos += len(tokens)

    def generate(self, text: str, max_new_tokens: int = 256,
                 temperature: float = 0.8, topp: float = 0.9,
                 seed: int = 128391297, callback=None) -> str:
        """Feed a user turn, stream assistant tokens until EOS.

        Invariant: ``self.pos`` counts tokens whose K/V rows are valid in the
        cache; rows past it are stale and masked.  ``pending`` is the sampled
        next token, not yet in the cache."""
        eng = self.engine
        toks = eng.tokenizer.encode(text, add_bos=False)
        if toks:
            self.feed(toks)
        max_new_tokens = min(max_new_tokens, self.remaining() - 2)

        rng = jax.random.PRNGKey(seed + self.pos)
        rng, sub = jax.random.split(rng)
        pending = int(sampling.sample(self._last_logits, sub, temperature,
                                      topp))
        stop = {0, eng.tokenizer.eos_token_id}
        out: List[int] = []
        prev = toks[-1] if toks else -1

        from fastllama_tpu.loaders.tokenizer import StreamDecoder
        stream = StreamDecoder(eng.tokenizer) if callback is not None else None
        while pending not in stop and len(out) < max_new_tokens:
            out.append(pending)
            if callback is not None:
                callback(stream.piece(pending, prev))
            prev = pending

            n = min(DEFAULT_DECODE_CHUNK, max_new_tokens - len(out) + 1,
                    self.remaining() - 1)
            if n < 1:
                break
            from fastllama_tpu.ops.pallas.flash_decode import round_bound
            sb = (round_bound(self.pos + n, eng.config.max_seq_len)
                  if (eng._attn_idx_factory or
                      eng._sp_attn_bidx_factory) else 0)
            if n == DEFAULT_DECODE_CHUNK:
                fn = eng._get_decode_chunk(n, temperature, topp, sb)
                toks_out, self.cache, rng = fn(
                    eng.params, self.cache, jnp.asarray(pending, jnp.int32),
                    self.pos, rng)
            else:
                # tail chunk through the one dynamic program (no
                # per-length whole-model compile)
                fn = eng._get_decode_chunk(DEFAULT_DECODE_CHUNK,
                                           temperature, topp, sb,
                                           dynamic=True)
                toks_out, self.cache, rng = fn(
                    eng.params, self.cache, jnp.asarray(pending, jnp.int32),
                    self.pos, rng, np.int32(n))
            seq = np.asarray(toks_out)[:n].tolist()
            accepted = 1                      # pending's row was written
            nxt = seq[-1]                     # not in cache
            for t in seq[:-1]:
                if int(t) in stop or len(out) >= max_new_tokens:
                    nxt = int(t)
                    break
                out.append(int(t))
                if callback is not None:
                    callback(stream.piece(int(t), prev))
                prev = int(t)
                accepted += 1
            self.pos += accepted
            pending = int(nxt)
        return eng.tokenizer.decode(out)
