"""Batched speculative decoding — speculation inside the serving engine.

Single-stream speculation (runtime/speculative.py) breaks the weight
-streaming bound for ONE stream; this module applies the same trick to the
continuous-batching engine: every decode round drafts D-1 tokens PER SLOT
(draft-free n-gram prompt-lookup over a device-resident per-slot history)
and verifies them with ONE target forward over (B, D) rows
(models/batched.spec_decode_step) — the weight stream and each slot's KV
read amortize over every ACCEPTED token, so at acceptance ``a`` the
per-token HBM traffic drops toward 1/(1+a) of a plain decode step.  This
is the aggregate-throughput lever VERDICT r2 #4 asked for: at serving
batch, plain decode already amortizes weights over B slots, but the KV
-cache stream (the dominant term at long contexts) only amortizes through
speculation.

Correctness property (tested): greedy outputs ALWAYS equal the plain
BatchedEngine's, for any draft quality — acceptance only changes speed.

Scheduling: rounds advance each slot by a variable 1..D tokens (per-slot
positions already exist); R rounds run per device call with the history,
pending tokens and positions carried on device.  Near the context limit
(no full D-row block fits) the engine falls back to the parent's plain
chunks, preserving the exact generation contract.

No reference analogue (one forward per token, transformer.cpp:92-101).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastllama_tpu.config import EngineConfig, ModelConfig
from fastllama_tpu.loaders.tokenizer import Tokenizer
from fastllama_tpu.models.batched import spec_decode_step
from fastllama_tpu.models.llama import LlamaParams
from fastllama_tpu.ops import sampling
from fastllama_tpu.runtime.batching import DEFAULT_CHUNK, BatchedEngine


def ngram_draft_batched(hist: jax.Array, hlen: jax.Array, n: int, D: int
                        ) -> jax.Array:
    """Per-slot prompt-lookup drafting, fully on device: the most recent
    earlier occurrence of slot b's trailing n-gram proposes the D tokens
    that followed it.  hist (B, H) int32, hlen (B,) valid lengths
    (including the pending token).  Returns (B, D) int32 (zeros when no
    match — they'll just be rejected)."""
    H = hist.shape[1]

    def one(hist_b, hlen_b):
        tail = jax.lax.dynamic_slice(hist_b, (hlen_b - n,), (n,))
        idx = jnp.arange(H)[:, None] + jnp.arange(n)[None, :]
        vals = hist_b[jnp.clip(idx, 0, H - 1)]
        match = jnp.all(vals == tail[None, :], axis=1) & \
            (jnp.arange(H) < hlen_b - n)
        s = jnp.max(jnp.where(match, jnp.arange(H), -1))
        take = jnp.clip(s + n + jnp.arange(D), 0, H - 1)
        return jnp.where((s >= 0) & (s + n + jnp.arange(D) < hlen_b),
                         hist_b[take], 0).astype(jnp.int32)

    return jax.vmap(one)(hist, hlen)


class SpecAutoTuner:
    """Per-chunk throughput arbiter between speculative and plain decode
    chunks (VERDICT r3 Weak #1: ``--spec`` must never lose).

    Speculation's win condition depends on batch, context length and the
    workload's real acceptance rate — at S<=512 the measured crossover sits
    between B=32 (spec wins) and B=48 (plain wins) on v5e.  Rather than
    model alpha, measure the ground truth the model would try to predict:
    an EMA of emitted-tokens-per-second for each mode, run the winner, and
    probe the losers round-robin every ``probe_every`` chunks so a drifting
    workload (acceptance collapsing, batch draining) can flip the decision
    back.  Samples from chunks that just compiled are discarded — a
    first-call compile (~seconds) would poison the EMA for
    ~probe_every * 10 chunks.

    Arms: 0 = plain; a positive arm = a speculative chunk at that draft
    width D (VERDICT r4 next #7: the optimal D moves with alpha and batch —
    D=2 wins at B=32/alpha=0.455, D=4 at long-context alpha=0.329 — so let
    the same measured arbitration pick the width too).  With ``widths=None``
    the tuner stays the binary spec/plain arbiter (arm 1 = "spec at the
    engine's static width") — the multi-host vote protocol exchanges a
    boolean and keeps its width fleet-static."""

    def __init__(self, probe_every: int = 16, decay: float = 0.8,
                 widths=None, backoff_cap: int = 8):
        spec_arms = sorted({int(d) for d in widths}) if widths else [1]
        assert all(a > 0 for a in spec_arms)
        self.arms = spec_arms + [0]        # choose() measures spec first
        self.ema = {a: None for a in self.arms}
        self.count = 0
        self.probe_every = probe_every
        self.decay = decay
        self._probe_i = 0
        # probe-rate backoff: every probe that CONFIRMS the standing winner
        # doubles the probe interval (capped at backoff_cap * probe_every);
        # a winner flip resets it.  A losing arm's probe chunk costs its
        # full throughput gap (measured: spec@4 runs at ~55% of plain at 7B
        # B=48), so a fixed probe_every=16 puts ~3-4% steady-state drag on
        # the winner — backoff shrinks that to <0.5% while still noticing
        # drift within ~backoff_cap*probe_every chunks
        self.backoff_cap = backoff_cap
        self._gap = probe_every
        self._last_probe = 0
        self._prev_winner = None
        # drift watch: backoff assumes a STATIONARY workload.  When the
        # winner's own EMA moves >drift_tol since the last probe, the
        # workload changed (e.g. long-context positions sweeping up — the
        # regime where the best draft width flips from 2 to 4), so the
        # probe interval resets: measured 959.6 tok/s with plain backoff
        # vs 1182 static-D=4 at 7B S=2048 before this rule
        self.drift_tol = 0.10
        self._ema_ref = None

    def record(self, arm, tokens: int, secs: float,
               compiled: bool = False) -> None:
        if compiled or secs <= 0 or tokens <= 0:
            return
        tps = tokens / secs
        e = self.ema[int(arm)]
        self.ema[int(arm)] = tps if e is None else \
            self.decay * e + (1.0 - self.decay) * tps

    def choose(self) -> int:
        """Arm to run next: 0 = plain, else the draft width to speculate
        at (1 in binary mode = the engine's static width)."""
        self.count += 1
        for a in self.arms:
            if self.ema[a] is None:
                return a                   # measure every arm once
        winner = max(self.arms, key=lambda a: self.ema[a])
        if winner != self._prev_winner:
            if self._prev_winner is not None:
                self._gap = self.probe_every     # order flipped: re-probe fast
            self._prev_winner = winner
            self._ema_ref = self.ema[winner]
        elif (self._ema_ref and abs(self.ema[winner] / self._ema_ref - 1.0)
                > self.drift_tol):
            self._gap = self.probe_every         # workload drifted: re-probe
            self._ema_ref = self.ema[winner]
        if (len(self.arms) > 1
                and self.count - self._last_probe >= self._gap):
            self._last_probe = self.count
            self._gap = min(self._gap * 2,
                            self.probe_every * self.backoff_cap)
            self._ema_ref = self.ema[winner]
            losers = [a for a in self.arms if a != winner]
            self._probe_i += 1
            return losers[self._probe_i % len(losers)]
        return winner


def build_spec_chunk(verify, R: int, D: int, greedy: bool):
    """Up-to-R speculative rounds as one traceable chunk, shared by the
    single-host and multi-host engines (the round/accept/commit logic is
    identical; only the verify forward differs — per-device fused kernels
    vs shard_map per shard).

    ``R`` is the MAX rounds (it sizes the output buffers); the rounds a
    call actually runs is the DYNAMIC scalar operand ``r_dyn`` (a
    ``lax.while_loop`` trip count), so ONE compiled chunk serves every
    drain/qos-capped round budget.  The previous design baked R into a
    ``lax.scan`` and compiled a whole-model R-round program per distinct
    (R, s_bound, D) — the drain-phase R sweep measured 1208 s of warmup at
    7B B=32 and left cold buckets that poisoned measured passes
    (tools/spec_batch_ab.py round-5 notes).

    ``verify(params, cache, pending, pos, hist) -> (ys, lg, cache)`` drafts
    D-1 tokens per slot and runs the (B, D)-row target forward.  Returns
    ``chunk(params, cache, pending, pos, hist, keys, temps, topps, r_dyn)
    -> (gs (R, B, D), accs (R, B), cache, hist, pending, pos, keys)`` —
    rows of gs/accs at round index >= r_dyn are zero."""

    def commit(emit, a, cache, hist, pos):
        """Shared round tail: pending/history/pos bookkeeping.  Rows past
        the accepted prefix are garbage but sit beyond the new history
        length, which masks them."""
        pending = jnp.take_along_axis(emit, a[:, None], 1)[:, 0]
        hist = jax.vmap(
            lambda h, u, p: jax.lax.dynamic_update_slice(
                h, u, (p,)))(hist, emit, pos + 1)
        pos = pos + a + 1                 # caller bounds pos + R*D
        return pending, pos, cache, hist

    def chunk(params, cache, pending, pos, hist, keys, temps, topps, r_dyn):
        if greedy:
            def round_fn(carry, _):
                pending, pos, cache, hist, keys = carry
                ys, lg, cache = verify(params, cache, pending, pos, hist)
                D_ = ys.shape[1]
                g = jnp.argmax(lg, axis=-1).astype(jnp.int32)       # (B, D)
                ok = (ys[:, :D_ - 1] == g[:, :D_ - 1]).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)        # (B,)
                pending, pos, cache, hist = commit(g, a, cache, hist, pos)
                return (pending, pos, cache, hist, keys), (g, a)
        else:
            # standard speculative sampling, per slot: the n-gram draft is
            # the one-hot q, so accept draft y_i iff u_i < p_i(y_i); first
            # rejection resamples from norm(max(p - q, 0)); full acceptance
            # draws a bonus from the last row.  Greedy slots (temperature
            # <= 0) degenerate to delta distributions and reproduce plain
            # greedy exactly (ops/sampling.nucleus_dist_dynamic).
            def round_fn(carry, _):
                pending, pos, cache, hist, keys = carry
                ys, lg, cache = verify(params, cache, pending, pos, hist)
                splits = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
                keys, ka, kr, kb = (splits[:, 0], splits[:, 1],
                                    splits[:, 2], splits[:, 3])
                p_rows = sampling.nucleus_dist_dynamic(
                    lg, temps[:, None, None],
                    topps[:, None, None])                   # (B, D, V)
                py = jnp.take_along_axis(
                    p_rows[:, :D - 1], ys[:, :D - 1, None],
                    axis=2)[..., 0]                         # (B, D-1)
                u = jax.vmap(lambda k: jax.random.uniform(k, (D - 1,)))(ka)
                ok = (u < py).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)        # (B,)
                pa = jnp.take_along_axis(
                    p_rows, a[:, None, None], axis=1)[:, 0]         # (B, V)
                ya = jnp.take_along_axis(
                    ys, jnp.minimum(a, D - 2)[:, None], 1)[:, 0]
                qa = jax.nn.one_hot(ya, p_rows.shape[-1],
                                    dtype=jnp.float32)
                resid = jnp.maximum(pa - qa, 0.0)
                resid = jnp.where(
                    (resid.sum(-1, keepdims=True) > 1e-9), resid, pa)
                t_rej = jax.vmap(lambda k, p: jax.random.categorical(
                    k, jnp.log(p + 1e-30)))(kr, resid).astype(jnp.int32)
                t_bonus = jax.vmap(lambda k, p: jax.random.categorical(
                    k, jnp.log(p + 1e-30)))(
                    kb, p_rows[:, D - 1]).astype(jnp.int32)
                t_last = jnp.where(a < D - 1, t_rej, t_bonus)
                emit = jnp.where(
                    jnp.arange(D)[None] == a[:, None],
                    t_last[:, None], ys)                    # (B, D)
                pending, pos, cache, hist = commit(emit, a, cache, hist, pos)
                return (pending, pos, cache, hist, keys), (emit, a)

        B = pending.shape[0]
        gs0 = jnp.zeros((R, B, D), jnp.int32)
        accs0 = jnp.zeros((R, B), jnp.int32)

        def cond_fn(carry):
            return carry[0] < r_dyn

        def body_fn(carry):
            r, st, gs, accs = carry
            st, (g, a) = round_fn(st, None)
            return r + 1, st, gs.at[r].set(g), accs.at[r].set(a)

        _, (pending, pos, cache, hist, keys), gs, accs = jax.lax.while_loop(
            cond_fn, body_fn,
            (jnp.int32(0), (pending, pos, cache, hist, keys), gs0, accs0))
        return gs, accs, cache, hist, pending, pos, keys

    return chunk


class SpecBatchedEngine(BatchedEngine):
    """BatchedEngine whose decode chunks run speculative rounds.

    ``width``: verify rows per slot per round (1 pending + width-1 drafts);
    ``ngram``: lookup n-gram length; ``rounds_per_chunk``: rounds per
    device call.  Greedy waves verify by argmax equality; mixed/sampled
    waves run per-slot speculative sampling (accept/residual-resample over
    the same nucleus distributions plain serving samples from — greedy
    slots degenerate to deltas and stay bit-exact)."""

    def __init__(self, config: ModelConfig, params: LlamaParams,
                 tokenizer: Tokenizer,
                 engine_config: Optional[EngineConfig] = None,
                 decode_chunk: int = DEFAULT_CHUNK,
                 width: int = 4, ngram: int = 3, rounds_per_chunk: int = 8,
                 spec_auto: bool = True):
        super().__init__(config, params, tokenizer, engine_config,
                         decode_chunk)
        if width < 2:
            raise ValueError("speculation needs width >= 2")
        self.width = width
        self.ngram = ngram
        self.R = max(1, rounds_per_chunk)
        self.spec_drafted = 0
        self.spec_accepted = 0
        # alpha-aware width arms: powers of two in [2, width] (at most 3 —
        # each extra arm costs probe chunks and one compile per
        # (R, s_bound, greedy) bucket).  The tuner picks among
        # {plain} + {spec@D} by measured emitted-tok/s, so D adapts to the
        # workload's acceptance instead of staying static
        arms = sorted({d for d in (2, 4, 8) if d < width} | {width})[-3:]
        self._tuner = SpecAutoTuner(widths=arms) if spec_auto else None
        # device-resident per-slot token history (prompt + emitted tokens,
        # including the pending one); length = pos + 1 for live slots
        self._hist = jnp.zeros((self.B, self.S + width + 1), jnp.int32)
        # device-resident scheduler state between chunks: pending/pos come
        # back from every chunk and temps/topps only change on admission,
        # so in the steady full-occupancy phase no per-chunk uploads are
        # needed (each device_put is a full tunnel round trip)
        self._io_dirty = True
        self._hist_stale = False
        self._pend_dev = self._pos_dev = None
        self._temps_dev = self._topps_dev = None
        self._spec_fns = {}
        self._attn_sbidx_factory = None
        self._spec_writer = None
        if self._attn_bidx is not None:            # pallas path active
            from functools import partial
            from fastllama_tpu.ops.pallas.flash_decode import \
                make_attn_spec_batched
            self._attn_sbidx_factory = partial(
                make_attn_spec_batched, interpret=self.ec.pallas_interpret)
        if self._kv_writer is not None:
            from fastllama_tpu.ops.pallas.kv_write import (_sublane,
                                                           make_spec_writer)
            if width <= _sublane(self.kv_dtype):
                self._spec_writer = make_spec_writer(
                    interpret=self.ec.pallas_interpret)

    @staticmethod
    def load_spec(ckpt_path: str, tokenizer_path: str = "",
                  file_type=None, qtype=None,
                  engine_config: Optional[EngineConfig] = None,
                  decode_chunk: int = DEFAULT_CHUNK, width: int = 4,
                  ngram: int = 3, rounds_per_chunk: int = 8,
                  spec_auto: bool = True,
                  device_put=None) -> "SpecBatchedEngine":
        from fastllama_tpu.loaders.registry import (FileType,
                                                    resolve_and_build)
        cfg, params, tok = resolve_and_build(
            ckpt_path, tokenizer_path, file_type or FileType.UNKNOWN, qtype,
            engine_config, device_put)
        return SpecBatchedEngine(cfg, params, tok, engine_config,
                                 decode_chunk, width, ngram,
                                 rounds_per_chunk, spec_auto)

    # -- compiled spec chunk -------------------------------------------------

    def _get_spec_chunk(self, s_bound: int, greedy: bool,
                        D: Optional[int] = None):
        # the round count is a DYNAMIC operand of the compiled chunk
        # (build_spec_chunk r_dyn) — NOT a compile key: one program per
        # (s_bound, greedy, D) serves every drain/qos round budget
        D = self.width if D is None else D
        key_ = (s_bound, greedy, D)
        if key_ not in self._spec_fns:
            cfg, mm, mi = self.config, self._mm, self._mm_idx
            cdt, n = self._cdt, self.ngram
            ab = (self._attn_sbidx_factory(s_bound)
                  if self._attn_sbidx_factory is not None else None)

            def verify(params, cache, pending, pos, hist):
                ys = ngram_draft_batched(hist, pos + 1, n, D)       # (B, D)
                batch = jnp.concatenate(
                    [pending[:, None], ys[:, :D - 1]], axis=1)
                if self._spmd:
                    # every shard runs the fused verify loop on its local
                    # slots (parallel/spmd_step.spmd_spec_decode_step);
                    # drafting above is slot-local jnp, GSPMD-partitioned
                    from fastllama_tpu.parallel.spmd_step import \
                        spmd_spec_decode_step
                    lg, cache = spmd_spec_decode_step(
                        cfg, self.mesh, params, batch, pos, cache,
                        mm=mm, mm_idx=mi, attn_sbidx=ab,
                        spec_writer=self._spec_writer, compute_dtype=cdt)
                else:
                    lg, cache = spec_decode_step(
                        cfg, params, batch, pos, cache,
                        mm=mm, mm_idx=mi, attn_sbidx=ab,
                        spec_writer=self._spec_writer, compute_dtype=cdt)
                return ys, lg, cache

            self._spec_fns[key_] = jax.jit(
                build_spec_chunk(verify, self.R, D, greedy),
                donate_argnums=(1,) if self.ec.donate_cache else ())
        return self._spec_fns[key_]

    # -- scheduling ----------------------------------------------------------

    def _write_history(self, slots) -> None:
        """Seed the device history for freshly admitted slots: prompt
        tokens + the prefill-sampled pending token."""
        H = self._hist.shape[1]
        rows = np.zeros((len(slots), H), np.int32)
        for i, b in enumerate(slots):
            req = self.slot_req[b]
            toks = req.prompt_tokens + [self.pending[b]]
            rows[i, :len(toks)] = toks
        self._hist = self._hist.at[jnp.asarray(slots, jnp.int32)].set(
            jnp.asarray(rows))

    def step(self) -> bool:
        before = [r is not None for r in self.slot_req]
        self._admit_pending()
        newly = [b for b, r in enumerate(self.slot_req)
                 if r is not None and not before[b]]
        if newly:
            self._write_history(newly)
            self._io_dirty = True

        live = self._live_slots()
        if not live:
            return bool(self.queue)

        D = self.width
        greedy = all(self.slot_req[b].temperature <= 0.0 for b in live)
        room = self.S - int(self.pos.max()) - 1
        # MAX budget over live slots, rounded up (the multihost SPECR rule):
        # emit discards a finished slot's overshoot rows, so bounding by the
        # longest remaining request keeps R pinned at self.R for the whole
        # steady state — the old min-budget bound swept R down 16/8/4/2/1 as
        # requests drained, compiling a fresh R-round whole-model scan at
        # every stop (measured 525 s of warmup at 7B B=48 R=32)
        max_budget = max(self.slot_req[b].max_new_tokens
                         - len(self.slot_req[b].output_tokens) for b in live)

        def plan_R(D):
            # EXACT round budget — R is a dynamic operand of the compiled
            # chunk (build_spec_chunk r_dyn), so no pow2 bucketing and no
            # per-R recompile: drains run exactly the rounds they need
            R = min(self.R, room // D, max(1, -(-max_budget // D)))
            if self.ec.qos_chunk and self.queue:
                # the parent's TTFT bound (batching.py qos_chunk) must bind
                # on the spec path too: while requests queue, cap the chunk
                # at ~qos_chunk emitted tokens per slot (R rounds emit
                # <= R*D), mirroring spec_multihost._local_plan's SPECR cap
                R = min(R, max(1, self.ec.qos_chunk // D))
            return max(R, 0)

        R = plan_R(D)
        use_spec = R >= 1
        if use_spec and self._tuner is not None:
            # measured arbitration (SpecAutoTuner): run the fastest arm —
            # plain, or speculation at one of the width arms — and probe
            # the losers periodically
            arm = self._tuner.choose()
            use_spec = arm != 0
            if use_spec and arm not in (1, D) and plan_R(arm) >= 1:
                # alpha-aware width: re-plan the chunk at the chosen D
                # (falls back to the static width if D doesn't fit room)
                D, R = arm, plan_R(arm)
        if not use_spec:
            # plain chunks: near the context limit (R < 1) they keep the
            # generation contract; under the tuner they're the measured win
            K, greedy_only = self._plan_chunk(live)
            nfns = len(self._chunk_fns)
            tok0 = self.stats.decode_tokens
            t0 = time.perf_counter()
            toks = self._dispatch_chunk(K, greedy_only,
                                        jnp.asarray(self.pending),
                                        jnp.asarray(self.pos),
                                        int(self.pos.max()))
            toks_np = np.asarray(toks)
            dt = time.perf_counter() - t0
            self.stats.decode_s += dt
            self._apply_chunk(toks_np, K, live)
            if self._tuner is not None and R >= 1:
                self._tuner.record(False, self.stats.decode_tokens - tok0,
                                   dt, compiled=len(self._chunk_fns) > nfns)
            # plain chunks don't maintain the history; mark it stale and
            # rebuild LAZILY before the next spec chunk — in the all-plain
            # steady state under the tuner an eager per-chunk resync was
            # pure overhead (an extra dispatch + upload per chunk)
            self._hist_stale = True
            self._io_dirty = True
            return bool(self.queue) or bool(self._live_slots())

        if self._hist_stale:
            self._resync_history()
            self._hist_stale = False

        s_bound = 0
        if self._attn_bidx_factory is not None:
            from fastllama_tpu.ops.pallas.flash_decode import round_bound
            s_bound = round_bound(int(self.pos.max()) + R * D, self.S)

        nfns = len(self._spec_fns)
        tok0 = self.stats.decode_tokens
        t0 = time.perf_counter()
        fn = self._get_spec_chunk(s_bound, greedy, D)
        if self._io_dirty or self._pend_dev is None:
            self._pend_dev = jnp.asarray(self.pending)
            self._pos_dev = jnp.asarray(self.pos)
            self._temps_dev = jnp.asarray(self.temps)
            self._topps_dev = jnp.asarray(self.topps)
        gs, accs, self.cache, self._hist, pend_dev, pos_dev, self._keys = fn(
            self.params, self.cache, self._pend_dev, self._pos_dev,
            self._hist, self._keys, self._temps_dev, self._topps_dev,
            np.int32(R))
        # ONE host round trip for everything the scheduler needs: through
        # the tunnel each fetch is a full RT, and spec chunks are ~8x
        # shorter than plain ones so per-chunk host time bites ~8x harder
        gs_np, accs_np, pend_np = jax.device_get((gs, accs, pend_dev))
        dt = time.perf_counter() - t0
        self.stats.decode_s += dt

        for b in live:
            for r in range(R):
                if self.slot_req[b] is None:
                    break
                a = int(accs_np[r, b])
                self.spec_drafted += D - 1
                self.spec_accepted += a
                for t in gs_np[r, b, :a + 1]:
                    if self.slot_req[b] is None:
                        break
                    self._emit(b, int(t))
        # mirror device positions, park freed/idle slots
        adv = accs_np.sum(axis=0) + R                 # (B,)
        self.pos = np.minimum(self.pos + adv.astype(np.int32), self.S - 1)
        self.pending = pend_np.astype(np.int32)
        freed = False
        for b in range(self.B):
            if self.slot_req[b] is None:
                freed = freed or (self.pos[b] != 0 or self.pending[b] != 0)
                self.pos[b] = 0
                self.pending[b] = 0
        if freed:
            self._io_dirty = True                 # host parked slots
        else:
            self._pend_dev, self._pos_dev = pend_dev, pos_dev
            self._io_dirty = False
        if self._tuner is not None:
            # record under the width arm that actually ran (alpha-aware D)
            self._tuner.record(D, self.stats.decode_tokens - tok0, dt,
                               compiled=len(self._spec_fns) > nfns)
        return bool(self.queue) or bool(self._live_slots())

    def _resync_history(self) -> None:
        """After a plain (non-spec) chunk, rebuild live slots' device
        histories from host state."""
        live = self._live_slots()
        if live:
            H = self._hist.shape[1]
            rows = np.zeros((len(live), H), np.int32)
            for i, b in enumerate(live):
                req = self.slot_req[b]
                toks = (req.prompt_tokens + req.output_tokens
                        )[:int(self.pos[b])] + [int(self.pending[b])]
                rows[i, :len(toks)] = toks
            self._hist = self._hist.at[jnp.asarray(live, jnp.int32)].set(
                jnp.asarray(rows))

    @property
    def acceptance(self) -> float:
        return (self.spec_accepted / self.spec_drafted
                if self.spec_drafted else 0.0)
