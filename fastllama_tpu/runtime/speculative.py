"""Speculative decoding — breaking the weight-streaming bound.

Single-stream decode on TPU is HBM-bound: every token streams all weights
once (~6.9 GB/step for 7B INT8), capping throughput near bandwidth/model
bytes regardless of how fast the kernels are.  Speculation is the standard
way past it: draft D candidate tokens cheaply, then verify them with ONE
target forward over D rows — the verify matmuls read the weights once for D
tokens, so each accepted token costs 1/D of a weight sweep plus the draft.

Two drafters:

* **Model draft** (:class:`SpeculativeEngine` with ``draft=``): a small
  LLaMA (e.g. stories110M/TinyLlama-class) decodes D tokens autoregressively
  on its own KV cache; both caches and both scans live in ONE jitted round.
* **Prompt-lookup / n-gram draft** (``draft=None``): drafts are copied from
  the last occurrence of the current n-gram in the token history (prompt +
  generated) — free (host-side), no second model, and very effective on
  self-repetitive or quote-heavy output.

Scheme (greedy verify at temperature 0; at temperature > 0 the standard
speculative-sampling accept/residual-resample rule preserves the target
distribution exactly) with verify width D:

  round: draft scan runs D steps feeding x_0=pending, x_i=y_{i-1} (writes
  draft K/V rows pos..pos+D-1; the last step exists only to write x_{D-1}'s
  row), target forward verifies the batch [pending, y_0..y_{D-2}] at
  positions pos..pos+D-1 giving g_0..g_{D-1}; the accepted prefix length
  a = |{i : y_j == g_j for all j <= i}| emits tokens g_0..g_a (1..D per
  round) and both caches/positions advance by a+1 — rows past pos are
  stale and masked by position, exactly like the engines' pending-token
  invariant (runtime/batching.py docstring).

Correctness property (tested): output ALWAYS equals plain greedy decode,
for ANY draft — acceptance only changes speed.

The reference has no analogue (single-stream, one forward per token,
transformer.cpp:92-101); this is a TPU-native addition per SURVEY §7's
perf mandate.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastllama_tpu.models.llama import KVCache, forward
from fastllama_tpu.ops import sampling
from fastllama_tpu.runtime.engine import Engine, GenerationStats


@dataclasses.dataclass
class SpecStats(GenerationStats):
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0

    @property
    def acceptance(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0


def _ngram_draft(history: np.ndarray, n: int, width: int) -> np.ndarray:
    """Prompt-lookup drafting: find the most recent earlier occurrence of
    the trailing ``n``-gram and propose the ``width`` tokens that followed
    it.  Returns (width,) int32; zeros when no match (they'll just be
    rejected)."""
    L = len(history)
    if L < n + 1:
        return np.zeros(width, np.int32)
    tail = history[L - n:]
    # scan candidates right-to-left, newest match wins
    for s in range(L - n - 1, -1, -1):
        if np.array_equal(history[s:s + n], tail):
            seg = history[s + n:s + n + width]
            out = np.zeros(width, np.int32)
            out[:len(seg)] = seg
            return out
    return np.zeros(width, np.int32)


class SpeculativeEngine:
    """Greedy speculative decoding over a target :class:`Engine`.

    ``draft``: a second, smaller Engine sharing the tokenizer/vocab; None
    selects the draft-free n-gram drafter.  ``width``: tokens verified per
    round (D); emits 1..D tokens per round."""

    def __init__(self, engine: Engine, draft: Optional[Engine] = None,
                 width: int = 8, ngram: int = 3, rounds_per_call: int = 8):
        if width < 2:
            raise ValueError("speculation needs width >= 2")
        self.engine = engine
        self.draft = draft
        self.width = width
        self.ngram = ngram
        self.rounds_per_call = max(1, rounds_per_call)
        if draft is not None:
            if draft.config.vocab_size != engine.config.vocab_size:
                raise ValueError("draft vocab must match the target's")
        self._round_fns = {}

    # -- compiled rounds -----------------------------------------------------

    def _get_chunk_rounds_sampled(self, R: int, s_bound: int,
                                  temperature: float, topp: float):
        """Sampled (temperature > 0) speculative rounds — the standard
        accept / residual-resample rule (speculative sampling): draft token
        y_i ~ q_i is accepted iff u_i < p_i(y_i)/q_i(y_i); on the first
        rejection at row a the emitted token is drawn from
        norm(max(p_a - q_a, 0)); when every draft survives, a bonus token
        is drawn from the last verified row.  The emitted stream is then
        distributed EXACTLY as plain autoregressive sampling from the
        target (Leviathan et al.) — same nucleus/temperature transform on
        both sides (ops.sampling.nucleus_dist).  The n-gram drafter is the
        degenerate q = one-hot case: accept with probability p(y_i)."""
        key_ = ("s", R, s_bound, temperature, topp)
        if key_ in self._round_fns:
            return self._round_fns[key_]
        eng, dr, D, n = self.engine, self.draft, self.width, self.ngram
        tcfg = eng.config
        tai = eng._attn_idx
        if s_bound and eng._attn_idx_factory is not None:
            tai = eng._attn_idx_factory(s_bound)
        if dr is not None:
            dcfg = dr.config
            dai = dr._attn_idx
            if s_bound and dr._attn_idx_factory is not None:
                dai = dr._attn_idx_factory(min(s_bound, dcfg.max_seq_len))
        V = tcfg.vocab_size

        def draft_model(dp, dcache, pending, pos, history, hist_len, key):
            def dstep(carry, k):
                tok, p, dcache = carry
                lg, dcache = forward(
                    dcfg, dp, tok[None], p, dcache, mm=dr._mm,
                    attn=dr._attn, mm_idx=dr._mm_idx, attn_idx=dai,
                    compute_dtype=dr._cdt)
                q = sampling.nucleus_dist(lg[0], temperature, topp)
                nxt = jax.random.categorical(
                    k, jnp.log(q + 1e-30)).astype(jnp.int32)
                return (nxt, p + 1, dcache), (nxt, q)

            (_, _, dcache), (ys, q_rows) = jax.lax.scan(
                dstep, (pending, pos, dcache), jax.random.split(key, D))
            return ys, q_rows, dcache

        def draft_ngram(dp, dcache, pending, pos, history, hist_len, key):
            H = history.shape[0]
            tail = jax.lax.dynamic_slice(history, (hist_len - n,), (n,))
            idx = jnp.arange(H)[:, None] + jnp.arange(n)[None, :]
            vals = history[jnp.clip(idx, 0, H - 1)]
            match = jnp.all(vals == tail[None, :], axis=1) & \
                (jnp.arange(H) < hist_len - n)
            s = jnp.max(jnp.where(match, jnp.arange(H), -1))
            take = jnp.clip(s + n + jnp.arange(D), 0, H - 1)
            ys = jnp.where((s >= 0) & (s + n + jnp.arange(D) < hist_len),
                           history[take], 0).astype(jnp.int32)
            q_rows = jax.nn.one_hot(ys, V, dtype=jnp.float32)
            return ys, q_rows, dcache

        drafter = draft_model if dr is not None else draft_ngram

        def chunk(tp, dp, tcache, dcache, pending, pos, history, hist_len,
                  rng):
            def round_fn(carry, _):
                pending, pos, tcache, dcache, history, hist_len, rng = carry
                rng, kd, ka, kr, kb = jax.random.split(rng, 5)
                ys, q_rows, dcache = drafter(dp, dcache, pending, pos,
                                             history, hist_len, kd)
                batch = jnp.concatenate([pending[None], ys[:D - 1]])
                lg, tcache = forward(
                    tcfg, tp, batch, pos, tcache, mm=eng._mm, attn=eng._attn,
                    mm_idx=eng._mm_idx, attn_idx=tai, compute_dtype=eng._cdt)
                p_rows = sampling.nucleus_dist(lg, temperature, topp)  # (D,V)

                rows = jnp.arange(D - 1)
                py = p_rows[rows, ys[:D - 1]]
                qy = q_rows[rows, ys[:D - 1]]
                u = jax.random.uniform(ka, (D - 1,))
                ok = (u * qy < py).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(ok))                     # 0..D-1
                # rejected row a: residual resample; full accept: bonus row
                pa = p_rows[a]
                qa = q_rows[jnp.minimum(a, D - 2)]
                resid = jnp.maximum(pa - qa, 0.0)
                resid = jnp.where(resid.sum() > 1e-9, resid, pa)
                t_rej = jax.random.categorical(
                    kr, jnp.log(resid + 1e-30)).astype(jnp.int32)
                t_bonus = jax.random.categorical(
                    kb, jnp.log(p_rows[D - 1] + 1e-30)).astype(jnp.int32)
                t_last = jnp.where(a < D - 1, t_rej, t_bonus)
                emit = jnp.where(jnp.arange(D) == a, t_last, ys)  # (D,)
                pending = emit[a]
                pos = pos + a + 1
                cur = jax.lax.dynamic_slice(history, (hist_len,), (D,))
                seg = jnp.where(jnp.arange(D) <= a, emit, cur)
                history = jax.lax.dynamic_update_slice(history, seg,
                                                       (hist_len,))
                hist_len = hist_len + a + 1
                return (pending, pos, tcache, dcache, history, hist_len,
                        rng), (emit, a)

            carry = (pending, pos, tcache, dcache, history, hist_len, rng)
            (pending, pos, tcache, dcache, history, hist_len, rng), \
                (gs, accs) = jax.lax.scan(round_fn, carry, length=R)
            return gs, accs, tcache, dcache, history, pending, pos, \
                hist_len, rng

        self._round_fns[key_] = jax.jit(chunk, donate_argnums=(2, 3, 6))
        return self._round_fns[key_]

    def _get_chunk_rounds(self, R: int, s_bound: int = 0):
        """R spec rounds in ONE device call (a host round-trip per round —
        measured ~40 ms through the TPU tunnel — erased any speculation win:
        26 tok/s vs 93 plain).  Each round drafts ON DEVICE (draft-model
        scan, or n-gram lookup over a device-resident token history), runs
        the D-row verify, accepts, and advances pending/pos/history; the
        host reads back (R, D) candidate tokens + (R,) accept counts and
        emits sequentially with stop handling."""
        key_ = (R, s_bound)
        if key_ in self._round_fns:
            return self._round_fns[key_]
        eng, dr, D, n = self.engine, self.draft, self.width, self.ngram
        tcfg = eng.config
        tai = eng._attn_idx
        if s_bound and eng._attn_idx_factory is not None:
            tai = eng._attn_idx_factory(s_bound)
        if dr is not None:
            dcfg = dr.config
            dai = dr._attn_idx
            if s_bound and dr._attn_idx_factory is not None:
                dai = dr._attn_idx_factory(min(s_bound, dcfg.max_seq_len))

        def draft_model(dp, dcache, pending, pos, history, hist_len):
            def dstep(carry, _):
                tok, p, dcache = carry
                lg, dcache = forward(
                    dcfg, dp, tok[None], p, dcache, mm=dr._mm,
                    attn=dr._attn, mm_idx=dr._mm_idx, attn_idx=dai,
                    compute_dtype=dr._cdt)
                nxt = jnp.argmax(lg[0]).astype(jnp.int32)
                return (nxt, p + 1, dcache), nxt

            (_, _, dcache), ys = jax.lax.scan(
                dstep, (pending, pos, dcache), length=D)
            return ys, dcache

        def draft_ngram(dp, dcache, pending, pos, history, hist_len):
            """Most recent earlier occurrence of the trailing n-gram; the
            D-1 tokens after it are the drafts (prompt-lookup), fully on
            device.  history already includes ``pending``."""
            H = history.shape[0]
            tail = jax.lax.dynamic_slice(history, (hist_len - n,), (n,))
            idx = jnp.arange(H)[:, None] + jnp.arange(n)[None, :]
            vals = history[jnp.clip(idx, 0, H - 1)]            # (H, n)
            match = jnp.all(vals == tail[None, :], axis=1) & \
                (jnp.arange(H) < hist_len - n)
            s = jnp.max(jnp.where(match, jnp.arange(H), -1))
            take = jnp.clip(s + n + jnp.arange(D), 0, H - 1)
            drafts = jnp.where((s >= 0) & (s + n + jnp.arange(D) < hist_len),
                               history[take], 0).astype(jnp.int32)
            return drafts, dcache

        drafter = draft_model if dr is not None else draft_ngram

        def chunk(tp, dp, tcache, dcache, pending, pos, history, hist_len):
            def round_fn(carry, _):
                pending, pos, tcache, dcache, history, hist_len = carry
                ys, dcache = drafter(dp, dcache, pending, pos, history,
                                     hist_len)
                batch = jnp.concatenate([pending[None], ys[:D - 1]])
                lg, tcache = forward(
                    tcfg, tp, batch, pos, tcache, mm=eng._mm, attn=eng._attn,
                    mm_idx=eng._mm_idx, attn_idx=tai, compute_dtype=eng._cdt)
                g = jnp.argmax(lg, axis=-1).astype(jnp.int32)   # (D,)
                ok = (ys[:D - 1] == g[:D - 1]).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(ok))                    # 0..D-1
                pending = g[a]
                pos = pos + a + 1
                # append the a+1 emitted tokens to the device history
                cur = jax.lax.dynamic_slice(history, (hist_len,), (D,))
                seg = jnp.where(jnp.arange(D) <= a, g, cur)
                history = jax.lax.dynamic_update_slice(history, seg,
                                                       (hist_len,))
                hist_len = hist_len + a + 1
                return (pending, pos, tcache, dcache, history, hist_len), \
                    (g, a)

            carry = (pending, pos, tcache, dcache, history, hist_len)
            (pending, pos, tcache, dcache, history, hist_len), (gs, accs) = \
                jax.lax.scan(round_fn, carry, length=R)
            return gs, accs, tcache, dcache, history, pending, pos, hist_len

        self._round_fns[key_] = jax.jit(chunk, donate_argnums=(2, 3, 6))
        return self._round_fns[key_]

    def _get_plain_step(self, sampled: bool, temperature: float, topp: float):
        """One plain target decode token — the context-limit tail path (a
        D-row verify block no longer fits, so speculation must stop but the
        generation contract still runs to max_new_tokens/seq_cap)."""
        key_ = ("plain", sampled, temperature, topp)
        if key_ in self._round_fns:
            return self._round_fns[key_]
        eng = self.engine
        tcfg = eng.config

        def stepfn(tp, tcache, pending, pos, rng):
            lg, tcache = forward(
                tcfg, tp, pending[None], pos, tcache, mm=eng._mm,
                attn=eng._attn, mm_idx=eng._mm_idx, attn_idx=eng._attn_idx,
                compute_dtype=eng._cdt)
            if sampled:
                rng, k = jax.random.split(rng)
                nxt = sampling.sample_top_p(lg[0], k, temperature, topp)
            else:
                nxt = jnp.argmax(lg[0]).astype(jnp.int32)
            return nxt, tcache, pos + 1, rng

        self._round_fns[key_] = jax.jit(stepfn, donate_argnums=(1,))
        return self._round_fns[key_]

    # -- generation ----------------------------------------------------------

    def generate(self, prompt, max_new_tokens: int = 512,
                 stop_tokens: Optional[Sequence[int]] = None,
                 callback=None, temperature: float = 0.0, topp: float = 0.9,
                 seed: int = 128391297) -> Tuple[List[int], SpecStats]:
        """Speculative generation; same contract as Engine.generate.
        temperature 0 verifies by argmax equality; temperature > 0 runs the
        accept/residual-resample rule, whose output is distributed exactly
        as plain sampling from the target."""
        sampled = temperature > 0.0
        eng, D = self.engine, self.width
        cfg = eng.config
        tokens = (eng.encode(prompt) if isinstance(prompt, str)
                  else list(prompt))
        if not tokens:
            raise ValueError("empty prompt")
        if len(tokens) >= cfg.max_seq_len:
            raise ValueError("prompt too long")
        if stop_tokens is None:
            stop_tokens = (0, eng.tokenizer.eos_token_id)
        stop_set = set(int(t) for t in stop_tokens)
        max_new_tokens = min(max_new_tokens, cfg.max_seq_len - len(tokens))
        stats = SpecStats(prompt_tokens=len(tokens))

        from fastllama_tpu.loaders.tokenizer import StreamDecoder
        stream = StreamDecoder(eng.tokenizer) if callback else None
        out: List[int] = []
        prev = tokens[-1]

        def emit(tok: int) -> bool:
            nonlocal prev
            out.append(tok)
            ok = True
            if callback is not None and tok not in stop_set:
                ok = callback(stream.piece(tok, prev), tok) is not False
            prev = tok
            return ok

        # prefill target (and the draft model on the same prompt)
        t0 = time.perf_counter()
        bucket = eng._bucket(len(tokens))
        padded = np.zeros(bucket, np.int32)
        padded[:len(tokens)] = tokens
        tcache = eng.new_cache()
        last_logits, tcache = eng._get_prefill(bucket)(
            eng.params, jnp.asarray(padded), tcache, len(tokens), 0)
        rng = jax.random.PRNGKey(seed)
        if sampled:
            rng, k0 = jax.random.split(rng)
            pending = int(np.asarray(sampling.sample_top_p(
                last_logits, k0, temperature, topp)))
        else:
            pending = int(np.asarray(jnp.argmax(last_logits)))
        dcache = None
        if self.draft is not None:
            dr = self.draft
            dbucket = dr._bucket(len(tokens))
            dpad = np.zeros(dbucket, np.int32)
            dpad[:len(tokens)] = tokens
            dcache = dr.new_cache()
            _, dcache = dr._get_prefill(dbucket)(
                dr.params, jnp.asarray(dpad), dcache, len(tokens), 0)
        pos = len(tokens)
        stats.prefill_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        if not emit(pending) or pending in stop_set:
            stats.output_tokens = len(out)
            stats.decode_s = time.perf_counter() - t0
            return out, stats

        # device-resident loop state: token history (the n-gram drafter
        # reads it on device), pending token, position, history length —
        # kept as device scalars so chunk k+1 can be DISPATCHED from chunk
        # k's output handles before chunk k's results are read.  Blocking on
        # results before dispatching left the chip idle one tunnel
        # round-trip (~8 ms) per chunk — xprof showed 939 ms of idle in a
        # 2.45 s run.
        hbuf = np.zeros(cfg.max_seq_len + D, np.int32)
        hbuf[:len(tokens) + 1] = tokens + [pending]
        history = jnp.asarray(hbuf)
        pend_dev = jnp.asarray(pending, jnp.int32)
        pos_dev = jnp.asarray(pos, jnp.int32)
        hlen_dev = jnp.asarray(pos + 1, jnp.int32)   # history == pos+1 tokens

        from fastllama_tpu.ops.pallas.flash_decode import round_bound
        stop = False
        seq_cap = cfg.max_seq_len if self.draft is None else \
            min(cfg.max_seq_len, self.draft.config.max_seq_len)
        dparams = self.draft.params if self.draft is not None else None
        R = self.rounds_per_call
        pos_lb = pos              # host lower bound (updated on each read)
        inflight = []             # [(gs, accs)] dispatched, unread
        PIPE = 2                  # chunks in flight

        rng_dev = rng

        def dispatch():
            nonlocal tcache, dcache, history, pend_dev, pos_dev, hlen_dev, \
                rng_dev
            # conservative position bound covers every in-flight chunk
            # (each dispatched chunk of r rounds advances pos by <= r*D)
            ub_base = pos_lb + sum(g.shape[0] for g, _ in inflight) * D
            # shrink the final chunk's round count so a nearly-full context
            # still speculates (a full-R gate here starved short-room
            # generations down to the prefill token alone)
            r_fit = (seq_cap - ub_base) // D
            if r_fit < 1:
                return False
            Ru = min(R, r_fit)
            ub = ub_base + Ru * D
            sb = (round_bound(ub, cfg.max_seq_len)
                  if eng._attn_idx_factory else 0)
            if sampled:
                fn = self._get_chunk_rounds_sampled(Ru, sb, temperature, topp)
                gs, accs, tcache, dcache, history, pend_dev, pos_dev, \
                    hlen_dev, rng_dev = fn(
                        eng.params, dparams, tcache, dcache, pend_dev,
                        pos_dev, history, hlen_dev, rng_dev)
            else:
                fn = self._get_chunk_rounds(Ru, sb)
                gs, accs, tcache, dcache, history, pend_dev, pos_dev, \
                    hlen_dev = fn(
                        eng.params, dparams, tcache, dcache, pend_dev,
                        pos_dev, history, hlen_dev)
            inflight.append((gs, accs))
            return True

        def consume() -> None:
            nonlocal stop, pos_lb
            gs, accs = inflight.pop(0)
            gs, accs = np.asarray(gs), np.asarray(accs)   # (Ru, D), (Ru,)
            for r in range(gs.shape[0]):
                a = int(accs[r])
                stats.rounds += 1
                stats.drafted += D - 1
                stats.accepted += a
                pos_lb += a + 1
                for t in (int(x) for x in gs[r, :a + 1]):
                    if len(out) >= max_new_tokens:
                        stop = True
                        break
                    if not emit(t) or t in stop_set:
                        stop = True
                        break
                if stop:
                    break

        while not stop and len(out) < max_new_tokens:
            while len(inflight) < PIPE and dispatch():
                pass
            if not inflight:
                break
            consume()
        # unread in-flight chunks only wrote past-stop rows; drop them.
        # If speculation ran out of context room (no D-row verify block fits
        # before seq_cap) finish with plain per-token decode — same contract
        # as Engine.generate right up to the context limit.  Device state is
        # consistent here: the loop above only exits un-stopped with every
        # dispatched chunk consumed.
        while not stop and len(out) < max_new_tokens \
                and pos_lb < cfg.max_seq_len:
            fn = self._get_plain_step(sampled, temperature, topp)
            pend_dev, tcache, pos_dev, rng_dev = fn(
                eng.params, tcache, pend_dev, pos_dev, rng_dev)
            tok = int(np.asarray(pend_dev))
            pos_lb += 1
            if not emit(tok) or tok in stop_set:
                stop = True

        stats.output_tokens = len(out)
        stats.decode_s = time.perf_counter() - t0
        return out, stats
