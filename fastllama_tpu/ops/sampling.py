"""Device-side token sampling.

Reference: ``Sampler`` (sampler.cpp:113-137) — greedy argmax at temperature 0,
otherwise temperature-softmax then multinomial or top-p nucleus sampling
(sampler.cpp:70-111).  Here sampling runs *inside* the jitted step function
with ``jax.random``, so logits never leave the device.  The reference's exact
xorshift64* host sampler is reproduced in runtime/sampler.py for parity
tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    """argmax over the last axis (sampler.cpp:36-47)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_top_p(logits: jax.Array, key: jax.Array, temperature: float,
                 top_p: float) -> jax.Array:
    """Temperature + nucleus sampling (sampler.cpp:70-111).

    Keeps the smallest prefix of descending-probability tokens whose
    cumulative mass exceeds ``top_p`` (inclusive of the crossing token, like
    the reference's ``break`` at sampler.cpp:93-98), renormalizes, samples.
    """
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(logits, axis=-1)
    if top_p <= 0.0 or top_p >= 1.0:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # token kept iff the mass strictly before it is < top_p
    keep_mass = cum - sorted_probs < top_p
    cutoff = jnp.min(jnp.where(keep_mass, sorted_probs, 1.0), axis=-1, keepdims=True)
    masked_logits = jnp.where(probs >= cutoff, logits, -jnp.inf)
    return jax.random.categorical(key, masked_logits, axis=-1).astype(jnp.int32)


def nucleus_dist(logits: jax.Array, temperature: float,
                 top_p: float) -> jax.Array:
    """The NORMALIZED distribution :func:`sample_top_p` samples from —
    softmax at ``temperature`` with the nucleus tail zeroed and the head
    renormalized.  Speculative sampling needs the explicit p/q vectors for
    its accept / residual-resample rule; using the same filter rule keeps
    the spec-sampled output distribution identical to plain sampling."""
    lf = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(lf, axis=-1)
    if top_p <= 0.0 or top_p >= 1.0:
        return probs
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_mass = cum - sorted_probs < top_p
    cutoff = jnp.min(jnp.where(keep_mass, sorted_probs, 1.0), axis=-1,
                     keepdims=True)
    kept = jnp.where(probs >= cutoff, probs, 0.0)
    return kept / jnp.sum(kept, axis=-1, keepdims=True)


def sample(logits: jax.Array, key: jax.Array, temperature: float,
           top_p: float) -> jax.Array:
    """Static dispatch on temperature (the engine treats it as a compile-time
    constant, mirroring the reference's branch at sampler.cpp:117)."""
    if temperature == 0.0:
        return greedy(logits)
    return sample_top_p(logits, key, temperature, top_p)


def sample_dynamic(logits: jax.Array, key: jax.Array, temperature: jax.Array,
                   top_p: jax.Array) -> jax.Array:
    """Sampling with **traced** temperature/top_p scalars — the continuous-
    batching path, where each slot carries its own request's sampling params
    and they must not trigger recompilation.  Semantics match :func:`sample`:
    temperature <= 0 is greedy; top_p >= 1 disables the nucleus filter
    (the cutoff falls to the smallest probability, keeping every token)."""
    lf = logits.astype(jnp.float32)
    g = greedy(lf)
    scaled = lf / jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(scaled, axis=-1)
    tp = jnp.clip(top_p, 1e-9, 1.0)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_mass = cum - sorted_probs < tp
    cutoff = jnp.min(jnp.where(keep_mass, sorted_probs, 1.0), axis=-1,
                     keepdims=True)
    # top_p >= 1 must be a pure categorical (fp32 cumsum rounding could
    # otherwise mask the probability tail that sample() can still reach)
    masked = jnp.where(jnp.logical_or(top_p >= 1.0, probs >= cutoff),
                       scaled, -jnp.inf)
    s = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, g, s)


def nucleus_dist_dynamic(logits: jax.Array, temperature: jax.Array,
                         top_p: jax.Array) -> jax.Array:
    """The NORMALIZED distribution :func:`sample_dynamic` samples from,
    with TRACED per-slot temperature/top_p — the batched speculative
    -sampling accept rule needs the explicit p vectors (temperature <= 0
    degenerates to a delta at the argmax, so greedy slots fall out of the
    same accept/resample math exactly)."""
    lf = logits.astype(jnp.float32)
    gdelta = jax.nn.one_hot(jnp.argmax(lf, axis=-1), lf.shape[-1],
                            dtype=jnp.float32)
    scaled = lf / jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(scaled, axis=-1)
    tp = jnp.clip(top_p, 1e-9, 1.0)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_mass = cum - sorted_probs < tp
    cutoff = jnp.min(jnp.where(keep_mass, sorted_probs, 1.0), axis=-1,
                     keepdims=True)
    keep = jnp.logical_or(top_p >= 1.0, probs >= cutoff)
    p = jnp.where(keep, probs, 0.0)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    return jnp.where(temperature <= 0.0, gdelta, p)


def sample_batched(logits: jax.Array, keys: jax.Array, temperatures: jax.Array,
                   top_ps: jax.Array) -> jax.Array:
    """Per-slot sampling over a batch of logits rows.

    logits (B, V); keys (B, 2) PRNG keys; temperatures/top_ps (B,) traced.
    Returns (B,) int32 tokens."""
    return jax.vmap(sample_dynamic)(logits, keys, temperatures, top_ps)
