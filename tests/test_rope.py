"""RoPE convention tests: the runtime's deinterleave+rotate-half must be
exactly equivalent to the reference's interleaved rope_v2
(tf_operators.cpp:355-402)."""
import jax.numpy as jnp
import numpy as np

from fastllama_tpu.ops.rope import (apply_rope_half, apply_rope_interleaved,
                                    deinterleave_heads, deinterleave_perm,
                                    rope_cos_sin)
from tests.reference_impl import rope_v2_ref


def test_interleaved_matches_cpp():
    rng = np.random.default_rng(0)
    hs = 64
    x = rng.normal(size=(hs,)).astype(np.float32)
    for pos in (0, 1, 7, 100, 1023):
        ref = rope_v2_ref(x, pos, hs)
        cos, sin = rope_cos_sin(jnp.asarray([pos]), hs)
        got = apply_rope_interleaved(jnp.asarray(x)[None], cos, sin)[0]
        # fp32 trig argument reduction at theta ~ pos rad costs ~pos*eps
        atol = 2e-5 + 3e-7 * pos
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=atol)


def test_half_equals_permuted_interleaved():
    """rope_half(P x) == P rope_interleaved(x) for the deinterleave perm P."""
    rng = np.random.default_rng(1)
    hs = 32
    x = rng.normal(size=(3, hs)).astype(np.float32)
    perm = deinterleave_perm(hs)
    pos = jnp.asarray([5, 9, 21])
    cos, sin = rope_cos_sin(pos, hs)
    inter = apply_rope_interleaved(jnp.asarray(x), cos, sin)
    half = apply_rope_half(jnp.asarray(x[:, perm]), cos, sin)
    np.testing.assert_allclose(np.asarray(half), np.asarray(inter)[:, perm],
                               rtol=1e-6, atol=1e-6)


def test_attention_scores_invariant():
    """q.k inner products are identical in either convention — the load-time
    weight permutation is exact."""
    rng = np.random.default_rng(2)
    hs = 64
    q = rng.normal(size=(hs,)).astype(np.float32)
    k = rng.normal(size=(hs,)).astype(np.float32)
    perm = deinterleave_perm(hs)

    ref = float(rope_v2_ref(q, 11, hs) @ rope_v2_ref(k, 4, hs))
    cq, sq = rope_cos_sin(jnp.asarray(11), hs)
    ck, sk = rope_cos_sin(jnp.asarray(4), hs)
    qh = apply_rope_half(jnp.asarray(q[perm]), cq, sq)
    kh = apply_rope_half(jnp.asarray(k[perm]), ck, sk)
    assert abs(float(qh @ kh) - ref) < 1e-3


def test_deinterleave_heads():
    """Row permutation of a weight reorders each head's output dims."""
    rng = np.random.default_rng(3)
    hs, n_heads, I = 8, 2, 4
    w = rng.normal(size=(n_heads * hs, I)).astype(np.float32)
    out = deinterleave_heads(w, hs)
    perm = deinterleave_perm(hs)
    for h in range(n_heads):
        np.testing.assert_array_equal(out[h * hs:(h + 1) * hs],
                                      w[h * hs:(h + 1) * hs][perm])
