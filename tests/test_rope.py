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


def test_yarn_matches_scalar_reference():
    """rope_cos_sin_yarn vs a direct numpy port of the reference rope_v2
    YaRN math (tf_operators.cpp:352-402) with ext_factor enabled."""
    import numpy as np
    import jax.numpy as jnp
    from fastllama_tpu.ops.rope import rope_cos_sin_yarn

    hs, base, orig_ctx = 16, 10000.0, 512
    freq_scale, ext_factor, attn_factor = 0.25, 1.0, 1.0
    beta_fast, beta_slow = 32.0, 1.0
    pos = 100

    def corr_dim(n_rot):
        return hs * np.log(orig_ctx / (n_rot * 2 * np.pi)) / (2 * np.log(base))

    c0 = max(0.0, np.floor(corr_dim(beta_fast)))
    c1 = min(hs - 1.0, np.ceil(corr_dim(beta_slow)))
    theta_scale = base ** (-2.0 / hs)
    theta_base = float(pos)
    want_cos, want_sin = [], []
    for i in range(0, hs, 2):
        theta_interp = freq_scale * theta_base
        ramp = 1 - min(1.0, max(0.0, (i / 2 - c0) / max(1e-3, c1 - c0)))
        theta = theta_interp * (1 - ramp) + theta_base * ramp
        mscale = attn_factor * (1.0 + 0.1 * np.log(1.0 / freq_scale))
        want_cos.append(np.cos(theta) * mscale)
        want_sin.append(np.sin(theta) * mscale)
        theta_base *= theta_scale

    cos, sin = rope_cos_sin_yarn(jnp.asarray([pos]), hs, base, freq_scale,
                                 ext_factor, attn_factor, beta_fast,
                                 beta_slow, orig_ctx)
    np.testing.assert_allclose(np.asarray(cos[0]), want_cos, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(sin[0]), want_sin, rtol=2e-5)


def test_yarn_ext0_is_plain_rope_scaled():
    import numpy as np
    import jax.numpy as jnp
    from fastllama_tpu.ops.rope import rope_cos_sin, rope_cos_sin_yarn

    pos = jnp.asarray([0, 7, 31])
    c1, s1 = rope_cos_sin_yarn(pos, 8, ext_factor=0.0, freq_scale=1.0)
    c2, s2 = rope_cos_sin(pos, 8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
