"""Fused dequant-matmul kernel vs the jnp reference — interpret mode on CPU
(the SURVEY §4 pattern: kernel vs scalar/jnp reference on random data)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import QuantType
from fastllama_tpu.ops.pallas.qmm import make_mm, qmatmul_pallas, supported
from fastllama_tpu.ops.qmatmul import qmatmul
from fastllama_tpu.quant.groupquant import QArray, quantize


def make_qweight(O, I, qt, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(O, I)) * 0.05, jnp.float32)
    q = quantize(w, qt, 64)  # (O, I), groups last
    return QArray(q.data.T, q.scales.T, qt, 64, group_axis=-2)  # -> (I, O)


@pytest.mark.parametrize("T,O,I,qt", [
    (1, 512, 256, QuantType.INT8),
    (8, 1024, 512, QuantType.INT8),
    (128, 512, 2048, QuantType.INT8),   # K-blocked path
    (1, 512, 256, QuantType.INT16),
    (4, 256, 128, QuantType.INT4),
    (1, 256, 1408, QuantType.INT8),     # full-K fallback (1408 = 11*128)
    (1, 1024, 2048, QuantType.INT8),    # narrow-O decode 1024x1024 tiling
])
def test_qmm_matches_jnp(T, O, I, qt):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(T, I)), jnp.bfloat16)
    w = make_qweight(O, I, qt)
    assert supported(x, w)
    ref = qmatmul(x, w, jnp.bfloat16).astype(jnp.float32)
    got = qmatmul_pallas(x, w, interpret=True).astype(jnp.float32)
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.02


@pytest.mark.parametrize("T,qt", [(1, QuantType.INT8), (8, QuantType.INT8),
                                  (1, QuantType.INT4)])
def test_qmm_groupdot_variant(T, qt):
    """Scale-after-dot experimental variant == standard kernel (1 bf16 ulp:
    it keeps scales in f32 where the standard path rounds them to bf16)."""
    O, I = 512, 256 if qt == QuantType.INT8 else 1024
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(T, I)), jnp.bfloat16)
    w = make_qweight(O, I, qt)
    if qt == QuantType.INT4:
        from fastllama_tpu.quant.groupquant import pack_int4_rows_np
        w = QArray(jnp.asarray(pack_int4_rows_np(np.asarray(w.data))),
                   w.scales, QuantType.INT4, 64, group_axis=-2, packed=True)
    ref = qmatmul_pallas(x, w, interpret=True).astype(jnp.float32)
    got = qmatmul_pallas(x, w, interpret=True,
                         groupdot=True).astype(jnp.float32)
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.01


def test_make_mm_fallback():
    # unsupported shape (O not mult of 128) silently falls back to jnp
    mm = make_mm(interpret=True)
    x = jnp.ones((2, 128), jnp.float32)
    w = make_qweight(96, 128, QuantType.INT8)
    out = mm(x, w)
    assert out.shape == (2, 96)
    # plain array fallback
    out2 = mm(x, jnp.ones((128, 64), jnp.float32))
    assert out2.shape == (2, 64)


def test_qmm_in_forward_interpret():
    """Whole model forward with the pallas mm (interpret) == jnp forward."""
    from fastllama_tpu.config import ModelConfig
    from fastllama_tpu.models.llama import KVCache, forward, random_params

    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=256, max_seq_len=16,
                      quant_type=QuantType.INT8)
    params = random_params(cfg, seed=2)
    tokens = jnp.asarray([3, 9, 77], jnp.int32)
    mm = make_mm(compute_dtype=jnp.float32, interpret=True)
    ref, _ = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c))(
        params, tokens, KVCache.create(cfg))
    got, _ = forward(cfg, params, tokens, 0, KVCache.create(cfg), mm=mm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_qmm_packed_int4_matches_unpacked():
    """Split-half nibble-packed INT4 through the kernel must match the
    unpacked int8-held path (plain and layer-indexed) closely.  Tolerance
    covers accumulation order (the packed kernel sums two half-K passes)
    AND dequant rounding: the unpacked int8 kernel multiplies bf16-rounded
    scales while the packed kernel dequantizes through f32 (the bf16-scale
    variant measured slower for int4 on v5e — int32->bf16 conversion is
    the expensive VPU step)."""
    import jax.numpy as jnp
    import numpy as np
    from fastllama_tpu.config import QuantType
    from fastllama_tpu.quant.groupquant import (QArray, pack_int4_rows_np,
                                                quantize_np)
    from fastllama_tpu.ops.pallas.qmm import (qmatmul_pallas,
                                              qmatmul_pallas_indexed,
                                              supported, supported_indexed)

    rng = np.random.default_rng(0)
    # I=1024 so the split halves (512 rows) satisfy the scale-block
    # sublane constraint; smaller contractions legitimately stay unpacked
    w = rng.standard_normal((1024, 256)).astype(np.float32)
    d, s = quantize_np(w.T, QuantType.INT4, 64)
    d, s = d.T.copy(), s.T.copy()
    unp = QArray(jnp.asarray(d), jnp.asarray(s), QuantType.INT4, 64,
                 group_axis=-2)
    pk = QArray(jnp.asarray(pack_int4_rows_np(d)), jnp.asarray(s),
                QuantType.INT4, 64, group_axis=-2, packed=True)
    x = jnp.asarray(rng.standard_normal((8, 1024)).astype(np.float32))
    assert supported(x, pk)
    a = qmatmul_pallas(x, unp, interpret=True)
    b = qmatmul_pallas(x, pk, interpret=True)
    scale_ref = np.abs(np.asarray(a)).max()
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-2 * scale_ref

    dL = np.stack([d, -d])
    sL = np.stack([s, s])
    unpL = QArray(jnp.asarray(dL), jnp.asarray(sL), QuantType.INT4, 64,
                  group_axis=-2)
    pkL = QArray(jnp.asarray(pack_int4_rows_np(dL)), jnp.asarray(sL),
                 QuantType.INT4, 64, group_axis=-2, packed=True)
    assert supported_indexed(x, pkL)
    for l in range(2):
        a = qmatmul_pallas_indexed(x, unpL, l, interpret=True)
        b = qmatmul_pallas_indexed(x, pkL, l, interpret=True)
        scale_ref = np.abs(np.asarray(a)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-2 * scale_ref


def test_qmm_k_inner_chunked_matches_whole_tile():
    """In-kernel chunked dequant (k_inner) == whole-tile dequant for the
    standard AND layer-indexed kernels.  Accumulation regroups (per-chunk
    f32 partial dots summed) so allow a few bf16 ulps."""
    import fastllama_tpu.ops.pallas.qmm as qmm_mod
    from fastllama_tpu.ops.pallas.qmm import (qmatmul_pallas,
                                              qmatmul_pallas_indexed)

    rng = np.random.default_rng(7)
    T, O, I = 4, 512, 1024
    x = jnp.asarray(rng.normal(size=(T, I)), jnp.bfloat16)
    w = make_qweight(O, I, QuantType.INT8)
    ref = qmatmul_pallas(x, w, interpret=True).astype(jnp.float32)
    got = qmatmul_pallas(x, w, interpret=True,
                         k_inner=128).astype(jnp.float32)
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 5e-3

    # layer-indexed kernel picks k_inner up from the module default
    wL = QArray(jnp.stack([w.data, -w.data]), jnp.stack([w.scales, w.scales]),
                QuantType.INT8, 64, group_axis=-2)
    refs = [qmatmul_pallas_indexed(x, wL, l, interpret=True) for l in (0, 1)]
    old = qmm_mod._K_INNER
    qmm_mod._K_INNER = 128
    try:
        for l in (0, 1):
            got = qmatmul_pallas_indexed(x, wL, l, interpret=True)
            d = float(jnp.abs(got.astype(jnp.float32)
                              - refs[l].astype(jnp.float32)).max())
            assert d / denom < 5e-3
    finally:
        qmm_mod._K_INNER = old


def test_auto_k_inner_divisor_fallback():
    """_auto_k_inner: explicit arg wins; irregular TK falls back to the
    largest gs-multiple divisor <= the request; degenerate -> 0."""
    from fastllama_tpu.ops.pallas.qmm import _auto_k_inner

    assert _auto_k_inner(512, 4096, 64) == 512       # clean split
    assert _auto_k_inner(512, 4096, 64) % 64 == 0
    assert _auto_k_inner(4096, 4096, 64) == 0        # >= TK: whole tile
    assert _auto_k_inner(0, 2048, 64) in (0, 512)    # env default applies
    # 1408 = 11*128: 512 doesn't divide; largest 64-multiple divisor <= 512
    ki = _auto_k_inner(512, 1408, 64)
    assert ki and 1408 % ki == 0 and ki % 64 == 0 and ki <= 512


@pytest.mark.parametrize("mode", ["int16", "f32"])
def test_int4_unpack_modes_identical(mode):
    """All nibble-unpack strategies (int32 shifts / int16 shifts / f32
    floor-div) must produce BIT-IDENTICAL results: they feed the same
    bf16 dequant + MXU dot, so any difference is an unpack bug."""
    import fastllama_tpu.ops.pallas.qmm as qmm_mod
    from fastllama_tpu.ops.pallas.qmm import (qmatmul_pallas,
                                              qmatmul_pallas_indexed)
    from fastllama_tpu.quant.groupquant import pack_int4_rows_np, quantize_np

    rng = np.random.default_rng(11)
    w = rng.standard_normal((1024, 256)).astype(np.float32)
    d, s = quantize_np(w.T, QuantType.INT4, 64)
    d, s = d.T.copy(), s.T.copy()
    pk = QArray(jnp.asarray(pack_int4_rows_np(d)), jnp.asarray(s),
                QuantType.INT4, 64, group_axis=-2, packed=True)
    x = jnp.asarray(rng.standard_normal((8, 1024)).astype(np.float32))
    pkL = QArray(jnp.asarray(pack_int4_rows_np(np.stack([d, -d]))),
                 jnp.asarray(np.stack([s, s])), QuantType.INT4, 64,
                 group_axis=-2, packed=True)
    old = qmm_mod._INT4_UNPACK
    try:
        qmm_mod._INT4_UNPACK = "int32"
        ref = np.asarray(qmatmul_pallas(x, pk, interpret=True))
        refL = [np.asarray(qmatmul_pallas_indexed(x, pkL, l, interpret=True))
                for l in (0, 1)]
        qmm_mod._INT4_UNPACK = mode
        got = np.asarray(qmatmul_pallas(x, pk, interpret=True))
        np.testing.assert_array_equal(got, ref)
        for l in (0, 1):
            np.testing.assert_array_equal(
                np.asarray(qmatmul_pallas_indexed(x, pkL, l, interpret=True)),
                refL[l])
    finally:
        qmm_mod._INT4_UNPACK = old


@pytest.mark.parametrize("T,O,I,norm,res", [
    (1, 768, 256, True, False),     # full-K: in-kernel rmsnorm prologue
    (1, 512, 256, False, True),     # residual epilogue only
    (1, 768, 256, True, True),      # both (the decode-scan glue fusion)
    (4, 512, 2048, True, True),     # K-blocked: norm falls back outside,
                                    # residual still fuses at k==0
])
def test_qmm_indexed_fused_glue(T, O, I, norm, res):
    """Fused rmsnorm-prologue / residual-epilogue (the decode-scan glue,
    models/llama.layer_fn) vs the separate-ops reference."""
    from fastllama_tpu.ops.norms import rmsnorm
    from fastllama_tpu.ops.pallas.qmm import qmatmul_pallas_indexed
    from fastllama_tpu.quant.groupquant import quantize

    rng = np.random.default_rng(5)
    L = 3
    ws, qs = [], []
    for l in range(L):
        w = jnp.asarray(rng.normal(size=(O, I)) * 0.05, jnp.float32)
        q = quantize(w, QuantType.INT8, 64)
        ws.append(q.data.T)
        qs.append(q.scales.T)
    wL = QArray(jnp.stack(ws), jnp.stack(qs), QuantType.INT8, 64,
                group_axis=-2)
    x = jnp.asarray(rng.normal(size=(T, I)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(I,)) * 0.1 + 1.0, jnp.float32)
    r = jnp.asarray(rng.normal(size=(T, O)), jnp.bfloat16)

    for l in (0, 2):
        h = rmsnorm(x, g, 1e-5) if norm else x
        ref = qmatmul_pallas_indexed(h, wL, l, interpret=True)
        if res:
            ref = (r.astype(jnp.float32)
                   + ref.astype(jnp.float32)).astype(jnp.bfloat16)
        got = qmatmul_pallas_indexed(
            x, wL, l, interpret=True,
            norm_gain=g if norm else None, eps=1e-5,
            residual=r if res else None)
        # bf16 double-rounding differs between the in-kernel f32 norm and
        # the standalone rmsnorm -> cast path; tolerance covers it
        np.testing.assert_allclose(
            np.asarray(got, jnp.float32), np.asarray(ref, jnp.float32),
            rtol=3e-2, atol=5e-2)


def test_forward_fused_glue_matches_unfused():
    """models/llama.forward with a fusion-capable mm_idx equals the plain
    separate-ops path (the engines' correctness contract)."""
    from fastllama_tpu.config import ModelConfig
    from fastllama_tpu.models.llama import (KVCache, forward,
                                            random_params_int)
    from fastllama_tpu.ops.pallas.qmm import make_mm, make_mm_indexed

    cfg = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=512, max_seq_len=64,
                      group_size=64)
    params = random_params_int(cfg, seed=3)
    toks = jnp.asarray([1, 5, 9], jnp.int32)

    def run(mm_idx):
        cache = KVCache.create(cfg)
        lg, _ = forward(cfg, params, toks, 0, cache,
                        mm=make_mm(interpret=True),
                        mm_idx=mm_idx, compute_dtype=jnp.float32)
        return np.asarray(lg)

    mm_idx = make_mm_indexed(compute_dtype=jnp.float32, interpret=True)
    assert getattr(mm_idx, "supports_fusion", False)
    fused = run(mm_idx)

    def mm_idx_plain(x, w, layer):                # no fusion contract
        return mm_idx(x, w, layer)
    plain = run(mm_idx_plain)
    np.testing.assert_allclose(fused, plain, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("packed", [False, True])
def test_qmm_bf16_scales_bit_identical(packed):
    """bf16-STORED group scales are bit-identical to f32 storage on the
    non-wide (int8/int4) path: the kernel casts scales to bf16 before the
    dequant multiply anyway (_qmm_chunk), so halving the HBM scale stream
    (serving: 416 MB/step f32 at 7B gs=64) is free numerics-wise."""
    from fastllama_tpu.quant.groupquant import compress_scales
    T, O, I = 4, 512, 2048 if packed else 256
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(T, I)), jnp.bfloat16)
    if packed:
        from fastllama_tpu.quant.groupquant import pack_int4_rows_np
        w = make_qweight(O, I, QuantType.INT4, seed=3)
        w = QArray(jnp.asarray(pack_int4_rows_np(np.asarray(w.data))),
                   w.scales, QuantType.INT4, 64, -2, True)
    else:
        w = make_qweight(O, I, QuantType.INT8, seed=3)
    # reference: f32 storage, scale values pre-rounded to bf16 (what the
    # kernel computes with either way)
    w_ref = QArray(w.data, w.scales.astype(jnp.bfloat16).astype(jnp.float32),
                   w.qtype, w.group_size, -2, w.packed)
    w_bf = compress_scales(w)
    assert w_bf.scales.dtype == jnp.bfloat16
    ref = qmatmul_pallas(x, w_ref, interpret=True)
    got = qmatmul_pallas(x, w_bf, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_compress_scales_tree_and_wide_guard():
    """compress_scales maps a params tree, skips INT16 (wide-path f32
    dequant needs full scale precision), and is idempotent."""
    from fastllama_tpu.quant.groupquant import compress_scales
    w8 = make_qweight(256, 128, QuantType.INT8)
    w16 = make_qweight(256, 128, QuantType.INT16)
    tree = {"a": w8, "b": w16, "c": jnp.ones((4,))}
    out = compress_scales(tree)
    assert out["a"].scales.dtype == jnp.bfloat16
    assert out["b"].scales.dtype == jnp.float32
    assert out["c"].dtype == jnp.ones((4,)).dtype
    again = compress_scales(out)
    assert again["a"].scales.dtype == jnp.bfloat16
