"""Group-quantization golden tests (reference: quant_operators.cpp:26-117)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import QuantType
from fastllama_tpu.quant.groupquant import (dequantize, dequantize_np,
                                            pack_int4_np, quantize,
                                            quantize_np, unpack_int4_np)
from tests.reference_impl import quantize_ref


def test_factors():
    assert QuantType.INT16.factor == 5792
    assert QuantType.INT8.factor == 127
    assert QuantType.INT4.factor == 7


def test_int8_hand_computed():
    # group of 64 with max |x| = 2.54 -> scale = 0.02, value 1.0 -> trunc(50)
    x = np.zeros(64, np.float32)
    x[0] = 2.54
    x[1] = 1.0
    x[2] = -1.27
    q, s = quantize_np(x[None], QuantType.INT8, 64)
    assert s[0, 0] == pytest.approx(0.02)
    assert q[0, 0] == 127
    assert q[0, 1] == 50      # 1.0/0.02 = 50.0
    assert q[0, 2] == -63     # -63.5 truncates toward zero -> -63


def test_truncation_not_rounding():
    x = np.full((1, 64), 0.9999, np.float32)
    x[0, 0] = 1.27
    q, s = quantize_np(x, QuantType.INT8, 64)
    # 0.9999 / 0.01 = 99.99 -> 99 (not 100)
    assert q[0, 1] == 99


@pytest.mark.parametrize("qtype,rtol", [(QuantType.INT16, 3e-4),
                                        (QuantType.INT8, 2e-2),
                                        (QuantType.INT4, 0.3)])
def test_roundtrip_error(qtype, rtol):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    q, s = quantize_np(x, qtype, 64)
    back = dequantize_np(q, s, 64)
    maxerr = np.abs(back - x).max()
    assert maxerr <= np.abs(x).max() * rtol


def test_jax_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 192)).astype(np.float32)
    for qtype in (QuantType.INT16, QuantType.INT8):
        qn, sn = quantize_np(x, qtype, 64)
        qj = quantize(jnp.asarray(x), qtype, 64)
        np.testing.assert_array_equal(np.asarray(qj.data), qn)
        np.testing.assert_allclose(np.asarray(qj.scales), sn, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dequantize(qj)),
                                   dequantize_np(qn, sn, 64), rtol=1e-6)


def test_matches_cpp_reference_impl():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 128)).astype(np.float32)
    for qtype in ("int16", "int8"):
        qr, sr = quantize_ref(x, qtype)
        qn, sn = quantize_np(x, QuantType.parse(qtype), 64)
        np.testing.assert_array_equal(qn, qr)
        np.testing.assert_allclose(sn, sr, rtol=1e-7)


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 128)).astype(np.float32)
    q, s = quantize_np(x, QuantType.INT4, 64)
    assert q.min() >= -7 and q.max() <= 7
    packed = pack_int4_np(q)
    assert packed.shape == (2, 64)
    np.testing.assert_array_equal(unpack_int4_np(packed), q)


def test_int4_jax_dtype():
    # int4 values ride in int8 lanes (native jnp.int4 breaks on the axon TPU
    # backend; see groupquant.py); range must still be int4's [-7, 7].
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 128)),
                    dtype=jnp.float32)
    q = quantize(x, QuantType.INT4, 64)
    assert q.data.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q.data))) <= 7
    back = dequantize(q)
    assert jnp.abs(back - x).max() < jnp.abs(x).max() * 0.35


def test_zero_group_safe():
    x = np.zeros((1, 64), np.float32)
    q, s = quantize_np(x, QuantType.INT8, 64)
    assert np.all(q == 0) and np.all(s == 0)
    np.testing.assert_array_equal(dequantize_np(q, s, 64), x)


def test_int4_row_packing_roundtrip():
    """Nibble packing along the contraction axis (QArray.packed) — exact
    roundtrip in numpy and jnp, and dequantize() equivalence."""
    import jax.numpy as jnp
    import numpy as np
    from fastllama_tpu.config import QuantType
    from fastllama_tpu.quant.groupquant import (QArray, dequantize,
                                                pack_int4_rows_np,
                                                unpack_int4_rows,
                                                unpack_int4_rows_np)

    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(3, 64, 48)).astype(np.int8)
    p = pack_int4_rows_np(q)
    assert p.shape == (3, 32, 48) and p.dtype == np.int8
    np.testing.assert_array_equal(unpack_int4_rows_np(p), q)
    np.testing.assert_array_equal(np.asarray(unpack_int4_rows(jnp.asarray(p))), q)

    s = rng.standard_normal((3, 1, 48)).astype(np.float32)
    a = QArray(jnp.asarray(q), jnp.asarray(s), QuantType.INT4, 64,
               group_axis=-2)
    b = QArray(jnp.asarray(p), jnp.asarray(s), QuantType.INT4, 64,
               group_axis=-2, packed=True)
    np.testing.assert_array_equal(np.asarray(dequantize(a)),
                                  np.asarray(dequantize(b)))
