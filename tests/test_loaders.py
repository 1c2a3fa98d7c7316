"""Loader tests: llama2.c and FLM round-trips, format detection, and
cross-format logit equivalence (same fp32 weights through different
containers must produce identical engine outputs)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastllama_tpu.config import ModelConfig, QuantType
from fastllama_tpu.loaders import flm
from fastllama_tpu.loaders.registry import FileType, detect_file_type, load_model
from fastllama_tpu.models.llama import KVCache, forward
from fastllama_tpu.tools.synthetic import (TINY, tiny_tokenizer, tiny_weights,
                                           write_tiny_llama2c)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama2c")
    ckpt, tokp = write_tiny_llama2c(str(d))
    return ckpt, tokp


def test_llama2c_roundtrip(tiny_ckpt):
    ckpt, tokp = tiny_ckpt
    m = load_model(ckpt, tokp, FileType.LLAMA2C)
    assert m.config.dim == TINY.dim
    assert m.config.n_layers == TINY.n_layers
    assert m.tokenizer.vocab_size == TINY.vocab_size
    ref = tiny_weights()
    # loader output is deinterleaved; wv untouched by convention change
    np.testing.assert_allclose(m.weights["wv"], ref["wv"], rtol=1e-6)
    np.testing.assert_allclose(m.weights["embedding"], ref["embedding"], rtol=1e-6)
    assert m.weights["wq"].shape == ref["wq"].shape


def test_llama2c_detection_requires_real_dims(tmp_path):
    # tiny dims fail the plausibility check (llama2c_loader.cpp:31-40) —
    # explicit file_type is the documented escape hatch
    big = ModelConfig(dim=512, hidden_dim=512, n_layers=1, n_heads=8,
                      n_kv_heads=8, vocab_size=1000, max_seq_len=16)
    from fastllama_tpu.loaders.llama2c import write_llama2c
    p = tmp_path / "big.bin"
    write_llama2c(str(p), big, tiny_weights(big))
    assert detect_file_type(str(p)) == FileType.LLAMA2C


def test_flm_write_read_roundtrip(tmp_path):
    cfg = TINY
    weights = tiny_weights()
    tok = tiny_tokenizer()
    path = str(tmp_path / "tiny.flm")
    # write from the interleaved convention directly
    flm.write_flm(path, cfg, tok, weights, QuantType.INT8,
                  rope_convention="interleaved")
    assert detect_file_type(path) == FileType.FLM

    cfg2, w2, tok2 = flm.load_flm(path)
    assert cfg2.dim == cfg.dim and cfg2.vocab_size == cfg.vocab_size
    assert cfg2.quant_type == QuantType.INT8
    assert tok2.vocab_size == tok.vocab_size
    assert tok2.index_texts[:300] == tok.index_texts[:300]
    assert tok2.bos_token_id == tok.bos_token_id

    # embedding stays fp32; projections arrive pre-quantized (data, scales)
    np.testing.assert_allclose(w2["embedding"], weights["embedding"], rtol=1e-6)
    assert isinstance(w2["wq"], tuple)
    from fastllama_tpu.quant.groupquant import dequantize_np, quantize_np
    qd, qs = quantize_np(weights["wq"], QuantType.INT8, 64)
    np.testing.assert_array_equal(w2["wq"][0], qd)
    np.testing.assert_allclose(w2["wq"][1], qs, rtol=1e-6)


def test_flm_tokenizer_only(tmp_path):
    path = str(tmp_path / "tok.flm")
    flm.write_flm(path, TINY, tiny_tokenizer(), tiny_weights(),
                  QuantType.INT8, rope_convention="interleaved")
    m = load_model(path, tokenizer_only=True)
    assert m.tokenizer.vocab_size == TINY.vocab_size
    assert not m.weights


def test_cross_format_logits_match(tiny_ckpt, tmp_path):
    """llama2.c fp32 (quantized on load) vs FLM int8 (pre-quantized) from the
    same fp32 weights -> identical quantized params -> identical logits."""
    ckpt, tokp = tiny_ckpt
    m1 = load_model(ckpt, tokp, FileType.LLAMA2C)
    p1 = m1.build(QuantType.INT8)

    path = str(tmp_path / "tiny.flm")
    flm.write_flm(path, TINY, tiny_tokenizer(), tiny_weights(),
                  QuantType.INT8, rope_convention="interleaved")
    m2 = load_model(path)
    p2 = m2.build()

    cfg = m1.config
    tokens = jnp.asarray([5, 300, 17, 263], jnp.int32)
    f = jax.jit(lambda p, t, c: forward(cfg, p, t, 0, c)[0])
    l1 = f(p1, tokens, KVCache.create(cfg))
    l2 = f(p2, tokens, KVCache.create(cfg))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)


def test_flm_int4_uses_extension_datatype(tmp_path):
    """INT4 FLM files are written with our DT_INT4X extension block type
    (the reference enum has no INT4; its loader rejects unknown types)."""
    import struct
    path = str(tmp_path / "x.flm")
    flm.write_flm(path, TINY, tiny_tokenizer(), tiny_weights(),
                  QuantType.INT4, rope_convention="interleaved")
    raw = open(path, "rb").read()
    # at least one tensor block carries data_type DT_INT4X
    found = False
    pos = 8
    while pos + 16 <= len(raw):
        bt, dt = raw[pos], raw[pos + 1]
        if bt == flm.BT_TENSOR and dt == flm.DT_INT4X:
            found = True
            break
        pos += 8
    assert found


def test_gguf_reader(tmp_path):
    """Build a minimal GGUF v3 file by hand and read it back."""
    import struct
    cfg = TINY
    weights = tiny_weights()
    path = str(tmp_path / "tiny.gguf")

    def s(txt):
        b = txt.encode()
        return struct.pack("<Q", len(b)) + b

    def kv_u32(k, v):
        return s(k) + struct.pack("<I", 4) + struct.pack("<I", v)

    def kv_f32(k, v):
        return s(k) + struct.pack("<I", 6) + struct.pack("<f", v)

    def kv_str(k, v):
        return s(k) + struct.pack("<I", 8) + s(v)

    def kv_arr_str(k, items):
        out = s(k) + struct.pack("<I", 9) + struct.pack("<I", 8)
        out += struct.pack("<Q", len(items))
        for it in items:
            out += s(it)
        return out

    def kv_arr_f32(k, items):
        out = s(k) + struct.pack("<I", 9) + struct.pack("<I", 6)
        out += struct.pack("<Q", len(items))
        out += struct.pack(f"<{len(items)}f", *items)
        return out

    tok = tiny_tokenizer(cfg.vocab_size)
    kvs = (kv_str("general.architecture", "llama")
           + kv_str("general.name", "tiny")
           + kv_u32("llama.embedding_length", cfg.dim)
           + kv_u32("llama.feed_forward_length", cfg.hidden_dim)
           + kv_u32("llama.block_count", cfg.n_layers)
           + kv_u32("llama.attention.head_count", cfg.n_heads)
           + kv_u32("llama.attention.head_count_kv", cfg.n_kv_heads)
           + kv_u32("llama.context_length", cfg.max_seq_len)
           + kv_f32("llama.attention.layer_norm_rms_epsilon", 1e-5)
           + kv_str("tokenizer.ggml.model", "llama")
           + kv_arr_str("tokenizer.ggml.tokens", tok.index_texts)
           + kv_arr_f32("tokenizer.ggml.scores", tok.scores)
           + kv_u32("tokenizer.ggml.bos_token_id", 1)
           + kv_u32("tokenizer.ggml.eos_token_id", 2))
    n_kv = 14

    # tensors: embedding (f32) + one q8_0 projection per layer for wq; rest f32
    tensors = [("token_embd.weight", weights["embedding"], "f32"),
               ("output_norm.weight", weights["out_norm"], "f32"),
               ("output.weight", weights["classifier"], "f32")]
    for l in range(cfg.n_layers):
        tensors += [
            (f"blk.{l}.attn_norm.weight", weights["attn_norm"][l], "f32"),
            (f"blk.{l}.attn_q.weight", weights["wq"][l], "q8_0"),
            (f"blk.{l}.attn_k.weight", weights["wk"][l], "f32"),
            (f"blk.{l}.attn_v.weight", weights["wv"][l], "f32"),
            (f"blk.{l}.attn_output.weight", weights["wo"][l], "f32"),
            (f"blk.{l}.ffn_norm.weight", weights["ffn_norm"][l], "f32"),
            (f"blk.{l}.ffn_gate.weight", weights["w1"][l], "f32"),
            (f"blk.{l}.ffn_down.weight", weights["w2"][l], "f32"),
            (f"blk.{l}.ffn_up.weight", weights["w3"][l], "f32"),
        ]

    def q8_0_bytes(arr):
        a = arr.reshape(-1, 32)
        scale = np.abs(a).max(axis=1) / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        q = np.round(a / safe[:, None]).astype(np.int8)
        out = b""
        for i in range(a.shape[0]):
            out += np.float16(scale[i]).tobytes() + q[i].tobytes()
        return out, q.reshape(arr.shape), scale.astype(np.float32)

    infos, blobs, expected_q = b"", [], {}
    offset = 0
    align = 32
    for name, arr, kind in tensors:
        dims = tuple(reversed(arr.shape))  # ggml innermost-first
        if kind == "f32":
            blob = np.ascontiguousarray(arr, "<f4").tobytes()
            gtype = 0
        else:
            blob, q, sc = q8_0_bytes(arr)
            expected_q[name] = (q, sc)
            gtype = 8
        offset += (-offset) % align
        infos += s(name) + struct.pack("<I", len(dims))
        infos += struct.pack(f"<{len(dims)}Q", *dims)
        infos += struct.pack("<IQ", gtype, offset)
        blobs.append((offset, blob))
        offset += len(blob)

    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", 0x46554747, 3, len(tensors), n_kv))
        f.write(kvs)
        f.write(infos)
        start = f.tell()
        start += (-start) % align
        for off, blob in blobs:
            f.seek(start + off)
            f.write(blob)

    assert detect_file_type(path) == FileType.GGUF
    m = load_model(path)
    assert m.config.dim == cfg.dim
    assert m.config.quant_type == QuantType.INT8
    assert m.config.group_size == 32
    assert m.tokenizer.index_texts[:100] == tok.index_texts[:100]
    np.testing.assert_allclose(m.weights["wv"], weights["wv"], rtol=1e-6)
    # wq came back requantized (q8_0, group 32), deinterleaved
    assert isinstance(m.weights["wq"], tuple)
    params = m.build()
    cfg2 = m.config
    tokens = jnp.asarray([5, 17], jnp.int32)
    logits, _ = jax.jit(lambda p, t, c: forward(cfg2, p, t, 0, c))(
        params, tokens, KVCache.create(cfg2))
    assert np.isfinite(np.asarray(logits)).all()


def test_hf_rope_scaling_parsing():
    from fastllama_tpu.loaders.hf import _config_from_json

    base = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, vocab_size=256,
                max_position_embeddings=512)
    c = _config_from_json(dict(base))
    assert c.rope_freq_scale == 1.0 and c.rope_ext_factor == 0.0

    c = _config_from_json(dict(base, rope_scaling={"type": "linear",
                                                   "factor": 4.0}))
    assert c.rope_freq_scale == 0.25 and c.rope_ext_factor == 0.0

    c = _config_from_json(dict(base, rope_scaling={
        "rope_type": "yarn", "factor": 2.0,
        "original_max_position_embeddings": 256}))
    assert c.rope_freq_scale == 0.5
    assert c.rope_ext_factor == 1.0
    assert c.rope_orig_ctx == 256


def test_flm_int4_extension_roundtrip(tmp_path):
    """Our DT_INT4X extension block: packed INT4 FLM files round-trip through
    write_flm/load_flm and serve identically to quantize-on-load INT4."""
    import numpy as np
    from fastllama_tpu.config import EngineConfig, ModelConfig, QuantType
    from fastllama_tpu.loaders.flm import load_flm, write_flm
    from fastllama_tpu.loaders.registry import FileType
    from fastllama_tpu.runtime.engine import Engine
    from fastllama_tpu.tools.synthetic import (tiny_tokenizer, tiny_weights,
                                               write_tiny_llama2c)

    # group_size 64 (the default): llama2c files carry no group-size field
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=512, max_seq_len=64,
                      quant_type=QuantType.INT4)
    # write the llama2c checkpoint first and take ITS normalized (half-
    # convention) weights as the FLM source, so both engines share the
    # exact same effective parameters
    from fastllama_tpu.loaders.registry import load_model
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg, seed=3)
    m = load_model(ckpt, tokp, FileType.LLAMA2C)
    weights = {k: np.asarray(v, np.float32) for k, v in m.weights.items()}
    tok = tiny_tokenizer(cfg.vocab_size)
    flm_path = str(tmp_path / "m4.flm")
    write_flm(flm_path, cfg, tok, weights, QuantType.INT4)

    rcfg, rweights, rtok = load_flm(flm_path)
    assert rcfg.quant_type == QuantType.INT4
    # packed values round-trip exactly (wv has no rope permutation)
    from fastllama_tpu.quant.groupquant import quantize_np
    want_q, want_s = quantize_np(
        np.asarray(weights["wv"], np.float32), QuantType.INT4, 64)
    got_q, got_s = rweights["wv"]
    np.testing.assert_array_equal(np.asarray(got_q), want_q)
    np.testing.assert_allclose(np.asarray(got_s).reshape(want_s.shape),
                               want_s, rtol=0, atol=0)

    # serving parity: FLM-int4 engine == llama2c quantize-on-load int4
    e_ref = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT4,
                        EngineConfig(max_seq_len=64,
                                     compute_dtype="float32"))
    e_flm = Engine.load(flm_path, "", FileType.FLM, None,
                        EngineConfig(max_seq_len=64,
                                     compute_dtype="float32"))
    want, _ = e_ref.generate([1, 5, 9], max_new_tokens=6, temperature=0.0,
                             stop_tokens=(), decode_chunk=3)
    got, _ = e_flm.generate([1, 5, 9], max_new_tokens=6, temperature=0.0,
                            stop_tokens=(), decode_chunk=3)
    assert got == want
