"""Tokenizer semantics tests (reference tokenizer.cpp:247-398)."""
import numpy as np

from fastllama_tpu.loaders.tokenizer import Tokenizer, build_byte_fallback_vocab
from fastllama_tpu.tools.synthetic import tiny_tokenizer


def test_byte_fallback_offset():
    tk = build_byte_fallback_vocab()
    # unknown chars fall back to byte+3 (tokenizer.cpp:289-291)
    toks = tk.encode("AB", add_bos=False)
    assert toks == [ord("A") + 3, ord("B") + 3]


def test_bos_prepended():
    tk = build_byte_fallback_vocab()
    toks = tk.encode("A", add_bos=True)
    assert toks[0] == tk.bos_token_id == 1


def test_greedy_merge_highest_score():
    # vocab has "a","b","ab" — "ab" should merge; score ordering decides
    tk = build_byte_fallback_vocab(extra=["a", "b", "ab"])
    ab = tk.index_texts.index("ab")
    assert tk.encode("ab", add_bos=False) == [ab]


def test_merge_loop_iterates():
    # "abc" with pieces a,b,c,ab,abc -> single token after two merges
    tk = build_byte_fallback_vocab(extra=["a", "b", "c", "ab", "abc"])
    abc = tk.index_texts.index("abc")
    assert tk.encode("abc", add_bos=False) == [abc]


def test_space_maps_to_underline():
    tk = tiny_tokenizer()
    uid = tk.index_texts.index("▁")
    toks = tk.encode(" ", add_bos=False)
    # " " resolves to ▁ (tokenizer.cpp:236-239)
    assert toks[0] == uid or tk.index_texts[toks[0]].startswith("▁")


def test_spm_word_encoding_decodes_back():
    tk = tiny_tokenizer()
    text = "the cat"
    toks = tk.encode(text, add_bos=False)
    out = tk.decode(toks)
    assert out.replace("▁", " ").strip() == text.replace(" cat", " cat").strip() \
        or "cat" in out


def test_decode_strips_space_after_bos():
    tk = tiny_tokenizer()
    wid = tk.index_texts.index("▁the")
    # after BOS the leading space is stripped (tokenizer.cpp:334-336);
    # BOS itself decodes to its show_text "<s>" like the reference
    assert tk.decode([tk.bos_token_id, wid]) == "<s>the"
    assert tk.decode_one(wid, prev_token=tk.bos_token_id) == "the"
    assert tk.decode_one(wid, prev_token=-1) == " the"


def test_byte_piece_decoding():
    tk = build_byte_fallback_vocab()
    tid = tk.index_texts.index("<0x41>")
    assert tk.decode_one(tid) == "A"


def test_unsafe_piece_filtered():
    tk = build_byte_fallback_vocab()
    tid = tk.index_texts.index("<0x01>")  # control char
    assert tk.decode_one(tid) == ""


def test_utf8_multibyte_chunking():
    tk = build_byte_fallback_vocab(extra=["é"])
    eid = tk.index_texts.index("é")
    assert tk.encode("é", add_bos=False) == [eid]
    # unknown multibyte char falls back to its utf-8 bytes + 3
    toks = tk.encode("中", add_bos=False)
    assert toks == [b + 3 for b in "中".encode("utf-8")]


def test_encode_decode_roundtrip_ascii():
    tk = tiny_tokenizer()
    text = "the dog and the boy"
    toks = tk.encode(text, add_bos=True)
    decoded = tk.decode(toks[1:])  # skip BOS like the generate loop does
    assert decoded.lstrip() == text


def test_stream_decoder_multibyte_utf8():
    """Byte-fallback multi-byte UTF-8 must reassemble in streaming
    callbacks (stateless decode_one can only mojibake or drop high bytes)."""
    from fastllama_tpu.loaders.tokenizer import StreamDecoder, \
        build_byte_fallback_vocab

    tk = build_byte_fallback_vocab(extra=["hi"])
    sd = StreamDecoder(tk)
    text = "héllo 🌍"
    toks = [b + 3 for b in text.encode("utf-8")]
    out = "".join(sd.piece(t) for t in toks) + sd.flush()
    assert out == text
    # interleave a normal piece: buffered bytes flush first
    sd = StreamDecoder(tk)
    hi_id = tk.index_texts.index("hi")
    toks = [b + 3 for b in "é".encode("utf-8")[:1]]   # dangling high byte
    out = sd.piece(toks[0]) + sd.piece(hi_id)
    assert out.endswith("hi")


def test_decode_assembles_utf8_bytes():
    from fastllama_tpu.loaders.tokenizer import build_byte_fallback_vocab

    tk = build_byte_fallback_vocab()
    text = "día 🌍"
    toks = [b + 3 for b in text.encode("utf-8")]
    assert tk.decode(toks) == text


def test_encode_invalid_bytes_fallback():
    """Invalid UTF-8 input bytes must byte-fallback, not collapse to a
    replacement-char piece (reference matches raw bytes)."""
    from fastllama_tpu.loaders.tokenizer import build_byte_fallback_vocab

    tk = build_byte_fallback_vocab()
    tk._native = None
    raw = b"a\xffb"
    toks = tk.encode(raw.decode("latin-1"), add_bos=False)
    # 'ÿ' (U+00FF) encodes to 2 utf-8 bytes -> two byte tokens
    assert toks == [ord("a") + 3, 0xC3 + 3, 0xBF + 3, ord("b") + 3]
