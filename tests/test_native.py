"""Native C++ tokenizer encoder vs the pure-Python reference path."""
import pytest

from fastllama_tpu.loaders.native import available
from fastllama_tpu.tools.synthetic import tiny_tokenizer

pytestmark = pytest.mark.skipif(not available(),
                                reason="libftl_native.so not built")

TEXTS = [
    "the cat", "the dog and the boy", " ", "a", "",
    "the story of the cat and the dog",
    "unknownwords zzz qqq", "mixed 123 !@# text",
    "é中文 bytes", "the the the the",
]


def test_native_matches_python():
    tk = tiny_tokenizer()
    assert tk._native is not None
    native = tk._native
    # force the python path for comparison
    tk._native = None
    for text in TEXTS:
        if not text:
            continue
        py = tk.encode(text, add_bos=True)
        nat = native.encode(text, add_bos=True)
        assert nat == py, f"mismatch on {text!r}: {nat} vs {py}"
        py2 = tk.encode(text, add_bos=False)
        nat2 = native.encode(text, add_bos=False)
        assert nat2 == py2


def test_native_speedup_sanity():
    import time
    tk = tiny_tokenizer()
    native = tk._native
    tk._native = None
    text = "the story of the cat and the dog and the boy " * 20
    t0 = time.perf_counter()
    py = tk.encode(text)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nat = native.encode(text)
    t_nat = time.perf_counter() - t0
    assert nat == py
    # not a strict perf gate, just a sanity print
    print(f"python {t_py*1e3:.1f}ms vs native {t_nat*1e3:.1f}ms")


def test_native_python_encode_fuzz():
    """The native C encoder and the pure-Python reference must agree
    token-for-token on randomized inputs (ASCII, unicode, byte-fallback,
    long merges)."""
    import random

    from fastllama_tpu.tools.synthetic import tiny_tokenizer

    tk = tiny_tokenizer(512)
    if tk._native is None:
        import pytest
        pytest.skip("native encoder unavailable")
    rng = random.Random(0)
    corpus = ["the", "cat", "sat", "on", "a", "mat", " ", "é", "日", "🌍",
              "\n", "\t", "x" * 50, "<0x41>", "▁the", "''", "\\"]
    for trial in range(200):
        parts = rng.choices(corpus, k=rng.randint(1, 12))
        text = "".join(parts)
        native = tk.encode(text, add_bos=bool(trial % 2))
        saved, tk._native = tk._native, None
        py = tk.encode(text, add_bos=bool(trial % 2))
        tk._native = saved
        assert native == py, (text, native, py)
