"""ctypes binding to the native runtime library (csrc/libftl_native.so).

Loads lazily; everything has a pure-Python fallback, so the engine works
without the native build (``make -C csrc`` creates it, and this module will
attempt that build once if a compiler is available).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "build", "libftl_native.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and os.path.exists(
                os.path.join(_CSRC, "Makefile")):
            try:
                subprocess.run(["make", "-C", _CSRC, "-s"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.flt_tokenizer_new.restype = ctypes.c_void_p
        lib.flt_tokenizer_new.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_char_p]
        lib.flt_tokenizer_free.argtypes = [ctypes.c_void_p]
        lib.flt_tokenizer_encode.restype = ctypes.c_int64
        lib.flt_tokenizer_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeEncoder:
    """Native greedy-BPE encoder; raises ImportError if the library is
    unavailable (callers keep the Python path as fallback)."""

    def __init__(self, index_texts: List[str], scores: List[float],
                 bos_token_id: int, conn_tag: str = "▁"):
        lib = _load()
        if lib is None:
            raise ImportError("libftl_native.so unavailable")
        self._lib = lib
        blobs = [t.encode("utf-8") for t in index_texts]
        offsets = [0]
        for b in blobs:
            offsets.append(offsets[-1] + len(b))
        texts = b"".join(blobs)
        n = len(blobs)
        off_arr = (ctypes.c_int64 * (n + 1))(*offsets)
        sc_arr = (ctypes.c_float * n)(*[float(s) for s in scores])
        self._handle = lib.flt_tokenizer_new(
            texts, off_arr, sc_arr, n, conn_tag.encode("utf-8"))
        self._bos = bos_token_id

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.flt_tokenizer_free(self._handle)
            self._handle = None

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        raw = text.encode("utf-8")
        max_out = len(raw) + 2
        out = (ctypes.c_int32 * max_out)()
        n = self._lib.flt_tokenizer_encode(
            self._handle, raw, len(raw), self._bos, 1 if add_bos else 0,
            out, max_out)
        if n < 0:
            raise RuntimeError("native encode overflow")
        return list(out[:n])
