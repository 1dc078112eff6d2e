"""ctypes binding for the native C++ host engine (native/jtokkit_native.cc).

The native engine implements the same two hot loops as the device pipeline
(pre-split scanner + exact min-rank merge) as tight scalar code over the SAME
packed integer tables, giving the host path reference-class single-core
throughput. It is optional: everything falls back to the pure-Python oracle
when the shared library is absent or the toolchain is missing.

Build (one-time, cached): ``python -m jtokkit_tpu.native``
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "jtokkit_native.cc")
_LIB = os.path.join(os.path.dirname(__file__), "_libjtokkit_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    if os.path.exists(_LIB) and not force:
        if os.path.getmtime(_LIB) >= os.path.getmtime(src):
            return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-o", _LIB, src],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB) and not build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.jt_init.restype = ctypes.c_int
            lib.jt_encode.restype = ctypes.c_int64
            lib.jt_split.restype = ctypes.c_int64
            if hasattr(lib, "jt_encode_capped"):
                lib.jt_encode_capped.restype = ctypes.c_int64
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


class NativeEngine:
    """Native encoder bound to one encoding's packed tables.

    Each engine owns one of the library's table slots (handles), so multiple
    encodings encode concurrently with no locking: the C calls are pure reads
    over immutable tables and release the GIL, so Python threads scale.
    """

    _next_handle = 0
    _cls_table = None  # keep alive

    def __init__(self, packed, pattern: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native engine unavailable")
        from .engine import charclass

        self._lib = lib
        self._packed = packed
        self._pattern_code = 0 if pattern == "gpt2" else 1
        if NativeEngine._cls_table is None:
            NativeEngine._cls_table = np.ascontiguousarray(
                charclass.class_table()
            )
        with _lock:
            handle = NativeEngine._next_handle
            NativeEngine._next_handle += 1
            if handle >= 16:
                raise RuntimeError("too many native engines (max 16)")
            p = packed
            # pin the table arrays for the lifetime of this engine
            self._refs = [
                np.ascontiguousarray(p.byte_to_id),
                np.ascontiguousarray(p.byte_pair_id),
                np.ascontiguousarray(p.cuckoo_u),
                np.ascontiguousarray(p.cuckoo_v),
                np.ascontiguousarray(p.cuckoo_id),
                np.ascontiguousarray(p.token_bytes),
                np.ascontiguousarray(p.token_offsets),
            ]
            b2i, bp, cu, cv, cid, pool, offs = self._refs
            got = self._lib.jt_init(
                ctypes.c_int32(handle),
                NativeEngine._cls_table.ctypes.data_as(ctypes.c_void_p),
                b2i.ctypes.data_as(ctypes.c_void_p),
                bp.ctypes.data_as(ctypes.c_void_p),
                cu.ctypes.data_as(ctypes.c_void_p),
                cv.ctypes.data_as(ctypes.c_void_p),
                cid.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int64(cu.shape[1]),
                pool.ctypes.data_as(ctypes.c_void_p),
                offs.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int32(p.n_tokens),
            )
            if got != handle:
                raise RuntimeError("native engine init failed")
            self._handle = handle

    def encode_ordinary(self, text: str) -> list:
        out, m = self._encode_raw(text)
        if m < 0:
            raise RuntimeError("native engine not initialized")
        return out[:m].tolist()

    def encode_ordinary_array(self, text: str) -> np.ndarray:
        out, m = self._encode_raw(text)
        if m < 0:
            raise RuntimeError("native engine not initialized")
        return out[:m]

    def encode_bytes(self, data) -> np.ndarray:
        """Encode a UTF-8 byte buffer (bytes or uint8 ndarray) directly —
        no str round-trip; used by the device engine's long-piece routing."""
        if len(data) == 0:
            return np.zeros(0, dtype=np.int32)
        buf = np.ascontiguousarray(
            np.frombuffer(data, dtype=np.uint8)
            if isinstance(data, (bytes, bytearray, memoryview)) else data
        )
        out = np.empty(len(buf), dtype=np.int32)
        m = self._lib.jt_encode(
            ctypes.c_int32(self._handle),
            buf.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(buf)),
            ctypes.c_int32(self._pattern_code),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if m < 0:
            raise RuntimeError("native engine not initialized")
        return out[:m]

    def encode_ordinary_capped_array(self, text: str, max_tokens: int):
        """First ``max_tokens`` tokens of the full encoding, or None when the
        loaded library predates the capped entry point. O(prefix) — the
        native scan stops once the cap is reached (the reference's maxTokens
        early exit, ``M/GptBytePairEncoding.java:79,281-283``)."""
        if not hasattr(self._lib, "jt_encode_capped"):
            return None
        if max_tokens <= 0:
            return np.zeros(0, dtype=np.int32)
        data = text.encode("utf-8")
        if not data:
            return np.zeros(0, dtype=np.int32)
        buf = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(max_tokens, dtype=np.int32)
        m = self._lib.jt_encode_capped(
            ctypes.c_int32(self._handle),
            buf.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(data)),
            ctypes.c_int32(self._pattern_code),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(max_tokens),
        )
        if m < 0:
            raise RuntimeError("native engine not initialized")
        return out[:m]

    def _encode_raw(self, text: str):
        data = text.encode("utf-8")
        if not data:
            return np.zeros(0, dtype=np.int32), 0
        buf = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(len(data), dtype=np.int32)
        m = self._lib.jt_encode(
            ctypes.c_int32(self._handle),
            buf.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(data)),
            ctypes.c_int32(self._pattern_code),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out, m

    def split_ends(self, text: str) -> np.ndarray:
        """Piece end byte-offsets (for differential testing)."""
        data = text.encode("utf-8")
        if not data:
            return np.zeros(0, dtype=np.int32)
        buf = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(len(data), dtype=np.int32)
        m = self._lib.jt_split(
            ctypes.c_int32(self._handle),
            buf.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(data)),
            ctypes.c_int32(self._pattern_code),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out[:m].copy()


def available() -> bool:
    return _load() is not None


if __name__ == "__main__":
    ok = build(force=True)
    print("native build:", "OK" if ok else "FAILED")
