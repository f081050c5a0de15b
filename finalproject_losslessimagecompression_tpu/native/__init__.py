"""ctypes binding for the native C++ rANS codec, with lazy on-demand build.

The reference shipped a prebuilt CPython-3.8 Cython extension
(reference: rans/setup.py, rans/rans.cpython-38-...so); here the C++ is
compiled on first use with the system g++ (no Python-version coupling) and
exposed through ctypes.  If no compiler is available the module degrades
gracefully: `available()` returns False and callers fall back to the
JAX/NumPy codecs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rans.cpp")
_BUILD_DIR = os.path.join(_DIR, "build")
_SO = os.path.join(_BUILD_DIR, "librans.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # Prefer an existing build; if it fails to load or lacks a symbol
        # (stale/wrong-arch binary predating newer entry points), rebuild
        # from source once, then degrade to None (Python fallback) -- a bad
        # cached .so must never turn available() into a crash.
        if os.path.exists(_SO):
            try:
                _lib = _bind(ctypes.CDLL(_SO))
                return _lib
            except (OSError, AttributeError):
                try:
                    os.remove(_SO)
                except OSError:
                    pass
        so = _build()
        if so is None:
            return None
        try:
            _lib = _bind(ctypes.CDLL(so))
        except (OSError, AttributeError):
            return None
        return _lib


def _bind(lib):
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.rans_encode_single.restype = ctypes.c_int
    lib.rans_encode_single.argtypes = [
        ctypes.c_int, i32p, f32p, f32p, u32p, ctypes.c_int, u64p,
    ]
    lib.rans_decode_single.restype = ctypes.c_int
    lib.rans_decode_single.argtypes = [
        ctypes.c_int, f32p, f32p, u32p, ctypes.c_int, i32p, u64p,
    ]
    lib.rans_encode_interleaved.restype = ctypes.c_int
    lib.rans_encode_interleaved.argtypes = [
        ctypes.c_int, ctypes.c_int, i32p, f32p, f32p, u32p,
        ctypes.c_int, u32p, u32p,
    ]
    lib.rans_decode_interleaved.restype = ctypes.c_int
    lib.rans_decode_interleaved.argtypes = [
        ctypes.c_int, ctypes.c_int, f32p, f32p, u32p, ctypes.c_int,
        i32p, u32p, u32p,
    ]
    lib.rans_chain_pack.restype = ctypes.c_int
    lib.rans_chain_pack.argtypes = [
        ctypes.c_int, u64p, u32p, ctypes.c_int, ctypes.c_int, u64p,
    ]
    lib.rans_chain_unpack.restype = ctypes.c_int
    lib.rans_chain_unpack.argtypes = [
        ctypes.c_int, ctypes.c_uint64, u32p, ctypes.c_int, u64p,
    ]
    return lib


def available() -> bool:
    return _load() is not None


def _as(arr, dtype):
    return np.ascontiguousarray(np.asarray(arr), dtype=dtype)


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def encode_single(
    values, means, scales, state: int = 1 << 32
) -> Tuple[int, np.ndarray]:
    """Reference-semantics single-stream encode.  Returns (state, words)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable (no g++?)")
    v = _as(values, np.int32)
    m = _as(means, np.float32)
    s = _as(scales, np.float32)
    n = v.shape[0]
    out = np.empty(n + 16, np.uint32)
    st = ctypes.c_uint64(state)
    nw = lib.rans_encode_single(
        n, _ptr(v, ctypes.c_int32), _ptr(m, ctypes.c_float),
        _ptr(s, ctypes.c_float), _ptr(out, ctypes.c_uint32), out.shape[0],
        ctypes.byref(st),
    )
    if nw < 0:
        raise ValueError("native encode failed (symbol out of window?)")
    return int(st.value), out[:nw].copy()


def decode_single(
    state: int, words, n: int, means, scales
) -> Tuple[int, np.ndarray]:
    """means/scales in decode (reversed) order; returns (state, values)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable (no g++?)")
    w = _as(words, np.uint32)
    m = _as(means, np.float32)
    s = _as(scales, np.float32)
    out = np.empty(n, np.int32)
    st = ctypes.c_uint64(state)
    r = lib.rans_decode_single(
        n, _ptr(m, ctypes.c_float), _ptr(s, ctypes.c_float),
        _ptr(w, ctypes.c_uint32), w.shape[0], _ptr(out, ctypes.c_int32),
        ctypes.byref(st),
    )
    if r < 0:
        raise ValueError("native decode failed (buffer underrun)")
    return int(st.value), out


def encode_interleaved(values, means, scales, num_streams: int):
    """Pre-padded inputs of length steps*S.  Returns (words, hi, lo)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable (no g++?)")
    v = _as(values, np.int32)
    m = _as(means, np.float32)
    s = _as(scales, np.float32)
    S = num_streams
    steps = v.shape[0] // S
    out = np.empty(v.shape[0] + 16, np.uint32)
    hi = np.empty(S, np.uint32)
    lo = np.empty(S, np.uint32)
    nw = lib.rans_encode_interleaved(
        steps, S, _ptr(v, ctypes.c_int32), _ptr(m, ctypes.c_float),
        _ptr(s, ctypes.c_float), _ptr(out, ctypes.c_uint32), out.shape[0],
        _ptr(hi, ctypes.c_uint32), _ptr(lo, ctypes.c_uint32),
    )
    if nw < 0:
        raise ValueError("native interleaved encode failed")
    return out[:nw].copy(), hi, lo


def chain_pack(states: np.ndarray, words: np.ndarray, num_words: int):
    """Chain final states 1..S-1 into state0 + appended words
    (bit-identical to the Python _uniform_push loop in codec/container.py).

    `states`: uint64[S]; `words`: uint32 buffer with payload in [0:num_words]
    and at least 5*S + 8 words of spare capacity.  Returns
    (state0, new_word_count); words is modified in place."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable (no g++?)")
    st = np.ascontiguousarray(states, np.uint64)
    assert words.dtype == np.uint32 and words.flags.c_contiguous
    out = ctypes.c_uint64(0)
    nw = lib.rans_chain_pack(
        st.shape[0], _ptr(st, ctypes.c_uint64), _ptr(words, ctypes.c_uint32),
        num_words, words.shape[0], ctypes.byref(out),
    )
    if nw < 0:
        raise ValueError("chain pack overflow")
    return int(out.value), nw


def chain_unpack(S: int, state0: int, words: np.ndarray, num_words: int):
    """Inverse of chain_pack.  Returns (states uint64[S], payload word
    count), raising ValueError on underflow (corrupt container)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable (no g++?)")
    w = np.ascontiguousarray(words, np.uint32)
    states = np.empty(S, np.uint64)
    nw = lib.rans_chain_unpack(
        S, state0, _ptr(w, ctypes.c_uint32), num_words,
        _ptr(states, ctypes.c_uint64),
    )
    if nw < 0:
        raise ValueError("corrupt container: state chain underflow")
    return states, nw


def decode_interleaved(words, means, scales, num_streams: int, hi, lo):
    """Inputs in encode order (length steps*S).  Returns values."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable (no g++?)")
    w = _as(words, np.uint32)
    m = _as(means, np.float32)
    s = _as(scales, np.float32)
    S = num_streams
    steps = m.shape[0] // S
    out = np.empty(m.shape[0], np.int32)
    hi = _as(hi, np.uint32).copy()
    lo = _as(lo, np.uint32).copy()
    r = lib.rans_decode_interleaved(
        steps, S, _ptr(m, ctypes.c_float), _ptr(s, ctypes.c_float),
        _ptr(w, ctypes.c_uint32), w.shape[0], _ptr(out, ctypes.c_int32),
        _ptr(hi, ctypes.c_uint32), _ptr(lo, ctypes.c_uint32),
    )
    if r < 0:
        raise ValueError("native interleaved decode failed")
    return out, hi, lo
