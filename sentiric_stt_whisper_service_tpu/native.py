"""ctypes bindings for the native C++ audio runtime (native/).

Auto-builds ``libsstw_native.so`` with make on first use when a toolchain
is present; every entry point has a pure-Python fallback so the framework
works without the native library (and tests cover both paths).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libsstw_native.so"
_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    try:
        proc = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], capture_output=True, timeout=120
        )
        return proc.returncode == 0 and _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and os.environ.get("SSTW_NO_NATIVE_BUILD") != "1":
            if not _build():
                log.info("native library unavailable; using Python fallbacks")
                return None
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            log.warning("failed to load native lib: %s", e)
            return None
        lib.sstw_parse_wav.restype = ctypes.c_int
        lib.sstw_parse_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sstw_rb_create.restype = ctypes.c_void_p
        lib.sstw_rb_append.restype = ctypes.c_size_t
        lib.sstw_rb_append.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.sstw_rb_size.restype = ctypes.c_size_t
        lib.sstw_rb_size.argtypes = [ctypes.c_void_p]
        lib.sstw_rb_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.sstw_rb_clear.argtypes = [ctypes.c_void_p]
        lib.sstw_rb_destroy.argtypes = [ctypes.c_void_p]
        lib.sstw_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def parse_wav_native(data: bytes):
    """Native WAV parse → (pcm int16, rate, channels) or None on any
    failure (caller falls back to the Python parser)."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_size_t()
    rate = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.sstw_parse_wav(
        data, len(data), ctypes.byref(out), ctypes.byref(n),
        ctypes.byref(rate), ctypes.byref(ch),
    )
    if rc != 0:
        return None
    try:
        pcm = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.sstw_free(out)
    return pcm, rate.value, ch.value


class StreamBuffer:
    """Streaming PCM16 ingest buffer.

    Native-backed when available (amortized growth in C++, WAV-header
    strip, odd-byte stitching across chunks); otherwise a Python list of
    chunks with identical semantics."""

    def __init__(self):
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.sstw_rb_create()
        else:
            self._chunks: list[np.ndarray] = []
            self._first = True
            self._skip = 0
            self._pending = b""

    def append(self, chunk: bytes) -> int:
        if self._lib is not None:
            size = self._lib.sstw_rb_append(self._h, chunk, len(chunk))
            if size == ctypes.c_size_t(-1).value:
                raise MemoryError("stream buffer allocation failed")
            return size
        if self._first:
            if (
                len(chunk) > 44
                and chunk[:4] == b"RIFF"
                and chunk[8:12] == b"WAVE"
            ):
                self._skip = 44
            self._first = False
        if self._skip:
            cut = min(self._skip, len(chunk))
            chunk = chunk[cut:]
            self._skip -= cut
        data = self._pending + chunk
        self._pending = data[len(data) // 2 * 2 :]
        data = data[: len(data) // 2 * 2]
        if data:
            self._chunks.append(np.frombuffer(data, "<i2"))
        return self.size

    @property
    def size(self) -> int:
        if self._lib is not None:
            return self._lib.sstw_rb_size(self._h)
        return sum(len(c) for c in self._chunks)

    def read(self) -> np.ndarray:
        if self._lib is not None:
            n = self.size
            out = np.empty(n, np.int16)
            if n:
                self._lib.sstw_rb_read(self._h, out.ctypes.data_as(ctypes.c_void_p))
            return out
        if not self._chunks:
            return np.zeros(0, np.int16)
        return np.concatenate(self._chunks)

    def clear(self):
        if self._lib is not None:
            self._lib.sstw_rb_clear(self._h)
        else:
            self._chunks = []
            self._pending = b""

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            try:
                self._lib.sstw_rb_destroy(self._h)
            except Exception:
                pass
