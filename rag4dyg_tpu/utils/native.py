"""ctypes loader for the C++ runtime (runtime/encoder.cpp).

The shared library is compiled on first use with the system g++ into a
per-user cache keyed by source hash, so the repo stays build-system-free
while bulk corpus encoding runs at native speed. Every entry point
degrades gracefully: if g++ or the source is unavailable the caller falls
back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime", "encoder.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            with open(_SRC, "rb") as f:
                src = f.read()
            tag = hashlib.sha256(src).hexdigest()[:16]
            cache = os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "rag4dyg_tpu")
            os.makedirs(cache, exist_ok=True)
            so_path = os.path.join(cache, f"encoder_{tag}.so")
            if not os.path.exists(so_path):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", so_path + ".tmp"],
                    check=True, capture_output=True)
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
            lib.enc_create.restype = ctypes.c_void_p
            lib.enc_create.argtypes = [ctypes.c_char_p, ctypes.c_int32]
            lib.enc_destroy.argtypes = [ctypes.c_void_p]
            lib.enc_encode_batch.restype = ctypes.c_int64
            lib.enc_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32), ctypes.c_int32]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


class NativeEncoder:
    """Bulk word-level encoder over a fixed token->id table."""

    def __init__(self, id_to_token: Sequence[str]):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native encoder unavailable")
        self._lib = lib
        buf = "\n".join(id_to_token).encode("utf-8")
        self._handle = lib.enc_create(buf, len(id_to_token))
        if not self._handle:
            raise RuntimeError("enc_create failed")

    def __del__(self):
        if getattr(self, "_handle", None) and _lib is not None:
            self._lib.enc_destroy(self._handle)
            self._handle = None

    def encode_batch(self, lines: Sequence[str],
                     max_len: Optional[int] = None) -> List[List[int]]:
        text = "\n".join(lines).encode("utf-8")
        offsets = np.zeros(len(lines) + 1, np.int64)
        pos = 0
        for i, ln in enumerate(lines):
            b = ln.encode("utf-8")
            offsets[i] = pos
            pos += len(b) + 1  # + the '\n' separator
        offsets[-1] = len(text)
        # longest possible row: bounded by max_len or line length/2 + 1
        stride = max_len or (max((len(ln) for ln in lines), default=2)
                             // 2 + 1)
        out_ids = np.zeros((len(lines), stride), np.int32)
        out_lens = np.zeros(len(lines), np.int32)
        err = self._lib.enc_encode_batch(
            self._handle, text, offsets, len(lines), max_len or 0,
            out_ids, out_lens, stride)
        if err:
            line = lines[err - 1]
            raise KeyError(f"unknown token in line {err - 1}: {line[:80]!r}")
        return [out_ids[i, : out_lens[i]].tolist()
                for i in range(len(lines))]


def available() -> bool:
    return _build_and_load() is not None
