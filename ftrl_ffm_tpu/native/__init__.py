"""Native (C++) fast path for text parsing.

Builds `libftrlparse-<hash>.so` from parser.cpp on first use (g++ -O3) into a
per-user cache dir, where <hash> is the sha256 of the source — no opaque
binary ships in the repo, and a stale build can never shadow a modified
parser.cpp (content hash, not mtimes, decides staleness).  All entry points
degrade gracefully: `lib()` returns None when no toolchain is available and
callers fall back to the pure-numpy parser.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "parser.cpp")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "FTRL_FFM_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ftrl_ffm_tpu_native"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"libftrlparse-{digest}.so")


def _build(so: str) -> bool:
    tmp = so + f".tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)  # atomic: concurrent builders race safely
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def lib() -> ctypes.CDLL | None:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            so = _so_path()
        except OSError:
            return None
        if not os.path.exists(so) and not _build(so):
            return None
        try:
            cdll = ctypes.CDLL(so)
        except OSError:
            return None
        # Optional (FTRL_MALLOPT=1): raise glibc's mmap threshold so the
        # multi-MB parse output buffers come from the (reused, warm) heap
        # instead of fresh mmaps — without it, first-touch page faults
        # inside the parse threads serialize on the mm lock and cap the
        # multi-thread speedup (measured: nt=4 call 11.0 -> 5.0 ms).  OFF
        # by default: on this dev host's TPU relay the global allocator
        # change slows the transfer path more than the parse gains
        # (LR end-to-end 516k -> 481k ex/s) — flip it on for parse-bound
        # multi-core hosts.
        try:
            import os as _os

            if _os.environ.get("FTRL_MALLOPT") == "1":
                ctypes.CDLL("libc.so.6").mallopt(-3, 256 << 20)  # M_MMAP_THRESHOLD
        except (OSError, AttributeError):
            pass
        cdll.ftrl_parse_chunk.restype = ctypes.c_int64
        cdll.ftrl_parse_chunk.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        cdll.ftrl_parse_chunk_mt.restype = ctypes.c_int64
        cdll.ftrl_parse_chunk_mt.argtypes = (
            cdll.ftrl_parse_chunk.argtypes + [ctypes.c_int32]
        )
        cdll.ftrl_count_chunk.restype = None
        cdll.ftrl_count_chunk.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = cdll
        return _lib
