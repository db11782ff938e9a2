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
    # -march=native: the .so is built on (and cached for) THIS host, and the
    # compact-encode loops only beat numpy's SIMD kernels when g++ actually
    # vectorizes them; fall back to the portable build if it is rejected
    for extra in (["-march=native"], []):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 # the compact analyzer reads float bit patterns through a
                 # uint32 view (bf16 round-trip check)
                 "-fno-strict-aliasing",
                 *extra, "-o", tmp, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so)  # atomic: concurrent builders race safely
            return True
        except (OSError, subprocess.SubprocessError):
            continue
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
        _i32p = ctypes.POINTER(ctypes.c_int32)
        cdll.ftrl_compact_analyze.restype = ctypes.c_int64
        cdll.ftrl_compact_analyze.argtypes = [
            _i32p,                            # feats
            ctypes.POINTER(ctypes.c_float),   # vals
            _i32p,                            # fields (nullable)
            ctypes.c_int64, ctypes.c_int64,   # n, f
            ctypes.c_int32,                   # sentinel
            _i32p, _i32p,                     # out_lo, out_hi
            ctypes.c_int32,                   # n_threads
        ]
        cdll.ftrl_compact_encode.restype = None
        cdll.ftrl_compact_encode.argtypes = [
            _i32p,                            # feats
            ctypes.POINTER(ctypes.c_float),   # vals
            _i32p,                            # fields (nullable)
            ctypes.c_int64, ctypes.c_int64,   # n, f
            ctypes.c_int32,                   # sentinel
            _i32p,                            # lo
            ctypes.POINTER(ctypes.c_uint16),  # out_feats_u16 (nullable)
            ctypes.POINTER(ctypes.c_int8),    # out_vals_i8 (nullable)
            ctypes.POINTER(ctypes.c_uint16),  # out_vals_bf16 (nullable)
            ctypes.POINTER(ctypes.c_int8),    # out_fields_i8 (nullable)
            ctypes.c_int32,                   # n_threads
        ]
        _lib = cdll
        return _lib


# ftrl_compact_analyze fact bits (keep in sync with parser.cpp)
HAS_PAD = 1
ALL_ONES = 4
VALS_I8 = 8
VALS_BF16 = 16
FIELDS_IOTA = 32
# decision bits added by compact_batch below
DELTA = 2


def compact_batch(feats, vals, fields, sentinel: int, try_delta: bool,
                  n_threads: int, fields_i8_ok: bool = True):
    """Native fused batch compaction: one GIL-released analyze pass, the
    encoding decisions (mirroring train.py::_compact's numpy logic exactly),
    then one GIL-released encode pass writing ONLY the chosen outputs.

    feats/vals (and fields, or None) are C-contiguous [n, F] int32/float32
    arrays.  Returns (flags, feats_u16, base, vals_i8, vals_bf16,
    fields_i8) — array entries are None unless their flag bit is set
    (fields_i8 is written whenever fields was passed).  Returns None when
    the native library is unavailable or inputs don't qualify; the caller
    falls back to the numpy path."""
    import numpy as np

    cdll = lib()
    if cdll is None:
        return None
    if (
        feats.dtype != np.int32
        or vals.dtype != np.float32
        or not feats.flags.c_contiguous
        or not vals.flags.c_contiguous
        or (fields is not None
            and (fields.dtype != np.int32 or not fields.flags.c_contiguous))
    ):
        return None
    n, f = feats.shape
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lo = np.empty((f,), np.int32)
    hi = np.empty((f,), np.int32)
    facts = cdll.ftrl_compact_analyze(
        feats.ctypes.data_as(i32p), vals.ctypes.data_as(f32p),
        fields.ctypes.data_as(i32p) if fields is not None else None,
        n, f, sentinel, lo.ctypes.data_as(i32p), hi.ctypes.data_as(i32p),
        n_threads,
    )
    has_pad = bool(facts & HAS_PAD)
    # decisions — byte-for-byte the numpy _compact's policy
    delta = bool(try_delta) and bool(
        ((hi.astype(np.int64) - lo) <= 65534).all()
    )
    ones_marker = bool(facts & ALL_ONES) and not has_pad
    write_i8 = not ones_marker and bool(facts & VALS_I8)
    write_bf16 = not ones_marker and not write_i8 and bool(facts & VALS_BF16)
    iota_marker = (
        fields is not None and bool(facts & FIELDS_IOTA) and not has_pad
    )
    flags = facts & HAS_PAD
    if delta:
        flags |= DELTA
    if ones_marker:
        flags |= ALL_ONES
    if write_i8:
        flags |= VALS_I8
    if write_bf16:
        flags |= VALS_BF16
    if iota_marker:
        flags |= FIELDS_IOTA
    feats_u16 = np.empty((n, f), np.uint16) if delta else None
    vals_i8 = np.empty((n, f), np.int8) if write_i8 else None
    vals_bf16 = np.empty((n, f), np.uint16) if write_bf16 else None
    fields_i8 = (
        np.empty((n, f), np.int8)
        if fields is not None and fields_i8_ok and not iota_marker
        else None
    )
    if delta or write_i8 or write_bf16 or fields_i8 is not None:
        cdll.ftrl_compact_encode(
            feats.ctypes.data_as(i32p), vals.ctypes.data_as(f32p),
            fields.ctypes.data_as(i32p) if fields is not None else None,
            n, f, sentinel, lo.ctypes.data_as(i32p),
            feats_u16.ctypes.data_as(u16p) if delta else None,
            vals_i8.ctypes.data_as(i8p) if write_i8 else None,
            vals_bf16.ctypes.data_as(u16p) if write_bf16 else None,
            fields_i8.ctypes.data_as(i8p) if fields_i8 is not None else None,
            n_threads,
        )
    return flags, feats_u16, lo, vals_i8, vals_bf16, fields_i8
