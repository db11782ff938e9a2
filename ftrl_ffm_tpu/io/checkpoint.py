"""Model serialization.

Two formats:

1. **Full checkpoints** (new capability): the entire optimizer state —
   bias/linear/factor (n, z) accumulator pairs plus the factor init table and
   step counter — zstd-compressed with a JSON header.  The reference only
   serializes weights, so a loaded reference model cannot faithfully resume
   training (SURVEY §5); full checkpoints can.

2. **Reference-compatible weight blobs**: a raw little-endian float32 array
   [bias, lin_w..., vec_w row-major...] zstd-compressed with no framing —
   byte-compatible with the reference's compress_weights / decompress_weights
   (reference: src/compression/compress.cpp:15-51, layout from
   src/model/ffm.cpp:138-159 and src/model/lr.cpp:26-39), so models can be
   exchanged with the C++ binary in both directions.  The FFM plain-text
   format (src/model/ffm.cpp:161-200) is also supported.
"""

from __future__ import annotations

import json
import struct

import jax.numpy as jnp
import ml_dtypes  # registers bfloat16 with numpy for checkpoint round-trips
import numpy as np
import zstandard

from ftrl_ffm_tpu.models.base import ModelState

MAGIC = b"FTRLTPU1"


# ---------------------------------------------------------------- checkpoints
def save_checkpoint(path: str, state: ModelState, level: int = 3, extra: dict | None = None):
    arrays = {}
    meta = {"fields": [], "extra": extra or {}}
    for name, val in state._asdict().items():
        if val is None:
            meta["fields"].append({"name": name, "none": True})
            continue
        arr = np.asarray(val)
        meta["fields"].append(
            {"name": name, "dtype": str(arr.dtype), "shape": list(arr.shape)}
        )
        arrays[name] = arr

    payload = b"".join(arrays[f["name"]].tobytes() for f in meta["fields"] if not f.get("none"))
    header = json.dumps(meta).encode()
    blob = MAGIC + struct.pack("<I", len(header)) + header + payload
    comp = zstandard.ZstdCompressor(level=level).compress(blob)
    with open(path, "wb") as f:
        f.write(comp)


def load_checkpoint(path: str) -> tuple[ModelState, dict]:
    with open(path, "rb") as f:
        blob = zstandard.ZstdDecompressor().decompress(f.read())
    if blob[:8] != MAGIC:
        raise ValueError(f"{path}: not a ftrl_ffm_tpu checkpoint")
    hlen = struct.unpack("<I", blob[8:12])[0]
    meta = json.loads(blob[12 : 12 + hlen])
    off = 12 + hlen
    kwargs = {}
    for fld in meta["fields"]:
        if fld.get("none"):
            kwargs[fld["name"]] = None
            continue
        dt = np.dtype(fld["dtype"])
        count = int(np.prod(fld["shape"])) if fld["shape"] else 1
        nbytes = dt.itemsize * count
        arr = np.frombuffer(blob[off : off + nbytes], dtype=dt).reshape(fld["shape"])
        off += nbytes
        kwargs[fld["name"]] = jnp.asarray(arr)
    return ModelState(**kwargs), meta["extra"]


# ------------------------------------------- reference-compatible weight blob
def export_reference_model(path: str, bias, lin_w, vec_w=None, level: int = 3):
    """Write [bias, lin_w..., vec_w...] float32, zstd, no framing — readable by
    the reference's load_compressed_model."""
    parts = [np.array([bias], "<f4"), np.asarray(lin_w, "<f4").ravel()]
    if vec_w is not None:
        parts.append(np.asarray(vec_w, "<f4").ravel())
    raw = np.concatenate(parts).tobytes()
    with open(path, "wb") as f:
        f.write(zstandard.ZstdCompressor(level=level).compress(raw))
    print(f"compress file size: {len(raw)} -> {os_size(path)}")


def os_size(path: str) -> int:
    import os

    return os.path.getsize(path)


def import_reference_model(path: str, n_feats: int, row_width: int = 0):
    """Read a reference compressed model -> (bias, lin_w[, vec_w])."""
    with open(path, "rb") as f:
        raw = zstandard.ZstdDecompressor().decompress(f.read())
    flat = np.frombuffer(raw, "<f4")
    bias = float(flat[0])
    lin_w = flat[1 : 1 + n_feats].copy()
    vec_w = None
    if row_width:
        vec_w = flat[1 + n_feats : 1 + n_feats + n_feats * row_width].reshape(
            n_feats, row_width
        ).copy()
    return bias, lin_w, vec_w


# --------------------------------------------------- FFM plain-text format
def export_reference_text_model(path: str, bias, lin_w, vec_w):
    """FFM text layout: bias line, one lin_w per line, one factor row per line
    (reference: src/model/ffm.cpp:161-177)."""
    with open(path, "w") as f:
        f.write(f"{float(bias)}\n")
        for w in np.asarray(lin_w).ravel():
            f.write(f"{float(w)}\n")
        for row in np.asarray(vec_w):
            f.write(" ".join(str(float(x)) for x in row) + "\n")


def import_reference_text_model(path: str, n_feats: int, row_width: int):
    with open(path, "r") as f:
        bias = float(f.readline())
        lin_w = np.array([float(f.readline()) for _ in range(n_feats)], np.float32)
        vec_w = np.stack(
            [
                np.array(f.readline().split(), np.float32)[:row_width]
                for _ in range(n_feats)
            ]
        )
    return bias, lin_w, vec_w
