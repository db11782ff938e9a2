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
_TABLES = ("lin_n", "lin_z", "lin_w", "vec_n", "vec_z", "vec_w")
CHUNK_BYTES = 64 << 20  # max host-resident bytes per table while streaming


def _chunk_rows(shape, itemsize) -> int:
    row_bytes = itemsize * (int(np.prod(shape[1:])) if len(shape) > 1 else 1)
    return max(1, CHUNK_BYTES // max(1, row_bytes))


def _logical_row_chunks(val, n_shards: int, n_feats: int):
    """Yield (logical_shape, chunk iterator) for one table.

    Sharded tables live in physical (modulo-interleaved, padded) row order
    across devices (parallel/mesh.py::interleave_ids); each chunk is gathered
    on device in logical id order and pulled to host one slab at a time — the
    coordinator never materializes a whole table (SURVEY §5: "sharded per
    host" checkpointing without a full-table host gather)."""
    arr_rows = val.shape[0]
    rows = min(n_feats, arr_rows) if n_shards > 1 else arr_rows
    shape = (rows,) + tuple(val.shape[1:])
    step = _chunk_rows(shape, np.dtype(str(val.dtype)).itemsize)

    def chunks():
        rl = arr_rows // n_shards
        for a in range(0, rows, step):
            b = min(rows, a + step)
            if n_shards == 1:
                yield np.asarray(val[a:b])
            else:
                ids = np.arange(a, b)
                phys = (ids % n_shards) * rl + ids // n_shards
                yield np.asarray(jnp.take(val, jnp.asarray(phys), axis=0))

    return shape, chunks


def save_checkpoint(
    path: str,
    state: ModelState,
    level: int = 3,
    extra: dict | None = None,
    n_shards: int = 1,
    n_feats: int = 0,
):
    """Stream a full-state checkpoint to zstd.

    Accepts single-device states directly, or mesh-sharded states via
    (n_shards, n_feats): tables are then de-interleaved to logical row order
    chunk-by-chunk on device, so peak host memory is one CHUNK_BYTES slab —
    not one table.  The on-disk format is identical either way (checkpoints
    are mesh-independent; resume on any mesh re-shards on load)."""
    meta = {"fields": [], "extra": extra or {}}
    writers = []
    for name, val in state._asdict().items():
        if val is None:
            meta["fields"].append({"name": name, "none": True})
            continue
        if name in _TABLES and val.ndim >= 1 and n_shards >= 1:
            shape, chunks = _logical_row_chunks(val, n_shards, n_feats or val.shape[0])
        else:
            arr = np.asarray(val)
            shape, chunks = arr.shape, (lambda a=arr: iter((a,)))
        meta["fields"].append(
            {"name": name, "dtype": str(np.dtype(str(val.dtype))), "shape": list(shape)}
        )
        writers.append(chunks)

    header = json.dumps(meta).encode()
    cctx = zstandard.ZstdCompressor(level=level)
    with open(path, "wb") as f, cctx.stream_writer(f) as zf:
        zf.write(MAGIC + struct.pack("<I", len(header)) + header)
        for chunks in writers:
            for chunk in chunks():
                zf.write(np.ascontiguousarray(chunk).tobytes())


def load_checkpoint(path: str) -> tuple[ModelState, dict]:
    """Stream-read a checkpoint: each table decompresses directly into its
    preallocated buffer (no whole-file decompressed copy)."""
    dctx = zstandard.ZstdDecompressor()
    with open(path, "rb") as f, dctx.stream_reader(f) as zf:
        head = zf.read(12)
        if head[:8] != MAGIC:
            raise ValueError(f"{path}: not a ftrl_ffm_tpu checkpoint")
        hlen = struct.unpack("<I", head[8:12])[0]
        meta = json.loads(zf.read(hlen))
        kwargs = {}
        for fld in meta["fields"]:
            if fld.get("none"):
                kwargs[fld["name"]] = None
                continue
            dt = np.dtype(fld["dtype"])
            arr = np.empty(tuple(fld["shape"]), dtype=dt)
            view = arr.reshape(-1).view(np.uint8)
            got = zf.readinto(view)
            while got < view.nbytes:
                n = zf.readinto(view[got:])
                if not n:
                    raise ValueError(f"{path}: truncated checkpoint")
                got += n
            # host numpy, not device arrays: the caller (Trainer init /
            # shard_state) decides placement — an eager device put here
            # wastes a full HBM round-trip on sharded resume and doubles
            # peak device-0 memory at 1M-row scale
            kwargs[fld["name"]] = arr
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
    import sys

    # stderr: stdout may be carrying the --predict_output - probability
    # stream (cli.py's one-probability-per-line contract)
    print(f"compress file size: {len(raw)} -> {os_size(path)}", file=sys.stderr)


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
