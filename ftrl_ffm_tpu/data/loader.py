"""Offline in-memory dataset loading + fixed-shape batch iteration.

The reference's offline Reader splits the file into byte ranges aligned to
line boundaries and parses them on N async tasks
(reference: src/data/reader.cpp:22-91).  Here the file is split the same way
and parsed by a thread pool of vectorized-numpy (or C++) chunk parsers, then
concatenated into flat arrays ready for device feeding.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterator, NamedTuple, Optional

import numpy as np

from ftrl_ffm_tpu.data.parser import ParsedChunk, parse_text, sniff_max_nnz


class ArrayDataset(NamedTuple):
    fields: np.ndarray  # [N, F] int32
    feats: np.ndarray   # [N, F] int32
    vals: np.ndarray    # [N, F] float32
    y: np.ndarray       # [N] float32

    @property
    def n(self) -> int:
        return self.y.shape[0]


def _partition_offsets(path: str, n_parts: int) -> list[tuple[int, int]]:
    """Byte ranges aligned to line boundaries
    (reference: src/data/reader.cpp:22-48, get_data_partition)."""
    size = os.path.getsize(path)
    n_parts = max(1, n_parts)
    approx = [size * i // n_parts for i in range(n_parts + 1)]
    cuts = [0]
    with open(path, "rb") as f:
        for i in range(1, n_parts):
            f.seek(approx[i])
            f.readline()  # advance to next line boundary
            cuts.append(min(f.tell(), size))
    cuts.append(size)
    cuts = sorted(set(cuts))
    return [(a, b) for a, b in zip(cuts[:-1], cuts[1:]) if b > a]


def load_file(
    path: str,
    file_type: str,
    max_nnz: int = 0,
    n_feats: int = 1 << 31 - 1,
    n_fields: int = 1 << 31 - 1,
    n_workers: int = 1,
) -> ArrayDataset:
    """Parse a whole libsvm/libffm file into padded arrays, in parallel."""
    if max_nnz <= 0:
        max_nnz = sniff_max_nnz(path, file_type)
    parts = _partition_offsets(path, n_workers)

    def parse_range(rng: tuple[int, int]) -> ParsedChunk:
        with open(path, "rb") as f:
            f.seek(rng[0])
            raw = f.read(rng[1] - rng[0])
        return parse_text(raw.decode(), file_type, max_nnz, n_feats, n_fields)

    if len(parts) == 1:
        chunks = [parse_range(parts[0])]
    else:
        with cf.ThreadPoolExecutor(max_workers=n_workers) as pool:
            chunks = list(pool.map(parse_range, parts))

    return ArrayDataset(
        fields=np.concatenate([c.fields for c in chunks]),
        feats=np.concatenate([c.feats for c in chunks]),
        vals=np.concatenate([c.vals for c in chunks]),
        y=np.concatenate([c.y for c in chunks]),
    )


def batch_iterator(
    ds: ArrayDataset,
    batch_size: int,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    sentinel: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (fields, feats, vals, y, sample_w) numpy batches of fixed size.

    The batch remainder is padded with inert samples (sample_w = 0, value 0,
    feat id = sentinel), so every step has the same shape and jit compiles
    once.  Shuffling reproduces the reference's offline per-epoch index
    shuffle (reference: src/task/ftrl_offline.cpp:69-71).
    """
    n = ds.n
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    f = ds.feats.shape[1]
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        b = idx.shape[0]
        fields = ds.fields[idx]
        feats = ds.feats[idx]
        vals = ds.vals[idx]
        y = ds.y[idx]
        sample_w = np.ones(b, dtype=np.float32)
        if b < batch_size:
            pad = batch_size - b
            fields = np.concatenate([fields, np.zeros((pad, f), np.int32)])
            feats = np.concatenate([feats, np.full((pad, f), sentinel, np.int32)])
            vals = np.concatenate([vals, np.zeros((pad, f), np.float32)])
            y = np.concatenate([y, np.zeros(pad, np.float32)])
            sample_w = np.concatenate([sample_w, np.zeros(pad, np.float32)])
        yield fields, feats, vals, y, sample_w
