"""Online streaming input pipeline.

The reference's online mode is a producer thread pushing <=20000-line string
batches into a mutex/condvar queue drained by consumer threads
(reference: src/concurrent/pc_task.cpp:22-80, buf_size at
src/include/concurrent/pc_task.h:34-35).  The TPU-native equivalent: a host
producer thread reads + parses line chunks into padded numpy batches ahead of
the device, bounded by a queue (back-pressure), so parsing overlaps device
compute.  Each example is seen exactly once per epoch, in file order — same
guarantee as the reference's single-pass streaming.

`--cmd` stdin streaming (reference: src/concurrent/pc_task.cpp:41; the
training branch there is a TODO stub, src/task/ftrl_online.cpp:55-57) is
supported by passing a file object.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import IO, Iterator, Optional

import numpy as np

from ftrl_ffm_tpu.data.parser import parse_lines

CHUNK_LINES = 20000  # reference: src/include/concurrent/pc_task.h:34


class StreamReader:
    """Iterate fixed-shape batches over a text stream, producer-threaded."""

    def __init__(
        self,
        path_or_file: str | IO[str],
        file_type: str,
        batch_size: int,
        max_nnz: int,
        n_feats: int,
        n_fields: int,
        chunk_lines: int = CHUNK_LINES,
        prefetch: int = 4,
        log_every: int = 1_000_000,  # reference: pc_task.h:35 (log_num)
        n_parse_threads: int = 3,
        byte_range: Optional[tuple[int, int]] = None,
    ):
        self.path_or_file = path_or_file
        self.file_type = file_type
        self.batch_size = batch_size
        self.max_nnz = max_nnz
        self.n_feats = n_feats
        self.n_fields = n_fields
        self.chunk_lines = chunk_lines
        self.prefetch = prefetch
        self.log_every = log_every
        # multi-host: stream only this byte slice (line-aligned; see
        # data/loader.py::process_byte_range)
        if byte_range is not None and not isinstance(path_or_file, str):
            raise ValueError("byte_range requires a file path, not a stream")
        self.byte_range = byte_range
        # The C++ chunk parser releases the GIL, so a small thread pool gives
        # real parse parallelism — the reference's N consumer threads
        # (src/concurrent/pc_task.cpp:57-80) reborn as a parse pool feeding
        # one device stream.
        self.n_parse_threads = max(1, n_parse_threads)

    def _open(self) -> IO[str]:
        if isinstance(self.path_or_file, str):
            return open(self.path_or_file, "r")
        return self.path_or_file  # e.g. sys.stdin for --cmd mode

    def _lines(self, fh: IO[str]):
        """Lines of the stream, restricted to self.byte_range if set.

        Ranged reads go through a separate binary handle with 8 MB block
        reads (text-mode tell()-per-line is pathologically slow)."""
        if self.byte_range is None:
            yield from fh
            return
        lo, hi = self.byte_range
        if hi <= lo:
            return
        with open(self.path_or_file, "rb") as fb:
            fb.seek(lo)
            remaining = hi - lo
            buf = b""
            while remaining > 0:
                block = fb.read(min(8 << 20, remaining))
                if not block:
                    break
                remaining -= len(block)
                buf += block
                parts = buf.split(b"\n")
                buf = parts.pop()
                for p in parts:
                    yield p.decode() + "\n"
            if buf:
                yield buf.decode()

    def batches(self) -> Iterator[tuple]:
        """One epoch of (fields, feats, vals, y, sample_w) batches."""
        # Producer thread reads line chunks and submits them to a parse pool;
        # chunk futures are queued in order so batch order == file order (the
        # reference's "each example seen once per epoch, in stream order").
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        err: list[BaseException] = []
        pool = cf.ThreadPoolExecutor(max_workers=self.n_parse_threads)

        def parse(lines):
            return parse_lines(
                lines, self.file_type, self.max_nnz, self.n_feats, self.n_fields
            )

        def produce():
            try:
                fh = self._open()
                lines: list[str] = []
                seen = 0
                for ln in self._lines(fh):
                    if not ln.strip():
                        continue
                    lines.append(ln)
                    if len(lines) >= self.chunk_lines:
                        q.put(pool.submit(parse, lines))
                        prev, seen = seen, seen + len(lines)
                        # threshold-crossing check: fires for any chunk_lines,
                        # not only when it divides log_every
                        if self.log_every and seen // self.log_every > prev // self.log_every:
                            print(f"processing {seen} examples")
                        lines = []
                if lines:
                    q.put(pool.submit(parse, lines))
                if isinstance(self.path_or_file, str):
                    fh.close()
            except BaseException as e:  # surfaced to the consumer
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        carry: Optional[tuple] = None  # leftover rows from previous chunk
        while True:
            fut = q.get()
            if fut is None:
                break
            chunk = fut.result()
            arrays = (chunk.fields, chunk.feats, chunk.vals, chunk.y)
            if carry is not None:
                arrays = tuple(
                    np.concatenate([c, a]) for c, a in zip(carry, arrays)
                )
            n = arrays[3].shape[0]
            full = (n // self.batch_size) * self.batch_size
            for s in range(0, full, self.batch_size):
                fields, feats, vals, y = (a[s : s + self.batch_size] for a in arrays)
                yield fields, feats, vals, y, np.ones(self.batch_size, np.float32)
            carry = tuple(a[full:] for a in arrays) if full < n else None
        t.join()
        pool.shutdown(wait=False)
        if err:
            raise err[0]
        if carry is not None and carry[3].shape[0]:
            fields, feats, vals, y = carry
            b = y.shape[0]
            pad = self.batch_size - b
            fmax = fields.shape[1]
            yield (
                np.concatenate([fields, np.zeros((pad, fmax), np.int32)]),
                np.concatenate(
                    [feats, np.full((pad, fmax), self.n_feats, np.int32)]
                ),
                np.concatenate([vals, np.zeros((pad, fmax), np.float32)]),
                np.concatenate([y, np.zeros(pad, np.float32)]),
                np.concatenate(
                    [np.ones(b, np.float32), np.zeros(pad, np.float32)]
                ),
            )
