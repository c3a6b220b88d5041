"""Corpus file I/O.

The reference slurps whole files (utils/read_file.zig:3-13). Here reading is
mmap-backed for large corpora, can concatenate multiple shards, and exposes
per-host slicing for multi-host data-parallel loading (each host reads only
its contiguous byte range). A C++ fast path (native/fastio) is used when
built; behavior is identical either way.
"""

from __future__ import annotations

import mmap
import os
import pathlib
from typing import List, Sequence, Tuple


def read_file(path: str | os.PathLike) -> bytes:
    """Whole-file read (reference readFile analogue)."""
    try:
        from ..native import fastio

        if fastio.available():
            return fastio.read_file(str(path))
    except ImportError:
        pass
    return pathlib.Path(path).read_bytes()


def read_file_mmap(path: str | os.PathLike) -> memoryview:
    """Zero-copy mmap view of a corpus file (large-corpus path)."""
    f = open(path, "rb")
    try:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    finally:
        f.close()
    return memoryview(mm)


def count_text_size(path: str | os.PathLike) -> int:
    """Size of a corpus file in bytes without reading it — the analogue of
    the reference's comptime ``countTextSize`` (utils/count_text_size.zig:6-9,
    unused there; here it sizes capacity planning before upload)."""
    return os.path.getsize(path)


def host_slice(total_size: int, host_id: int, host_count: int) -> Tuple[int, int]:
    """Contiguous byte range [start, end) owned by ``host_id`` of
    ``host_count`` — multi-host corpora are split exactly like device shards
    so the global sequence is the concatenation of host slices."""
    per = (total_size + host_count - 1) // host_count
    start = min(host_id * per, total_size)
    return start, min(start + per, total_size)


def read_range(paths: Sequence[str | os.PathLike], start: int, end: int) -> bytes:
    """Read the byte range [start, end) of the logical concatenation of
    ``paths`` — the loading primitive behind per-device corpus sharding
    (each device's slice is read directly from disk, nothing else)."""
    out: List[bytes] = []
    offset = 0
    for p in paths:
        size = os.path.getsize(p)
        lo, hi = max(start - offset, 0), min(end - offset, size)
        if lo < hi:
            with open(p, "rb") as f:
                f.seek(lo)
                out.append(f.read(hi - lo))
        offset += size
    return b"".join(out)


def read_corpus(paths: Sequence[str | os.PathLike],
                host_id: int = 0, host_count: int = 1) -> bytes:
    """Read (this host's slice of) a corpus made of one or more files,
    concatenated in argument order."""
    sizes = [os.path.getsize(p) for p in paths]
    total = sum(sizes)
    start, end = host_slice(total, host_id, host_count)
    out: List[bytes] = []
    offset = 0
    for p, size in zip(paths, sizes):
        lo, hi = max(start - offset, 0), min(end - offset, size)
        if lo < hi:
            with open(p, "rb") as f:
                f.seek(lo)
                out.append(f.read(hi - lo))
        offset += size
    return b"".join(out)
