"""Stable 64-bit hashing used for URL identity, partitioning, and the
bloom/cuckoo filters.

Must be stable across processes, Python versions and runs (so built-in
``hash()`` is out — PYTHONHASHSEED).  blake2b with an 8-byte digest is
stdlib, keyed-off, and fast (C implementation).

Deterministic ids replace the reference's UUIDv7 session/task ids
(`pkg/spider/workflow.go:113-119,143-149`): UUIDv7 is time-ordered, i.e.
ordering-by-id == ordering-by-creation; our ids are pure functions of
(epoch, partition, seq) which preserves that property reproducibly
(SURVEY.md §1.3).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

_MASK63 = (1 << 63) - 1


def hash64(s: str | bytes) -> int:
    """Stable unsigned-ish 64-bit hash (top bit cleared so it also fits
    int64 columns without overflow surprises)."""
    if isinstance(s, str):
        s = s.encode("utf-8", errors="replace")
    return int.from_bytes(blake2b(s, digest_size=8).digest(), "little") & _MASK63


def hash64_many(strings) -> np.ndarray:
    """Vectorized-ish hash64 over an iterable of str — returns int64 array.

    blake2b runs in C; the Python loop is ~1µs/row which is fine for the
    frontier hot path (hashing is a tiny fraction of fetch+extract cost).
    """
    h = blake2b  # local bind
    out = np.fromiter(
        (
            int.from_bytes(h(s.encode("utf-8", "replace"), digest_size=8).digest(), "little")
            & _MASK63
            for s in strings
        ),
        dtype=np.int64,
    )
    return out


def part_of(url_hash: int | np.ndarray, num_parts: int):
    """Partition id of a url hash — the ONE partitioning key reused across
    frontier storage, seen-set shards, and the pages fetch index (uniform
    by construction, so host skew never concentrates frontier storage)."""
    return url_hash % num_parts


def task_id(epoch: int, part: int, seq: int) -> str:
    """Deterministic replacement for the reference's per-hop UUIDv7 task ids."""
    return f"t{epoch:04d}-{part:04d}-{seq:08d}"
