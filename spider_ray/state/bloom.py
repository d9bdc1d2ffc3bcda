"""Vectorized Bloom filter over int64 key hashes (numpy bit array).

Used as the cheap negative pre-filter in front of the cuckoo filter inside
each URL-seen shard (BASELINE.json north_star: "sharded cuckoo-filter
URL-seen set (with bloom pre-filter)").  A bloom "no" is authoritative
(never a false negative); a "maybe" falls through to the cuckoo / exact
layers.

All operations take numpy int64 arrays (already-hashed keys from
spider_ray.common.hashing) and are fully vectorized — no per-row Python in
the seen-check hot path.
"""

from __future__ import annotations

import math

import numpy as np

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + _GOLD).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(64, int(capacity))
        m = int(-capacity * math.log(fp_rate) / (math.log(2) ** 2))
        self.m = np.uint64(max(512, m))
        self.k = max(1, int(round((int(self.m) / capacity) * math.log(2))))
        self.bits = np.zeros((int(self.m) + 7) // 8, dtype=np.uint8)
        self.count = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch-Mitzenmacher)."""
        h = hashes.astype(np.uint64)
        h1 = _splitmix64(h)
        h2 = _splitmix64(h ^ _GOLD) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % self.m

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(np.asarray(hashes)).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
        self.count += len(hashes)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean mask: True = maybe present, False = definitely absent."""
        hashes = np.asarray(hashes)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        return ((byte & bit) != 0).all(axis=1)

    def nbytes(self) -> int:
        return self.bits.nbytes
