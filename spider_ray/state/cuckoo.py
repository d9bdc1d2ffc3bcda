"""Cuckoo filter over int64 key hashes (Fan et al., CoNEXT'14 — public
algorithm): 4-way buckets of 16-bit fingerprints, partial-key cuckoo
hashing with bounded eviction.

Role in the seen-set shard (spider_ray.state.seen): the approximate
membership authority at 10^10-URL scale.  Unlike the bloom pre-filter it
supports DELETE (not needed here) and has ~3x better space at equal fp
for this load factor regime.  Lookups are vectorized; inserts are a
Python loop but run only over *admitted* urls (new per epoch), not over
every candidate.

Capacity planning at 10^10 urls (SURVEY.md §7.4): 16-bit fingerprints at
95% load → ~2.4 bytes/key → 10^10 keys ≈ 24 GB total, sharded over
256 shards ≈ 94 MB per shard actor.  False-positive rate ≈ 2*4/2^16 ≈
0.012%; cuckoo-positives are resolved against the exact per-shard store
(in-memory at sandbox scale, per-partition sorted Parquet at full scale).
"""

from __future__ import annotations

import numpy as np

from .bloom import _splitmix64

_BUCKET = 4
_MAX_KICKS = 500
_CHUNK = 131072  # add_many internal chunk; see method docstring
_FP_SEED = np.uint64(0xA076_1D64_78BD_642F)


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        capacity = max(64, int(capacity))
        nb = 1
        while nb * _BUCKET < capacity / 0.95:
            nb <<= 1  # power-of-two buckets -> cheap masking, valid i1^h(fp)
        self.nb = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, _BUCKET), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)  # eviction choice only
        # victim stash: fingerprints orphaned by a failed eviction chain.
        # Without it, a failed insert can LOSE a previously inserted key
        # (the last evicted victim never lands) -> false negatives.
        self._victim_i: list[int] = []
        self._victim_fp: list[int] = []

    # -- fingerprints / bucket indexing ------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (_splitmix64(h.astype(np.uint64) ^ _FP_SEED) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (_splitmix64(h.astype(np.uint64)) & self.mask).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        fph = _splitmix64(fp.astype(np.uint64))
        return ((i.astype(np.uint64) ^ fph) & self.mask).astype(np.int64)

    # -- ops ----------------------------------------------------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(hashes)
        i1 = self._i1(hashes)
        i2 = self._alt(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        found = in1 | in2
        if self._victim_fp:
            vi = np.asarray(self._victim_i, dtype=np.int64)
            vfp = np.asarray(self._victim_fp, dtype=np.uint16)
            # a victim (iv, fpv) matches a key iff fpv == fp and iv is one of
            # the key's two candidate buckets
            m = (fp[:, None] == vfp[None, :]) & (
                (i1[:, None] == vi[None, :]) | (i2[:, None] == vi[None, :])
            )
            found |= m.any(axis=1)
        return found

    def add_many(self, hashes: np.ndarray) -> int:
        """Insert all (assumed not present); returns number that failed
        (table effectively full — callers treat failure as 'rely on exact
        layer', never as data loss).

        Vectorized: two sorted free-slot placement rounds (i1 then i2)
        place the vast majority of a batch without touching Python; only
        keys whose BOTH buckets are full fall back to the per-row kick
        loop.  At typical shard load this cut bulk admission from ~27µs
        to <1µs per key (the resume rebuild's dominant term)."""
        hashes = np.asarray(hashes)
        if len(hashes) == 0:
            return 0
        # internal chunking: each placement round gathers bucket state ONCE,
        # so a giant batch sees stale free-counts for long same-bucket runs
        # and spills thousands of rows to the Python fallback.  128k chunks
        # keep runs short (measured: 1.8M keys 6.1s -> 0.8s).
        if len(hashes) > _CHUNK:
            return sum(self.add_many(hashes[i:i + _CHUNK])
                       for i in range(0, len(hashes), _CHUNK))
        fps = self._fp(hashes)
        i1s = self._i1(hashes)
        i2s = self._alt(i1s, fps)
        remaining = np.arange(len(hashes))
        for cand in (i1s, i2s):
            if not len(remaining):
                break
            placed = self._place_round(fps[remaining], cand[remaining])
            remaining = remaining[~placed]
        failed = 0
        for idx in remaining:  # rare: both candidate buckets full
            if not self._insert_one(int(fps[idx]), int(i1s[idx])):
                failed += 1
        return failed

    def _place_round(self, fps: np.ndarray, buckets: np.ndarray) -> np.ndarray:
        """One vectorized placement round: write each fp into a free slot
        of its target bucket where capacity allows (ties within a batch
        resolved by stable rank within the bucket run).  Returns the
        placed mask, row-aligned with the inputs."""
        n = len(fps)
        order = np.argsort(buckets, kind="stable")
        b_sorted = buckets[order]
        new_run = np.r_[True, b_sorted[1:] != b_sorted[:-1]]
        starts = np.nonzero(new_run)[0]
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(n) - starts[run_id]
        uniq_b = b_sorted[starts]
        rows = self.table[uniq_b]               # (U, 4) gather
        empty_mask = rows == 0
        free = empty_mask.sum(axis=1)
        admit = rank < free[run_id]
        # the rank-th empty slot of the bucket (empties sorted first)
        slot_order = np.argsort(~empty_mask, axis=1, kind="stable")
        slots = slot_order[run_id, np.minimum(rank, _BUCKET - 1)]
        self.table[b_sorted[admit], slots[admit]] = fps[order][admit]
        self.count += int(admit.sum())
        placed = np.zeros(n, dtype=bool)
        placed[order[admit]] = True
        return placed

    def _insert_one(self, fp: int, i1: int) -> bool:
        i2 = int(self._alt(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        i = i1 if self._rng.integers(2) else i2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_BUCKET))
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            i = int(self._alt(np.array([i]), np.array([cur], dtype=np.uint16))[0])
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        # kicks exhausted: stash the orphaned victim so no existing key is lost
        self._victim_i.append(i)
        self._victim_fp.append(cur)
        self.count += 1
        return False

    def nbytes(self) -> int:
        return self.table.nbytes
