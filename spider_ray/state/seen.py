"""Sharded URL-seen set: one Ray actor per shard, each holding a bloom
pre-filter + cuckoo filter + exact resolver.

This is the engine's only cross-epoch mutable state (the reference's
analogue is the Mongo session-context store + JetStream publisher-dedup
window, `pkg/spider/storage_workflow_mongodb.go:335-374`,
`pkg/spider/nats.go:161` — which is *not* exact; ours is).

Check/admit protocol is TWO-PHASE per epoch so Ray task retries stay safe
(at-least-once tasks + idempotent state transitions = effectively-once,
SURVEY.md §4.1):

  phase 1  `check(hashes)`   pure read -> "is new" mask.  Candidate urls
           are pre-deduplicated per epoch (groupby max-priority) so no
           within-epoch duplicate can be double-admitted.
  phase 2  `add(hashes)`     idempotent insert of the final admitted set,
           called once per shard after the epoch's admission is decided.

Layered check (never a false negative, false positives resolved):
  bloom says NO               -> definitely new (vectorized fast path)
  else cuckoo says NO and not in insert-overflow -> new
  else                        -> consult exact layer (in-memory int64 set
                                 at sandbox scale; per-partition sorted
                                 Parquet read-back at 10^10 scale — see
                                 capacity notes in state/cuckoo.py)

Identity caveat at the target scale: "exact" means exact over the 63-bit
url HASH (hash64(canonical_url)) — the layers above resolve their own
false positives, but two distinct urls colliding in hash64 are
indistinguishable.  Expected collisions by the birthday bound are
n²/2^64: ~0 at sandbox scale, but ≈5 spurious "seen" verdicts at 10^10
urls.  If even that is unacceptable, the 10^10-scale exact layer (the
per-partition sorted-Parquet read-back) must key on canonical_url and
compare the string on hash hits — the admitted/ checkpoint already
stores canonical_url alongside url_hash, so that path needs no schema
change.  The sandbox engine + oracle both key on hash64, so conformance
is unaffected either way.
"""

from __future__ import annotations

import numpy as np

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


class SeenShardState:
    """Plain-Python shard state (also used directly in unit tests)."""

    def __init__(self, capacity: int = 1 << 16, fp_rate: float = 0.01):
        self.capacity = capacity
        self.bloom = BloomFilter(capacity, fp_rate)
        self.cuckoo = CuckooFilter(capacity)
        self.exact: set[int] = set()
        self.overflow: set[int] = set()  # cuckoo insert failures (rare)

    def check(self, hashes: np.ndarray) -> np.ndarray:
        """True = NEW (not seen). Pure read."""
        hashes = np.asarray(hashes, dtype=np.int64)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        maybe = self.bloom.contains_many(hashes)          # False -> new
        new = ~maybe
        if maybe.any():
            idx = np.nonzero(maybe)[0]
            sub = hashes[idx]
            cuckoo_hit = self.cuckoo.contains_many(sub)
            for j, (h, hit) in enumerate(zip(sub.tolist(), cuckoo_hit.tolist())):
                if hit or h in self.overflow:
                    if h not in self.exact:   # fp resolution (exact layer)
                        new[idx[j]] = True
                else:
                    new[idx[j]] = True        # bloom fp, cuckoo authoritative no
        return new

    def add(self, hashes: np.ndarray) -> int:
        """Idempotent insert; returns number actually new to this shard."""
        hashes = np.asarray(hashes, dtype=np.int64)
        fresh = [h for h in hashes.tolist() if h not in self.exact]
        if not fresh:
            return 0
        arr = np.asarray(fresh, dtype=np.int64)
        self.bloom.add_many(arr)
        failed = self.cuckoo.add_many(arr)
        if failed:
            # keep exactness: failed inserts tracked so check() never
            # false-negatives on them
            tail = self.cuckoo.contains_many(arr)
            self.overflow.update(np.asarray(fresh)[~tail].tolist())
        self.exact.update(fresh)
        return len(fresh)

    def size(self) -> int:
        return len(self.exact)

    def dump(self) -> np.ndarray:
        """All hashes in this shard (sorted) — for checkpoint/debug."""
        return np.sort(np.fromiter(self.exact, dtype=np.int64, count=len(self.exact)))


def make_seen_shards(num_shards: int, capacity_per_shard: int = 1 << 16):
    """Create the shard actors. Caller owns the handles (and their lifetime)."""
    import ray

    # num_cpus=0: shard ops are sub-millisecond vectorized membership
    # checks; reserving CPU slices for them starves the data-plane tasks
    # on small clusters (the shard COUNT bounds concurrency, not CPUs)
    shard_cls = ray.remote(num_cpus=0)(SeenShardState)
    return [shard_cls.remote(capacity_per_shard) for _ in range(num_shards)]


class SeenChecker:
    """Driver-side facade: route hash arrays to shard actors by h % S."""

    def __init__(self, shards):
        self.shards = shards
        self.s = len(shards)

    def _route(self, hashes: np.ndarray):
        sid = hashes % self.s
        for j in range(self.s):
            m = sid == j
            if m.any():
                yield j, np.nonzero(m)[0], hashes[m]

    def check(self, hashes: np.ndarray) -> np.ndarray:
        import ray

        hashes = np.asarray(hashes, dtype=np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        parts = list(self._route(hashes))
        futs = [self.shards[j].check.remote(h) for j, _, h in parts]
        for (j, idx, _), res in zip(parts, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, hashes: np.ndarray) -> int:
        import ray

        hashes = np.asarray(hashes, dtype=np.int64)
        futs = [self.shards[j].add.remote(h) for j, _, h in self._route(hashes)]
        return sum(ray.get(futs))

    def total(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))
