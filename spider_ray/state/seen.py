"""Sharded URL-seen set: one Ray actor per shard, each holding a bloom
pre-filter + cuckoo filter + a SPILLABLE exact resolver.

This is the engine's only cross-epoch mutable state (the reference's
analogue is the Mongo session-context store + JetStream publisher-dedup
window, `pkg/spider/storage_workflow_mongodb.go:335-374`,
`pkg/spider/nats.go:161` — which is *not* exact; ours is).

Check/admit protocol is TWO-PHASE per epoch so Ray task retries stay safe
(at-least-once tasks + idempotent state transitions = effectively-once,
SURVEY.md §4.1):

  phase 1  `check(hashes, urls)`  pure read -> "is new" mask.  Candidate
           urls are pre-deduplicated per epoch (groupby max-priority) so
           no within-epoch duplicate can be double-admitted.
  phase 2  `add(hashes, urls)`    idempotent insert of the final admitted
           set, pushed per-partition by tasks that route straight to the
           owning shard actor (engine._admit_frontier_part) — the driver
           never sees the admitted hashes.

Layered check (never a false negative, false positives resolved):
  bloom says NO               -> definitely new (vectorized fast path)
  else cuckoo says NO and not in insert-overflow -> new
  else                        -> consult the exact layer

The exact layer is LOG-STRUCTURED so a shard's resident memory stays
bounded at any frontier scale (the Mercator-style batched URL-seen test):

  pending  recent admits, bounded chunks      (memory, np.isin membership)
  mem      one sorted int64 array + urls      (memory, searchsorted;
           bounded by mem_capacity)
  runs     sorted (url_hash, canonical_url) Parquet runs on disk; only
           per-row-group [min,max] fences stay in memory, and a probe
           reads ONLY the row groups whose fences cover it.  Runs are
           compacted (k-way merged) when their count exceeds run_target,
           so probe cost stays O(log) row-group reads per candidate.

Only bloom∧cuckoo-positive probes reach the exact layer — i.e. true
re-encounters plus a ~0.01% double-false-positive trickle — and they
arrive as one batched, sorted probe per epoch per shard, which the fence
index turns into a handful of sequential row-group reads.

Identity at the target scale: the IN-MEMORY levels key on the 63-bit
hash64(canonical_url) (collisions within the bounded resident set are
birthday-negligible: (2^20)²/2^64 ≈ 6e-8 per shard), while the SPILLED
bulk — where 10^10-scale collisions would actually land (~5 expected
spurious "seen" verdicts, see round-2 ADVICE) — stores canonical_url
alongside the hash and compares the string on every hash hit, so two
distinct urls colliding in hash64 are still both admitted.  The sandbox
oracle keys its seen set on canonical_url (oracle/crawler.py:57), so
this is the conformant semantics, not an extension of it.

Capacity at 10^10 urls over 256 shards: bloom+cuckoo ≈ 140 MB/shard
(state/cuckoo.py capacity notes), resident exact ≈ mem_capacity ·
(8 B + url) ≈ 70 MB/shard at the 2^20 default, spilled runs ≈ 40M
rows/shard of sorted Parquet read back a row group at a time.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .bloom import BloomFilter
from .cuckoo import CuckooFilter

_RUN_SCHEMA = pa.schema([("url_hash", pa.int64()),
                         ("canonical_url", pa.string())])
_ROW_GROUP = 1 << 16


def _as_url_array(urls, n: int) -> np.ndarray | None:
    """Coerce an optional url column to an object ndarray of str/None."""
    if urls is None:
        return None
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    out = np.empty(n, dtype=object)
    out[:] = list(urls)
    return out


class _SortedRun:
    """One spilled sorted (url_hash, canonical_url) Parquet run.  Holds
    only the per-row-group hash fences in memory; `contains` reads just
    the row groups a probe's candidates fall into."""

    def __init__(self, path: str):
        self.path = path
        pf = pq.ParquetFile(path)
        self.num_rows = pf.metadata.num_rows
        mins, maxs = [], []
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        self.mins = np.asarray(mins, dtype=np.int64)
        self.maxs = np.asarray(maxs, dtype=np.int64)

    def contains(self, hashes: np.ndarray,
                 urls: np.ndarray | None) -> np.ndarray:
        """Seen-mask for the probe batch.  A hash hit counts as seen
        unless BOTH sides carry a url and the urls differ (hash64
        collision -> distinct url -> still new)."""
        n = len(hashes)
        seen = np.zeros(n, dtype=bool)
        if n == 0 or self.num_rows == 0:
            return seen
        # a probe can match MULTIPLE row groups when its equal-hash range
        # straddles a group boundary (relevant exactly for the collision
        # resolution this layer exists for): groups [g_lo, g_hi) have
        # min <= h <= max
        g_lo = np.searchsorted(self.maxs, hashes, side="left")
        g_hi = np.searchsorted(self.mins, hashes, side="right")
        cand = g_lo < g_hi
        if not cand.any():
            return seen
        pf = pq.ParquetFile(self.path)
        for g in range(int(g_lo[cand].min()), int(g_hi[cand].max())):
            m = cand & (g_lo <= g) & (g < g_hi) & ~seen
            if not m.any():
                continue
            cols = ["url_hash"] if urls is None else ["url_hash",
                                                      "canonical_url"]
            t = pf.read_row_group(int(g), columns=cols, use_threads=False)
            rh = np.asarray(t["url_hash"], dtype=np.int64)
            ph = hashes[m]
            lo = np.searchsorted(rh, ph, side="left")
            hi = np.searchsorted(rh, ph, side="right")
            hit = hi > lo
            if urls is None:
                res = hit
            else:
                ru = t["canonical_url"].combine_chunks()
                pu = urls[m]
                res = np.zeros(len(ph), dtype=bool)
                # fast path: singleton equal-hash range (everything but
                # actual collisions) — ONE vectorized take + object-array
                # compare instead of a per-hit Python loop with pyarrow
                # scalar reads (true re-encounters all land here, i.e.
                # most of every epoch's link probes)
                one = hit & (hi - lo == 1)
                if one.any():
                    ru_sel = np.asarray(
                        ru.take(pa.array(lo[one])).to_pylist(), dtype=object)
                    pu_sel = pu[one]
                    eq = (ru_sel == pu_sel)
                    # url-less probe / stored null: hash decides
                    eq |= np.array([s is None for s in ru_sel])
                    eq |= np.array([p is None for p in pu_sel])
                    res[one] = eq
                for j in np.nonzero(hit & ~one)[0]:
                    if pu[j] is None:
                        res[j] = True  # url-less probe: hash decides
                        continue
                    for r in range(lo[j], hi[j]):  # equal-hash range
                        su = ru[r].as_py()
                        if su is None or su == pu[j]:
                            res[j] = True
                            break
            seen[m] |= res
        return seen

    def read_all(self) -> pa.Table:
        return pq.read_table(self.path, use_threads=False)


class SeenShardState:
    """Plain-Python shard state (also used directly in unit tests).

    `spill_dir=None` keeps the exact layer fully in memory (tests /
    ad-hoc use); the engine always provides one, so `mem_capacity`
    genuinely bounds the shard's resident exact entries.
    """

    def __init__(self, capacity: int = 1 << 16, fp_rate: float = 0.01,
                 spill_dir: str | None = None,
                 mem_capacity: int = 1 << 20,
                 run_target: int = 4):
        self.capacity = capacity
        self.bloom = BloomFilter(capacity, fp_rate)
        self.cuckoo = CuckooFilter(capacity)
        self.spill_dir = spill_dir
        self.mem_capacity = int(mem_capacity)
        self.pending_cap = max(1024, min(1 << 15, self.mem_capacity // 4))
        self.run_target = run_target
        if spill_dir:
            shutil.rmtree(spill_dir, ignore_errors=True)
            os.makedirs(spill_dir, exist_ok=True)
        # log-structured exact layer
        self.pending: list[tuple[np.ndarray, np.ndarray | None]] = []
        self.pending_count = 0
        self._pending_cat: np.ndarray | None = None
        self.mem = np.zeros(0, dtype=np.int64)        # sorted
        self.mem_urls: np.ndarray = np.zeros(0, dtype=object)
        self.runs: list[_SortedRun] = []
        self._run_seq = 0
        # cuckoo insert failures (rare) — sorted array for np.isin
        self.overflow = np.zeros(0, dtype=np.int64)

    # ----------------------------------------------------------- exact layer
    def _pending_hashes(self) -> np.ndarray:
        if self._pending_cat is None:
            self._pending_cat = (np.concatenate(
                [p[0] for p in self.pending]) if self.pending
                else np.zeros(0, dtype=np.int64))
        return self._pending_cat

    def _exact_contains(self, hashes: np.ndarray,
                        urls: np.ndarray | None) -> np.ndarray:
        """Seen-mask over pending ∪ mem ∪ runs.  In-memory levels key on
        the hash (bounded => collision-negligible); spilled runs resolve
        hash hits against canonical_url."""
        seen = np.zeros(len(hashes), dtype=bool)
        if self.pending_count:
            seen |= np.isin(hashes, self._pending_hashes())
        if len(self.mem):
            rem = ~seen
            if rem.any():
                sub = hashes[rem]
                pos = np.searchsorted(self.mem, sub)
                ok = pos < len(self.mem)
                hit = np.zeros(len(sub), dtype=bool)
                hit[ok] = self.mem[pos[ok]] == sub[ok]
                seen[np.nonzero(rem)[0][hit]] = True
        for run in self.runs:
            rem = ~seen
            if not rem.any():
                break
            sub_u = urls[rem] if urls is not None else None
            hit = run.contains(hashes[rem], sub_u)
            seen[np.nonzero(rem)[0][hit]] = True
        return seen

    def _merge_pending(self) -> None:
        """Fold pending chunks into the sorted mem level (vectorized)."""
        if not self.pending_count:
            return
        ph = self._pending_hashes()
        pu = np.empty(len(ph), dtype=object)
        off = 0
        for h, u in self.pending:
            if u is not None:
                pu[off:off + len(h)] = u
            off += len(h)
        allh = np.concatenate([self.mem, ph])
        allu = np.concatenate([self.mem_urls, pu]) if len(allh) else pu
        order = np.argsort(allh, kind="mergesort")
        self.mem = allh[order]
        self.mem_urls = allu[order]
        self.pending = []
        self.pending_count = 0
        self._pending_cat = None

    def _spill(self) -> None:
        """Write mem as one sorted Parquet run and drop it from memory."""
        if not self.spill_dir or not len(self.mem):
            return
        path = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.parquet")
        self._run_seq += 1
        t = pa.table({"url_hash": pa.array(self.mem),
                      "canonical_url": pa.array(list(self.mem_urls),
                                                pa.string())},
                     schema=_RUN_SCHEMA)
        tmp = path + ".tmp"
        pq.write_table(t, tmp, row_group_size=_ROW_GROUP)
        os.replace(tmp, path)
        self.runs.append(_SortedRun(path))
        self.mem = np.zeros(0, dtype=np.int64)
        self.mem_urls = np.zeros(0, dtype=object)
        if len(self.runs) > self.run_target:
            self._compact()

    def _compact(self) -> None:
        """Merge all runs into one (sequential read + one sorted write);
        distinct urls sharing a hash are all kept (collision support)."""
        tables = [r.read_all() for r in self.runs]
        merged = pa.concat_tables(tables).sort_by("url_hash")
        path = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.parquet")
        self._run_seq += 1
        tmp = path + ".tmp"
        pq.write_table(merged, tmp, row_group_size=_ROW_GROUP)
        os.replace(tmp, path)
        for r in self.runs:
            os.remove(r.path)
        self.runs = [_SortedRun(path)]

    # ------------------------------------------------------------------ api
    def check(self, hashes: np.ndarray, urls=None) -> np.ndarray:
        """True = NEW (not seen). Pure read, fully vectorized."""
        hashes = np.asarray(hashes, dtype=np.int64)
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        urls = _as_url_array(urls, n)
        maybe = self.bloom.contains_many(hashes)          # False -> new
        new = ~maybe
        if maybe.any():
            idx = np.nonzero(maybe)[0]
            sub = hashes[idx]
            cand = self.cuckoo.contains_many(sub)
            if len(self.overflow):
                cand |= np.isin(sub, self.overflow)
            res = np.ones(len(sub), dtype=bool)           # cuckoo no -> new
            if cand.any():
                sub_u = urls[idx][cand] if urls is not None else None
                res[cand] = ~self._exact_contains(sub[cand], sub_u)
            new[idx] = res
        return new

    def add(self, hashes: np.ndarray, urls=None) -> int:
        """Idempotent insert; returns number actually new to this shard."""
        hashes = np.asarray(hashes, dtype=np.int64)
        if len(hashes) == 0:
            return 0
        urls = _as_url_array(urls, len(hashes))
        if urls is None:
            uh = np.unique(hashes)
            uu = None
        else:
            # dedup on the (hash, url) PAIR: two distinct urls colliding
            # in hash64 within one batch must both record their url
            # string, or the collision-support layer loses one of them
            import pandas as pd

            df = (pd.DataFrame({"h": hashes, "u": urls})
                  .drop_duplicates().sort_values("h", kind="mergesort"))
            uh = df["h"].to_numpy(np.int64)
            uu = df["u"].to_numpy(dtype=object)
        maybe = self.bloom.contains_many(uh)
        fresh = ~maybe
        if maybe.any():
            idx = np.nonzero(maybe)[0]
            sub_u = uu[idx] if uu is not None else None
            fresh[idx] = ~self._exact_contains(uh[idx], sub_u)
        arr = uh[fresh]
        if not len(arr):
            return 0
        self._insert(arr, uu[fresh] if uu is not None else None)
        return len(arr)

    def _insert(self, arr: np.ndarray, uu) -> None:
        """Unconditional insert of hashes KNOWN to be absent (callers
        verified via bloom/exact first) — the shared tail of add() and
        check_add()."""
        self.bloom.add_many(arr)
        failed = self.cuckoo.add_many(arr)
        if failed:
            # keep exactness: failed inserts tracked so check() never
            # false-negatives on them
            tail = self.cuckoo.contains_many(arr)
            if (~tail).any():
                self.overflow = np.unique(
                    np.concatenate([self.overflow, arr[~tail]]))
        self.pending.append((arr, uu))
        self.pending_count += len(arr)
        self._pending_cat = None
        if (self.pending_count >= self.pending_cap
                or (self.spill_dir
                    and self.pending_count + len(self.mem)
                    > self.mem_capacity)):
            self._merge_pending()
            if self.spill_dir and len(self.mem) > self.mem_capacity:
                self._spill()

    def check_add(self, hashes: np.ndarray, urls=None) -> np.ndarray:
        """Fused two-phase admission: the phase-1 verdict (True = new)
        and the phase-2 insert of exactly the new rows in ONE actor
        call — one RPC round instead of two per epoch, and the insert
        skips add()'s redundant re-verification (check just computed
        it).  A (hash, url) duplicated WITHIN one call admits and
        reports True exactly once — the first occurrence — matching the
        split protocol's add()-side dedup (the engine passes uniques;
        stress batches with in-batch recrawl duplicates exposed the
        earlier report-both behavior as an over-count).  Distinct urls
        colliding in hash64 both admit (collision support).  NOT used
        by the distributed epoch tail, whose crash-replay protocol
        needs the admitted checkpoint written BETWEEN check and add
        (engine._admit_frontier_part docstring)."""
        hashes = np.asarray(hashes, dtype=np.int64)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        urls_a = _as_url_array(urls, len(hashes))
        new = self.check(hashes, urls_a)
        if not new.any():
            return new
        if urls_a is None:
            _, first = np.unique(hashes, return_index=True)
        else:
            import pandas as pd

            first = np.nonzero(~pd.DataFrame(
                {"h": hashes, "u": urls_a}).duplicated().to_numpy())[0]
        keep = np.zeros(len(hashes), dtype=bool)
        keep[first] = True
        new &= keep
        if new.any():
            arr = hashes[new]
            uu = urls_a[new] if urls_a is not None else None
            # sort by hash (add()'s pair-dedup ordering) so pending runs
            # stay mergesort-friendly and collision pairs stay aligned
            order = np.argsort(arr, kind="mergesort")
            self._insert(arr[order], uu[order] if uu is not None else None)
        return new

    def ingest_files(self, files: list[str], shard_id: int,
                     num_shards: int) -> int:
        """Resume rebuild, shard-side: read the admitted delta files and
        add THIS shard's residue class (hash % num_shards == shard_id).
        One call per shard makes the rebuild S-way parallel with no row
        ever touching the driver — the old driver-routed loop added at
        ~300k urls/s total, which at a 10^10-URL frontier is hours; this
        path is bounded by per-shard local add rate × S.  File-at-a-time
        so peak memory is one delta, and add() is idempotent so a retry
        replays safely."""
        import pyarrow.parquet as _pq

        total = 0
        for f in files:
            t = _pq.read_table(f, columns=["url_hash", "canonical_url"],
                               use_threads=False)
            if not t.num_rows:
                continue
            h = np.asarray(t["url_hash"], dtype=np.int64)
            m = (h % num_shards) == shard_id
            if m.any():
                # Arrow-filter BEFORE touching Python objects: only this
                # shard's 1/S of the rows become url strings (the full
                # to_pylist cost across S shards would re-materialize
                # the whole delta set S times)
                sub = t.filter(pa.array(m))
                urls = np.asarray(sub["canonical_url"].to_pylist(),
                                  dtype=object)
                total += self.add(np.asarray(sub["url_hash"],
                                             dtype=np.int64), urls)
        return total

    def size(self) -> int:
        return (self.pending_count + len(self.mem)
                + sum(r.num_rows for r in self.runs))

    def resident_exact(self) -> int:
        """Exact-layer entries currently held in MEMORY (tests assert the
        spill bound with this)."""
        return self.pending_count + len(self.mem)

    def dump(self) -> np.ndarray:
        """All hashes in this shard (sorted) — for checkpoint/debug; reads
        spilled runs, so test/debug-sized use only."""
        parts = [self._pending_hashes(), self.mem]
        parts += [np.asarray(r.read_all()["url_hash"], dtype=np.int64)
                  for r in self.runs]
        return np.sort(np.concatenate(parts))


def make_seen_shards(num_shards: int, capacity_per_shard: int = 1 << 16,
                     spill_root: str | None = None,
                     mem_capacity: int = 1 << 20):
    """Create the shard actors. Caller owns the handles (and their
    lifetime).  With spill_root set, shard i spills its exact layer under
    spill_root/shard-iii (wiped at actor init — state is rebuilt from
    admitted checkpoint deltas on resume)."""
    import ray

    # num_cpus=0: shard ops are sub-millisecond vectorized membership
    # checks; reserving CPU slices for them starves the data-plane tasks
    # on small clusters (the shard COUNT bounds concurrency, not CPUs)
    shard_cls = ray.remote(num_cpus=0)(SeenShardState)
    return [
        shard_cls.remote(
            capacity_per_shard,
            spill_dir=(os.path.join(spill_root, f"shard-{i:03d}")
                       if spill_root else None),
            mem_capacity=mem_capacity)
        for i in range(num_shards)
    ]


class SeenChecker:
    """Driver-side facade: route hash arrays to shard actors by h % S."""

    def __init__(self, shards):
        self.shards = shards
        self.s = len(shards)

    def _route(self, hashes: np.ndarray, urls):
        sid = hashes % self.s
        for j in range(self.s):
            m = sid == j
            if m.any():
                u = urls[m] if urls is not None else None
                yield j, np.nonzero(m)[0], hashes[m], u

    def check(self, hashes: np.ndarray, urls=None) -> np.ndarray:
        import ray

        hashes = np.asarray(hashes, dtype=np.int64)
        urls = _as_url_array(urls, len(hashes))
        out = np.zeros(len(hashes), dtype=bool)
        parts = list(self._route(hashes, urls))
        futs = [self.shards[j].check.remote(h, u) for j, _, h, u in parts]
        for (j, idx, _, _), res in zip(parts, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, hashes: np.ndarray, urls=None) -> int:
        import ray

        hashes = np.asarray(hashes, dtype=np.int64)
        urls = _as_url_array(urls, len(hashes))
        futs = [self.shards[j].add.remote(h, u)
                for j, _, h, u in self._route(hashes, urls)]
        return sum(ray.get(futs))

    def check_add(self, hashes: np.ndarray, urls=None) -> np.ndarray:
        """Fused admission (see SeenShardState.check_add): one RPC round
        to the owning shards; returns the row-aligned new mask."""
        import ray

        hashes = np.asarray(hashes, dtype=np.int64)
        urls = _as_url_array(urls, len(hashes))
        out = np.zeros(len(hashes), dtype=bool)
        parts = list(self._route(hashes, urls))
        futs = [self.shards[j].check_add.remote(h, u)
                for j, _, h, u in parts]
        for (j, idx, _, _), res in zip(parts, ray.get(futs)):
            out[idx] = res
        return out

    def total(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))


