"""The crawl engine: Ray-Data epoch driver with checkpoint/resume.

This is the rebuild of spider-go's trigger→dispatch→worker→output loop
(`pkg/spider/workflow.go:83-328`, SURVEY.md §3.4) as a bulk-synchronous
epoch loop over Ray Datasets:

  seeds ──admit──► frontier₀ (Parquet, partitioned by url_hash % P)
  epoch e:
    select   scheduler.select_epoch  (combiner + salted reduce; budget B)
    fetch    actor-pool FetchWorker  (partition-aligned pages join, robots)
    route    outcome ports ok/miss/robots  (meta_output routing, §2 #10)
    fan-out  explode_links (1 page → k urls, §2 #9)
    tail     P fused partition-aligned tasks (_admit_frontier_part), one
             per part = url_hash % P: link dedup (max priority) →
             two-phase check/add against sharded bloom+cuckoo actors →
             admitted delta → frontier_{e+1} = (frontier_e − selected)
             ∪ admitted — actors pre-split links by part, so the tail
             reduces disjoint key ranges with no global shuffle
    ckpt     epoch_e/{order,texts,admitted,frontier}/ + manifest

The reference's per-hop Mongo session contexts become in-band columns
(priority, host ride on the rows); its only cross-epoch keyed state —
the URL-seen set — lives in the shard actors and is reconstructible from
the admitted/ checkpoint deltas, which is what makes resume exact
(SURVEY.md §4.1 "checkpoint / resume").

Delivery semantics: Ray retries give at-least-once per task; determinism
plus two-phase seen admission plus overwrite-by-partition checkpoint
writes make the pipeline effectively-once — versus the reference's
at-most-once (ack-before-process, `pkg/spider/messenger_worker_nats.go:108`).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .common.hashing import hash64_many
from .scheduler import (_topb_pandas, select_epoch_ds, select_map_part,
                        select_reduce_bucket)
from .stages.crawl import (
    FRONTIER_SCHEMA,
    FetchWorker,
    build_pages_index,
    canon_table,
    finalize_links,
)
from .state.seen import SeenChecker, make_seen_shards

_ORDER_SCHEMA = pa.schema(
    [
        ("epoch", pa.int32()),
        ("seq", pa.int64()),
        ("canonical_url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.float64()),
        ("outcome", pa.string()),
    ]
)


# -------------------------------------------------------------------------
# distributed-epoch task kernels (plain functions, wrapped ray.remote
# lazily via _remote_fns so importing this module never touches Ray)
# -------------------------------------------------------------------------

def _write_order_shard(block, epoch: int, seq_offset: int, path: str) -> dict:
    """Stamp one sorted order block with its global seq range (seq_offset
    = running prefix sum of preceding block row counts — the
    per-partition prefix-sum order write) and persist it atomically.
    Returns the shard's outcome counts so the driver only ever sees
    per-shard integers, never order rows."""
    pa.set_cpu_count(1)
    if isinstance(block, pa.Table):
        t = block
    elif isinstance(block, pd.DataFrame):
        t = pa.Table.from_pandas(block, preserve_index=False)
    else:
        t = pa.table(block)
    n = t.num_rows
    out = pa.table(
        {
            "epoch": pa.array(np.full(n, epoch, np.int32)),
            "seq": pa.array(seq_offset + np.arange(n, dtype=np.int64)),
            "canonical_url": t["canonical_url"],
            "host": t["host"],
            "priority": t["priority"],
            "outcome": t["outcome"],
        }
    ).cast(_ORDER_SCHEMA)
    tmp = path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    counts = {"ok": 0, "miss": 0, "robots": 0}
    vc = out["outcome"].to_pandas().value_counts()
    for k, v in vc.items():
        counts[k] = int(v)
    return counts


def _admit_frontier_part(part: int, link_refs: list, frontier_files: list[str],
                         selected_files: list[str], shards, epoch: int,
                         adm_path: str, out_path: str) -> dict:
    """Fused per-partition epoch tail for ONE part: link dedup → two-phase
    seen admission → admitted checkpoint → next-frontier write, all in a
    single partition-aligned task.

    The link stream is ALREADY partitioned by the one global key
    (url_hash % P) at the producer — the fetch actors locally dedup and
    split their links by part — so the global groupby the round-2/3 chain
    ran (a full sort shuffle + its own Ray Data execution, ~2-6 s/epoch
    constant) is redundant: P of these tasks reduce disjoint key ranges.

    Idempotent replay (Ray task retry AND cross-run resume of an
    incomplete epoch): the admitted checkpoint is written atomically
    BEFORE phase-2 `add`, and a replay that finds it reuses its committed
    phase-1 verdicts instead of re-checking (re-checking after our own
    adds would wrongly see these urls as seen).  Verdicts depend only on
    the part's own urls (disjoint across parts) and epoch-start seen
    state, so concurrent adds from sibling parts never change them —
    deterministic under any interleaving.  The unique-link count rides in
    the file's parquet metadata so replays return the same counters."""
    import ray

    from .stages.crawl import host_of_batch

    pa.set_cpu_count(1)
    if os.path.exists(adm_path):
        f = pq.ParquetFile(adm_path)
        kv = f.metadata.metadata or {}
        n_links = int(kv.get(b"n_links_unique", b"0"))
        at = f.read()
    else:
        tbls = [t for t in (ray.get(list(link_refs)) if link_refs else [])
                if t is not None and t.num_rows]
        if tbls:
            links = pa.concat_tables(tbls)
            # cross-actor dedup (actors already deduped locally): key on
            # the int64 hash, url kept for hash-collision correctness
            uniq = (pa.TableGroupBy(links, ["url_hash", "canonical_url"])
                    .aggregate([("priority", "max")])
                    .rename_columns(["url_hash", "canonical_url", "priority"]))
        else:
            uniq = pa.table({"url_hash": pa.array([], pa.int64()),
                             "canonical_url": pa.array([], pa.string()),
                             "priority": pa.array([], pa.float64())})
        n_links = uniq.num_rows
        h = np.asarray(uniq["url_hash"], dtype=np.int64)
        # phase-1 check, routed straight to the owning shard actors via
        # the same facade the driver paths use (ONE home for the
        # hash-%-num_shards routing rule)
        checker = SeenChecker(shards)
        mask = (checker.check(h, uniq["canonical_url"]) if len(h)
                else np.zeros(0, dtype=bool))
        adm = uniq.filter(pa.array(mask)) if len(h) else uniq
        at = pa.table({
            "canonical_url": adm["canonical_url"],
            "host": host_of_batch(adm["canonical_url"]),
            "priority": adm["priority"],
            "url_hash": adm["url_hash"],
            "part": pa.array(np.full(adm.num_rows, part, np.int32)),
            "first_epoch": pa.array([epoch + 1] * adm.num_rows, pa.int32()),
        })
        os.makedirs(os.path.dirname(adm_path), exist_ok=True)
        tmp = adm_path + ".tmp"
        pq.write_table(at.replace_schema_metadata(
            {"n_links_unique": str(n_links)}), tmp)
        os.replace(tmp, adm_path)
    # phase-2 add (idempotent set insert; replay-safe)
    if at.num_rows:
        SeenChecker(shards).add(np.asarray(at["url_hash"], dtype=np.int64),
                                at["canonical_url"])
    # next frontier for this part = (frontier_p − selected_p) ∪ admitted_p
    ft = pq.read_table(frontier_files, columns=list(FRONTIER_SCHEMA.names),
                       filters=[("part", "==", part)], use_threads=False) \
        if frontier_files else pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
    if selected_files and ft.num_rows:
        sel_h = np.asarray(pq.read_table(selected_files, columns=["url_hash"],
                                         use_threads=False)["url_hash"])
        keep = ~np.isin(np.asarray(ft["url_hash"]), sel_h)
        ft = ft.filter(pa.array(keep))
    out = pa.concat_tables([ft.cast(FRONTIER_SCHEMA),
                            at.select(FRONTIER_SCHEMA.names)
                              .cast(FRONTIER_SCHEMA)])
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, out_path)
    return {"links": int(n_links), "admitted": int(at.num_rows),
            "frontier": int(out.num_rows)}


def _merge_order_shard(handles, idx: int, epoch: int, seq_offset: int,
                       path: str) -> dict:
    """Gather ONE host-range's slices from every fetch actor's stashed
    sorted order run, merge-sort them (each slice is already sorted —
    the sort here is a k-way merge in practice), seq-stamp with the
    range's global prefix offset and persist.  Replaces the round-2
    Ray Data sort+materialize execution with P plain tasks; the driver
    only ever sees per-range integers."""
    import ray

    pa.set_cpu_count(1)
    parts = [t for t in ray.get([h.take_order_range.remote(idx)
                                 for h in handles])
             if t is not None and t.num_rows]
    if not parts:
        return {"ok": 0, "miss": 0, "robots": 0}
    df = pa.concat_tables(parts).to_pandas()
    df = (df.assign(neg_priority=-df["priority"])
          .sort_values(["host", "neg_priority", "canonical_url"],
                       kind="mergesort")
          .drop(columns=["neg_priority"]))
    return _write_order_shard(df, epoch, seq_offset, path)


_RFNS: dict | None = None


def _remote_fns() -> dict:
    global _RFNS
    if _RFNS is None:
        import ray

        # fractional CPUs: these are small IO-bound tasks that must be
        # schedulable ALONGSIDE the persistent fetch-actor reservations
        _RFNS = {
            "order": ray.remote(num_cpus=0.25)(_write_order_shard),
            "order_merge": ray.remote(num_cpus=0.25)(_merge_order_shard),
            "admit_frontier": ray.remote(num_cpus=0.25)(_admit_frontier_part),
            "select_map": ray.remote(num_cpus=0.25)(select_map_part),
            "select_reduce": ray.remote(num_cpus=0.25)(select_reduce_bucket),
        }
    return _RFNS


class CrawlEngine:
    """One crawl run rooted at a checkpoint directory.

    Parameters mirror the politeness fixture (FIXTURES.md F3).  num_parts
    is the global partition count P (frontier storage, pages index, seen
    shards are all keyed by url_hash % P / % S).
    """

    def __init__(self, pages_path: str, politeness: dict, ckpt_dir: str,
                 num_parts: int = 16, seen_shards: int = 8,
                 fetch_concurrency: int = 4,
                 seen_capacity_per_shard: int = 1 << 17,
                 seen_mem_capacity: int = 1 << 20,
                 force_salted_scheduler: bool = False,
                 force_distributed: bool = False,
                 driver_threshold: int = 2_000_000,
                 index_dir: str | None = None,
                 politeness_path: str | None = None,
                 emit_edges: bool = False,
                 fetcher_factory=None):
        # fetcher_factory: zero-arg callable returning a Fetcher for each
        # FetchWorker actor (e.g. lambda: HttpFetcher(proxy=...)); None
        # -> the default IndexFetcher over the local pages index
        self.fetcher_factory = fetcher_factory
        # optional per-epoch href-edge artifact (edges/ beside texts/),
        # written actor-side like the texts shards — graph analytics
        # read it instead of re-parsing html (see edges_table())
        self.emit_edges = emit_edges
        self.pages_path = pages_path
        self.politeness = politeness
        self.budget = int(politeness["max_per_host_per_epoch"])
        self.max_epochs = int(politeness["max_epochs"])
        self.robots = dict(politeness.get("robots", {}))
        self.ckpt_dir = ckpt_dir
        self.num_parts = num_parts
        self.num_shards = seen_shards
        self.fetch_concurrency = fetch_concurrency
        self.seen_capacity = seen_capacity_per_shard
        self.seen_mem_capacity = seen_mem_capacity
        self.force_salted = force_salted_scheduler
        self.force_distributed = force_distributed
        self.driver_threshold = driver_threshold
        self.politeness_path = politeness_path
        # the pages index derives only from (pages_path, num_parts) — it
        # may live outside ckpt_dir and be shared across runs
        self.index_dir = index_dir or os.path.join(ckpt_dir, "pages_index")
        self._checker: SeenChecker | None = None
        self._fetch_pool: list | None = None
        self._seq = 0
        self._cluster_cpus: int | None = None  # cached by _effective_threshold

    # ------------------------------------------------------------------ io
    def _epoch_dir(self, e: int) -> str:
        return os.path.join(self.ckpt_dir, f"epoch_{e:04d}")

    def _manifest_path(self) -> str:
        return os.path.join(self.ckpt_dir, "manifest.json")

    def _read_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic

    # --------------------------------------------------------------- setup
    def _init_shards(self):
        shards = make_seen_shards(
            self.num_shards, self.seen_capacity,
            spill_root=os.path.join(self.ckpt_dir, "seen_spill"),
            mem_capacity=self.seen_mem_capacity)
        self._checker = SeenChecker(shards)

    def _init_fetch_pool(self):
        """Persistent FetchWorker actors (robots + index-shard cache live
        across epochs — see stages/crawl.FetchWorker docstring).

        Sizing: the pool must fit ALONGSIDE the Ray Data stages of the
        same epoch — actor reservations that add up to the whole cluster
        deadlock it (every data task pends behind the actors forever).
        The pool reserves 0.5 CPU per actor and is clamped to at most
        half the cluster's CPUs."""
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
        pool_size = max(1, min(self.fetch_concurrency, cpus))  # x0.5 => <=50%
        cls = ray.remote(num_cpus=0.5)(FetchWorker)
        self._fetch_pool = [
            cls.remote(self.index_dir, self.robots,
                       emit_edges=self.emit_edges,
                       fetcher=(self.fetcher_factory()
                                if self.fetcher_factory else None))
            for _ in range(pool_size)
        ]

    def warm_fetch_cache(self):
        """Load every pages-index shard into its owning fetch actor's
        cache.  This is ingest for the no-network fetch substitute (a real
        crawler has no local corpus to page in) — benchmarks run it
        untimed so the timed section measures crawl work."""
        import ray

        pool = self._fetch_pool
        futs = []
        for p in range(self.num_parts):
            futs.append(pool[p % len(pool)].warm.remote(p))
        ray.get(futs)

    def close(self):
        """Release the persistent actors (state is reconstructible from
        the checkpoint tree; result accessors are file-based)."""
        import ray

        for a in self._fetch_pool or []:
            ray.kill(a)
        if self._checker is not None:
            for s in self._checker.shards:
                ray.kill(s)
        self._fetch_pool = None
        self._checker = None

    def _admit_seeds(self, seeds: pa.Table) -> pa.Table:
        """Epoch-0 admission: canonicalize, dedup(max prio), mark seen."""
        t = canon_table(seeds["url"].to_pylist(),
                        np.asarray(seeds["priority"]), self.num_parts)
        self._checker.add(np.asarray(t["url_hash"]), t["canonical_url"])
        return t

    def _write_frontier(self, ds_or_table, e: int) -> str:
        """Write frontier for epoch e+1 under epoch=e/frontier/, one file
        per part (part-%05d.parquet) — the SAME layout the distributed
        frontier tasks produce, so the next epoch's per-part readers can
        open exactly one file instead of filtering every shard."""
        out = os.path.join(self._epoch_dir(e), "frontier")
        if isinstance(ds_or_table, pa.Table):
            os.makedirs(out, exist_ok=True)
            t = ds_or_table
            parts = np.asarray(t["part"])
            for p in np.unique(parts):
                sub = t.filter(pa.array(parts == p))
                pq.write_table(sub, os.path.join(
                    out, f"part-{int(p):05d}.parquet"))
        else:
            ds_or_table.write_parquet(out, mode="overwrite")
        return out

    @staticmethod
    def _parquet_files(path: str) -> list[str]:
        out = []
        for root, _, files in os.walk(path):
            out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
        return sorted(out)

    # ---------------------------------------------------------------- run
    def run(self, seeds: pa.Table | None = None, resume: bool = False) -> dict:
        """Run (or resume) the crawl; returns the final manifest.

        Fresh run: `seeds` required; any existing checkpoint is replaced.
        Resume: state is rebuilt from the manifest + admitted deltas and
        the loop continues after the last complete epoch — final outputs
        are byte-identical to an uninterrupted run (tested).
        """
        manifest = self.prepare(seeds=seeds, resume=resume)
        return self.run_epochs(manifest)

    def prepare(self, seeds: pa.Table | None = None, resume: bool = False) -> dict:
        """Setup only: index build, actor pools, seed admission / state
        rebuild.  Split from run_epochs so benchmarks can warm the fetch
        caches untimed between the two."""
        manifest = self._read_manifest() if resume else None
        if resume and manifest is not None:
            # resuming against the wrong corpus would silently mix two
            # crawls (seen set from A, fetches from B) — refuse loudly
            recorded = manifest.get("pages_path")
            if recorded and recorded != os.path.abspath(self.pages_path):
                raise ValueError(
                    f"checkpoint was built from {recorded!r}, not "
                    f"{os.path.abspath(self.pages_path)!r}")
        if manifest is None:
            if seeds is None:
                raise ValueError("fresh run needs seeds (no checkpoint "
                                 "manifest found to resume from)")
            if os.path.isdir(self.ckpt_dir):
                # keep the (idempotent) pages index; drop stale epoch state
                for name in os.listdir(self.ckpt_dir):
                    if name.startswith("epoch_") or name == "manifest.json":
                        full = os.path.join(self.ckpt_dir, name)
                        shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)
            os.makedirs(self.ckpt_dir, exist_ok=True)
            build_pages_index(self.pages_path, self.index_dir, self.num_parts)
            self._init_shards()
            self._init_fetch_pool()
            frontier0 = self._admit_seeds(seeds)
            self._write_frontier(frontier0, -1)
            init_dir = os.path.join(self.ckpt_dir, "epoch_-001")
            os.makedirs(os.path.join(init_dir, "admitted"), exist_ok=True)
            pq.write_table(
                frontier0.append_column("first_epoch",
                                        pa.array([0] * frontier0.num_rows, pa.int32())),
                os.path.join(init_dir, "admitted", "admitted.parquet"),
            )
            manifest = {
                "version": 1,
                "pages_path": os.path.abspath(self.pages_path),
                "politeness": self.politeness,
                "num_parts": self.num_parts,
                "num_shards": self.num_shards,
                "next_epoch": 0,
                "next_seq": 0,
                "epochs": [],
                "done": False,
            }
            self._write_manifest(manifest)
        else:
            assert manifest["num_parts"] == self.num_parts, "num_parts changed"
            build_pages_index(self.pages_path, self.index_dir, self.num_parts)
            self._init_shards()
            self._init_fetch_pool()
            # rebuild seen shards from admitted deltas (epoch-atomic),
            # SHARD-SIDE: each shard actor reads the delta files itself
            # and keeps its hash-residue class, so the rebuild is S-way
            # parallel and no url row ever crosses the driver (the old
            # driver-routed add loop was ~300k urls/s total — hours at
            # the 10^10-URL frontier this engine is sized for)
            import ray

            files: list[str] = []
            for e in range(-1, manifest["next_epoch"]):
                files += self._parquet_files(
                    os.path.join(self._epoch_dir(e), "admitted"))
            if files:
                ray.get([s.ingest_files.remote(files, i, self.num_shards)
                         for i, s in enumerate(self._checker.shards)])
        self._seq = manifest["next_seq"]
        return manifest

    def _reconcile_config(self) -> None:
        """Per-epoch config re-read (SURVEY.md §2 #18): if the engine was
        given a politeness *path*, changes to budget / robots between
        epochs take effect at the next epoch boundary — budget on the
        driver, robots broadcast to the fetch actors.  (The reference
        polls + diffs every 10 s in its cron trigger; an epoch boundary
        is our natural reconcile point.)"""
        if not self.politeness_path:
            return
        try:
            with open(self.politeness_path) as f:
                pol = json.load(f)
        except (OSError, json.JSONDecodeError):
            return  # keep last good config (reference logs & continues)
        new_budget = int(pol.get("max_per_host_per_epoch", self.budget))
        new_robots = dict(pol.get("robots", self.robots))
        self.max_epochs = int(pol.get("max_epochs", self.max_epochs))
        if new_budget != self.budget:
            self.budget = new_budget
        if new_robots != self.robots:
            self.robots = new_robots
            import ray

            ray.get([a.update_robots.remote(new_robots)
                     for a in self._fetch_pool])

    def run_epochs(self, manifest: dict) -> dict:
        """The BFS epoch loop (call prepare() first)."""
        try:
            e = manifest["next_epoch"]
            while True:
                self._reconcile_config()   # SURVEY.md §2 #18
                if e >= self.max_epochs:
                    break
                n_frontier = self._frontier_rows(e - 1)
                if n_frontier == 0:
                    break
                stats = self._run_epoch(e, n_frontier)
                manifest["epochs"].append(stats)
                manifest["next_epoch"] = e + 1
                manifest["next_seq"] = self._seq
                self._write_manifest(manifest)
                e += 1
            manifest["done"] = True
            self._write_manifest(manifest)
        finally:
            self.close()  # resume rebuilds actor state from checkpoints
        return manifest

    # -------------------------------------------------------------- epoch
    def _frontier_rows(self, e: int) -> int:
        """Frontier size from parquet metadata — no Ray execution."""
        files = self._parquet_files(os.path.join(self._epoch_dir(e), "frontier"))
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    def _effective_threshold(self) -> int:
        """CPU-adaptive driver/distributed dispatch point (frontier rows).

        Measured on the bench fixtures (BENCH/BASELINE.md): on ~120k-row
        frontiers the driver path wins at BOTH 8 and 32 CPUs (7.6k vs
        6.7k urls/s at 8; the gap is the ~0.5 s/epoch streaming-executor
        constant), while on ~500k-row frontiers the distributed path
        wins 2.3x at 8 CPUs and 1.3x at 32 — the driver path's serial
        select/links/frontier stages bind harder the fewer cores the
        node has to overlap them with.  So: a floor keeps control-sized
        frontiers on the driver kernels at any CPU count, a per-CPU term
        raises the switch point on bigger nodes (where the distributed
        path's gain is smaller), and the constructor's driver_threshold
        stays the absolute cap — the 10^10-frontier driver-memory bound.
        """
        import ray

        ncpu = self._cluster_cpus
        if ncpu is None:
            try:
                ncpu = int(ray.cluster_resources().get("CPU", 8) or 8)
            except Exception:
                ncpu = 8
            self._cluster_cpus = ncpu
        return min(self.driver_threshold, max(150_000, 8_000 * ncpu))

    def _run_epoch(self, e: int, n_frontier: int) -> dict:
        """One crawl epoch.

        Control-sized stages (budget-bounded selection, per-epoch link
        set, frontier below `driver_threshold` rows) run driver-side
        through the SAME pure kernels as the distributed paths — a Ray
        Data execution costs ~0.5s of streaming-executor overhead, which
        dominates small epochs.  Above the thresholds (or with
        force_distributed=True, which conformance tests exercise) every
        stage runs as the distributed pipeline, and NO per-row data
        touches the driver: the selection stays a Dataset staged to
        per-part parquet, fetch actors pull their own partitions, the
        crawl order is sorted + seq-stamped by per-block prefix sums, and
        the next frontier is built by P partition-aligned tasks.  Volume
        work is always parallel: fetch/extract runs on the persistent
        actor pool, and each actor writes its own texts shard (the text
        payload never crosses the object store).
        """
        import time as _time

        _dbg = bool(os.environ.get("SPIDER_RAY_EPOCH_DEBUG"))
        _marks = [("start", _time.time())]

        def _mark(name):
            if _dbg:
                _marks.append((name, _time.time()))

        edir = self._epoch_dir(e)
        # a rerun of a partially-completed epoch (crash mid-epoch, then
        # resume — possibly with different pool size / budget / path
        # selection) must not inherit stale outputs: clear EVERY epoch
        # artifact before (re)producing it (ADVICE.md: a small-path rerun
        # after a distributed crash must not union stale frontier shards)
        for sub in ("texts", "admitted", "selected", "order", "frontier",
                    "edges"):
            shutil.rmtree(os.path.join(edir, sub), ignore_errors=True)
        for f in ("order.parquet",):
            try:
                os.remove(os.path.join(edir, f))
            except OSError:
                pass
        os.makedirs(edir, exist_ok=True)
        ffiles = self._parquet_files(os.path.join(self._epoch_dir(e - 1), "frontier"))
        small = (not self.force_distributed) and \
            n_frontier <= self._effective_threshold()
        if small:
            stats = self._epoch_small(e, ffiles, _mark)
        else:
            stats = self._epoch_distributed(e, ffiles, _mark)
        if _dbg:
            spans = [f"{n}={t1-t0:.2f}" for (_, t0), (n, t1) in
                     zip(_marks, _marks[1:])]
            print(f"[epoch {e}] " + " ".join(spans), flush=True)
        with open(os.path.join(edir, "metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats

    def _epoch_small(self, e: int, ffiles: list[str], _mark) -> dict:
        """Driver-side epoch for control-sized frontiers — same pure
        kernels (_topb_pandas, finalize_links, two-phase seen) as the
        distributed path, none of the per-execution Ray Data overhead."""
        import ray

        edir = self._epoch_dir(e)

        # 1. politeness selection (deterministic order)
        frontier_tbl = pq.read_table(ffiles)
        pdf = frontier_tbl.to_pandas()
        pdf = pdf.assign(neg_priority=-pdf["priority"])
        selected = (_topb_pandas(pdf, self.budget)
                    .drop(columns=["neg_priority"]).reset_index(drop=True))
        n_sel = len(selected)
        _mark("select")

        # 2. fused fetch + text sink + link fan-out on the persistent
        # actor pool: rows route to the actor owning their partition
        # (part % pool) — a partition-aligned join, never a shuffle.
        pool = self._fetch_pool
        sel_tbl = pa.Table.from_pandas(selected, preserve_index=False)
        per_actor: list[list[pa.Table]] = [[] for _ in pool]
        for p in sorted(selected["part"].unique()):
            per_actor[int(p) % len(pool)].append(
                sel_tbl.filter(pc.equal(sel_tbl["part"], int(p))))
        outcome_refs, link_refs, flush_refs = [], [], []
        for rank, tables in enumerate(per_actor):
            if not tables:
                continue
            texts_path = os.path.join(edir, "texts", f"shard-{rank:04d}.parquet")
            oref, lref = pool[rank].fetch_stash.options(num_returns=2).remote(
                pa.concat_tables(tables), self.num_parts)
            # flush is queued behind fetch on the same actor and runs
            # while the driver does link-dedup / frontier work below; the
            # join before the stats/manifest write keeps crash-replay exact
            flush_refs.append(pool[rank].flush_texts.remote(texts_path))
            if self.emit_edges:
                flush_refs.append(pool[rank].flush_edges.remote(
                    os.path.join(edir, "edges", f"shard-{rank:04d}.parquet")))
            outcome_refs.append(oref)
            link_refs.append(lref)

        _mark("fetch_submit")

        # 3. crawl-order record. `selected` is already in the deterministic
        # order (host, -priority, url); seq is a running global counter.
        # Driver-side is fine here: rows are budget-bounded AND below
        # driver_threshold by construction of this path.
        got = ray.get(outcome_refs)
        if not got:  # zero-row epoch (e.g. politeness budget hot-set to
            # 0 via reconcile): write an empty order table, don't crash
            # on concat_tables([])
            got = [pa.table({"canonical_url": pa.array([], pa.string()),
                             "outcome": pa.array([], pa.string())})]
        oc = pa.concat_tables(got).combine_chunks()
        _mark("fetch_wait_outcomes")
        # align outcomes to the selected order with one C++ hash lookup
        # (index_in) — the dict/zip/list-comprehension this replaces was
        # ~150 ms of serial Python per epoch at a 52k-row budget
        sel_urls = pa.array(selected["canonical_url"], pa.string())
        pos = pc.index_in(sel_urls, value_set=oc["canonical_url"])
        if pos.null_count:
            raise RuntimeError("fetch actors returned no outcome for "
                               f"{pos.null_count} selected urls")
        outcome_col = pc.take(oc["outcome"], pos)
        order = pa.table(
            {
                "epoch": pa.array(np.full(n_sel, e, np.int32)),
                "seq": pa.array(self._seq + np.arange(n_sel, dtype=np.int64)),
                "canonical_url": sel_urls,
                "host": pa.array(selected["host"], pa.string()),
                "priority": pa.array(selected["priority"], pa.float64()),
                "outcome": outcome_col,
            }
        ).cast(_ORDER_SCHEMA)
        self._seq += n_sel
        pq.write_table(order, os.path.join(edir, "order.parquet"))
        counts = {"ok": 0, "miss": 0, "robots": 0}
        for k, v in zip(*pc.value_counts(order["outcome"]).flatten()):
            counts[k.as_py()] = int(v.as_py())

        _mark("order_write")

        # 4. link dedup (per-epoch max-priority) -> two-phase seen
        # admission.  Links are bounded by budget x links/page.
        checker = self._checker
        adm_dir = os.path.join(edir, "admitted")
        os.makedirs(adm_dir, exist_ok=True)
        link_tbls = [t for t in ray.get(link_refs) if t.num_rows]
        if link_tbls:
            # per-actor tables arrive pre-deduped + pre-hashed (the
            # fetch_stash combiner); the global max-priority reduce is
            # an Arrow C++ hash aggregate — the pandas string groupby
            # this replaces was the largest serial term of the epoch
            # tail (0.4-1.8 s/epoch at 200k pages).  url_hash is
            # functionally dependent on the key, so min() just carries
            # it through the groupby.
            lt = pa.concat_tables(link_tbls)
            agg = pa.TableGroupBy(lt, "canonical_url").aggregate(
                [("priority", "max"), ("url_hash", "min")])
            uniq = pa.table({"canonical_url": agg["canonical_url"],
                             "priority": agg["priority_max"],
                             "url_hash": agg["url_hash_min"]})
            # sorted-by-url order preserved from the pandas
            # groupby(sort=True) this replaces — admitted.parquet row
            # order is part of the resume/conformance surface
            uniq = uniq.take(pc.sort_indices(uniq["canonical_url"]))
            uniq_tbl = finalize_links(uniq, self.num_parts)
            # fused two-phase admission: verdict + insert in one RPC
            # round to the owning shards (driver path only — the
            # distributed tail keeps split phases for its crash-replay
            # protocol).  Resume safety: an epoch that dies after this
            # call rebuilds shard state from COMMITTED admitted deltas,
            # so the live actors' extra adds are discarded with them.
            mask = checker.check_add(np.asarray(uniq_tbl["url_hash"]),
                                     uniq_tbl["canonical_url"])
            admitted_tbl = uniq_tbl.filter(pa.array(mask))
            n_unique_links = uniq_tbl.num_rows
        else:
            admitted_tbl = None
            n_unique_links = 0
        n_admitted = admitted_tbl.num_rows if admitted_tbl is not None else 0
        if n_admitted:
            pq.write_table(
                admitted_tbl.append_column(
                    "first_epoch", pa.array([e + 1] * n_admitted, pa.int32())),
                os.path.join(adm_dir, "admitted.parquet"))

        _mark("links_seen_admit")

        # 5. next frontier = (frontier - selected) ∪ admitted
        sel_hashes = np.sort(selected["url_hash"].to_numpy())
        keep = ~np.isin(np.asarray(frontier_tbl["url_hash"]), sel_hashes)
        remaining_tbl = frontier_tbl.filter(pa.array(keep))                                     .select(FRONTIER_SCHEMA.names)                                     .cast(FRONTIER_SCHEMA)
        parts_next = [remaining_tbl]
        if n_admitted:
            parts_next.append(
                admitted_tbl.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA))
        nxt_tbl = pa.concat_tables(parts_next)
        self._write_frontier(nxt_tbl, e)
        n_frontier_after = nxt_tbl.num_rows

        ray.get(flush_refs)  # texts durable BEFORE the epoch is committed
        _mark("frontier_write")
        return {
            "epoch": e, "selected": n_sel, **counts,
            "links_found": int(n_unique_links),
            "admitted": int(n_admitted), "frontier_after": int(n_frontier_after),
        }

    def _epoch_distributed(self, e: int, ffiles: list[str], _mark) -> dict:
        """Fully distributed epoch: the driver orchestrates with file
        paths, object refs and per-shard integers only — no URL, text or
        frontier row is ever materialized on it.  This is the scale path
        the small-epoch kernels mirror."""
        import ray
        import ray.data as rd

        edir = self._epoch_dir(e)
        rfns = _remote_fns()

        # per-part frontier file routing, computed once: used by the
        # fused selection below AND the fused admit/frontier tail (the
        # previous epoch always writes part-%05d files; fall back to the
        # whole list + predicate pushdown if a foreign layout appears)
        import re as _re

        by_part_f: dict[int, list[str]] = {}
        layout_ok = True
        for f in ffiles:
            m = _re.fullmatch(r"part-(\d+)\.parquet", os.path.basename(f))
            if m is None:
                layout_ok = False
                break
            by_part_f.setdefault(int(m.group(1)), []).append(f)

        # 1. distributed politeness selection, staged to per-part parquet
        # (hive layout) — the ONE partitioning key again.  Default path:
        # P map tasks (local top-B per host per part, split by host
        # bucket) + H reduce tasks (final per-host top-B, staged per
        # part) — plain partition-aligned tasks, no Ray Data execution
        # (~1.4 s/epoch constant removed).  The salted-scheduler variant
        # (mega-host splitting) stays on the Dataset path; both produce
        # the identical selected set (scheduler.select_map_part
        # docstring) and both are conformance-tested.
        sel_dir = os.path.join(edir, "selected")
        if layout_ok and not self.force_salted:
            os.makedirs(sel_dir, exist_ok=True)
            hb = min(64, max(1, self.num_parts))
            maps = []
            for p in range(self.num_parts):
                ff_p = by_part_f.get(p, [])
                if not ff_p:
                    continue
                if hb == 1:
                    maps.append([rfns["select_map"].remote(
                        ff_p, self.budget, 1)])
                else:
                    maps.append(rfns["select_map"].options(
                        num_returns=hb).remote(ff_p, self.budget, hb))
            ray.get([rfns["select_reduce"].remote(
                [m[h] for m in maps], self.budget, sel_dir, h)
                for h in range(hb)])
        else:
            sel_ds = select_epoch_ds(rd.read_parquet(ffiles), self.budget,
                                     force_salted=self.force_salted)
            sel_ds.write_parquet(sel_dir, partition_cols=["part"],
                                 mode="overwrite")
        part_files: dict[int, list[str]] = {}
        for name in sorted(os.listdir(sel_dir)):
            if name.startswith("part="):
                fl = self._parquet_files(os.path.join(sel_dir, name))
                if fl:
                    part_files[int(name.split("=", 1)[1])] = fl
        _mark("select")

        # 2. fetch: each actor pulls its OWN partitions from the staged
        # selection (partition-aligned read, no shuffle, no driver hop);
        # with stash_order=True the actor keeps an order-sorted run of
        # its outcomes and returns only a small host-sample table
        pool = self._fetch_pool
        by_rank: dict[int, dict[int, list[str]]] = {}
        for p, fl in part_files.items():
            by_rank.setdefault(p % len(pool), {})[p] = fl
        sample_refs, active = [], []
        for rank in sorted(by_rank):
            sref, _lref = pool[rank].fetch_stash_paths.options(
                num_returns=2).remote(by_rank[rank], self.num_parts,
                                      stash_order=True)
            sample_refs.append(sref)
            active.append(rank)
        _mark("fetch_submit")

        # 3. crawl-order record, written distributed WITHOUT a Ray Data
        # sort execution: host-range boundaries are planned from the
        # actors' samples, each actor slices its sorted run at the
        # boundaries (a host never straddles a range, and selection is
        # budget-bounded per host, so no range can be skewed beyond
        # hosts_per_range × B), and per-range merge tasks k-way-merge
        # the slices, seq-stamp with prefix-sum offsets and persist.
        order_dir = os.path.join(edir, "order")
        os.makedirs(order_dir, exist_ok=True)
        samples = np.sort(np.concatenate(
            [np.asarray(t["host"].to_pylist(), dtype=object)
             for t in ray.get(sample_refs)] or
            [np.zeros(0, dtype=object)]))
        _mark("fetch_wait_outcomes")
        n_ranges = min(self.num_parts, max(1, len(samples)))
        bcuts = (len(samples) * np.arange(1, n_ranges)) // n_ranges
        boundaries = np.unique(samples[bcuts]).tolist() if len(samples) else []
        handles = [pool[r] for r in active]
        counts_mat = np.asarray(ray.get(
            [h.split_order.remote(boundaries) for h in handles]))
        # queue the link split right behind split_order (AHEAD of the
        # zstd texts flush) on each actor: the fused admit/frontier tasks
        # below need these slices early; the flush only gates epoch commit
        if self.num_parts == 1:
            link_split = [[pool[r].split_links.remote(1)] for r in active]
        else:
            link_split = [pool[r].split_links.options(
                num_returns=self.num_parts).remote(self.num_parts)
                for r in active]
        range_counts = (counts_mat.sum(axis=0) if len(counts_mat)
                        else np.zeros(1, dtype=np.int64))
        n_sel = int(range_counts.sum())
        offsets = self._seq + np.concatenate(
            [[0], np.cumsum(range_counts)[:-1]]).astype(np.int64)
        shard_futs = [
            rfns["order_merge"].remote(
                handles, i, e, int(offsets[i]),
                os.path.join(order_dir, f"shard-{i:05d}.parquet"))
            for i in range(len(range_counts)) if range_counts[i]]
        counts = {"ok": 0, "miss": 0, "robots": 0}
        for c in ray.get(shard_futs):
            for k, v in c.items():
                counts[k] += v
        self._seq += n_sel
        # queue the zstd texts flush only AFTER the order merges are done:
        # actor method calls serialize, so a flush submitted earlier would
        # block every merge task's take_order_range behind ~seconds of
        # compression (measured +4.7 s on the epoch's order span).  Here it
        # overlaps the fused admit/frontier wave below, which never touches
        # the fetch actors.
        flush_refs = [
            pool[r].flush_texts.remote(
                os.path.join(edir, "texts", f"shard-{r:04d}.parquet"))
            for r in active]
        if self.emit_edges:
            flush_refs += [
                pool[r].flush_edges.remote(
                    os.path.join(edir, "edges", f"shard-{r:04d}.parquet"))
                for r in active]
        _mark("order_write")

        # 4+5 fused: P partition-aligned tasks — each gathers its part's
        # locally-deduped link slices from every fetch actor, finishes
        # the dedup over its DISJOINT key range (the link stream is
        # already partitioned by the one global key at the producer, so
        # the global groupby shuffle the round-2/3 chain ran — a full Ray
        # Data execution, ~2-6 s/epoch constant — is redundant), runs
        # two-phase seen admission straight against the owning shard
        # actors, checkpoints its admitted delta and writes its
        # next-frontier file.  The driver collects P count dicts.
        adm_dir = os.path.join(edir, "admitted")
        fr_dir = os.path.join(edir, "frontier")
        os.makedirs(adm_dir, exist_ok=True)
        futs = []
        for p in range(self.num_parts):
            ff = by_part_f.get(p, []) if layout_ok else ffiles
            futs.append(rfns["admit_frontier"].remote(
                p, [ls[p] for ls in link_split], ff, part_files.get(p, []),
                self._checker.shards, e,
                os.path.join(adm_dir, f"part-{p:05d}.parquet"),
                os.path.join(fr_dir, f"part-{p:05d}.parquet")))
        part_stats = ray.get(futs)
        n_unique_links = sum(s["links"] for s in part_stats)
        n_admitted = sum(s["admitted"] for s in part_stats)
        n_frontier_after = sum(s["frontier"] for s in part_stats)
        _mark("links_seen_admit")

        # texts durable BEFORE the epoch is committed
        ray.get(flush_refs)
        _mark("frontier_write")
        return {
            "epoch": e, "selected": n_sel, **counts,
            "links_found": int(n_unique_links),
            "admitted": int(n_admitted), "frontier_after": int(n_frontier_after),
        }

    # ------------------------------------------------------------ results
    def seen_count(self) -> int:
        """Final seen-set size from parquet metadata only — never
        materializes the URL set (safe at any frontier scale)."""
        total = 0
        for name in sorted(os.listdir(self.ckpt_dir)):
            if name.startswith("epoch_"):
                for f in self._parquet_files(
                        os.path.join(self.ckpt_dir, name, "admitted")):
                    total += pq.ParquetFile(f).metadata.num_rows
        return total

    def seen_table(self) -> pa.Table:
        """Final seen set from checkpoint deltas (canonical_url, url_hash,
        first_epoch) — sorted by url for comparison with the oracle."""
        parts = []
        for name in sorted(os.listdir(self.ckpt_dir)):
            files = self._parquet_files(os.path.join(self.ckpt_dir, name, "admitted"))
            if name.startswith("epoch_") and files:
                parts.append(pq.read_table(
                    files, columns=["canonical_url", "url_hash", "first_epoch"]))
        if not parts:
            return pa.table({"canonical_url": pa.array([], pa.string()),
                             "url_hash": pa.array([], pa.int64()),
                             "first_epoch": pa.array([], pa.int32())})
        t = pa.concat_tables(parts, promote_options="default")
        return t.sort_by("canonical_url").cast(pa.schema([
            ("canonical_url", pa.string()), ("url_hash", pa.int64()),
            ("first_epoch", pa.int32())]))

    def order_table(self) -> pa.Table:
        """Crawl-order record across epochs, sorted by seq.  Reads both
        layouts: the small path's single order.parquet and the
        distributed path's order/shard-*.parquet directory."""
        parts = []
        for name in sorted(os.listdir(self.ckpt_dir)):
            if not name.startswith("epoch_"):
                continue
            p = os.path.join(self.ckpt_dir, name, "order.parquet")
            if os.path.exists(p):
                parts.append(pq.read_table(p))
            for f in self._parquet_files(os.path.join(self.ckpt_dir, name, "order")):
                parts.append(pq.read_table(f))
        if not parts:
            return pa.Table.from_pylist([], schema=_ORDER_SCHEMA)
        return pa.concat_tables(parts).sort_by("seq")

    def edges_table(self) -> pa.Table:
        """DISTINCT href edges across epochs (requires emit_edges=True) —
        each shard is per-actor-distinct; the cross-shard distinct here
        is tiny because the seen set guarantees each page is fetched
        (and therefore contributes edges) exactly once."""
        parts = []
        for name in sorted(os.listdir(self.ckpt_dir)):
            files = self._parquet_files(os.path.join(self.ckpt_dir, name, "edges"))
            if name.startswith("epoch_") and files:
                parts.append(pq.read_table(files))
        if not parts:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        allp = pa.concat_tables(parts, promote_options="default")
        return (pa.TableGroupBy(allp, ["src", "dst"]).aggregate([])
                .select(["src", "dst"]).sort_by([("src", "ascending"),
                                                 ("dst", "ascending")]))

    def text_table(self) -> pa.Table:
        parts = []
        for name in sorted(os.listdir(self.ckpt_dir)):
            files = self._parquet_files(os.path.join(self.ckpt_dir, name, "texts"))
            if name.startswith("epoch_") and files:
                parts.append(pq.read_table(files))
        if not parts:
            return pa.table({"url": pa.array([], pa.string()),
                             "text": pa.array([], pa.string())})
        return pa.concat_tables(parts, promote_options="default").sort_by("url")


def crawl(pages_path: str, seeds: pa.Table, politeness: dict, ckpt_dir: str,
          **kw) -> CrawlEngine:
    """Convenience: fresh crawl, returns the engine for result access."""
    eng = CrawlEngine(pages_path, politeness, ckpt_dir, **kw)
    eng.run(seeds=seeds)
    return eng
