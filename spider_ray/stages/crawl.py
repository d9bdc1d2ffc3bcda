"""Ray Data stages of the crawl pipeline.

Every stage is a map_batches callable over Arrow batches; the only
stateful stage (FetchWorker — robots cache, SURVEY.md §2 #13 analogue) is
a callable CLASS run as an actor pool.  All URL/text semantics are
imported from spider_ray.common — the same modules the oracle uses.

Partitioning: the ONE key reused everywhere is part = url_hash % P
(spider_ray.common.hashing.part_of): frontier storage, seen shards, and
the pages fetch index are all aligned on it, so the per-epoch fetch is a
partition-aligned join with NO shuffle.  Host skew cannot concentrate a
partition because the key is the url hash (uniform), not the host — this
is the structural half of the north rule's skew mitigation; the salted
scheduling reduce (scheduler.py) is the other half.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..common.extract import (_decode_column, extract_hrefs_batch,
                              extract_text_batch, extract_text_batch_arrow)
from ..common.hashing import hash64_many
from ..common.urlnorm import (
    canonicalize,
    host_of,
    host_of_batch,
    path_of,
    resolve_batch,
    robots_denied,
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("canonical_url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.float64()),
        ("url_hash", pa.int64()),
        ("part", pa.int32()),
    ]
)


def canon_table(urls: list[str], priorities: np.ndarray, num_parts: int) -> pa.Table:
    """Canonicalize raw urls -> FRONTIER_SCHEMA rows (invalid urls dropped,
    duplicates collapsed to MAX priority)."""
    agg: dict[str, float] = {}
    for u, p in zip(urls, priorities):
        c = canonicalize(u)
        if c is None:
            continue
        q = agg.get(c)
        if q is None or p > q:
            agg[c] = float(p)
    cu = list(agg.keys())
    h = hash64_many(cu) if cu else np.array([], dtype=np.int64)
    return pa.table(
        {
            "canonical_url": pa.array(cu, pa.string()),
            "host": pa.array([host_of(u) for u in cu], pa.string()),
            "priority": pa.array([agg[u] for u in cu], pa.float64()),
            "url_hash": pa.array(h, pa.int64()),
            "part": pa.array((h % num_parts).astype(np.int32), pa.int32()),
        }
    )


# --------------------------------------------------------------------------
# pages fetch index (built once per input; partition-aligned with frontier)
# --------------------------------------------------------------------------

def build_pages_index(pages_path: str, index_dir: str, num_parts: int) -> dict:
    """One-time preprocessing: pages.parquet -> index_dir/part=J/ parquet
    with (url_hash, canonical_url, html).  Idempotent via param marker.

    Columns are pruned at the read (url + html only); canonicalization is
    the only per-row Python and runs once per corpus, not per epoch.
    """
    import ray.data as rd

    marker = os.path.join(index_dir, "_INDEX_DONE.json")
    key = json.dumps({"pages": os.path.abspath(pages_path),
                      "mtime": os.path.getmtime(pages_path),
                      "parts": num_parts,
                      "schema_v": 3}, sort_keys=True)  # bump on index schema change
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == key:
                return {"reused": True}
    os.makedirs(index_dir, exist_ok=True)

    def to_index(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        canon = [canonicalize(u) for u in urls]
        keep = [i for i, c in enumerate(canon) if c is not None]
        cu = [canon[i] for i in keep]
        h = hash64_many(cu) if cu else np.array([], dtype=np.int64)
        keep_idx = pa.array(keep, pa.int64())
        return pa.table(
            {
                "url_hash": pa.array(h, pa.int64()),
                "canonical_url": pa.array(cu, pa.string()),
                "html": pc.take(batch["html"], keep_idx),
                "warc_ts": pc.take(batch["warc_ts"], keep_idx),
                "part": pa.array((h % num_parts).astype(np.int32), pa.int32()),
            }
        )

    (
        rd.read_parquet(pages_path, columns=["url", "html", "warc_ts"])
        .map_batches(to_index, batch_format="pyarrow")
        .write_parquet(index_dir, partition_cols=["part"], mode="overwrite")
    )
    _compact_index_parts(index_dir, num_parts)
    with open(marker, "w") as f:
        f.write(key)
    return {"reused": False}


def _compact_index_parts(index_dir: str, num_parts: int,
                         max_files: int = 8) -> None:
    """Rewrite fragmented part dirs as one file with bounded row groups.

    write_parquet(partition_cols) splits EVERY task's block by partition
    value, so P parts x B blocks leaves ~B tiny files per part (measured
    141 x 46-row files per part on a fine-row-grouped corpus) — a
    part-shard load then pays per-file open/footer costs on every cache
    miss and every resume.  One Ray task per part compacts its dir; a
    crash mid-compaction is safe (atomic rename per part, fragments
    removed only after the compacted file is in place)."""
    import ray

    @ray.remote(num_cpus=1)
    def compact(part_dir: str) -> int:
        files = [os.path.join(part_dir, f) for f in os.listdir(part_dir)
                 if f.endswith(".parquet")]
        if len(files) <= max_files:
            return 0
        t = pq.read_table(part_dir, use_threads=False)
        tmp = os.path.join(part_dir, "_compact.tmp")
        # small row groups = the gather's pruning granularity: a fetch
        # for K urls decompresses only the row groups those urls live
        # in, not the whole shard (IndexFetcher caches NO html — see
        # _load_part — so this is what bounds per-call read work)
        pq.write_table(t, tmp, row_group_size=512)
        os.replace(tmp, os.path.join(part_dir, "compacted.parquet"))
        for f in files:
            os.remove(f)
        return len(files)

    futs = []
    for p in range(num_parts):
        d = os.path.join(index_dir, f"part={p}")
        if os.path.isdir(d):
            futs.append(compact.remote(d))
    ray.get(futs)


# --------------------------------------------------------------------------
# fetch + extract (stateful actor pool)
# --------------------------------------------------------------------------

class IndexFetcher:
    """The no-network page fetcher: resolves url hashes against the
    partition-aligned pages index built by build_pages_index.  This is
    the sandbox stand-in for live HTTP — the Fetcher SEAM below marks
    where a real crawler plugs in (same pattern as
    pipelines/multimodal.decode_image_real's codec seam).

    Fetcher contract (duck-typed; FetchWorker only calls these):
      warm(part) -> int                       optional cache preload
      fetch_part(part, url_hashes, urls) -> list[bytes | None]
        one html payload (or None = unfetchable/miss) PER input row,
        row-aligned.  `part` batches rows by the engine's partition key
        so an implementation can exploit locality (index shard cache
        here; per-host connection pools for HTTP).
    """

    def __init__(self, index_dir: str, max_cached_parts: int = 64):
        self.index_dir = index_dir
        # part cache: (sorted url hashes, argsort order, html column).
        # The html column is backed by the RAY OBJECT STORE, not the
        # actor heap: 32 actors each pinning a ~160 MB shard as
        # anonymous heap memory puts ~5 GB of per-process anon pages on
        # the node, which on an overcommitted host slows EVERY phase of
        # every process 10-20x (measured: +300 MB resident ballast per
        # process inflated the extraction kernel 9.3 s -> 102 s wall at
        # 32 procs; with small heaps the same kernel ran at isolated
        # speed).  ray.put once + a zero-copy ray.get view keeps ONE
        # shm-backed, evictable/spillable copy per node that all
        # gathers read through — heap residency stays kilobytes.
        self._cache: dict[int, tuple[np.ndarray, np.ndarray, pa.Array]] = {}
        self._pins: dict[int, object] = {}  # ObjectRef keepalives
        self._max_cached = max_cached_parts

    def warm(self, part: int) -> int:
        """Populate the cache for one shard; returns its row count (small
        return only — never ship the shard back to the caller)."""
        sorted_h, _, _ = self._load_part(part)
        return len(sorted_h)

    def fetch_part(self, part: int, url_hashes: np.ndarray,
                   urls: list[str]) -> list:
        """Row-aligned html payloads for one partition's urls (None =
        miss).  O(log n) sorted-hash membership + one vectorized gather."""
        arr = self.fetch_part_arrow(int(part), np.asarray(url_hashes))
        return arr.to_pylist()

    def fetch_part_arrow(self, part: int, url_hashes: np.ndarray) -> pa.Array:
        """Arrow-native variant of fetch_part: row-aligned binary array
        with NULL at misses.  The html payloads never materialize as
        Python bytes — the take indices carry a null mask, so the gather
        is one zero-copy-offset buffer build instead of len(urls)
        PyBytes allocations (the dominant per-batch allocation churn of
        the fetch stage on a 25 KB/page corpus)."""
        sorted_h, order, html_col = self._load_part(int(part))
        h = np.asarray(url_hashes)
        if len(sorted_h) == 0:
            return pa.nulls(len(h), pa.binary())
        pos = np.searchsorted(sorted_h, h)
        pos_c = np.clip(pos, 0, len(sorted_h) - 1)
        found = sorted_h[pos_c] == h
        idx = pa.array(order[pos_c], pa.int64(), mask=~found)
        return html_col.take(idx)

    def _shm_backed(self, part: int, html: pa.Array) -> pa.Array:
        """Move a shard's html column into the object store and return a
        zero-copy view (see __init__); falls back to the heap array when
        no Ray session exists (driver-side oracle/test usage)."""
        try:
            import ray
            if not ray.is_initialized():
                return html
            ref = ray.put(html)
            view = ray.get(ref)
            self._pins[part] = ref  # keep the plasma object alive
            return (view.combine_chunks()
                    if isinstance(view, pa.ChunkedArray) else view)
        except Exception:
            return html

    def _load_part(self, part: int):
        """Sorted-hash lookup index for one pages shard: O(log n)
        membership + one vectorized gather per batch — cheaper and
        single-threaded vs an Arrow hash join per call.

        Duplicate canonical urls (recrawls) resolve to the LATEST capture
        by (warc_ts, html) — the same contract as the oracle's index."""
        if part in self._cache:
            return self._cache[part]
        if os.environ.get("SPIDER_RAY_FETCH_DEBUG"):
            import time as _t
            print(f"[fetch] COLD part load part={part} t={_t.time():.2f}",
                  flush=True)
        part_dir = os.path.join(self.index_dir, f"part={part}")
        if not os.path.isdir(part_dir):
            entry = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                     pa.array([], pa.binary()))
        else:
            t = pq.read_table(part_dir, columns=["url_hash", "html", "warc_ts"],
                              use_threads=False)
            h = np.asarray(t["url_hash"])
            order = np.argsort(h, kind="stable").astype(np.int64)
            hs = h[order]
            dup = np.zeros(len(hs), dtype=bool)
            dup[1:] = hs[1:] == hs[:-1]
            if dup.any():
                # rare path: pick max (warc_ts, html) per duplicate hash
                ts = np.asarray(t["warc_ts"]).astype("datetime64[us]").astype(np.int64)
                html_col = t["html"]
                keep_rows = []
                i = 0
                while i < len(hs):
                    j = i
                    while j + 1 < len(hs) and hs[j + 1] == hs[i]:
                        j += 1
                    if j == i:
                        keep_rows.append(order[i])
                    else:
                        grp = order[i:j + 1]
                        keep_rows.append(max(
                            grp, key=lambda r: (ts[r], html_col[int(r)].as_py())))
                    i = j + 1
                order = np.asarray(keep_rows, dtype=np.int64)
                hs = h[order]
            html = self._shm_backed(part, t["html"].combine_chunks())
            del t  # drop the heap copy before caching the shm view
            entry = (hs, order, html)
        if len(self._cache) >= self._max_cached:
            old = next(iter(self._cache))
            self._cache.pop(old)  # FIFO eviction
            self._pins.pop(old, None)
        self._cache[part] = entry
        return entry


class HttpFetcher:
    """Live HTTP transport for the fetch stage (cf. the reference's
    remote side-effect workers, `cmd/slack-worker/main.go:31-84`):
    stdlib http.client GETs with per-(scheme, host, port) connection
    reuse, one stale-connection retry, and every failure mode —
    timeout, refused, non-200, bad keep-alive — mapped to None so the
    CALLER routes it to the `miss` outcome port.  Robots/politeness are
    applied upstream by FetchWorker, keeping the politeness layer
    transport-independent.

    `proxy=(host, port)` sends absolute-URI requests through a forward
    proxy — how a production crawl egress usually runs, and how the
    loopback conformance test serves a many-host corpus from one local
    socket without DNS.  This sandbox has no external network, so the
    pytest loopback server is the full in-sandbox exercise of this
    class; IndexFetcher remains the default fetcher."""

    def __init__(self, user_agent: str = "spider-ray/1.0",
                 timeout_s: float = 10.0,
                 proxy: tuple[str, int] | None = None,
                 tunnel_https: bool = True):
        self.user_agent = user_agent
        self.timeout_s = timeout_s
        self.proxy = tuple(proxy) if proxy else None
        # tunnel_https=True (default): https through the proxy uses a
        # CONNECT tunnel — what every standards-compliant forward proxy
        # requires.  False = send https as plaintext absolute-URI GETs,
        # the TLS-terminating lab-proxy mode the loopback conformance
        # server speaks (a plain HTTP server can then serve a
        # mixed-scheme corpus from one socket without certificates).
        self.tunnel_https = tunnel_https
        self._conns: dict = {}

    def warm(self, part: int) -> int:
        return 0  # nothing to preload; connection pools fill lazily

    def _get(self, url: str):
        import http.client
        import urllib.parse

        try:
            p = urllib.parse.urlsplit(url)
            https = p.scheme == "https"
            if not p.hostname:  # malformed/relative url -> per-row miss
                return None
            tport = p.port  # ValueError on ':8a'/out-of-range ports —
        except ValueError:    # the contract maps EVERY bad url to miss
            return None
        tunnel = self.proxy is not None and https and self.tunnel_https
        if tunnel:
            # https through a forward proxy = CONNECT tunnel (a
            # plaintext absolute-URI GET would be rejected by any
            # standards-compliant proxy); pool per target host so
            # tunnels aren't cross-wired between hosts
            key = (self.proxy, p.hostname, tport)
            target = (p.path or "/") + (f"?{p.query}" if p.query else "")
        elif self.proxy:
            key = self.proxy
            target = url  # absolute-URI request line (proxy semantics)
        else:
            key = (p.scheme, p.hostname, tport)
            target = (p.path or "/") + (f"?{p.query}" if p.query else "")
        conn = self._conns.pop(key, None)
        for _attempt in range(2):  # retry once on a stale kept-alive conn
            try:
                if conn is None:
                    host, port = (self.proxy if self.proxy
                                  else (p.hostname, tport))
                    # TLS only end-to-end (direct https) or through a
                    # CONNECT tunnel; proxied-plaintext mode stays HTTP
                    cls = (http.client.HTTPSConnection
                           if https and (tunnel or not self.proxy)
                           else http.client.HTTPConnection)
                    conn = cls(host, port, timeout=self.timeout_s)
                    if tunnel:
                        conn.set_tunnel(p.hostname, tport or 443)
                conn.request("GET", target,
                             headers={"User-Agent": self.user_agent,
                                      "Host": p.netloc})
                r = conn.getresponse()
                body = r.read()
                self._conns[key] = conn  # keep-alive for the next row
                return body if r.status == 200 else None
            except Exception:
                try:
                    if conn is not None:
                        conn.close()
                except Exception:
                    pass
                conn = None
        return None  # both attempts failed -> miss outcome upstream

    def fetch_part(self, part: int, url_hashes: np.ndarray,
                   urls: list[str]) -> list:
        """Row-aligned html payloads (None = miss) — sequential GETs
        with connection reuse; parallelism comes from the actor POOL
        (one HttpFetcher per FetchWorker), not from per-row threads."""
        return [self._get(u) for u in urls]


class FetchWorker:
    """Stateful fetch stage: resolve selected urls through the Fetcher
    seam (IndexFetcher by default), apply robots, extract text + links.

    __init__ (once per actor): parse the robots config into prefix lists —
    the reference's "worker loads its configs once" hook
    (`pkg/spider/worker.go:82-91`) — and set up the fetcher (per-actor
    part-shard cache for IndexFetcher).  __call__ (per batch): a
    partition-aligned lookup (selected ⋈ index part), then per-row
    extraction.

    Deployment: the engine runs a PERSISTENT pool of these as raw Ray
    actors (engine._init_fetch_pool) — the one place the Dataset API
    can't express the semantics we need: robots + hot index shards are
    cross-EPOCH state, and a map_batches actor pool is torn down after
    each execution.  Each actor owns parts where part % pool == rank, so
    its cache holds only its own shards (at 10^10 scale the cache is an
    LRU over row-group reads; here whole shard files — max_cached_parts
    bounds memory either way).

    Outcome ports ok/miss/robots mirror the reference's meta_output
    routing (`cmd/control-flow-worker/main.go:30-34`).
    """

    def __init__(self, index_dir: str, robots: dict[str, list[str]],
                 max_cached_parts: int = 64, fetcher=None,
                 emit_edges: bool = False):
        self.emit_edges = emit_edges
        # one Arrow thread per actor: the POOL is the parallelism unit;
        # letting every actor spawn a machine-wide Arrow thread pool
        # (join/parquet default) makes N actors thrash N*cores threads
        pa.set_cpu_count(1)
        self.robots = {h: sorted(p) for h, p in robots.items()}
        self.fetcher = (fetcher if fetcher is not None else
                        IndexFetcher(index_dir,
                                     max_cached_parts=max_cached_parts))

    def _denied(self, host: str, path: str) -> bool:
        return robots_denied(self.robots, host, path)

    def update_robots(self, robots: dict[str, list[str]]) -> None:
        """Config-change reconcile hook: the engine pushes new robots
        rules when the politeness file changes between epochs (the
        reference's cron-trigger diff/reconcile loop,
        `cmd/cron-trigger/main.go:94-226`, collapsed to a broadcast)."""
        self.robots = {h: sorted(p) for h, p in robots.items()}

    def warm(self, part: int) -> int:
        return self.fetcher.warm(part)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        _dbg = bool(os.environ.get("SPIDER_RAY_FETCH_DEBUG"))
        _t0 = _time.time()
        if batch.num_rows == 0:
            return _empty_fetch_table()
        parts = pc.unique(batch["part"]).to_pylist()
        urls, hosts, prios = [], [], []
        html_arrs: list[pa.Array] = []
        for p in sorted(parts):
            sel = batch.filter(pc.equal(batch["part"], p))
            part_urls = sel["canonical_url"].to_pylist()
            urls += part_urls
            hosts += sel["host"].to_pylist()
            prios += sel["priority"].to_pylist()
            hashes = np.asarray(sel["url_hash"])
            if hasattr(self.fetcher, "fetch_part_arrow"):
                # Arrow-native gather: html stays an Arrow binary array
                # end to end — never len(urls) Python bytes objects
                html_arrs.append(self.fetcher.fetch_part_arrow(int(p), hashes))
            else:  # Fetcher seam (HttpFetcher / test doubles): list API
                html_arrs.append(pa.array(
                    self.fetcher.fetch_part(int(p), hashes, part_urls),
                    pa.binary()))
        html_col = pa.concat_arrays(
            [a.cast(pa.binary()) for a in html_arrs])
        _t1 = _time.time()
        # route outcomes first, then extract text for ALL ok rows in one
        # batch kernel call (Arrow RE2 passes over the whole column —
        # extraction is the dominant crawl cost, see common/extract)
        have_html = np.asarray(pc.is_valid(html_col))
        n = len(urls)
        out_outcome = []
        ok_rows = []
        for i, (u, h) in enumerate(zip(urls, hosts)):
            if self._denied(h, path_of(u)):
                out_outcome.append("robots")
            elif not have_html[i]:
                out_outcome.append("miss")
            else:
                out_outcome.append("ok")
                ok_rows.append(i)
        _t2 = _time.time()
        if ok_rows:
            ok_arr = np.asarray(ok_rows, dtype=np.int64)
            # decode ONCE (Arrow cast), reuse for text extraction and
            # the href scan — both fully vectorized RE2 batch kernels
            ok_html = _decode_column(html_col.take(pa.array(ok_arr)))
            # text stays an Arrow array end to end: scatter the ok-row
            # texts into the n-row column via take with null indices
            # (miss/robots rows -> null) — no Python-string round-trip
            texts_ok = extract_text_batch_arrow(ok_html)
            scat = np.full(n, -1, dtype=np.int64)
            scat[ok_arr] = np.arange(len(ok_arr), dtype=np.int64)
            text_col = texts_ok.take(pa.array(scat, pa.int64(),
                                              mask=scat < 0))
            _t3 = _time.time()
            # hrefs flattened with parent rows by the batch kernel (no
            # per-page Python scan), resolved in ONE vectorized call
            # (RE2 fast paths + exact slow rows), regrouped into the
            # list column by offsets (parent is non-decreasing: ok_arr
            # ascending, fragment order within each row preserved)
            all_hrefs, par = extract_hrefs_batch(ok_html)
            parent = ok_arr[par]
            resolved = resolve_batch(
                all_hrefs, [urls[i] for i in parent])
            res_arr = pa.array(resolved, pa.string())
            valid = np.asarray(pc.is_valid(res_arr)) if len(res_arr) \
                else np.zeros(0, dtype=bool)
            counts = np.bincount(parent[valid], minlength=n)
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(counts, out=offsets[1:])
            links_col = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), res_arr.drop_null())
        else:
            _t3 = _time.time()
            text_col = pa.nulls(n, pa.string())
            links_col = pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()),
                pa.array([], pa.string()))
        if _dbg:
            print(f"[fetch] rows={batch.num_rows} gather={_t1-_t0:.2f} "
                  f"route={_t2-_t1:.2f} text={_t3-_t2:.2f} "
                  f"links={_time.time()-_t3:.2f} "
                  f"t_start={_t0:.2f} t_end={_time.time():.2f}", flush=True)
        return pa.table(
            {
                "canonical_url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "priority": pa.array(prios, pa.float64()),
                "outcome": pa.array(out_outcome, pa.string()),
                "text": text_col,
                "links": links_col,
            }
        )

    def fetch(self, batch: pa.Table) -> tuple[pa.Table, pa.Table]:
        """Persistent-pool entry point: returns (fetched, outcomes) where
        outcomes is the tiny (canonical_url, outcome) projection the
        driver needs for the crawl-order record — called with
        num_returns=2 so the big table never moves to the driver."""
        fetched = self(batch)
        return fetched, fetched.select(["canonical_url", "outcome"])

    def fetch_stash(self, batch: pa.Table, num_parts: int,
                    stash_order: bool = False) -> tuple[pa.Table, pa.Table]:
        """Fused fetch + link fan-out, with the texts payload STASHED in
        actor memory for a separate flush_texts() call: the driver gets
        (outcomes, links) as soon as extraction finishes and does its
        link-dedup / frontier work while the actor writes its shard —
        actor method calls are serialized, so flush always runs after
        fetch and before the next epoch's fetch.  The wide `text` column
        never crosses the object store.

        stash_order=False (driver epoch): the outcome projection keeps
        host + priority so the caller can order-stamp directly.
        stash_order=True (distributed epoch): the actor ALSO sorts its
        outcomes by the deterministic crawl-order key and keeps the
        sorted run in actor state; the first return value is then only a
        small HOST SAMPLE table (every ~64th host) — the driver plans
        host-range merge boundaries from the samples and the sorted rows
        flow actor→merge-task, never through the driver (the round-2
        path ran a whole Ray Data sort execution for this).  Links are
        STASHED too (second return value is an empty placeholder): the
        fused epoch tail pulls them per-part via split_links(), so the
        full link set never forms one big object-store table."""
        import time as _time

        _t0 = _time.time()
        fetched = self(batch)
        _t1 = _time.time()
        self._pending_texts = (
            fetched.filter(pc.equal(fetched["outcome"], "ok"))
                   .select(["canonical_url", "text"])
                   .rename_columns(["url", "text"]))
        if self.emit_edges:
            # optional first-class href-graph artifact: the (src, dst)
            # edges THIS actor just extracted, deduped in-table — flushed
            # actor-side by flush_edges like the texts shard, so graph
            # analytics (jobs/run_graph.py, pipelines/graph.py) never
            # re-parse the corpus.  Purely additive: the existing link
            # flow (explode_links -> frontier) is untouched.
            lcol = fetched["links"]
            if isinstance(lcol, pa.ChunkedArray):
                lcol = lcol.combine_chunks()
            flat = lcol.flatten()
            par = pc.list_parent_indices(lcol)
            edges = pa.table({
                "src": pc.take(fetched["canonical_url"], par),
                "dst": flat,
            })
            self._pending_edges = (
                pa.TableGroupBy(edges, ["src", "dst"]).aggregate([])
                .select(["src", "dst"]))
        links = explode_links(fetched, num_parts)
        outcomes = fetched.select(
            ["canonical_url", "host", "priority", "outcome"])
        if not stash_order:
            # driver epoch: pre-reduce THIS actor's links (max priority
            # per url — the combiner for the driver's global max) and
            # hash them here, so the per-actor duplicate mass never
            # crosses the object store and the driver's serial
            # links_seen_admit stage keys Arrow int64/string aggregates
            # over pre-shrunk input instead of re-hashing every row
            if links.num_rows:
                agg = pa.TableGroupBy(links, "canonical_url").aggregate(
                    [("priority", "max")])
                links = pa.table({
                    "canonical_url": agg["canonical_url"],
                    "priority": agg["priority_max"],
                    "url_hash": pa.array(
                        hash64_many(agg["canonical_url"].to_pylist()),
                        pa.int64()),
                })
            else:
                links = pa.table({
                    "canonical_url": pa.array([], pa.string()),
                    "priority": pa.array([], pa.float64()),
                    "url_hash": pa.array([], pa.int64()),
                })
            return outcomes, links
        # distributed path: hash links actor-side (parallel, overlapped
        # with fetch) so the link-dedup groupby keys on int64 first —
        # sorting/partitioning 64-bit ints instead of URL strings; the
        # string key stays second for hash-collision correctness
        if links.num_rows:
            links = links.append_column("url_hash", pa.array(
                hash64_many(links["canonical_url"].to_pylist()), pa.int64()))
        else:
            links = links.append_column("url_hash",
                                        pa.array([], pa.int64()))
        self._links = links
        df = outcomes.to_pandas()
        df = (df.assign(neg_priority=-df["priority"])
              .sort_values(["host", "neg_priority", "canonical_url"],
                           kind="mergesort")
              .drop(columns=["neg_priority"]))
        self._order_sorted = pa.Table.from_pandas(df, preserve_index=False)
        step = max(1, len(df) // 64)
        if os.environ.get("SPIDER_RAY_FETCH_DEBUG"):
            print(f"[fetch_stash] rows={batch.num_rows} "
                  f"call={_t1 - _t0:.2f}s tail={_time.time() - _t1:.2f}s "
                  f"t_end={_time.time():.2f}", flush=True)
        return pa.table({"host": pa.array(
            df["host"].to_numpy()[::step], pa.string())}), _EMPTY_LINKS

    def split_links(self, num_parts: int):
        """Locally dedup the stashed link set (max priority per url) and
        split it by the ONE global key part = url_hash % P.  Called with
        num_returns=num_parts so each slice is its own object — the P
        fused admit/frontier tasks each fetch ONLY their part's slices
        from every actor, finishing the dedup over disjoint key ranges
        with no global shuffle.  Returns the bare table when
        num_parts == 1 (Ray num_returns=1 doesn't unpack).  The stash is
        kept until the next fetch overwrites it (idempotent re-split,
        like take_order_range).

        Scale note: this is the classic M×N shuffle-fragment layout
        (A actors × P parts objects per epoch).  At num_parts ≈ cluster
        cores (jobs/run_crawl.py sizing) that is ≤ ~10⁵–10⁶ small
        objects — fine for Ray's store — but if P×A grows past that,
        coarsen: return one object per RANGE of parts (parts_per_range
        = ceil(P×A / budget)) and let each admit task slice its part
        out, trading one extra zero-copy slice for P×A/parts_per_range
        fewer store entries."""
        links = getattr(self, "_links", None)
        if links is None or links.num_rows == 0:
            return _EMPTY_LINKS if num_parts == 1 else [_EMPTY_LINKS] * num_parts
        uniq = (pa.TableGroupBy(links, ["url_hash", "canonical_url"])
                .aggregate([("priority", "max")])
                .rename_columns(["url_hash", "canonical_url", "priority"]))
        if num_parts == 1:
            return uniq
        part = (np.asarray(uniq["url_hash"], dtype=np.int64)
                % num_parts).astype(np.int64)
        order = np.argsort(part, kind="stable")
        srt = uniq.take(pa.array(order))
        cuts = np.searchsorted(part[order], np.arange(num_parts + 1))
        return [srt.slice(int(cuts[p]), int(cuts[p + 1] - cuts[p]))
                for p in range(num_parts)]

    def split_order(self, boundaries: list[str]) -> np.ndarray:
        """Slice the stashed sorted order run at the given host
        boundaries (rows with host >= boundary[i] fall into range i+1).
        Returns the per-range row counts; slices stay in actor state for
        take_order_range (idempotent — a merge-task retry re-takes)."""
        t = getattr(self, "_order_sorted", None)
        if t is None or t.num_rows == 0:
            n = len(boundaries) + 1
            self._order_slices = [None] * n
            return np.zeros(n, dtype=np.int64)
        hosts = np.asarray(t["host"].to_pylist(), dtype=object)
        cuts = np.concatenate([
            [0], np.searchsorted(hosts, np.asarray(boundaries, dtype=object)),
            [len(hosts)]]).astype(np.int64)
        self._order_slices = [t.slice(int(cuts[i]), int(cuts[i + 1] - cuts[i]))
                              for i in range(len(cuts) - 1)]
        return np.diff(cuts)

    def take_order_range(self, idx: int) -> pa.Table | None:
        return self._order_slices[idx]

    def fetch_stash_paths(self, part_files: dict[int, list[str]],
                          num_parts: int,
                          stash_order: bool = False) -> tuple[pa.Table, pa.Table]:
        """Distributed-epoch entry point: the actor PULLS its own
        partitions from the staged per-part selection parquet (hive
        layout, so `part` rides in the directory name) — selection rows
        route actor-side, never through the driver."""
        tables = []
        import time as _time
        _r0 = _time.time()
        nfiles = 0
        for p in sorted(part_files):
            t = pq.read_table(
                part_files[p],
                columns=["canonical_url", "host", "priority", "url_hash"],
                use_threads=False)
            nfiles += len(part_files[p])
            tables.append(t.append_column(
                "part", pa.array(np.full(t.num_rows, p, np.int32))))
        if os.environ.get("SPIDER_RAY_FETCH_DEBUG"):
            print(f"[stash_paths] start={_r0:.2f} files={nfiles} "
                  f"read={_time.time() - _r0:.2f}s", flush=True)
        batch = pa.concat_tables(tables) if tables else pa.table({
            "canonical_url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "priority": pa.array([], pa.float64()),
            "url_hash": pa.array([], pa.int64()),
            "part": pa.array([], pa.int32()),
        })
        return self.fetch_stash(batch, num_parts, stash_order=stash_order)

    def flush_texts(self, texts_path: str) -> int:
        """Write the stashed texts shard (one parquet file per actor per
        epoch — the resumable-output layout).  Atomic rename => replay-
        safe; the engine joins these refs BEFORE marking the epoch
        complete, so a crash between fetch and flush replays the epoch."""
        texts = getattr(self, "_pending_texts", None)
        if texts is None:
            return 0
        self._pending_texts = None
        os.makedirs(os.path.dirname(texts_path), exist_ok=True)
        tmp = texts_path + ".tmp"
        # zstd: ~3x fewer bytes than snappy on extracted text — disk
        # bandwidth is the shared serial resource on a single node, CPU
        # (the compressor) is the parallel one
        pq.write_table(texts, tmp, compression="zstd")
        os.replace(tmp, texts_path)
        return texts.num_rows

    def flush_edges(self, edges_path: str) -> int:
        """Write the stashed href-edge shard (same atomic-rename,
        one-file-per-actor-per-epoch layout as flush_texts)."""
        edges = getattr(self, "_pending_edges", None)
        if edges is None:
            return 0
        self._pending_edges = None
        os.makedirs(os.path.dirname(edges_path), exist_ok=True)
        tmp = edges_path + ".tmp"
        pq.write_table(edges, tmp, compression="zstd")
        os.replace(tmp, edges_path)
        return edges.num_rows


# schema of split_links slices (and their concat in the fused epoch tail)
_EMPTY_LINKS = pa.table({
    "url_hash": pa.array([], pa.int64()),
    "canonical_url": pa.array([], pa.string()),
    "priority": pa.array([], pa.float64()),
})


def _empty_fetch_table() -> pa.Table:
    return pa.table(
        {
            "canonical_url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "priority": pa.array([], pa.float64()),
            "outcome": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "links": pa.array([], pa.list_(pa.string())),
        }
    )


def explode_links(batch: pa.Table, num_parts: int) -> pa.Table:
    """1 fetched page -> k child rows (the reference's fan-out operator,
    `cmd/fd-order-worker/main.go:29-52`).  Child priority = parent - 1.0.
    Vectorized via Arrow list kernels (no Python loop)."""
    links = batch["links"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = links.flatten()
    if len(flat) == 0:
        return pa.table({"canonical_url": pa.array([], pa.string()),
                         "priority": pa.array([], pa.float64())})
    parent_idx = pc.list_parent_indices(links)
    child_prio = pc.subtract(pc.take(batch["priority"], parent_idx), 1.0)
    return pa.table({"canonical_url": flat, "priority": child_prio})


def finalize_links(batch: pa.Table, num_parts: int) -> pa.Table:
    """Add host / url_hash / part to deduplicated link rows (urls are
    already canonical — resolve() canonicalizes).  Host extraction is
    the vectorized RE2 kernel (host_of_batch == host_of per row on
    canonical urls, hypothesis-tested)."""
    if "url_hash" in batch.column_names:  # distributed path pre-hashed
        h = np.asarray(batch["url_hash"], dtype=np.int64)
    else:
        urls = batch["canonical_url"].to_pylist()
        h = hash64_many(urls) if urls else np.array([], dtype=np.int64)
    return pa.table(
        {
            "canonical_url": batch["canonical_url"],
            "host": host_of_batch(batch["canonical_url"]),
            "priority": batch["priority"],
            "url_hash": pa.array(h, pa.int64()),
            "part": pa.array((h % num_parts).astype(np.int32), pa.int32()),
        }
    )
