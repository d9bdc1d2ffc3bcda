"""Crawl-engine queries for the driver contract.

The crawl operates on self-generated Common-Crawl-style fixtures (the
driver's pre-registered DuckDB views cover only the TPC-H-ish testdata
tables, and BASELINE.json's input_hint table is synthesized per the
FIXTURES.md spec) — so these entries are rows-only checks for the
driver, while the REAL correctness gate is tests/test_engine_conformance
.py: engine outputs equal the single-threaded oracle exactly.

Fixtures and crawl results are cached under /tmp keyed by scale so the
three queries (seen/order/text) share one run.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

_CACHE: dict[tuple, object] = {}


def _scale_pages(sf_dir: str) -> int:
    from . import sf_of

    return max(1000, int(2_000_000 * sf_of(sf_dir)))  # sf0.001 -> 2k pages


def run_crawl_cached(sf_dir: str, n_pages: int | None = None,
                     budget: int = 8, max_epochs: int = 6):
    """Generate fixture + run the crawl once per (n_pages, budget, epochs)."""
    from ..datagen import default_politeness, write_fixture
    from ..engine import CrawlEngine

    n = n_pages or _scale_pages(sf_dir)
    key = (n, budget, max_epochs)
    if key in _CACHE:
        return _CACHE[key]
    # _v3: bump when engine/datagen semantics change so stale /tmp results
    # from older code never serve
    root = f"/tmp/spider_ray_cache_v3/n{n}_b{budget}_e{max_epochs}"
    pol = default_politeness(max_per_host_per_epoch=budget, max_epochs=max_epochs)
    paths = write_fixture(os.path.join(root, "fixture"), n_pages=n, seed=42,
                          politeness=pol)
    eng = CrawlEngine(paths["pages"], pol, os.path.join(root, "ckpt"),
                      num_parts=16, seen_shards=8, fetch_concurrency=4)
    manifest_p = os.path.join(root, "ckpt", "manifest.json")
    done = False
    if os.path.exists(manifest_p):
        with open(manifest_p) as f:
            done = json.load(f).get("done", False)
    if not done:
        eng.run(seeds=pq.read_table(paths["seeds"]))
    # (when done, the result accessors read straight from the checkpoint
    # tree — no Ray work needed)
    _CACHE[key] = eng
    return eng


def crawl_seen(sf_dir: str):
    return run_crawl_cached(sf_dir).seen_table()


def crawl_order(sf_dir: str):
    return run_crawl_cached(sf_dir).order_table()


def crawl_text(sf_dir: str):
    return run_crawl_cached(sf_dir).text_table()


def crawl_metrics(sf_dir: str):
    """Per-epoch crawl counters from the lineage manifest (selected /
    ok / miss / robots / links / admitted / frontier size)."""
    import pyarrow as pa

    eng = run_crawl_cached(sf_dir)
    with open(os.path.join(eng.ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    rows = manifest["epochs"]
    cols = ["epoch", "selected", "ok", "miss", "robots",
            "links_found", "admitted", "frontier_after"]
    return pa.table({c: pa.array([r[c] for r in rows], pa.int64())
                     for c in cols})


def crawl_link_edges(pages_path: str):
    """DISTINCT directed (src, dst) canonical-url edges of a pages
    corpus — the crawl's REAL href graph, derived with the SAME shared
    kernels the fetch stage runs (extract_hrefs_batch + resolve_batch),
    so the graph the analytics see is exactly the graph the frontier
    walked.  The canonicalize pass is page-count-sized; the
    link-count-sized work (href scan, resolution) is the vectorized
    kernels.  In-batch pre-distinct, then one grouped distinct."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..common.extract import extract_hrefs_batch
    from ..common.urlnorm import canonicalize, resolve_batch

    def edges(t: pa.Table) -> pa.Table:
        srcs = [canonicalize(u) for u in t["url"].to_pylist()]
        hrefs, parents = extract_hrefs_batch(t["html"])
        bases = np.array(srcs, dtype=object)[parents].tolist()
        dsts = resolve_batch(hrefs, bases)
        d_all = pa.array(dsts, pa.string())
        out = pa.table({"src": pa.array(bases, pa.string()),
                        "dst": d_all}).filter(pc.is_valid(d_all))
        return pa.TableGroupBy(out, ["src", "dst"]).aggregate([]) \
            .select(["src", "dst"])

    ds = rd.read_parquet(pages_path, columns=["url", "html"])
    per_block = ds.map_batches(edges, batch_format="pyarrow")
    return per_block.groupby(["src", "dst"]).count() \
        .drop_columns(["count()"])


def crawl_pagerank(sf_dir: str, iters: int = 4, topn: int = 100,
                   force_distributed: bool = False,
                   tier: str | None = None):
    """Link-graph centrality over the crawl corpus: fixed-point
    PageRank (graph.pagerank_edges) on the pages fixture's href graph.
    Unlike the symmetric interaction graph, this one is directed and
    full of dangling targets (discovered-but-unfetched urls) — the
    variant the dangling-node rule exists for.  Driver check is
    rows-only (the corpus is self-generated); pytest hash-matches the
    FULL rank vector against the unrolled SQL oracle over the same
    edge table (tests/test_pipelines.py::TestCrawlPagerank).  Returns
    the top `topn` urls by (rank desc, url)."""
    from .graph import pagerank_edges

    eng = run_crawl_cached(sf_dir)  # shares the cached fixture
    edges = crawl_link_edges(eng.pages_path)
    return pagerank_edges(edges, iters=iters,
                          force_distributed=force_distributed,
                          tier=tier).limit(topn)


def crawl_seed_urls(eng) -> list[str]:
    """The engine's seed list in canonical form (the identity the
    frontier dedups on) — non-crawlable schemes drop, duplicates
    collapse.  Reads the fixture's seeds.parquet next to pages."""
    from ..common.urlnorm import canonicalize

    seeds_path = os.path.join(os.path.dirname(eng.pages_path),
                              "seeds.parquet")
    urls = pq.read_table(seeds_path, columns=["url"])["url"].to_pylist()
    out = {c for c in (canonicalize(u) for u in urls) if c is not None}
    return sorted(out)


def crawl_bfs_depth(sf_dir: str, max_depth: int = 6,
                    force_distributed: bool = False,
                    tier: str | None = None):
    """Crawl depth of every url in the corpus's href graph: minimum hop
    distance from the engine's OWN seed list (canonicalized — the same
    identity the frontier dedups on), capped at max_depth — the classic
    frontier-scheduling signal (depth-bounded crawls, politeness
    budgeting by depth).  graph.bfs_depth_edges over the same edge
    table crawl_pagerank ranks.  Driver check is rows-only (the corpus
    is self-generated); pytest hash-matches the FULL depth vector
    against the unrolled level-by-level SQL oracle over the identical
    edge table + seed list on every tier
    (tests/test_pipelines.py::TestCrawlBfsDepth)."""
    from .graph import bfs_depth_edges

    eng = run_crawl_cached(sf_dir)  # shares the cached fixture
    edges = crawl_link_edges(eng.pages_path)
    return bfs_depth_edges(edges, seeds=crawl_seed_urls(eng),
                           max_depth=max_depth,
                           force_distributed=force_distributed, tier=tier)


def crawl_anchor_stats(sf_dir: str):
    """Anchor-text aggregation per link TARGET — the web-index signal
    (the text other pages use to link to a url is a classic relevance
    feature).  Over the crawl fixture's pages: extract (href, anchor
    text) with the vectorized kernel, resolve+canonicalize targets with
    the SAME kernels the fetch stage runs, then per target url:
    n_links (total in-links), distinct_anchors, and top_anchor (most
    frequent anchor text, ties -> lexicographically smallest).

    Scale shape = grouped MODE: per-block (url, anchor) count partials
    pre-aggregate in Arrow before ONE grouped sum (only
    distinct-pair-sized rows shuffle — never the raw link stream), and
    the per-url argmax runs over <= |distinct anchors of that url| rows.
    Driver check is rows-only (the corpus is self-generated); pytest
    gates the kernel against an independent python-re reference and the
    aggregate against pandas over those pairs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..common.extract import extract_anchors_batch
    from ..common.urlnorm import canonicalize, resolve_batch

    eng = run_crawl_cached(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        srcs = [canonicalize(u) for u in t["url"].to_pylist()]
        hrefs, texts, parents = extract_anchors_batch(t["html"])
        bases = np.array(srcs, dtype=object)[parents].tolist()
        dsts = resolve_batch(hrefs, bases)
        d_all = pa.array(dsts, pa.string())
        out = pa.table({"url": d_all,
                        "anchor": pa.array(texts, pa.string())}
                       ).filter(pc.is_valid(d_all))
        g = pa.TableGroupBy(out, ["url", "anchor"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["url", "anchor", "n"])

    counts = (rd.read_parquet(eng.pages_path, columns=["url", "html"])
              .map_batches(partials, batch_format="pyarrow")
              .groupby(["url", "anchor"])
              .aggregate(Sum("n", alias_name="n")))

    # per-url argmax via the suite's BUCKET pattern (dedup.py pair
    # buckets): a groupby().map_groups keyed on the ~url-cardinality
    # key pays Ray's per-group finalization ~40k times (measured ~4 s
    # of the query's 7 s at the 20k fixture); hashing urls into 64
    # buckets keeps every url's rows together and runs ONE vectorized
    # pandas reduce per bucket instead.
    def add_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd  # stable per-url hash, vectorized

        h = pd.util.hash_array(
            np.asarray(t["url"], dtype=object)).astype(np.uint64)
        return t.append_column(
            "pb", pa.array((h % np.uint64(64)).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "n", "anchor"],
                          ascending=[True, False, True], kind="mergesort")
        agg = (g.groupby("url", sort=False)
               .agg(n_links=("n", "sum"),
                    distinct_anchors=("n", "size"),
                    top_anchor=("anchor", "first"))
               .reset_index())
        agg["n_links"] = agg["n_links"].astype(np.int64)
        agg["distinct_anchors"] = agg["distinct_anchors"].astype(np.int64)
        return agg

    return (counts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("pb").map_groups(per_bucket, batch_format="pandas")
            .map_batches(lambda t: t.drop_columns(["pb"])
                         if "pb" in t.column_names else t,
                         batch_format="pyarrow"))


def crawl_host_stats(sf_dir: str):
    """Per-host crawl accounting over the checkpoint ORDER shards — the
    operational view a crawl operator reads (which hosts dominate, how
    long each stayed scheduled): pages fetched, first/last epoch, and
    epochs_active (distinct epochs the host appeared in).  Streams the
    checkpoint parquet as a Dataset — per-block (host, epoch) distinct
    partials, ONE grouped aggregate at (host, epoch), then the tiny
    host-level reduce; the order record itself never materializes on
    the driver.  Rows-only for the driver (self-generated corpus);
    pytest checks it against pandas over the byte-exact oracle-gated
    order table."""
    import pyarrow as pa
    import ray.data as rd

    from ray.data.aggregate import Count, Max, Min, Sum

    eng = run_crawl_cached(sf_dir)
    files = []
    for name in sorted(os.listdir(eng.ckpt_dir)):
        if not name.startswith("epoch_"):
            continue
        p = os.path.join(eng.ckpt_dir, name, "order.parquet")
        if os.path.exists(p):
            files.append(p)
        files.extend(eng._parquet_files(
            os.path.join(eng.ckpt_dir, name, "order")))

    def partials(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["host", "epoch"]),
                            ["host", "epoch"]).aggregate([([], "count_all")])
        return g.rename_columns(["host", "epoch", "n"])

    per_epoch = (rd.read_parquet(files, columns=["host", "epoch"])
                 .map_batches(partials, batch_format="pyarrow")
                 .groupby(["host", "epoch"])
                 .aggregate(Sum("n", alias_name="n")))
    out = (per_epoch.groupby("host")
           .aggregate(Sum("n", alias_name="pages"),
                      Min("epoch", alias_name="first_epoch"),
                      Max("epoch", alias_name="last_epoch"),
                      Count(alias_name="epochs_active")))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "host": t["host"],
            "pages": pc.cast(t["pages"], pa.int64()),
            "first_epoch": pc.cast(t["first_epoch"], pa.int64()),
            "last_epoch": pc.cast(t["last_epoch"], pa.int64()),
            "epochs_active": pc.cast(t["epochs_active"], pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("host")
