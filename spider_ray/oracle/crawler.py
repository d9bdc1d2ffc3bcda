"""Single-threaded, single-process reference crawler.

The Go reference (targc/spider-go) ships ZERO tests and no crawler — its
conformance artifact is a manually-run 3-node DAG example (SURVEY.md §5).
Per BASELINE.json, the rebuild's correctness contract is therefore defined
by THIS oracle: the Ray engine must reproduce, for the same seed list and
politeness budget,
  * the final URL-seen set,
  * the crawl order,
  * byte-identical extracted text per url.

Crawl semantics (the contract — spider_ray.engine implements the same):

  state   seen: canonical_url -> first_epoch (set at ADMISSION time)
          frontier: admitted, not-yet-fetched urls with (priority, host)

  init    canonicalize seeds, drop non-http(s); duplicate urls keep MAX
          priority; admit all with first_epoch=0.

  epoch e in range(max_epochs), while frontier non-empty:
    select  per host: top-B candidates by (-priority, canonical_url)
            where B = max_per_host_per_epoch; the rest stay pending.
            This mirrors the reference's bounded fan-out/in-flight caps
            (`pkg/spider/workflow.go:136-138`,
             `pkg/spider/messenger_worker_nats.go:103`) as a *data-defined*
            budget instead of a race-defined one.
    order   global crawl order within the epoch = sort selected by
            (host, -priority, canonical_url); seq increments globally
            across epochs.  Pure function of data — identical at any
            engine parallelism (SURVEY.md §7.4).
    fetch   robots deny-prefixes (host -> [path_prefix]) checked first ->
            outcome "robots"; else lookup canonical url in the pages
            table -> "ok" (emit text, extract links) or "miss".
            Port-labeled outcomes mirror meta_output routing
            (`cmd/control-flow-worker/main.go:30-34`).
    links   hrefs of ok pages resolved against the canonical base url,
            canonicalized, child_priority = parent_priority - 1.0;
            per-url MAX child priority within the epoch; urls already in
            seen dropped; the rest admitted with first_epoch = e + 1
            (1 page -> k urls is the reference's fan-out operator,
            `cmd/fd-order-worker/main.go:29-52`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ..common.extract import extract_hrefs, extract_text
from ..common.hashing import hash64
from ..common.urlnorm import canonicalize, host_of, path_of, resolve


@dataclass
class CrawlResult:
    seen: dict[str, int]                 # canonical_url -> first_epoch
    order: list[tuple]                   # (epoch, seq, url, host, priority, outcome)
    texts: dict[str, str]                # canonical_url -> extracted text
    metrics: list[dict] = field(default_factory=list)

    def seen_table(self) -> pa.Table:
        urls = sorted(self.seen)
        return pa.table({
            "canonical_url": pa.array(urls, pa.string()),
            "url_hash": pa.array([hash64(u) for u in urls], pa.int64()),
            "first_epoch": pa.array([self.seen[u] for u in urls], pa.int32()),
        })

    def order_table(self) -> pa.Table:
        return pa.table({
            "epoch": pa.array([r[0] for r in self.order], pa.int32()),
            "seq": pa.array([r[1] for r in self.order], pa.int64()),
            "canonical_url": pa.array([r[2] for r in self.order], pa.string()),
            "host": pa.array([r[3] for r in self.order], pa.string()),
            "priority": pa.array([r[4] for r in self.order], pa.float64()),
            "outcome": pa.array([r[5] for r in self.order], pa.string()),
        })

    def text_table(self) -> pa.Table:
        urls = sorted(self.texts)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "text": pa.array([self.texts[u] for u in urls], pa.string()),
        })


class OracleCrawler:
    def __init__(self, pages: pa.Table, politeness: dict):
        self.budget = int(politeness["max_per_host_per_epoch"])
        self.max_epochs = int(politeness["max_epochs"])
        self.robots: dict[str, list[str]] = dict(politeness.get("robots", {}))
        # pages indexed by canonical url.  Duplicate canonical urls
        # (recrawls) resolve to the LATEST capture by (warc_ts, html) —
        # the contract the engine's fetch index implements identically.
        self.index: dict[str, int] = {}
        self._urls = pages["url"].to_pylist()
        self._htmls = pages["html"]
        ts = (pages["warc_ts"].to_pylist()
              if "warc_ts" in pages.schema.names else [0] * pages.num_rows)
        best: dict[str, tuple] = {}
        for i, u in enumerate(self._urls):
            c = canonicalize(u)
            if c is None:
                continue
            key = (ts[i], self._htmls[i].as_py())
            if c not in best or key > best[c]:
                best[c] = key
                self.index[c] = i

    def _robots_denied(self, host: str, path: str) -> bool:
        from ..common.urlnorm import robots_denied

        return robots_denied(self.robots, host, path)

    def crawl(self, seeds: list[tuple[str, float]]) -> CrawlResult:
        seen: dict[str, int] = {}
        frontier: dict[str, float] = {}  # canonical_url -> priority
        # seed admission (epoch 0)
        for raw, prio in seeds:
            c = canonicalize(raw)
            if c is None:
                continue
            if c in frontier:
                frontier[c] = max(frontier[c], float(prio))
            else:
                frontier[c] = float(prio)
        for u in frontier:
            seen[u] = 0

        order: list[tuple] = []
        texts: dict[str, str] = {}
        metrics: list[dict] = []
        seq = 0
        for epoch in range(self.max_epochs):
            if not frontier:
                break
            # --- selection: per-host top-B by (-priority, url) ---
            by_host: dict[str, list[tuple[float, str]]] = {}
            for u, p in frontier.items():
                by_host.setdefault(host_of(u), []).append((-p, u))
            selected: list[tuple[str, float, str]] = []  # (host, prio, url)
            for h, cand in by_host.items():
                cand.sort()
                for negp, u in cand[: self.budget]:
                    selected.append((h, -negp, u))
            # --- deterministic global order ---
            selected.sort(key=lambda t: (t[0], -t[1], t[2]))
            counts = {"ok": 0, "miss": 0, "robots": 0}
            new_links: dict[str, float] = {}
            for h, p, u in selected:
                del frontier[u]
                if self._robots_denied(h, path_of(u)):
                    outcome = "robots"
                elif u in self.index:
                    outcome = "ok"
                    row = self.index[u]
                    html = self._htmls[row].as_py()
                    texts[u] = extract_text(html)
                    for href in extract_hrefs(html):
                        child = resolve(u, href)
                        if child is None:
                            continue
                        cp = p - 1.0
                        if child in new_links:
                            new_links[child] = max(new_links[child], cp)
                        else:
                            new_links[child] = cp
                else:
                    outcome = "miss"
                counts[outcome] += 1
                order.append((epoch, seq, u, h, p, outcome))
                seq += 1
            # --- admission of newly discovered urls ---
            admitted = 0
            for u, p in new_links.items():
                if u in seen:
                    continue
                seen[u] = epoch + 1
                frontier[u] = p
                admitted += 1
            metrics.append({
                "epoch": epoch, "selected": len(selected), **counts,
                "links_found": len(new_links), "admitted": admitted,
                "frontier_after": len(frontier),
            })
        return CrawlResult(seen=seen, order=order, texts=texts, metrics=metrics)


def crawl_oracle(pages: pa.Table, seeds: pa.Table, politeness: dict) -> CrawlResult:
    seed_rows = list(zip(seeds["url"].to_pylist(), seeds["priority"].to_pylist()))
    return OracleCrawler(pages, politeness).crawl(seed_rows)
