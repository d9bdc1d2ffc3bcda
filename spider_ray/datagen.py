"""Deterministic synthetic Common-Crawl-style fixture generator.

Produces the F1/F2/F3 fixtures of /root/repo/FIXTURES.md: a `pages`
Parquet table (url, warc_ts, html, text, lang per BASELINE.json
`input_hint`), a `seeds` table, and a politeness/robots config — all pure
functions of (n_pages, seed).  No external data, no network.

Key properties exercised on purpose:
  * Zipf-skewed hosts with ≥1 mega-host (>20% of rows) → salted-split /
    combiner scheduling paths get real skew.
  * `url` column stores a *messy* variant (uppercase host, default port,
    fragment, unsorted query, duplicate slashes, dot segments) whose
    canonical form is the page's identity — canonicalization edge cases
    are data, not just unit tests.
  * `text` is EXACTLY spider_ray.common.extract.extract_text(html) —
    the byte-identical-text invariant holds at generation time.
  * links embedded in html: root-relative + absolute + messy, duplicates,
    off-corpus targets, non-crawlable schemes, robots-denied paths.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .common.extract import extract_text
from .common.hashing import hash64
from .common.urlnorm import canonicalize

_LANGS = ["en", "de", "th", "fr", "und"]
_LANG_W = [0.55, 0.15, 0.1, 0.1, 0.1]
_WORDS = (
    "the quick brown fox jumps over lazy dog data stream crawl frontier "
    "ray arrow batch shuffle partition host budget seed page link text "
    "café naïve résumé zürich 東京 ยคว spider workflow trigger output"
).split()


def _hosts(n_hosts: int) -> list[str]:
    return [f"host{h:03d}.example" for h in range(n_hosts)]


def _canonical_url(scheme: str, host: str, i: int, private: bool) -> str:
    if private:
        path = f"/private/p/{i}"
    elif i % 13 == 0:
        path = f"/dir{i % 4}/p/{i}"
    else:
        path = f"/p/{i}"
    url = f"{scheme}://{host}{path}"
    if i % 7 == 0:
        url += f"?a={i % 5}&b={i % 3}"
    return url


def _messy(url: str, kind: int) -> str:
    """A raw variant whose canonical form equals canonicalize(url)."""
    scheme, rest = url.split("://", 1)
    hostport, _, pathq = rest.partition("/")
    pathq = "/" + pathq
    path, sep, query = pathq.partition("?")
    if kind == 1:
        hostport = hostport.upper()
    elif kind == 2:
        hostport += ":80" if scheme == "http" else ":443"
    elif kind == 3:
        path += ""  # plain, but add fragment below
        query = query  # no-op
        return f"{scheme}://{hostport}{path}{sep}{query}#frag"
    elif kind == 4 and query:
        parts = query.split("&")
        query = "&".join(reversed(parts))
    elif kind == 5:
        path = path.replace("/p/", "//p/./", 1)
    elif kind == 6:
        path = path.replace("/p/", "/x/../p/", 1)
    return f"{scheme}://{hostport}{path}{sep}{query}"


def gen_pages(n_pages: int, seed: int = 42, n_hosts: int | None = None) -> pa.Table:
    """F1 `pages` table. Deterministic in (n_pages, seed, n_hosts)."""
    rng = np.random.default_rng(seed)
    if n_hosts is None:
        n_hosts = max(20, min(400, n_pages // 100))
    hosts = _hosts(n_hosts)
    # Zipf-ish host assignment: rank-weighted so host000 is a mega-host.
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = ranks ** -1.3
    w /= w.sum()
    host_idx = rng.choice(n_hosts, size=n_pages, p=w)
    schemes = np.where((np.arange(n_hosts) % 3) == 0, "https", "http")
    # robots: host001 fully denied; host002 partial (/private); pages on
    # host002 are sometimes under /private so the deny path has real targets.
    private_flag = (host_idx == 2) & (np.arange(n_pages) % 3 == 0)

    canon = np.empty(n_pages, dtype=object)
    for i in range(n_pages):
        h = hosts[host_idx[i]]
        canon[i] = _canonical_url(str(schemes[host_idx[i]]), h, i, bool(private_flag[i]))

    mess_kind = rng.integers(0, 7, size=n_pages)
    urls = np.empty(n_pages, dtype=object)
    for i in range(n_pages):
        urls[i] = _messy(canon[i], int(mess_kind[i]))

    # link targets: per page, 2 same-host-ish + 2 random + extras
    tgt_a = rng.integers(0, n_pages, size=n_pages)
    tgt_b = rng.integers(0, n_pages, size=n_pages)
    n_para = rng.integers(1, 4, size=n_pages)
    word_pick = rng.integers(0, len(_WORDS), size=(n_pages, 24))
    lang = rng.choice(_LANGS, size=n_pages, p=_LANG_W)
    ts_jitter = rng.integers(0, 1_000_000, size=n_pages)

    base_us = int(datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)
    htmls = np.empty(n_pages, dtype=object)
    texts = np.empty(n_pages, dtype=object)
    for i in range(n_pages):
        host = hosts[host_idx[i]]
        paras = []
        for p in range(int(n_para[i])):
            ws = [_WORDS[word_pick[i][(p * 8 + k) % 24]] for k in range(8)]
            paras.append(f"<p>{' '.join(ws)} &amp; more {i}.{p}</p>")
        a, b = int(tgt_a[i]), int(tgt_b[i])
        links = [
            # root-relative link to page (i+1) on the SAME host (may be off-corpus
            # if i+1 lives on another host — exercises the fetch-miss path)
            f'<a href="/p/{(i + 1) % n_pages}">next</a>',
            f'<a href="{_messy(canon[a], int(mess_kind[a]))}">abs {a}</a>',
            f'<a href="{canon[b]}">abs {b}</a>',
            f'<a href="{canon[b]}">dup {b}</a>',  # duplicate target
        ]
        if i % 11 == 0:
            links.append(f'<a href="http://offsite{i % 17}.invalid/x/{i}">off</a>')
        if i % 9 == 0:
            links.append(f'<a href="/missing/{i}">miss</a>')
        if i % 23 == 0:
            links.append('<a href="mailto:x@example.com">mail</a>')
            links.append('<a href="javascript:void(0)">js</a>')
        if i % 5 == 0:
            links.append(f'<a href="http://host002.example/private/p/{(i * 3) % n_pages}">priv</a>')
        html = (
            f"<html><head><title>Page {i} — {host}</title>"
            f"<style>p{{margin:0}}</style></head>\n"
            f"<body><!-- gen {i} --><h1>Doc {i}</h1>\n"
            + "\n".join(paras)
            + "\n"
            + "\n".join(links)
            + f"\n<script>var x={i};</script></body></html>"
        )
        htmls[i] = html.encode("utf-8")
        texts[i] = extract_text(htmls[i])

    warc_ts = base_us + np.arange(n_pages, dtype=np.int64) * 1_000_000 + ts_jitter

    tbl = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
        }
    )
    # fixture convention: hash(host)-ordered so parquet row groups have host
    # locality like a real WARC-derived table
    order = np.argsort([hash64(hosts[hi]) % 64 for hi in host_idx], kind="stable")
    return tbl.take(pa.array(order))


def gen_seeds(pages: pa.Table, seed: int = 42, frac: float = 0.01) -> pa.Table:
    """F2 `seeds`: ~frac of page urls (messy form!) + a few off-corpus urls."""
    rng = np.random.default_rng(seed + 1)
    n = pages.num_rows
    k = max(3, int(n * frac))
    idx = rng.choice(n, size=k, replace=False)
    urls = [pages["url"][int(i)].as_py() for i in sorted(idx)]
    urls += [
        "http://host000.example/not-a-page",
        "HTTP://HOST003.EXAMPLE:80/p/0#seed",
        "ftp://host000.example/skip-me",  # non-crawlable, dropped at canonicalization
    ]
    prio = np.round(rng.uniform(1.0, 9.0, size=len(urls)), 1)
    return pa.table({"url": pa.array(urls, type=pa.string()),
                     "priority": pa.array(prio, type=pa.float64())})


def default_politeness(max_per_host_per_epoch: int = 8, max_epochs: int = 6) -> dict:
    """F3 politeness/robots config — same dict fed to oracle and engine."""
    return {
        "max_per_host_per_epoch": max_per_host_per_epoch,
        "crawl_delay_default": 0.0,
        "max_epochs": max_epochs,
        "robots": {
            "host001.example": ["/"],          # fully denied
            "host002.example": ["/private"],   # partial deny
        },
    }


def write_fixture(out_dir: str, n_pages: int, seed: int = 42,
                  n_hosts: int | None = None,
                  politeness: dict | None = None) -> dict:
    """Materialize pages.parquet / seeds.parquet / politeness.json under
    out_dir; idempotent via a done-marker keyed by the parameters."""
    os.makedirs(out_dir, exist_ok=True)
    key = json.dumps({"n": n_pages, "seed": seed, "hosts": n_hosts}, sort_keys=True)
    marker = os.path.join(out_dir, "_DONE.json")
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
        "politeness": os.path.join(out_dir, "politeness.json"),
    }
    pol = politeness or default_politeness()
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == key:
                with open(paths["politeness"], "w") as f:
                    json.dump(pol, f)  # politeness may vary per call; cheap rewrite
                return paths
    pages = gen_pages(n_pages, seed=seed, n_hosts=n_hosts)
    seeds = gen_seeds(pages, seed=seed)
    pq.write_table(pages, paths["pages"])
    pq.write_table(seeds, paths["seeds"])
    with open(paths["politeness"], "w") as f:
        json.dump(pol, f)
    with open(marker, "w") as f:
        f.write(key)
    return paths


def sanity_check(pages: pa.Table) -> None:
    """Cheap invariants: canonical urls unique; text matches extract_text."""
    canon = [canonicalize(u) for u in pages["url"].to_pylist()]
    assert all(c is not None for c in canon)
    assert len(set(canon)) == len(canon), "canonical urls must be unique"
    for i in range(0, pages.num_rows, max(1, pages.num_rows // 50)):
        assert pages["text"][i].as_py() == extract_text(pages["html"][i].as_py())
