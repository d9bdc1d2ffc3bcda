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


def _build_chunk(idx, hosts: list[str], schemes, host_idx, private_flag,
                 mess_kind, tgt_a, tgt_b, n_para, word_pick,
                 canon_a, canon_b, n_pages: int, para_scale: int) -> pa.Table:
    """Pure chunk builder: rows for global page ids ``idx`` (already in
    final on-disk order), returned as an Arrow table (url, html, text).
    Deterministic given the pre-drawn arrays — safe to run as parallel
    Ray tasks; returning Arrow keeps the payload zero-copy in the object
    store instead of re-pickling per-row Python bytes."""
    urls, htmls, texts = [], [], []
    for k, i in enumerate(idx):
        i = int(i)
        h = hosts[host_idx[k]]
        canon_i = _canonical_url(str(schemes[host_idx[k]]), h, i,
                                 bool(private_flag[k]))
        urls.append(_messy(canon_i, int(mess_kind[k])))
        paras = []
        for p in range(int(n_para[k]) * para_scale):
            ws = [_WORDS[word_pick[k][(p * 8 + j) % 24]] for j in range(8)]
            paras.append(f"<p>{' '.join(ws)} &amp; more {i}.{p}</p>")
        a, b = int(tgt_a[k]), int(tgt_b[k])
        links = [
            f'<a href="/p/{(i + 1) % n_pages}">next</a>',
            f'<a href="{canon_a[k]}">abs {a}</a>',
            f'<a href="{canon_b[k]}">abs {b}</a>',
            f'<a href="{canon_b[k]}">dup {b}</a>',
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
            f"<html><head><title>Page {i} — {h}</title>"
            f"<style>p{{margin:0}}</style></head>\n"
            f"<body><!-- gen {i} --><h1>Doc {i}</h1>\n"
            + "\n".join(paras) + "\n" + "\n".join(links)
            + f"\n<script>var x={i};</script></body></html>"
        ).encode("utf-8")
        htmls.append(html)
        texts.append(extract_text(html))
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
    })


def gen_pages(n_pages: int, seed: int = 42, n_hosts: int | None = None,
              para_scale: int = 1, use_ray: bool = False) -> pa.Table:
    """F1 `pages` table.  Deterministic in (n_pages, seed, n_hosts,
    para_scale) regardless of use_ray (parallel and serial paths build
    identical chunks from the same pre-drawn arrays).

    para_scale multiplies paragraph counts: 1 ≈ 0.7 KB html (unit-test
    fixtures), 200 ≈ 15-35 KB html (bench fixtures, Common-Crawl-sized
    pages where extraction is the honest dominant cost)."""
    rng = np.random.default_rng(seed)
    if n_hosts is None:
        n_hosts = max(20, min(400, n_pages // 100))
    hosts = _hosts(n_hosts)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = ranks ** -1.3
    w /= w.sum()
    host_idx = rng.choice(n_hosts, size=n_pages, p=w)
    schemes = np.where((np.arange(n_hosts) % 3) == 0, "https", "http")
    private_flag = (host_idx == 2) & (np.arange(n_pages) % 3 == 0)
    mess_kind = rng.integers(0, 7, size=n_pages)
    tgt_a = rng.integers(0, n_pages, size=n_pages)
    tgt_b = rng.integers(0, n_pages, size=n_pages)
    n_para = rng.integers(1, 4, size=n_pages)
    word_pick = rng.integers(0, len(_WORDS), size=(n_pages, 24))
    lang = rng.choice(_LANGS, size=n_pages, p=_LANG_W)
    ts_jitter = rng.integers(0, 1_000_000, size=n_pages)

    # link-target raw urls (content references, precomputed once)
    canon_of = lambda j: _canonical_url(str(schemes[host_idx[j]]),
                                        hosts[host_idx[j]], int(j),
                                        bool(private_flag[j]))
    canon_a_all = [_messy(canon_of(a), int(mess_kind[a])) for a in tgt_a]
    canon_b_all = [canon_of(b) for b in tgt_b]

    # final on-disk order (host-hash locality, like a WARC-derived table)
    # computed UP FRONT so chunks are built already-ordered — no
    # multi-GB Table.take afterwards
    order = np.argsort([hash64(hosts[hi]) % 64 for hi in host_idx],
                       kind="stable")

    chunk = max(2000, n_pages // 64)
    bounds = [(lo, min(lo + chunk, n_pages)) for lo in range(0, n_pages, chunk)]

    def args_for(lo, hi):
        idx = order[lo:hi]
        return (idx, hosts, schemes, host_idx[idx], private_flag[idx],
                mess_kind[idx], tgt_a[idx], tgt_b[idx], n_para[idx],
                word_pick[idx], [canon_a_all[i] for i in idx],
                [canon_b_all[i] for i in idx], n_pages, para_scale)

    if use_ray and n_pages >= 20_000:
        import ray

        if ray.is_initialized():
            f = ray.remote(num_cpus=1)(_build_chunk)
            chunks = ray.get([f.remote(*args_for(lo, hi)) for lo, hi in bounds])
        else:
            chunks = [_build_chunk(*args_for(lo, hi)) for lo, hi in bounds]
    else:
        chunks = [_build_chunk(*args_for(lo, hi)) for lo, hi in bounds]

    tbl = pa.concat_tables(chunks)

    base_us = int(datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)
    warc_ts = base_us + np.arange(n_pages, dtype=np.int64) * 1_000_000 + ts_jitter
    return pa.table(
        {
            "url": tbl["url"],
            "warc_ts": pa.array(warc_ts[order], type=pa.timestamp("us")),
            "html": tbl["html"],
            "text": tbl["text"],
            "lang": pa.array(lang[order], type=pa.string()),
        }
    )


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
                  politeness: dict | None = None,
                  para_scale: int = 1, use_ray: bool = False) -> dict:
    """Materialize pages.parquet / seeds.parquet / politeness.json under
    out_dir; idempotent via a done-marker keyed by the parameters."""
    os.makedirs(out_dir, exist_ok=True)
    key = json.dumps({"n": n_pages, "seed": seed, "hosts": n_hosts,
                      "para_scale": para_scale, "rg": 8192}, sort_keys=True)
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
    pages = gen_pages(n_pages, seed=seed, n_hosts=n_hosts,
                      para_scale=para_scale, use_ray=use_ray)
    seeds = gen_seeds(pages, seed=seed)
    # bounded row groups: pyarrow's default (1Mi rows) makes a large-page
    # fixture ONE multi-GB row group, which serializes every downstream
    # read into a single task (and Ray's batched reader degrades badly on
    # it — measured 28+ min vs ~50 s for the same bytes in 8k-row groups).
    # The input corpus follows the same rule as the outputs: never one
    # giant unit.
    pq.write_table(pages, paths["pages"], row_group_size=8192)
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
