"""URL-identity conformance query — certifies the engine's URL
canonicalization kernel (spider_ray.common.urlnorm, the single
definition of URL identity for the seen set and crawl ordering — the
north rule's "sharded seen set keyed by canonicalized URL hash") against
an independent SQL implementation of the same rules.

Shape: a deterministic "messy URL" per orders row is CONSTRUCTED by the
shared recipe below (mixed-case scheme/host, default and non-default
ports, dot-segment and duplicate-slash paths, unsorted query params,
fragments, and non-crawlable ftp rows); the engine canonicalizes with
the REAL urlnorm kernels (the exact code every fetch actor runs per
link, stages/crawl.py), while the DuckDB oracle applies the
normalization rules in SQL (lower/strip-default-port/replace
dot-segments/list_sort query params/drop fragment).  Equality certifies
the kernel rule-by-rule on every combination the recipe generates.

Oracle precondition (documented contract, not a general canonicalizer):
the constructed URLs carry no percent-escapes, at most one './' and one
'//' per path, and query keys/values are alphanumeric — the general
edge cases (exotic ports, encoded queries, whitespace) are pytest-gated
in tests/test_common.py against urlsplit ground truth.
"""

from __future__ import annotations

import pyarrow as pa

from . import read_table as _rp


def _raw_url(k: int) -> str:
    """The shared messy-URL recipe (keep in lockstep with the SQL
    construction in __ray_entry__.oracle_sql()['url_canonicalize'])."""
    if k % 11 == 0:
        scheme = "ftp"  # non-crawlable: the kernel must DROP these
    else:
        scheme = ("HTTP", "hTtps", "https")[k % 3]
    host = f"WWW.Host{k % 40}.Example.COM" + ("." if k % 13 == 0 else "")
    if k % 5 == 0:
        port = ":80" if k % 2 == 0 else ":443"  # default iff scheme matches
    elif k % 7 == 0:
        port = ":8080"  # never default: must survive
    else:
        port = ""
    path = ("", f"/a/./p{k % 10}", f"/a//p{k % 10}", f"/x/y{k % 10}")[k % 4]
    query = f"?z=9&a={k % 8}" if k % 2 == 0 else ""
    frag = f"#sec{k % 5}" if k % 6 == 0 else ""
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def url_canonicalize(sf_dir: str):
    """(url_key, canonical_url, host) for every crawlable constructed
    URL — ftp rows drop (canonicalize returns None).  The per-URL Python
    kernel matches production shape: canonicalization runs inside fetch
    actors per extracted link (stages/crawl.py), never as a shuffle."""
    from spider_ray.common.urlnorm import canonicalize, host_of

    ds = _rp(sf_dir, "orders", ["o_orderkey"])

    _SCHEMA = pa.schema([("url_key", pa.int64()),
                         ("canonical_url", pa.string()),
                         ("host", pa.string())])

    def fn(t: pa.Table) -> pa.Table:
        keys, canon, hosts = [], [], []
        for k in t["o_orderkey"].to_pylist():
            c = canonicalize(_raw_url(int(k)))
            if c is None:
                continue
            keys.append(int(k))
            canon.append(c)
            hosts.append(host_of(c))
        return pa.table({"url_key": pa.array(keys, pa.int64()),
                         "canonical_url": pa.array(canon, pa.string()),
                         "host": pa.array(hosts, pa.string())},
                        schema=_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow")
