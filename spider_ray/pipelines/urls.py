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


# Rule-based URL admission filter (the RefinedWeb/C4-style URL gate
# crawlers run BEFORE fetching).  Blocklist hosts are picked from the
# recipe's host space so the rule fires deterministically at every sf.
_BLOCKED_HOSTS = frozenset({
    "www.host7.example.com",
    "www.host23.example.com",
})


def url_filter_rules(sf_dir: str):
    """URL admission filter over the canonical URL stream: first match
    of (blocked host, blocked path prefix '/x/', >= 2 query params)
    rejects with a reason; anything else is admitted.  Returns
    (url_key, host, keep, reason) for every CRAWLABLE constructed URL —
    the decision a frontier makes per discovered link before spending a
    fetch (the reference crawls unconditionally; this is the graft's
    scale gate, same altitude as stages/crawl.py robots checks).

    Scale shape: the blocklist is a tiny broadcast frozenset captured
    by the batch closure (ray.put-equivalent for module constants —
    shipped once per task, never per row); rules evaluate on the
    already-canonical fields, so the kernel composes with the fetch
    actors' per-link canonicalization without a second parse."""
    from spider_ray.common.urlnorm import canonicalize, host_of, path_of

    ds = _rp(sf_dir, "orders", ["o_orderkey"])

    _SCHEMA = pa.schema([("url_key", pa.int64()), ("host", pa.string()),
                         ("keep", pa.bool_()), ("reason", pa.string())])

    def fn(t: pa.Table) -> pa.Table:
        keys, hosts, keeps, reasons = [], [], [], []
        for k in t["o_orderkey"].to_pylist():
            c = canonicalize(_raw_url(int(k)))
            if c is None:
                continue  # non-crawlable scheme: never reaches the filter
            host = host_of(c)
            path = path_of(c)
            q = c.split("?", 1)
            n_params = q[1].count("&") + 1 if len(q) > 1 else 0
            if host in _BLOCKED_HOSTS:
                keep, reason = False, "blocked_host"
            elif path.startswith("/x/"):
                keep, reason = False, "blocked_prefix"
            elif n_params >= 2:
                keep, reason = False, "too_many_params"
            else:
                keep, reason = True, ""
            keys.append(int(k))
            hosts.append(host)
            keeps.append(keep)
            reasons.append(reason)
        return pa.table({"url_key": pa.array(keys, pa.int64()),
                         "host": pa.array(hosts, pa.string()),
                         "keep": pa.array(keeps, pa.bool_()),
                         "reason": pa.array(reasons, pa.string())},
                        schema=_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow")
