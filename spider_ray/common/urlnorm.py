"""URL canonicalization — the single definition of URL identity for the
whole engine.

Both the single-threaded oracle (spider_ray.oracle) and the Ray stages
(spider_ray.stages) import *this* module, so the URL-seen set and crawl
ordering agree by construction.

Rules (deterministic, order of application fixed):
  1. strip surrounding whitespace
  2. scheme + host lowercased
  3. default ports removed (http:80, https:443)
  4. fragment removed
  5. dot-segments resolved, duplicate slashes collapsed, empty path -> "/"
  6. query parameters sorted by (key, value); empty query -> no "?"
  7. only http/https URLs are considered crawlable

Reference parity note: spider-go has no crawler; URL identity here plays
the role its message `Key`/dedup identity plays (`pkg/spider/message.go:14-24`,
JetStream publisher-dedup `pkg/spider/nats.go:161`) — a stable string key
for "have we processed this record".
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode, urljoin

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _normalize_path(path: str) -> str:
    if not path:
        return "/"
    # collapse duplicate slashes
    while "//" in path:
        path = path.replace("//", "/")
    # resolve dot segments (RFC 3986 §5.2.4, simplified for absolute paths)
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def canonicalize(url: str) -> str | None:
    """Canonical form of ``url``, or None if it is not a crawlable http(s) URL."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    try:
        host = parts.hostname
        if not host:
            return None
        host = host.lower().rstrip(".")
        # .port raises ValueError on malformed/out-of-range ports — one
        # bad href must never crash a fetch stage (invalid -> dropped)
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = _normalize_path(parts.path)
    query = ""
    if parts.query:
        pairs = sorted(parse_qsl(parts.query, keep_blank_values=True))
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(canonical_url: str) -> str:
    """Host part of an already-canonical URL (cheap split, no re-parse)."""
    # canonical form is scheme://host[:port]/path[?q]
    rest = canonical_url.split("://", 1)[1]
    hostport = rest.split("/", 1)[0]
    return hostport.split(":", 1)[0]


def path_of(canonical_url: str) -> str:
    """Path part (incl. leading /) of an already-canonical URL, sans query."""
    rest = canonical_url.split("://", 1)[1]
    slash = rest.find("/")
    if slash < 0:
        return "/"
    return rest[slash:].split("?", 1)[0]


def robots_denied(robots: dict[str, list[str]], host: str, path: str) -> bool:
    """Shared robots deny-prefix predicate — ONE definition imported by
    both the oracle and the fetch workers so engine/oracle parity holds
    by construction (rule set is tiny config; linear scan)."""
    for prefix in robots.get(host, ()):
        if path.startswith(prefix):
            return True
    return False


def resolve(base_url: str, href: str) -> str | None:
    """Resolve an href found on ``base_url`` and canonicalize it."""
    if href is None:
        return None
    href = href.strip()
    if not href or href.startswith(("javascript:", "mailto:", "data:", "#")):
        return None
    try:
        absolute = urljoin(base_url, href)
    except ValueError:
        return None
    return canonicalize(absolute)


# ---------------------------------------------------------------------------
# batch kernels — exact vectorized fast paths over resolve()/host_of()
# ---------------------------------------------------------------------------
#
# The crawl fetch stage resolves every href of every fetched page; doing
# that through urlsplit/parse_qsl per link was the last per-row Python
# loop in the hot path (round-2 verdict item 5).  The kernels below RE2-
# classify each href ONCE over the whole column:
#
#   fast-A  provably-already-canonical absolute http(s) URL -> unchanged
#   fast-B  clean root-relative path               -> base origin + href
#   slow    everything else                        -> per-row resolve()
#
# "Provably canonical" is deliberately conservative: printable-ASCII
# only (python str.strip() and urlsplit's \t\r\n-removal can touch
# nothing), lowercase scheme+host, no port / query / fragment / dot
# segments / empty segments — every condition under which
# canonicalize(href) is the identity.  Anything outside the proof goes
# through the EXACT slow path, so the batch kernel equals a per-row
# resolve() by construction (hypothesis-tested in tests/test_common.py).

# printable ASCII minus "/", "?", "#"  (and minus "." for segment heads)
_PCHAR = r"[\x21\x22\x24-\x2e\x30-\x3e\x40-\x7e]"
_PCHAR_ND = r"[\x21\x22\x24-\x2d\x30-\x3e\x40-\x7e]"
_SEG = (rf"(?:{_PCHAR_ND}{_PCHAR}*"      # not starting with "."
        rf"|\.{_PCHAR_ND}{_PCHAR}*"      # ".x..." (not "." / "..")
        rf"|\.\.{_PCHAR}+)")             # "..x..." (not "..")
_PATH = rf"/(?:{_SEG}(?:/{_SEG})*/?)?"
_FAST_ABS_RE = (r"^https?://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?"
                + _PATH + r"$")
_FAST_REL_RE = r"^" + _PATH + r"$"
_ORIGIN_RE = r"^(?P<origin>https?://[^/]+)"
_HOST_RE = r"^https?://(?P<host>[^/:]+)"


def _as_str_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    if isinstance(col, pa.Array):
        return col
    return pa.array(col, pa.string())


def host_of_batch(canonical_urls) -> pa.Array:
    """Vectorized host_of over a column of already-canonical URLs (one
    RE2 pass; falls back to host_of per row only on non-canonical
    input, which the engine never produces)."""
    arr = _as_str_array(canonical_urls)
    if len(arr) == 0:
        return pa.array([], pa.string())
    hosts = pc.struct_field(pc.extract_regex(arr, pattern=_HOST_RE), "host")
    if hosts.null_count:
        vals = hosts.to_pylist()
        return pa.array(
            [host_of(u) if v is None else v
             for u, v in zip(arr.to_pylist(), vals)], pa.string())
    return hosts


def resolve_batch(hrefs, base_urls) -> list:
    """resolve(base, href) over whole columns, returning a row-aligned
    list of canonical urls / None.  `base_urls` must be canonical (they
    are: the engine only fetches admitted canonical urls)."""
    arr = _as_str_array(hrefs)
    n = len(arr)
    if n == 0:
        return []
    out = arr.to_pylist()
    bases = (base_urls if isinstance(base_urls, (list, np.ndarray))
             else _as_str_array(base_urls).to_pylist())
    fast_abs = np.asarray(
        pc.match_substring_regex(arr, pattern=_FAST_ABS_RE).fill_null(False))
    fast_rel = np.asarray(
        pc.match_substring_regex(arr, pattern=_FAST_REL_RE).fill_null(False))
    for i in np.nonzero(~(fast_abs | fast_rel))[0]:
        out[i] = resolve(bases[i], out[i])
    rel_idx = np.nonzero(fast_rel)[0]
    if len(rel_idx):
        # origin = scheme://host[:port] of the canonical base; a cheap
        # concat replaces urljoin+canonicalize for clean absolute paths
        for i in rel_idx:
            b = bases[i]
            out[i] = b[:b.index("/", b.index("://") + 3)] + out[i]
    return out
