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
