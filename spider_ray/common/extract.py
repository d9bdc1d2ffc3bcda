"""HTML → text / links extraction — the single shared definition.

The per-row invariant from BASELINE.json `input_hint` is *byte-identical
extracted text per url* between the reference oracle and the Ray pipeline.
Both import this module, and the per-page API is a thin wrapper over the
SAME batch kernel, so the invariant reduces to determinism of one pure
function (SURVEY.md §7.4 "Byte-identical text").

The batch kernel runs the heavy passes (script/style/comment/tag
stripping) as Arrow RE2 `replace_substring_regex` over the whole html
column — C++ regex instead of per-page Python `re`, which was the
dominant CPU cost of the crawl fetch stage.  Entity unescape and
whitespace collapse finish per row in Python (cheap; unescape only runs
on rows that contain '&').
"""

from __future__ import annotations

import re
from html import unescape

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible passes (no backreferences; (?is) = case-insensitive +
# dot-matches-newline).  script/style/comment removal is ONE alternation
# pass — one 25KB-per-page intermediate instead of three; alternation is
# leftmost-first, so each region is removed up to its own closer
_BATCH_PASSES = (
    r"(?is)<script\b[^>]*>.*?</script\s*>"
    r"|<style\b[^>]*>.*?</style\s*>"
    r"|<!--.*?-->",
    r"<[^>]+>",
)

_HREF = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)


def _decode_column(htmls) -> pa.Array:
    """binary|string column -> string array (utf-8, errors replaced)."""
    if isinstance(htmls, list):
        htmls = pa.array(
            [h.decode("utf-8", "replace") if isinstance(h, bytes) else h
             for h in htmls], pa.string())
        return htmls
    if isinstance(htmls, pa.ChunkedArray):
        htmls = htmls.combine_chunks()
    if pa.types.is_string(htmls.type) or pa.types.is_large_string(htmls.type):
        return htmls
    try:
        return htmls.cast(pa.string())
    except pa.ArrowInvalid:
        # invalid utf-8 somewhere: per-row lossy decode (rare path)
        return pa.array([None if v is None else
                         (v.decode("utf-8", "replace") if isinstance(v, bytes)
                          else str(v))
                         for v in htmls.to_pylist()], pa.string())


def extract_text_batch(htmls) -> list[str]:
    """Visible text for a whole column of HTML documents.

    Deterministic pipeline per row: decode UTF-8 (replace errors) → drop
    script/style → drop comments → replace tags with a space → unescape
    HTML entities → collapse whitespace → strip.  Null rows yield "".
    """
    import os as _os
    import time as _time
    _dbg = bool(_os.environ.get("SPIDER_RAY_EXTRACT_DEBUG"))
    _t0 = _time.time()
    arr = _decode_column(htmls)
    if len(arr) == 0:
        return []
    _t1 = _time.time()
    arr = pc.replace_substring_regex(arr, pattern=_BATCH_PASSES[0],
                                     replacement=" ")
    _t2 = _time.time()
    arr = pc.replace_substring_regex(arr, pattern=_BATCH_PASSES[1],
                                     replacement=" ")
    _t3 = _time.time()
    out = arr.to_pylist()
    for i, s in enumerate(out):
        if s is None:
            out[i] = ""
            continue
        if "&" in s:  # entity unescape only when entities can exist
            s = unescape(s)
        # str.split() splits on the same unicode whitespace class the
        # old re \s+ matched; join+split is the fast C path
        out[i] = " ".join(s.split())
    if _dbg:
        _t4 = _time.time()
        print(f"[extract] n={len(out)} decode={_t1-_t0:.2f} "
              f"pass1={_t2-_t1:.2f} pass2={_t3-_t2:.2f} "
              f"tail={_t4-_t3:.2f}", flush=True)
    return out


def extract_text(html: bytes | str) -> str:
    """Single-page wrapper over the SAME batch kernel (the oracle's
    entry point — one implementation, so oracle and engine cannot
    diverge)."""
    return extract_text_batch([html])[0]


def extract_hrefs(html: bytes | str) -> list[str]:
    """Raw href attribute values of <a> tags, in document order."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    out: list[str] = []
    for m in _HREF.finditer(html):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        href = unescape(href)
        if href:
            out.append(href)
    return out
