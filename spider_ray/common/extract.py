"""HTML → text / links extraction — the single shared definition.

The per-row invariant from BASELINE.json `input_hint` is *byte-identical
extracted text per url* between the reference oracle and the Ray pipeline.
Both import this module, and the per-page API is a thin wrapper over the
SAME batch kernel, so the invariant reduces to determinism of one pure
function (SURVEY.md §7.4 "Byte-identical text").

The batch kernel runs every pass (script/style/comment/tag stripping,
common-entity unescape, whitespace collapse, href scan) as Arrow RE2
column kernels — C++ regex instead of per-page Python, which was the
dominant CPU cost of the crawl fetch stage.  Python html.unescape runs
only on rows containing entities outside the common set.
"""

from __future__ import annotations

from html import unescape

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible markup strip (no backreferences; (?is) =
# case-insensitive + dot-matches-newline): script/style/comment blocks
# AND plain tags as ONE alternation pass — one 25KB-per-page
# intermediate instead of three, ~40% less regex scan work.
# Alternation is leftmost-first, so at a block opener the whole block
# (up to its own closer) wins over the bare-tag branch.  Single-pass
# semantics: spans formed by earlier replacements are NOT re-scanned
# (the same convention html.unescape uses for entities).
_MARKUP_PASS = (
    r"(?is)<script\b[^>]*>.*?</script\s*>"
    r"|<style\b[^>]*>.*?</style\s*>"
    r"|<!--.*?-->"
    r"|<[^>]+>"
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


# rows per internal slice: bounds the kernel's transient intermediates
# (each pass materializes a fresh column) to ~tens of MB per worker —
# 32 workers' unbounded transients were a measured driver of the
# host-memory cliff documented in BENCH/BASELINE.md
_CHUNK_ROWS = 512


def extract_text_batch(htmls) -> list[str]:
    """Visible text for a whole column of HTML documents.

    Deterministic pipeline per row: decode UTF-8 (replace errors) → strip
    markup (script/style blocks, comments, tags — one single-pass RE2
    alternation) → unescape HTML entities → collapse whitespace → strip.
    Null rows yield "".  Processed in bounded row slices (see
    _CHUNK_ROWS)."""
    return extract_text_batch_arrow(htmls).to_pylist()


def extract_text_batch_arrow(htmls) -> pa.Array:
    """Arrow-native variant of extract_text_batch: the SAME kernel and
    the same bytes per row, but the result stays an Arrow string array
    (null rows -> "").  The crawl fetch path scatters it straight into
    its output table — skipping the tens of MB of Python-string
    round-trip per actor batch that the list API pays."""
    arr = _decode_column(htmls)
    if len(arr) <= _CHUNK_ROWS:
        return _extract_text_chunk(arr)
    return pa.concat_arrays(
        [_extract_text_chunk(arr.slice(start, _CHUNK_ROWS))
         for start in range(0, len(arr), _CHUNK_ROWS)])


def _extract_text_chunk(arr: pa.Array) -> pa.Array:
    import os as _os
    import time as _time

    import numpy as np
    _dbg = bool(_os.environ.get("SPIDER_RAY_EXTRACT_DEBUG"))
    _t0 = _time.time()
    if len(arr) == 0:
        return pa.array([], pa.string())
    _t1 = _time.time()
    arr = pc.replace_substring_regex(arr, pattern=_MARKUP_PASS,
                                     replacement=" ")
    _t2 = _time.time()
    _t3 = _t2
    # entity unescape, three-tier: rows whose entity starts are ALL from
    # the common set run as vectorized RE2 replaces (ordered so no
    # output of one replace forms another's input — html.unescape is
    # single-pass); only rows with exotic entities pay python
    # html.unescape.  RE2 has no lookahead, so "all common" is decided
    # by comparing entity-start counts.
    c_all = pc.count_substring_regex(arr, pattern=r"&(#|[A-Za-z])")
    c_common = pc.count_substring_regex(
        arr, pattern=r"&(amp;|lt;|gt;|quot;|#39;|nbsp;)")
    has_ent = np.asarray(pc.fill_null(pc.greater(c_all, 0), False))
    exotic = np.asarray(pc.fill_null(
        pc.not_equal(c_all, c_common), False)) & has_ent
    common = has_ent & ~exotic
    if common.any():
        rep = arr
        for pat, sub in ((r"&lt;", "<"), (r"&gt;", ">"), (r"&quot;", '"'),
                         (r"&#39;", "'"), (r"&nbsp;", "\xa0"),
                         (r"&amp;", "&")):
            rep = pc.replace_substring(rep, pattern=pat, replacement=sub)
        arr = pc.if_else(pa.array(common.tolist(), pa.bool_()), rep, arr)
    ex_idx = np.flatnonzero(exotic)
    if len(ex_idx):
        repl: list = [None] * len(arr)
        vals = arr.take(pa.array(ex_idx, pa.int64())).to_pylist()
        for i, s in zip(ex_idx, vals):
            repl[int(i)] = unescape(s) if s is not None else None
        arr = pc.if_else(pa.array(exotic.tolist(), pa.bool_()),
                         pa.array(repl, pa.string()), arr)
    # whitespace collapse + trim, fully vectorized: trim -> split on the
    # Unicode whitespace class (runs collapse, matching str.split()) ->
    # join (the old per-row " ".join(s.split()) Python loop was ~half
    # the kernel's wall time on a 25 KB/page corpus)
    collapsed = pc.fill_null(pc.binary_join(
        pc.utf8_split_whitespace(pc.utf8_trim_whitespace(arr)), " "), "")
    if isinstance(collapsed, pa.ChunkedArray):
        collapsed = collapsed.combine_chunks()
    if _dbg:
        _t4 = _time.time()
        print(f"[extract] n={len(collapsed)} decode={_t1-_t0:.2f} "
              f"markup={_t2-_t1:.2f} tail={_t4-_t3:.2f}", flush=True)
    return collapsed


def extract_text(html: bytes | str) -> str:
    """Single-page wrapper over the SAME batch kernel (the oracle's
    entry point — one implementation, so oracle and engine cannot
    diverge)."""
    return extract_text_batch([html])[0]


_HREF_FRAG = (r'(?i)^[^>]*?\bhref\s*=\s*'
              r'(?:"(?P<d>[^"]*)"|\'(?P<s>[^\']*)\'|(?P<u>[^\s>]+))')


def extract_hrefs_batch(htmls) -> tuple[list[str], "object"]:
    """Raw href attribute values of <a> tags for a whole html column, in
    document order, flattened with parent row indices.

    Vectorized as one RE2 split on `<a\\b` (each later fragment starts
    inside one anchor tag) + one RE2 first-match extract per fragment —
    replacing the per-page Python finditer loop that was the second
    hottest span of the crawl fetch stage.  Entity unescape runs only on
    the (short) hrefs that can contain an entity.  Processed in bounded
    row slices (_CHUNK_ROWS) to cap the ListArray intermediates."""
    import numpy as np

    arr = _decode_column(htmls)
    if len(arr) > _CHUNK_ROWS:
        all_h: list[str] = []
        parents = []
        for start in range(0, len(arr), _CHUNK_ROWS):
            h, p = extract_hrefs_batch(arr.slice(start, _CHUNK_ROWS))
            all_h.extend(h)
            parents.append(p + start)
        return all_h, (np.concatenate(parents) if parents
                       else np.zeros(0, dtype=np.int64))
    n = len(arr)
    empty = ([], np.zeros(0, dtype=np.int64))
    if n == 0:
        return empty
    frags = pc.split_pattern_regex(arr, pattern=r"(?i)<a\b")
    if isinstance(frags, pa.ChunkedArray):
        frags = frags.combine_chunks()
    offsets = np.asarray(frags.offsets)
    values = frags.flatten()
    if len(values) == 0:
        return empty
    parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    pos = np.arange(len(values), dtype=np.int64) - offsets[:-1][parent]
    tag_mask = pos > 0  # a row's first fragment precedes its first <a
    tags = values.filter(pa.array(tag_mask))
    parent = parent[tag_mask]
    if len(tags) == 0:
        return empty
    m = pc.extract_regex(tags, pattern=_HREF_FRAG)
    d = pc.struct_field(m, "d")
    s = pc.struct_field(m, "s")
    u = pc.struct_field(m, "u")
    # first participating non-empty group (the original finditer's
    # `group(1) or group(2) or group(3)` falsy chain)
    href = pc.if_else(pc.greater(pc.utf8_length(d), 0), d,
                      pc.if_else(pc.greater(pc.utf8_length(s), 0), s, u))
    keep = np.asarray(pc.fill_null(pc.greater(pc.utf8_length(href), 0),
                                   False))
    out = href.filter(pa.array(keep)).to_pylist()
    parent = parent[keep]
    for i, h in enumerate(out):
        if "&" in h:
            out[i] = unescape(h)
    # unescape can empty an href (e.g. a bare "&amp;" -> "&" stays, but
    # numeric refs to NUL etc. do not) — the original loop dropped
    # falsy values AFTER unescape
    final_keep = [bool(h) for h in out]
    if not all(final_keep):
        out = [h for h in out if h]
        parent = parent[np.asarray(final_keep)]
    return out, parent


_ANCHOR_FRAG = (r'(?is)^[^>]*?\bhref\s*=\s*'
                r'(?:"(?P<d>[^"]*)"|\'(?P<s>[^\']*)\'|(?P<u>[^\s>]+))'
                r'[^>]*>(?P<t>.*?)</a>')


def extract_anchors_batch(htmls) -> tuple[list[str], list[str], "object"]:
    """(href, anchor_text) pairs of <a> tags for a whole html column, in
    document order, flattened with parent row indices — the web-index
    side of the href scan (anchor text is the classic relevance signal
    aggregated per TARGET url).

    Same vectorized shape as extract_hrefs_batch (one RE2 split on
    `<a\\b` + one RE2 first-match extract per fragment); anchors without
    a closing </a> in their fragment are skipped.  Anchor text is
    tag-stripped, entity-unescaped and whitespace-collapsed; pairs with
    an empty href are dropped (empty TEXT is kept — a bare image link is
    still a link)."""
    import numpy as np

    arr = _decode_column(htmls)
    if len(arr) > _CHUNK_ROWS:
        all_h: list[str] = []
        all_t: list[str] = []
        parents = []
        for start in range(0, len(arr), _CHUNK_ROWS):
            h, tx, p = extract_anchors_batch(arr.slice(start, _CHUNK_ROWS))
            all_h.extend(h)
            all_t.extend(tx)
            parents.append(p + start)
        return all_h, all_t, (np.concatenate(parents) if parents
                              else np.zeros(0, dtype=np.int64))
    n = len(arr)
    empty = ([], [], np.zeros(0, dtype=np.int64))
    if n == 0:
        return empty
    frags = pc.split_pattern_regex(arr, pattern=r"(?i)<a\b")
    if isinstance(frags, pa.ChunkedArray):
        frags = frags.combine_chunks()
    offsets = np.asarray(frags.offsets)
    values = frags.flatten()
    if len(values) == 0:
        return empty
    parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    pos = np.arange(len(values), dtype=np.int64) - offsets[:-1][parent]
    tag_mask = pos > 0
    tags = values.filter(pa.array(tag_mask))
    parent = parent[tag_mask]
    if len(tags) == 0:
        return empty
    m = pc.extract_regex(tags, pattern=_ANCHOR_FRAG)
    d = pc.struct_field(m, "d")
    s = pc.struct_field(m, "s")
    u = pc.struct_field(m, "u")
    href = pc.if_else(pc.greater(pc.utf8_length(d), 0), d,
                      pc.if_else(pc.greater(pc.utf8_length(s), 0), s, u))
    text = pc.struct_field(m, "t")
    keep = np.asarray(pc.fill_null(pc.greater(pc.utf8_length(href), 0),
                                   False))
    href = href.filter(pa.array(keep))
    text = text.filter(pa.array(keep))
    parent = parent[keep]
    # anchor text: strip nested tags, collapse whitespace runs, trim
    text = pc.replace_substring_regex(text, pattern=r"<[^>]*>",
                                      replacement=" ")
    text = pc.replace_substring_regex(text, pattern=r"\s+",
                                      replacement=" ")
    text = pc.utf8_trim_whitespace(text)
    hrefs = href.to_pylist()
    texts = text.to_pylist()
    for i, h in enumerate(hrefs):
        if "&" in h:
            hrefs[i] = unescape(h)
        if "&" in texts[i]:
            texts[i] = unescape(texts[i])
    final_keep = [bool(h) for h in hrefs]
    if not all(final_keep):
        hrefs = [h for h in hrefs if h]
        texts = [t for t, k in zip(texts, final_keep) if k]
        parent = parent[np.asarray(final_keep)]
    return hrefs, texts, parent


def extract_hrefs(html: bytes | str) -> list[str]:
    """Raw href attribute values of <a> tags, in document order — the
    single-page wrapper over the SAME batch kernel (one implementation,
    so oracle and engine cannot diverge)."""
    out, _ = extract_hrefs_batch([html])
    return out
