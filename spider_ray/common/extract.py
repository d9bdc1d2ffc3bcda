"""HTML → text / links extraction — the single shared definition.

The per-row invariant from BASELINE.json `input_hint` is *byte-identical
extracted text per url* between the reference oracle and the Ray pipeline.
Both import this module, so the invariant reduces to determinism of these
two pure functions (SURVEY.md §7.4 "Byte-identical text").

Implementation is stdlib-only (html.parser) so it behaves identically in
oracle and Ray worker processes.
"""

from __future__ import annotations

import re
from html import unescape

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_HREF = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_WS = re.compile(r"\s+")


def extract_text(html: bytes | str) -> str:
    """Visible text of an HTML document.

    Deterministic pipeline: decode UTF-8 (replace errors) → drop
    script/style/comments → replace tags with a space → unescape HTML
    entities → collapse whitespace → strip.
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    html = _SCRIPT_STYLE.sub(" ", html)
    html = _COMMENT.sub(" ", html)
    html = _TAG.sub(" ", html)
    html = unescape(html)
    return _WS.sub(" ", html).strip()


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
