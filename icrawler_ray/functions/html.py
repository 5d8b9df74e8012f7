"""Minimal HTML span scanner (BeautifulSoup is not installed here).

The reference parses pages with bs4+lxml
(/root/reference/icrawler/builtin/greedy.py:30-40: ``find_all("img",
src=True)`` then ``find_all(href=True)``). This engine scans with one
compiled regex pass in **document order**, which both

- reconstructs the interleaved span sequence (kind, text, media_ref, offset)
  for the corpus round-trip invariant, and
- lets the greedy rules emit img tasks first, then hrefs, matching the
  reference's two-pass find_all emission order.

Synthetic pages are rendered by :func:`render_page` (one tag per span), so
scan(render(spans)) == spans is a tested property. Real-web HTML is out of
scope in this sandbox (no bs4); the scanner still handles attribute noise
like ``<img class=x src="u">``.
"""

from __future__ import annotations

import re

# One alternation, scanned once per page, in document order.
_SPAN_RE = re.compile(
    r"<img\s+[^>]*?src=\"([^\"]*)\"[^>]*>"      # group 1: img src
    r"|<a\s+[^>]*?href=\"([^\"]*)\"[^>]*>"      # group 2: a href
    r"|<p>(.*?)</p>",                           # group 3: text run
    re.S,
)


def scan_page(body: str) -> list[tuple[str, str, str]]:
    """Scan a page body -> ordered [(kind, text, media_ref)].

    kind="media" for <img src>, kind="link" for <a href>, kind="text" for
    <p> runs. media_ref / text are the RAW attribute/content strings;
    normalization happens downstream (urlnorm) so that the corpus row keeps
    page-faithful spans.
    """
    spans = []
    append = spans.append
    for m in _SPAN_RE.finditer(body):
        # exactly one alternative participates per match; lastindex names
        # it without materializing all three groups (hot path)
        gi = m.lastindex
        if gi == 1:
            append(("media", "", m.group(1)))
        elif gi == 2:
            append(("link", "", m.group(2)))
        else:
            append(("text", m.group(3), ""))
    return spans


def render_page(spans: list[tuple[str, str, str]]) -> str:
    """Render ordered (kind, text, media_ref) spans to an HTML-ish body.

    Inverse of :func:`scan_page` on the synthetic-web span alphabet.
    """
    parts = ["<html><body>"]
    for kind, text, ref in spans:
        if kind == "text":
            parts.append(f"<p>{text}</p>")
        elif kind == "media":
            parts.append(f'<img src="{ref}"/>')
        else:
            parts.append(f'<a href="{ref}">x</a>')
    parts.append("</body></html>")
    return "\n".join(parts)
