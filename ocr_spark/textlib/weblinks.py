"""WAT-style outlink extraction from HTML.

Every ``<a href=...>`` in a page becomes one link record
``(dst_url, anchor_text, rel, nofollow)`` with the href resolved
against the page base per RFC 3986 §5 (stdlib ``urljoin``), honoring
an in-document ``<base href>`` (first one wins, per the HTML spec).
This is the link layer Common Crawl publishes as WAT sidecar metadata
— a public format; the implementation here is from scratch on stdlib
``html.parser`` + ``urllib.parse``, like the rest of the webtext axis.

The reference service (/root/reference) has no link extractor; this
module belongs to the LLM-pipeline axis: web-graph signals (outlink
counts, host-level link graph, centrality ranks) are standard
curation inputs at crawl scale.

Skipped hrefs: empty, fragment-only (same-page), and non-web schemes
(javascript/mailto/tel/data). Only http(s) resolutions are kept, so a
relative href on a non-web base page also drops out.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

#: Schemes whose hrefs are navigation chrome, not web links.
_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


def _norm_ws(s: str) -> str:
    return " ".join(s.split())


class _LinkParser(HTMLParser):
    def __init__(self, page_url: str):
        super().__init__(convert_charrefs=True)
        self.page_url = page_url
        self.base = page_url
        self.base_seen = False
        self.links: list[dict] = []
        self._href: str | None = None
        self._rel: str | None = None
        self._text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "base" and not self.base_seen:
            href = dict(attrs).get("href")
            if href:
                # First <base href> wins (HTML spec §4.2.3); resolved
                # against the page URL itself, as browsers do.
                self.base = urljoin(self.page_url, href.strip())
                self.base_seen = True
        elif tag == "a":
            # HTML forbids nested <a>; browsers implicitly close the
            # open anchor when a new one starts. Match that.
            if self._href is not None:
                self._emit()
            a = dict(attrs)
            self._href = a.get("href")
            self._rel = a.get("rel")
            self._text = []

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            self._emit()

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)

    def _emit(self):
        href, rel = self._href, self._rel
        text = _norm_ws("".join(self._text))
        self._href, self._rel, self._text = None, None, []
        if href is None:
            return
        href = href.strip()
        low = href.lower()
        if not href or href.startswith("#"):
            return
        if any(low.startswith(s) for s in _SKIP_SCHEMES):
            return
        dst = urljoin(self.base, href)
        if urlsplit(dst).scheme not in ("http", "https"):
            return
        rel_norm = _norm_ws(rel.lower()) if rel else None
        nofollow = bool(rel_norm) and "nofollow" in rel_norm.split(" ")
        self.links.append({"dst_url": dst,
                           "anchor_text": text or None,
                           "rel": rel_norm,
                           "nofollow": nofollow})

    def close(self):
        super().close()
        # An anchor left open at EOF still carries its href.
        if self._href is not None:
            self._emit()


def extract_links(html: str, page_url: str) -> list[dict]:
    """All outlinks of ``html`` in document order, hrefs resolved
    against the page base. One dict per link:
    ``{dst_url, anchor_text, rel, nofollow}`` (anchor_text/rel are
    None when absent; rel is lowercased and whitespace-normalized).
    Malformed markup never raises — html.parser is resynchronizing,
    and the extractor only reacts to the tags it can see."""
    p = _LinkParser(page_url)
    try:
        p.feed(html)
        p.close()
    except Exception:
        # Defensive: html.parser is documented non-raising on bad
        # markup, but a poison page must never kill the task (the
        # module-wide contract of the extraction cascade).
        pass
    return p.links
