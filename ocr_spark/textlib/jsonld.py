"""JSON-LD structured-data extraction (schema.org embedded metadata).

The other metadata channel next to og/meta tags (textlib/webmeta.py):
publishers embed ``<script type="application/ld+json">`` blocks with
schema.org nodes — NewsArticle/Product/Organization/... — and real
pipelines read headline/author/datePublished from them because they
are usually cleaner than the visible page (Google's structured-data
docs make them table stakes for news/article pages).

Public sources: W3C JSON-LD 1.1 (script-embedding section), schema.org
vocabulary docs.

Semantics (documented exactly so the DuckDB driver-oracle can replay
the planted truth):

- Every ``<script>`` whose ``type`` attribute — lowercased, parameters
  after ``;`` dropped — equals ``application/ld+json`` is a candidate
  block; script bodies are taken verbatim (no entity decoding — script
  content is CDATA-like per HTML5).
- A block body may be wrapped in an HTML comment or CDATA marker (a
  legacy-browser convention); one wrapper layer is stripped.
- A parsed block yields nodes: the top-level object; the members of a
  top-level array; or the members of a top-level ``@graph`` array when
  present (the ``{"@context", "@graph": [...]}`` idiom — the envelope
  itself yields no node). Non-dict members are ignored.
- Per node, the extracted fields: ``jsonld_type`` (``@type``; a list
  takes its first string), ``name``, ``headline``, ``author`` (a
  string; an object takes its ``name``; a list takes its first
  element under the same rule), ``date_published`` (``datePublished``),
  ``item_url`` (``url``). All whitespace-normalized; non-string
  scalars are ignored (None).
- Blocks whose JSON fails to parse are counted, never fatal — the
  WARC/sitemap totality contract.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")


def _norm(v) -> str | None:
    if not isinstance(v, str):
        return None
    s = _WS.sub(" ", v).strip()
    return s or None


def _first_string(v) -> str | None:
    if isinstance(v, list):
        v = v[0] if v else None
    return _norm(v)


def _author_name(v) -> str | None:
    if isinstance(v, list):
        v = v[0] if v else None
    if isinstance(v, dict):
        v = v.get("name")
    return _norm(v)


_COMMENT_WRAP = re.compile(r"^\s*<!--(.*?)-->\s*$", re.DOTALL)
# The legacy convention nests the CDATA markers inside JS comments:
#   /*<![CDATA[*/ {json} /*]]>*/
_CDATA_WRAP = re.compile(
    r"^\s*(?:/\*)?\s*<!\[CDATA\[\s*(?:\*/)?(.*?)(?:/\*)?\s*\]\]>"
    r"\s*(?:\*/)?\s*$", re.DOTALL)


def _unwrap(body: str) -> str:
    for pat in (_COMMENT_WRAP, _CDATA_WRAP):
        m = pat.match(body)
        if m:
            return m.group(1)
    return body


class _ScriptCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.blocks: list[str] = []
        self._in_ld = False
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag != "script":
            return
        t = (dict(attrs).get("type") or "").split(";", 1)[0]
        if t.strip().lower() == "application/ld+json":
            self._in_ld = True
            self._buf = []

    def handle_endtag(self, tag):
        if tag == "script" and self._in_ld:
            self.blocks.append("".join(self._buf))
            self._in_ld = False

    def handle_startendtag(self, tag, attrs):
        # A self-closing <script .../> has no body; the default
        # start+end dispatch would append an empty block that then
        # counts as a "lossy page" despite nothing being lost.
        if tag != "script":
            super().handle_startendtag(tag, attrs)

    def handle_data(self, data):
        if self._in_ld:
            self._buf.append(data)

    def handle_comment(self, data):
        # convert_charrefs=False keeps comments separate; a whole-block
        # comment wrapper inside a script reaches handle_data in CDATA
        # mode for <script>, so nothing needed here.
        pass


def _nodes(doc) -> list[dict]:
    if isinstance(doc, list):
        return [n for n in doc if isinstance(n, dict)]
    if isinstance(doc, dict):
        graph = doc.get("@graph")
        if isinstance(graph, list):
            return [n for n in graph if isinstance(n, dict)]
        return [doc]
    return []


def extract_jsonld(html: str) -> tuple[list[dict], int]:
    """All schema.org nodes of a page -> ([{jsonld_type, name,
    headline, author, date_published, item_url}], skipped_blocks)."""
    p = _ScriptCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever blocks were collected before the error
    if p._in_ld:
        # Truncated page: the block never saw its </script>. In CDATA
        # mode html.parser WAITS for the close tag — even at close()
        # the tail stays in rawdata, never reaching handle_data — so
        # flush buf + the unconsumed tail as a block: a complete JSON
        # body still extracts and a cut-off one is COUNTED. Silently
        # dropping it would undercount the skip counter the contract
        # promises (review finding).
        tail = "".join(p._buf) + getattr(p, "rawdata", "")
        if tail.strip():
            p.blocks.append(tail)
        p._in_ld = False
    out: list[dict] = []
    skipped = 0
    for body in p.blocks:
        if not body.strip():
            continue  # empty script body: nothing lost, don't count
        try:
            doc = json.loads(_unwrap(body))
        except (ValueError, RecursionError):
            skipped += 1
            continue
        for n in _nodes(doc):
            out.append({
                "jsonld_type": _first_string(n.get("@type")),
                "name": _norm(n.get("name")),
                "headline": _norm(n.get("headline")),
                "author": _author_name(n.get("author")),
                "date_published": _norm(n.get("datePublished")),
                "item_url": _norm(n.get("url")),
            })
    return out, skipped
