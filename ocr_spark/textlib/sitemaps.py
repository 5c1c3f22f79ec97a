"""Sitemap parsing per the public sitemaps.org protocol (Sitemap 0.9,
the format robots.txt ``Sitemap:`` lines point at and every major
crawler consumes).

A crawl pipeline uses sitemaps as the DEMAND side of scheduling: the
site declares what exists (``<loc>``), when it changed
(``<lastmod>``), and how much it matters (``<priority>``,
``<changefreq>``). This module parses one sitemap document into flat
entry dicts; ``operators/domains.py`` lifts it over a DataFrame and
joins it against the crawl state to build a refetch frontier.

Semantics implemented:

- ``<urlset>`` documents yield one entry per ``<url>`` block:
  ``loc`` (required — blocks without one are skipped and counted),
  ``lastmod`` (W3C datetime: date-only, datetime with 'Z' or a
  numeric offset), ``changefreq`` (folded to the protocol's enum,
  anything else -> None), ``priority`` (float clamped to [0, 1];
  unparseable -> None; the protocol default 0.5 is applied by the
  CONSUMER so a missing value stays observable here).
- ``<sitemapindex>`` documents yield one entry per ``<sitemap>``
  block with ``is_index=True`` — the consumer fetches and expands
  them; this parser never follows the pointer.
- Namespaces are ignored by localname matching (real-world sitemaps
  carry the 0.9 namespace, image/video extensions, or none at all).
- Malformed XML never kills the task (same totality contract as the
  WARC reader and robots parser): when ElementTree rejects the
  document, a tag-level fallback scan recovers every
  ``<url>``/``<sitemap>`` block whose ``<loc>`` survives, and the
  parse reports how many blocks it skipped.
"""

from __future__ import annotations

import datetime as dt
import re
from xml.etree import ElementTree

CHANGEFREQS = ("always", "hourly", "daily", "weekly", "monthly",
               "yearly", "never")

_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&"))  # &amp; last


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def parse_w3c_datetime(s: str) -> dt.datetime | None:
    """W3C datetime (the ``lastmod`` grammar): YYYY-MM-DD, or a full
    timestamp with 'Z'/±HH:MM offset (normalized to naive UTC, the
    convention warc_ts already uses)."""
    s = s.strip()
    m = re.fullmatch(
        r"(\d{4})-(\d{2})-(\d{2})"
        r"(?:[Tt ](\d{2}):(\d{2})(?::(\d{2})(?:\.\d+)?)?"
        r"(Z|z|[+-]\d{2}:\d{2})?)?", s)
    if not m:
        return None
    try:
        out = dt.datetime(int(m.group(1)), int(m.group(2)),
                          int(m.group(3)), int(m.group(4) or 0),
                          int(m.group(5) or 0), int(m.group(6) or 0))
    except ValueError:
        return None
    tz = m.group(7)
    if tz and tz not in ("Z", "z"):
        sign = 1 if tz[0] == "+" else -1
        try:
            off = dt.timedelta(hours=int(tz[1:3]), minutes=int(tz[4:6]))
        except ValueError:
            return None
        out -= sign * off
    return out


def _norm_changefreq(s: str | None) -> str | None:
    if s is None:
        return None
    s = s.strip().lower()
    return s if s in CHANGEFREQS else None


def _norm_priority(s: str | None) -> float | None:
    if s is None:
        return None
    try:
        v = float(s.strip())
    except ValueError:
        return None
    return min(1.0, max(0.0, v))


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _entry(is_index: bool, loc: str, lastmod: str | None,
           changefreq: str | None, priority: str | None) -> dict:
    return {"loc": loc.strip(), "lastmod": parse_w3c_datetime(lastmod)
            if lastmod else None,
            "changefreq": _norm_changefreq(changefreq),
            "priority": _norm_priority(priority),
            "is_index": is_index}


_BLOCK_RE = re.compile(
    r"<\s*(url|sitemap)[\s>].*?<\s*/\s*\1\s*>",
    re.IGNORECASE | re.DOTALL)
_FIELD_RE = re.compile(
    r"<\s*(loc|lastmod|changefreq|priority)\s*>(.*?)<\s*/\s*\1\s*>",
    re.IGNORECASE | re.DOTALL)


def _fallback_scan(text: str) -> tuple[list[dict], int]:
    """Tag-level recovery for documents ElementTree rejects: every
    <url>/<sitemap> block with a <loc> still yields an entry."""
    out, skipped = [], 0
    for m in _BLOCK_RE.finditer(text):
        fields = {k.lower(): _unescape(v.strip())
                  for k, v in _FIELD_RE.findall(m.group(0))}
        if not fields.get("loc"):
            skipped += 1
            continue
        out.append(_entry(m.group(1).lower() == "sitemap",
                          fields["loc"], fields.get("lastmod"),
                          fields.get("changefreq"),
                          fields.get("priority")))
    return out, skipped


def parse_sitemap(text: str) -> tuple[list[dict], int]:
    """Entries of one sitemap document + the skipped-block count.

    Each entry: ``{loc, lastmod: datetime|None, changefreq: str|None,
    priority: float|None, is_index: bool}``. Returns ``([], 0)`` for
    a document with no recoverable blocks."""
    if not text or not text.strip():
        return [], 0
    try:
        root = ElementTree.fromstring(text)
    except ElementTree.ParseError:
        return _fallback_scan(text)
    out, skipped = [], 0
    is_index_doc = _localname(root.tag) == "sitemapindex"
    want = "sitemap" if is_index_doc else "url"
    for block in root:
        if _localname(block.tag) != want:
            continue
        fields: dict[str, str] = {}
        for child in block:
            name = _localname(child.tag)
            if name in ("loc", "lastmod", "changefreq", "priority") \
                    and child.text:
                fields[name] = child.text.strip()
        if not fields.get("loc"):
            skipped += 1
            continue
        out.append(_entry(is_index_doc, fields["loc"],
                          fields.get("lastmod"),
                          fields.get("changefreq"),
                          fields.get("priority")))
    return out, skipped
