"""RSS 2.0 / Atom 1.0 feed parsing — the OTHER demand-side discovery
channel next to sitemaps (``textlib/sitemaps.py``): a site's feed
declares its newest urls with publish timestamps, which is exactly
what a recrawl frontier wants for fast-moving hosts.

Formats implemented from the public specs:

- **RSS 2.0** (RSS Advisory Board spec): ``<rss><channel><item>``
  blocks — ``<link>`` (required here; items without one are skipped
  and counted), ``<pubDate>`` in RFC 822 date-time (two- or
  four-digit year, named month, numeric ``±HHMM`` offset or the
  RFC 822 zone names), ``<title>``.
- **Atom 1.0** (RFC 4287): ``<feed><entry>`` blocks — the entry link
  is ``<link href>`` preferring ``rel="alternate"`` (an absent rel
  IS alternate per §4.2.7.2), falling back to the first link of any
  other rel; ``<updated>`` else ``<published>`` in RFC 3339 (the same
  grammar sitemaps' W3C ``lastmod`` uses — parser shared); ``<title>``.

Same totality contract as the sitemap/robots/WARC parsers: malformed
XML never kills the task — a tag-level fallback scan recovers every
``<item>``/``<entry>`` block whose link survives, and the parse
reports how many blocks it dropped. Namespaces are ignored by
localname matching (real feeds carry content/dc/media extensions).
"""

from __future__ import annotations

import datetime as dt
import re
from xml.etree import ElementTree

from .sitemaps import _unescape, parse_w3c_datetime

# RFC 822 §5.1 month names and zone table (the zones RFC 822 defines;
# RFC 1123 recommends numeric offsets, which we also take).
_MONTHS = {m: i + 1 for i, m in enumerate(
    ["jan", "feb", "mar", "apr", "may", "jun",
     "jul", "aug", "sep", "oct", "nov", "dec"])}
# 'utc' is not in RFC 822's table but dominates real-world pubDates
# (review finding: rejecting it dropped the publish stamp on exactly
# the fast-moving hosts the feed channel exists for).
_ZONES = {"ut": 0, "gmt": 0, "z": 0, "utc": 0,
          "est": -5 * 60, "edt": -4 * 60,
          "cst": -6 * 60, "cdt": -5 * 60, "mst": -7 * 60,
          "mdt": -6 * 60, "pst": -8 * 60, "pdt": -7 * 60}

_RFC822_RE = re.compile(
    r"(?:[A-Za-z]{3},\s*)?"                      # optional day name
    r"(\d{1,2})\s+([A-Za-z]{3})\s+(\d{2,4})"     # day month year
    r"\s+(\d{2}):(\d{2})(?::(\d{2}))?"           # time
    r"(?:\s+([+-]\d{4}|[A-Za-z]{1,3}))?\s*$")    # zone


def parse_rfc822_datetime(s: str) -> dt.datetime | None:
    """RFC 822 date-time -> naive UTC (the warc_ts convention), or
    None. Two- and three-digit years read per RFC 2822 §4.3:
    00-49 -> 20xx, 50-99 -> 19xx, 100-999 -> +1900."""
    m = _RFC822_RE.match(s.strip())
    if not m:
        return None
    day, mon, year, hh, mm, ss, zone = m.groups()
    month = _MONTHS.get(mon.lower())
    if month is None:
        return None
    y = int(year)
    if y < 100:
        y += 2000 if y < 50 else 1900
    elif y < 1000:
        y += 1900
    offset_min = 0
    if zone:
        if zone[0] in "+-":
            offset_min = int(zone[1:3]) * 60 + int(zone[3:5])
            if zone[0] == "-":
                offset_min = -offset_min
        else:
            z = _ZONES.get(zone.lower())
            if z is None:
                return None
            offset_min = z
    try:
        t = dt.datetime(y, month, int(day), int(hh), int(mm),
                        int(ss or 0))
    except ValueError:
        return None
    return t - dt.timedelta(minutes=offset_min)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _text(el) -> str | None:
    if el is None or el.text is None:
        return None
    t = el.text.strip()
    return t or None


def _entry(loc: str, lastmod: dt.datetime | None,
           title: str | None) -> dict:
    return {"loc": loc, "lastmod": lastmod, "title": title}


def _atom_entry_link(entry) -> str | None:
    """rel='alternate' (or no rel) wins; otherwise the first link."""
    first = None
    for ch in entry:
        if _localname(ch.tag) != "link":
            continue
        href = (ch.get("href") or "").strip()
        if not href:
            continue
        rel = (ch.get("rel") or "alternate").strip().lower()
        if rel == "alternate":
            return href
        if first is None:
            first = href
    return first


def _parse_items(root) -> tuple[list[dict], int]:
    entries, skipped = [], 0
    kind = _localname(root.tag)
    if kind == "rss" or kind == "channel":
        items = [el for el in root.iter() if _localname(el.tag) == "item"]
        for it in items:
            fields = {}
            loc = None
            for ch in it:
                name = _localname(ch.tag)
                # the item link is the first <link> WITH text — an
                # extension <atom:link href rel="self"> has none and
                # must not shadow it
                if name == "link" and loc is None:
                    loc = _text(ch)
                    continue
                fields.setdefault(name, ch)
            if not loc:
                skipped += 1
                continue
            pub = _text(fields.get("pubdate"))
            entries.append(_entry(
                loc, parse_rfc822_datetime(pub) if pub else None,
                _text(fields.get("title"))))
    elif kind == "feed":
        for it in (el for el in root.iter()
                   if _localname(el.tag) == "entry"):
            loc = _atom_entry_link(it)
            if not loc:
                skipped += 1
                continue
            fields = {}
            for ch in it:
                fields.setdefault(_localname(ch.tag), ch)
            stamp = _text(fields.get("updated")) \
                or _text(fields.get("published"))
            entries.append(_entry(
                loc, parse_w3c_datetime(stamp) if stamp else None,
                _text(fields.get("title"))))
    else:
        # Unknown root — not a feed; nothing parsed, nothing skipped
        # (the caller's column carried something else entirely).
        return [], 0
    return entries, skipped


_BLOCK_RE = re.compile(r"<(item|entry)[\s>].*?</\1\s*>",
                       re.IGNORECASE | re.DOTALL)
_LINK_RE = re.compile(r"<link\s*>\s*([^<\s][^<]*?)\s*</link\s*>",
                      re.IGNORECASE | re.DOTALL)
_HREF_RE = re.compile(r"<link\b[^>]*?href\s*=\s*[\"']([^\"']+)[\"']",
                      re.IGNORECASE)
_DATE_RE = re.compile(
    r"<(pubdate|updated|published)\s*>\s*(.*?)\s*</\1\s*>",
    re.IGNORECASE | re.DOTALL)
_TITLE_RE = re.compile(r"<title\s*>\s*(.*?)\s*</title\s*>",
                       re.IGNORECASE | re.DOTALL)


def _fallback_scan(text: str) -> tuple[list[dict], int]:
    """Tag-level recovery for feeds ElementTree rejects: every
    <item>/<entry> block whose link survives yields an entry."""
    entries, skipped = [], 0
    for m in _BLOCK_RE.finditer(text):
        block = m.group(0)
        link = _LINK_RE.search(block)
        loc = _unescape(link.group(1).strip()) if link else None
        if not loc:
            href = _HREF_RE.search(block)
            loc = _unescape(href.group(1).strip()) if href else None
        if not loc:
            skipped += 1
            continue
        stamp_m = _DATE_RE.search(block)
        stamp = None
        if stamp_m:
            raw = _unescape(stamp_m.group(2))
            stamp = (parse_rfc822_datetime(raw)
                     if stamp_m.group(1).lower() == "pubdate"
                     else parse_w3c_datetime(raw))
        title_m = _TITLE_RE.search(block)
        entries.append(_entry(
            loc, stamp,
            _unescape(title_m.group(1)) if title_m
            and title_m.group(1) else None))
    return entries, skipped


def parse_feed(text: str) -> tuple[list[dict], int]:
    """Parse one feed document -> ([{loc, lastmod, title}], skipped).
    Never raises on malformed input."""
    try:
        root = ElementTree.fromstring(text)
    except ElementTree.ParseError:
        return _fallback_scan(text)
    return _parse_items(root)
