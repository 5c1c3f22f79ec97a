"""Trafilatura-style HTML page-metadata extraction (public algorithm
family: trafilatura's metadata module, Open Graph protocol docs).

Precedence per field (first hit wins, all exact-match documented so
the DuckDB driver-oracle can replay it):

  title       og:title  >  <title> text  >  first <h1> text
  description og:description  >  <meta name="description">
  author      <meta name="author">  >  article:author
  published   article:published_time  >  first <time datetime=...>
              >  <meta name="date">
  canonical   <link rel="canonical" href>
  sitename    og:site_name

All values are entity-unescaped and whitespace-normalized; absent
fields are None. Pure Python, one streaming stdlib-HTMLParser pass
(metadata density is head-dominated but <h1>/<time> live in the body,
so the pass runs to EOF — pages are already in memory per the corpus
row model).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")


def _norm(s: str | None) -> str | None:
    if s is None:
        return None
    s = _WS.sub(" ", s).strip()
    return s or None


class _MetaParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.og: dict[str, str] = {}
        self.meta: dict[str, str] = {}
        self.canonical: str | None = None
        self.title_parts: list[str] = []
        self.h1_parts: list[str] = []
        self.time_dt: str | None = None
        self._in_title = False
        self._in_h1 = False
        self._h1_done = False

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "meta":
            prop = (a.get("property") or "").lower()
            name = (a.get("name") or "").lower()
            content = a.get("content")
            if content is None:
                return
            if prop and prop not in self.og:
                self.og[prop] = content
            if name and name not in self.meta:
                self.meta[name] = content
        elif tag == "link":
            rel = (a.get("rel") or "").lower()
            if "canonical" in rel.split() and self.canonical is None:
                self.canonical = a.get("href")
        elif tag == "title":
            self._in_title = True
        elif tag == "h1" and not self._h1_done:
            self._in_h1 = True
        elif tag == "time":
            if self.time_dt is None and a.get("datetime"):
                self.time_dt = a["datetime"]

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag == "h1" and self._in_h1:
            self._in_h1 = False
            self._h1_done = True

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        if self._in_h1:
            self.h1_parts.append(data)


def extract_metadata(html: str) -> dict:
    """One page's metadata dict: title, description, author, published,
    canonical, sitename (each str | None)."""
    p = _MetaParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed markup: keep whatever was collected
    title = (_norm(p.og.get("og:title"))
             or _norm("".join(p.title_parts))
             or _norm("".join(p.h1_parts)))
    description = (_norm(p.og.get("og:description"))
                   or _norm(p.meta.get("description")))
    author = (_norm(p.meta.get("author"))
              or _norm(p.og.get("article:author")))
    published = (_norm(p.og.get("article:published_time"))
                 or _norm(p.time_dt)
                 or _norm(p.meta.get("date")))
    return {"title": title, "description": description, "author": author,
            "published": published,
            "canonical": _norm(p.canonical),
            "sitename": _norm(p.og.get("og:site_name"))}
