"""Main-content extraction from HTML — boilerplate stripping over a
block tree (north_rule: "HTML boilerplate strip, PDF/layout parse, DOM
heuristics"; north_star: "trafilatura/readability-style boilerplate
stripping (link-density and text-density heuristics over a block
tree)").

Public-knowledge algorithms only:

  * Link-density / text-density block classification: Kohlschuetter,
    Fankhauser & Nejdl, "Boilerplate Detection using Shallow Text
    Features" (WSDM 2010) — the boilerpipe features. A block's link
    density (anchor chars / total chars) is the single strongest
    boilerplate signal; length and comma count proxy text density.
  * Container scoring: the arc90 readability heuristic — each content
    block votes (1 + commas + min(chars/100, 3)) for its parent
    container and half that for its grandparent; the top-scoring
    container subtree is the main content, and high-link-density
    children inside it are stripped.
  * Semantic-tag pruning: trafilatura (Barbaresi, ACL 2021 demo)
    discards <nav>/<header>/<footer>/<aside> subtrees and elements
    whose class/id carry boilerplate tokens before any scoring.

Implemented over stdlib ``html.parser`` (no lxml wheel in this
environment — SURVEY.md §7: pure-stdlib DOM parsing). The parser is
single-pass and streaming: it never materializes a DOM, only a flat
list of text blocks each tagged with its ancestor-container ids, so
memory is O(blocks), not O(nodes) — at 10^12-document scale this runs
inside the Arrow extraction UDF per row (operators/cascade.py) and a
pathological page cannot balloon the worker.

Determinism contract (drives the DuckDB driver oracle): block text is
whitespace-normalized with ``" ".join(text.split())``; blocks join
with "\\n"; span confidence is ``min(1.0, chars/100.0) * (1.0 -
link_density)`` computed in IEEE double — every step replayable in SQL.

Reference parity note: the reference (Aashish23092/ocr) has no HTML
path — this operator is the webtext graft axis of the north rule, not
a port; the cascade dispatch it plugs into mirrors the reference's
per-doc-type dispatch (service/income_service.go:131-246).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Subtrees whose text never reaches the block list.
_SKIP = {"script", "style", "noscript", "template", "svg", "iframe",
         "object", "applet", "canvas", "head"}

# Semantic boilerplate subtrees (trafilatura-style hard prune).
_PRUNE_TAGS = {"nav", "header", "footer", "aside"}

# class/id tokens that mark a subtree as boilerplate.
_PRUNE_ATTR_RE = re.compile(
    r"(?:^|[\s_-])(?:nav|navbar|menu|footer|sidebar|banner|advert|ads?|"
    r"comments?|promo|share|social|breadcrumbs?|widget|cookie|popup)"
    r"(?:$|[\s_-])", re.IGNORECASE)

# Elements that delimit text blocks (HTML5 flow-content set).
_BLOCK_TAGS = {
    "html", "body", "div", "p", "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "li", "dl", "dt", "dd", "table", "thead", "tbody",
    "tfoot", "tr", "td", "th", "section", "article", "main", "aside",
    "nav", "header", "footer", "blockquote", "pre", "figure",
    "figcaption", "form", "fieldset", "address", "hr", "br",
}

# Void elements never enter the open-element stack.
_VOID = {"br", "hr", "img", "meta", "link", "input", "area", "base",
         "col", "embed", "source", "track", "wbr", "param"}

# Elements that can hold a readability score. Deliberate divergence
# from arc90's candidate set: `td`/`li` are NOT containers here — a
# data table's cells (or a list's items) vote for the enclosing
# table/list ancestor, so the whole structure wins or loses together
# instead of a single cell beating its siblings (arc90 resolves that
# with a sibling-score pass; the block-level boilerpipe view this
# implementation follows never splits sibling cells to begin with).
_CONTAINER_TAGS = {"body", "div", "article", "main", "section", "table",
                   "blockquote"}

# Thresholds — boilerpipe/arc90 published constants.
MIN_CONTENT_CHARS = 25     # arc90: paragraphs under 25 chars don't vote
MAX_VOTE_LINK_DENSITY = 0.33   # boilerpipe: high-link blocks are boilerplate
MAX_KEEP_LINK_DENSITY = 0.5    # arc90: strip link-heavy children of winner
CONF_SATURATION_CHARS = 100.0  # confidence saturates at ~a full sentence

# Low-yield recovery (trafilatura's favor_recall fallback): when the
# pruned parse keeps almost nothing from a non-trivial page — the
# classic cause is an UNCLOSED boilerplate-class div swallowing the
# article into its prune subtree, which lxml-based extractors mis-nest
# the same way — re-parse with class/id pruning disabled and keep the
# alternative iff it recovers strictly more text.
RECOVERY_MIN_CHARS = 250
RECOVERY_MIN_HTML = 200


class _Block:
    __slots__ = ("text", "chars", "anchor_chars", "containers")

    def __init__(self, text: str, anchor_chars: int,
                 containers: tuple[int, ...]):
        self.text = text
        self.chars = len(text)
        self.anchor_chars = min(anchor_chars, self.chars)
        self.containers = containers

    @property
    def link_density(self) -> float:
        return self.anchor_chars / self.chars if self.chars else 0.0


class _BlockParser(HTMLParser):
    """Streaming block-tree builder: flat block list + container votes."""

    def __init__(self, attr_prune: bool = True):
        super().__init__(convert_charrefs=True)
        self._attr_prune = attr_prune
        # Open-element stack entries: (tag, is_skip, is_prune, container_id).
        self._stack: list[tuple[str, bool, bool, int]] = []
        self._skip_depth = 0
        self._prune_depth = 0
        self._anchor_depth = 0
        self._in_title = False
        # Virtual root container 0 so body-less fragments still group.
        self._containers: list[int] = [0]
        self._next_container = 1
        self.body_container = 0
        # Open-tag multiplicities (stray-end-tag test without an O(depth)
        # stack scan per end tag).
        self._open_counts: dict[str, int] = {}
        # Current block accumulator: list of (raw_text, in_anchor) runs.
        self._runs: list[tuple[str, bool]] = []
        self.blocks: list[_Block] = []
        self.title_parts: list[str] = []
        self._h1_parts: list[str] | None = None
        self.first_h1: str | None = None

    # -- block accumulation ------------------------------------------

    def _flush(self) -> None:
        if not self._runs:
            return
        runs, self._runs = self._runs, []
        text = " ".join("".join(r for r, _ in runs).split())
        if not text:
            return
        anchor = sum(len(" ".join(r.split())) for r, a in runs if a)
        self.blocks.append(_Block(text, anchor, tuple(self._containers)))

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._skip_depth or self._prune_depth:
            return
        if data and not data.isspace() or self._runs:
            self._runs.append((data, self._anchor_depth > 0))
        if self._h1_parts is not None:
            self._h1_parts.append(data)

    # -- tree maintenance --------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "title":
            self._in_title = True
            return
        if tag in _VOID:
            if tag in ("br", "hr"):
                self._flush()
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            # HTML5 implied end tag: a block start closes an open <p>.
            if self._stack and self._stack[-1][0] == "p" and tag != "p":
                self._pop_one()
        is_skip = tag in _SKIP
        is_prune = tag in _PRUNE_TAGS or (bool(attrs) and self._attr_prune
                                          and any(
            k in ("class", "id") and v and _PRUNE_ATTR_RE.search(v)
            for k, v in attrs))
        container_id = -1
        if tag in _CONTAINER_TAGS and not is_skip:
            container_id = self._next_container
            self._next_container += 1
            self._containers.append(container_id)
            if tag == "body" and self.body_container == 0:
                self.body_container = container_id
        self._stack.append((tag, is_skip, is_prune, container_id))
        self._open_counts[tag] = self._open_counts.get(tag, 0) + 1
        if is_skip:
            self._skip_depth += 1
        if is_prune:
            self._prune_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag == "h1" and self.first_h1 is None and \
                not (self._skip_depth or self._prune_depth):
            self._h1_parts = []

    def _pop_one(self) -> None:
        tag, is_skip, is_prune, container_id = self._stack.pop()
        self._open_counts[tag] -= 1
        if is_skip:
            self._skip_depth -= 1
        if is_prune:
            self._prune_depth -= 1
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        if container_id >= 0:
            self._containers.pop()
        if tag == "h1" and self._h1_parts is not None:
            h1 = " ".join("".join(self._h1_parts).split())
            self.first_h1 = h1 or None
            self._h1_parts = None

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
            return
        if tag in _VOID:
            return
        if not self._open_counts.get(tag):
            return  # stray end tag — browsers ignore it
        if tag in _BLOCK_TAGS:
            self._flush()
        # Pop implicitly-unclosed descendants up to and including `tag`.
        while self._stack:
            top = self._stack[-1][0]
            if top in _BLOCK_TAGS and top != tag:
                self._flush()
            self._pop_one()
            if top == tag:
                break

    def close(self) -> None:
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# Fast tokenizer. html.parser's goahead loop is ~73% of extraction
# time (measured by cProfile over the synthetic web corpus): per-tag
# it pays updatepos line accounting, a check_for_whole_start_tag +
# attrfind_tolerant pass over EVERY attribute, and several dispatch
# hops — none of which this extractor needs (only tag names, and
# class/id values on the minority of tags that carry them). This
# drop-in tokenizer replays CPython's own tolerant grammar (the SAME
# module regexes: locatestarttagend_tolerant / tagfind_tolerant /
# attrfind_tolerant / endtagfind, html/parser.py:260-420) against the
# whole document in feed-once+close semantics, driving the identical
# _BlockParser handlers. Attribute parsing runs only when the raw tag
# text can possibly prune (contains "class" or "id", case-folded) —
# the handlers never look at other attributes.
#
# Divergence budget (accepted, exercised by the differential tests in
# tests/test_html_fast.py): (a) inside <script>/<style> the exact
# bytes emitted as cdata DATA can differ on pathological un-closers —
# invisible here because both paths drop skip-subtree text; (b) a
# start tag whose attribute region tokenizes under
# locatestarttagend_tolerant but not under the attrfind loop (CPython
# then emits the tag text as data) is treated as a tag when the
# class/id screen skipped the attr loop — not observed on any corpus
# or hypothesis-generated input.

from html import parser as _hp  # CPython's tolerant grammar regexes
from html import unescape as _unescape

_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_COMMENT_CLOSE = re.compile(r"--\s*>")
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")

# Fast lane for well-formed tags: matches the ENTIRE tag through its
# '>' or fails entirely (no partial acceptance), so any input the
# restricted grammar can't express falls through to the tolerant path
# — on the restricted shape the two grammars provably agree (quoted
# values can't hide '>', bare values can't start with a quote, and the
# trailing '/' group reproduces CPython's end-strip startend test).
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s>'\"=<]*))?)*)"
    r"\s*(/?)>")
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9-]*)\s*>")
_SIMPLE_ATTR = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"<>]*)\"|'([^'<>]*)'|([^\s>'\"=<]*)))?")
_CLASSID_SCREEN = re.compile(r"class|id", re.IGNORECASE)


def _fast_feed(data: str, p: _BlockParser) -> None:
    """Feed-once tokenizer: behaviorally equivalent to
    p.feed(data); p.close() for this handler set."""
    n = len(data)
    i = 0
    handle_data = p.handle_data
    handle_start = p.handle_starttag
    handle_end = p.handle_endtag
    find = data.find
    locatestart = _hp.locatestarttagend_tolerant
    tagfind = _hp.tagfind_tolerant
    attrfind = _hp.attrfind_tolerant
    endtagfind = _hp.endtagfind
    cdata_elem = None

    def eof_salvage(i: int) -> int:
        # goahead(end=1) k<0 branch: an unterminated construct becomes
        # data through the next '>' (inclusive), else next '<', else
        # one char (html/parser.py:185-198).
        k = find(">", i + 1)
        if k < 0:
            k = find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        chunk = data[i:k]
        handle_data(_unescape(chunk) if "&" in chunk else chunk)
        return k

    while i < n:
        if cdata_elem is not None:
            close_re = _CDATA_CLOSE[cdata_elem]
            pos = i
            while True:
                m = close_re.search(data, pos)
                if m is None:
                    return  # unterminated cdata is dropped (goahead:252)
                j = m.start()
                gt = find(">", j + 1)
                if gt < 0:
                    return
                em = endtagfind.match(data, j)
                if em is not None and em.group(1).lower() == cdata_elem:
                    if i < j:
                        handle_data(data[i:j])  # raw: no unescape in cdata
                    handle_end(cdata_elem)
                    cdata_elem = None
                    i = em.end()
                    break
                # </scriptx> / </script foo>: data-and-continue
                pos = gt + 1
            continue

        j = find("<", i)
        if j < 0:
            chunk = data[i:]
            handle_data(_unescape(chunk) if "&" in chunk else chunk)
            return
        if i < j:
            chunk = data[i:j]
            handle_data(_unescape(chunk) if "&" in chunk else chunk)
        i = j
        c = data[i + 1:i + 2]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            # -- start tag: fast lane for the well-formed shape
            sm = _SIMPLE_START.match(data, i)
            if sm is not None:
                tag = sm.group(1).lower()
                rawattrs = sm.group(2)
                attrs = []
                if rawattrs and _CLASSID_SCREEN.search(rawattrs):
                    for am in _SIMPLE_ATTR.finditer(rawattrs):
                        v = am.group(2)
                        if v is None:
                            v = am.group(3)
                        if v is None:
                            v = am.group(4)
                        if v:
                            v = _unescape(v) if "&" in v else v
                        attrs.append((am.group(1).lower(), v))
                if sm.group(3):
                    handle_start(tag, attrs)
                    handle_end(tag)
                else:
                    handle_start(tag, attrs)
                    if tag in ("script", "style"):
                        cdata_elem = tag
                i = sm.end()
                continue
            # -- tolerant path (parse_starttag + check_for_whole_start_tag)
            m = locatestart.match(data, i)
            j = m.end()
            nxt = data[j:j + 1]
            if nxt == ">":
                endpos = j + 1
            elif nxt == "/" and data.startswith("/>", j):
                endpos = j + 2
            elif nxt == "" or nxt == "/" or nxt == "=" or \
                    ("a" <= nxt <= "z") or ("A" <= nxt <= "Z"):
                i = eof_salvage(i)  # incomplete at EOF
                continue
            else:
                # bogus input: the partial tag text becomes RAW data
                endpos = j if j > i else i + 1
                handle_data(data[i:endpos])
                i = endpos
                continue
            tm = tagfind.match(data, i + 1)
            tag = tm.group(1).lower()
            attrs = []
            k = tm.end()
            raw = data[k:endpos].lower()
            # Attr loop needed when the tag can prune (class/id) OR
            # when a '/' makes the self-closing end-strip check
            # ambiguous (<br/> is startend, <a href=x/> is NOT — only
            # the attr loop's stop position distinguishes them,
            # html/parser.py:328-337). nxt=='/' (endpos=j+2) is always
            # self-closing: attrfind's /(?!>) tail can't consume it.
            if nxt == "/":
                selfclosing = True
                need_loop = "class" in raw or "id" in raw
            elif "/" in raw:
                selfclosing = False  # provisional; loop decides
                need_loop = True
            else:
                selfclosing = False
                need_loop = "class" in raw or "id" in raw
            if need_loop:
                while k < endpos:
                    am = attrfind.match(data, k)
                    if am is None:
                        break
                    attrname, rest, attrvalue = am.group(1, 2, 3)
                    if not rest:
                        attrvalue = None
                    elif attrvalue[:1] == "'" == attrvalue[-1:] or \
                            attrvalue[:1] == '"' == attrvalue[-1:]:
                        attrvalue = attrvalue[1:-1]
                    if attrvalue:
                        attrvalue = _unescape(attrvalue)
                    attrs.append((attrname.lower(), attrvalue))
                    k = am.end()
                end = data[k:endpos].strip()
                if end not in (">", "/>"):
                    handle_data(data[i:endpos])  # CPython bogus branch
                    i = endpos
                    continue
                selfclosing = selfclosing or end == "/>"
            if selfclosing:
                handle_start(tag, attrs)
                handle_end(tag)
            else:
                handle_start(tag, attrs)
                if tag in ("script", "style"):
                    cdata_elem = tag
            i = endpos
        elif c == "/":
            sm = _SIMPLE_END.match(data, i)
            if sm is not None:
                handle_end(sm.group(1).lower())
                i = sm.end()
                continue
            # -- end tag (parse_endtag, non-cdata)
            gt = find(">", i + 1)
            if gt < 0:
                i = eof_salvage(i)
                continue
            em = endtagfind.match(data, i)
            if em is not None:
                handle_end(em.group(1).lower())
                i = gt + 1
                continue
            nm = tagfind.match(data, i + 2)
            if nm is None:
                if data[i:i + 3] == "</>":
                    i = i + 3
                else:
                    pos = find(">", i + 2)  # bogus comment
                    i = pos + 1 if pos >= 0 else eof_salvage(i)
                continue
            gt2 = find(">", nm.end())
            handle_end(nm.group(1).lower())
            i = gt2 + 1
        elif data.startswith("<!--", i):
            m = _COMMENT_CLOSE.search(data, i + 4)
            i = m.end() if m else eof_salvage(i)
        elif c == "?":
            pos = find(">", i + 2)
            i = pos + 1 if pos >= 0 else eof_salvage(i)
        elif c == "!":
            if data.startswith("<![", i):
                # parse_marked_section (_markupbase.py): known section
                # keywords scan for their close; an unknown keyword (or
                # no name at all) RAISES in the stdlib — parse_blocks
                # catches that and keeps the partial blocks, so the
                # mirror is to stop feeding here.
                nm = _DECLNAME.match(data, i + 3)
                if nm is None:
                    return
                if nm.end() == n:
                    i = eof_salvage(i)
                    continue
                name = nm.group().strip().lower()
                if name in ("temp", "cdata", "ignore", "include",
                            "rcdata"):
                    m = _MARKED_CLOSE.search(data, i + 3)
                elif name in ("if", "else", "endif"):
                    m = _MS_MARKED_CLOSE.search(data, i + 3)
                else:
                    return
                i = m.end() if m else eof_salvage(i)
            elif data[i:i + 9].lower() == "<!doctype":
                pos = find(">", i + 9)
                i = pos + 1 if pos >= 0 else eof_salvage(i)
            else:
                pos = find(">", i + 2)  # bogus comment
                i = pos + 1 if pos >= 0 else eof_salvage(i)
        elif i + 1 < n:
            handle_data("<")
            i += 1
        else:
            handle_data("<")
            return


def parse_blocks(html: str, attr_prune: bool = True,
                 engine: str = "fast") -> _BlockParser:
    """Parse to a flat block list; never raises on malformed markup.

    engine="fast" (default) uses the regex tokenizer above (~2x);
    engine="stdlib" runs the identical handlers under html.parser —
    kept as the behavioral twin the differential tests compare against.
    """
    p = _BlockParser(attr_prune=attr_prune)
    try:
        if engine == "fast":
            _fast_feed(html, p)
            p._flush()
        else:
            p.feed(html)
            p.close()
    except Exception:  # the parser is robust, but a poison row must not
        p._flush()     # kill a 10^12-row job (north_rule) — keep what parsed
    return p


def extract_main(html: str, engine: str = "fast") -> dict:
    """Readability-style main-content extraction.

    Returns ``{title, main_text, spans, n_blocks, n_content_blocks}``
    where ``spans`` is the confidence-scored text-span assembly
    (north_star): one span per kept block, with its offset interval in
    ``main_text`` and ``confidence = min(1, chars/100) * (1 - link_density)``.
    """
    res = _extract(parse_blocks(html, engine=engine))
    if (len(res["main_text"]) < RECOVERY_MIN_CHARS
            and len(html) > RECOVERY_MIN_HTML):
        alt = _extract(parse_blocks(html, attr_prune=False, engine=engine))
        if len(alt["main_text"]) > len(res["main_text"]):
            return alt
    return res


def _extract(p: _BlockParser) -> dict:

    # arc90 container votes from boilerpipe-classified content blocks.
    scores: dict[int, float] = {}
    for b in p.blocks:
        if b.chars < MIN_CONTENT_CHARS:
            continue
        if b.link_density >= MAX_VOTE_LINK_DENSITY:
            continue
        vote = 1.0 + b.text.count(",") + min(b.chars / 100.0, 3.0)
        anc = b.containers
        scores[anc[-1]] = scores.get(anc[-1], 0.0) + vote
        if len(anc) >= 2:
            scores[anc[-2]] = scores.get(anc[-2], 0.0) + vote / 2.0

    if scores:
        # Highest score wins; document order (smaller id) breaks ties.
        winner = max(scores, key=lambda cid: (scores[cid], -cid))
    else:
        # No block voted (short page): fall back to <body> — semantic
        # pruning already removed nav/header/footer/aside, and the
        # link-density keep-filter below removes link farms.
        winner = p.body_container

    kept = [b for b in p.blocks
            if winner in b.containers
            and b.link_density <= MAX_KEEP_LINK_DENSITY]

    spans = []
    offset = 0
    for i, b in enumerate(kept):
        spans.append({
            "block_idx": i,
            "char_start": offset,
            "char_len": b.chars,
            "link_density": b.link_density,
            "confidence": min(1.0, b.chars / CONF_SATURATION_CHARS)
            * (1.0 - b.link_density),
        })
        offset += b.chars + 1  # the "\n" joiner

    title = " ".join("".join(p.title_parts).split())
    return {
        "title": title or (p.first_h1 or ""),
        "main_text": "\n".join(b.text for b in kept),
        "spans": spans,
        "n_blocks": len(p.blocks),
        "n_content_blocks": len(kept),
    }
