"""pdfminer-style PDF layout analysis: positioned text spans -> lines
-> text boxes -> reading order -> assembled page text.

The north rule asks for "pdfminer-style layout analysis for binary PDF
payloads" on top of the reference's row-oriented embedded-text scan
(ref service/pdf_processor.go:63-98 emits pre-ordered rows and never
sees coordinates). Real PDFs carry positioned glyph runs with no
guaranteed stream order, so text recovery needs the geometric grouping
pass that pdfminer.six's layout engine performs. This module implements
that published algorithm family from scratch:

  * line grouping   — pdfminer.six LAParams semantics: two spans share
                      a line when their vertical overlap is at least
                      LINE_OVERLAP of the smaller height and the
                      horizontal gap is under CHAR_MARGIN em-widths;
                      a space is synthesized when an in-line gap
                      exceeds WORD_MARGIN em-widths.
  * box grouping    — vertically adjacent lines (gap under LINE_MARGIN
                      of the line height) with overlapping x-intervals
                      form one text box (paragraph).
  * reading order   — recursive XY-cut (Nagy & Seth, ICPR 1984):
                      split the region at the widest horizontal
                      whitespace valley first (top block before bottom
                      block), else at the widest vertical valley (left
                      column before right column), recurse; leaf
                      regions order boxes by (top edge desc, left edge
                      asc). A full-width masthead therefore precedes a
                      two-column body, and the left column is read
                      before the right one.

All coordinates are PDF-convention: origin bottom-left, y grows UP.
A span is a dict (or 5-sequence) of (t, x0, y0, x1, y1).

Box confidence mirrors the webtext span contract
(textlib/htmltext.py): min(1, chars / 100).

Pure Python over tiny per-page lists; executed inside the Arrow-
vectorized extraction UDF, never as a per-row Spark UDF.
"""

from __future__ import annotations

import bisect

# LAParams-equivalent constants (pdfminer.six defaults, documented in
# its LAParams docstring: line_overlap=0.5, char_margin=2.0,
# word_margin=0.1, line_margin=0.5).
LINE_OVERLAP = 0.5
CHAR_MARGIN = 2.0
WORD_MARGIN = 0.1
LINE_MARGIN = 0.5
# Minimum whitespace valley the XY-cut will split on, in page units.
# Narrower gaps are treated as intra-block leading / word spacing.
MIN_CUT_GAP = 4.0

CONF_SATURATION_CHARS = 100.0


def _as_tuple(span) -> tuple[str, float, float, float, float]:
    if isinstance(span, dict):
        return (span["t"], float(span["x0"]), float(span["y0"]),
                float(span["x1"]), float(span["y1"]))
    t, x0, y0, x1, y1 = span
    return (t, float(x0), float(y0), float(x1), float(y1))


def _em(t: str, x0: float, x1: float) -> float:
    """Estimated character width of a span."""
    n = max(1, len(t))
    return max(0.1, (x1 - x0) / n)


class _Line:
    __slots__ = ("spans", "x0", "y0", "x1", "y1")

    def __init__(self, span):
        t, x0, y0, x1, y1 = span
        self.spans = [span]
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1

    def voverlap(self, y0: float, y1: float) -> float:
        ov = min(self.y1, y1) - max(self.y0, y0)
        h = min(self.y1 - self.y0, y1 - y0)
        if h <= 0:
            return 1.0 if ov >= 0 else 0.0
        return ov / h

    def add(self, span):
        self.spans.append(span)
        _, x0, y0, x1, y1 = span
        self.x0 = min(self.x0, x0)
        self.y0 = min(self.y0, y0)
        self.x1 = max(self.x1, x1)
        self.y1 = max(self.y1, y1)

    def text(self) -> str:
        parts = []
        prev_x1 = None
        for t, x0, _, x1, _ in sorted(self.spans, key=lambda s: (s[1], s[3])):
            if prev_x1 is not None and t:
                gap = x0 - prev_x1
                if gap > WORD_MARGIN * _em(t, x0, x1):
                    parts.append(" ")
            parts.append(t)
            prev_x1 = x1
        return "".join(parts)


def group_lines(spans) -> list[_Line]:
    """Greedy line clustering as a top-down sweep. Spans are processed
    in descending top-edge order (ties by x then text — fully
    deterministic, input order never leaks through); a line whose top
    gap to the sweep position rules out any further vertical overlap
    is CLOSED permanently, so each span only tests the lines still
    open in its y-window (the column count, in practice a handful) —
    O(N log N) per page instead of the naive O(N * lines) scan that a
    dense 10k-span page would turn quadratic."""
    ordered = []
    for raw in spans:
        span = _as_tuple(raw)
        if span[0] != "":
            ordered.append(span)
    ordered.sort(key=lambda s: (-s[4], s[1], s[0]))
    closed: list[_Line] = []
    active: list[_Line] = []
    for span in ordered:
        t, x0, y0, x1, y1 = span
        # A line with y0 >= y1 of the current span cannot vertically
        # overlap this span or any later (lower-topped) one.
        if active:
            still = []
            for line in active:
                (closed if line.y0 >= y1 else still).append(line)
            active = still
        best = None
        for line in active:
            if line.voverlap(y0, y1) < LINE_OVERLAP:
                continue
            # Horizontal reachability: the new span must sit within
            # CHAR_MARGIN em-widths of the line's current extent.
            em = _em(t, x0, x1)
            if x0 - line.x1 > CHAR_MARGIN * em or line.x0 - x1 > CHAR_MARGIN * em:
                continue
            best = line
            break
        if best is None:
            active.append(_Line(span))
        else:
            best.add(span)
    return closed + active


class _Box:
    __slots__ = ("lines", "x0", "y0", "x1", "y1")

    def __init__(self, line: _Line):
        self.lines = [line]
        self.x0, self.y0, self.x1, self.y1 = line.x0, line.y0, line.x1, line.y1

    def add(self, line: _Line):
        self.lines.append(line)
        self.x0 = min(self.x0, line.x0)
        self.y0 = min(self.y0, line.y0)
        self.x1 = max(self.x1, line.x1)
        self.y1 = max(self.y1, line.y1)

    def text(self) -> str:
        ordered = sorted(self.lines, key=lambda l: (-l.y1, l.x0))
        return "\n".join(l.text() for l in ordered)


def group_boxes(lines: list[_Line]) -> list[_Box]:
    """Top-down sweep with the same permanent-close rule as
    group_lines: a box whose bottom gap to the sweep line already
    exceeds the leading rule at the PAGE's max line height can never
    accept a later (lower) line, so each line only tests the boxes
    still open in its y-window."""
    if not lines:
        return []
    hmax = max(max(0.1, l.y1 - l.y0) for l in lines)
    closed: list[_Box] = []
    active: list[_Box] = []
    for line in sorted(lines, key=lambda l: (-l.y1, l.x0)):
        if active:
            still = []
            for box in active:
                (closed if box.y0 - line.y1 > LINE_MARGIN * hmax
                 else still).append(box)
            active = still
        best = None
        for box in active:
            # x-intervals must overlap (same column)...
            if line.x0 >= box.x1 or line.x1 <= box.x0:
                continue
            # ...and the vertical gap must be under LINE_MARGIN of the
            # line height (normal leading, not a paragraph break).
            h = max(0.1, line.y1 - line.y0)
            gap = box.y0 - line.y1
            if gap > LINE_MARGIN * h or line.y0 - box.y1 > LINE_MARGIN * h:
                continue
            best = box
            break
        if best is None:
            active.append(_Box(line))
        else:
            best.add(line)
    return closed + active


def _gaps(ivals: list[tuple[float, float]]) -> tuple[float, list[float]]:
    """All interior whitespace valleys >= MIN_CUT_GAP across a set of
    1-D intervals -> (widest gap width, cut positions). Empty when the
    intervals tile."""
    ivals = sorted(ivals)
    best_w, cuts = 0.0, []
    hi = ivals[0][1]
    for lo, up in ivals[1:]:
        if lo > hi:
            w = lo - hi
            if w > best_w:
                best_w = w
            if w >= MIN_CUT_GAP:
                cuts.append((hi + lo) / 2.0)
        hi = max(hi, up)
    return best_w, cuts


def _bands(boxes: list[_Box], cuts: list[float], key, reverse: bool):
    """Partition boxes into the segments the cut positions delimit,
    ordered reading-first (top band / left column first)."""
    groups: dict[int, list[_Box]] = {}
    for b in boxes:
        groups.setdefault(bisect.bisect_left(cuts, key(b)), []).append(b)
    idxs = sorted(groups, reverse=reverse)
    return [groups[i] for i in idxs]


def xy_cut_order(boxes: list[_Box]) -> list[_Box]:
    """XY-cut reading order (Nagy & Seth 1984), multi-way per level:
    every valley on the chosen axis splits at once, so a page of N
    stacked paragraphs is one O(N log N) level, not N binary
    recursions."""
    if len(boxes) <= 1:
        return list(boxes)
    # Horizontal valleys (split on y): top region reads first.
    hgap, hcuts = _gaps([(b.y0, b.y1) for b in boxes])
    # Vertical valleys (split on x): left region reads first.
    vgap, vcuts = _gaps([(b.x0, b.x1) for b in boxes])
    if hcuts and hgap >= vgap:
        segs = _bands(boxes, hcuts, key=lambda b: b.y0, reverse=True)
        if len(segs) > 1:
            return [b for seg in segs for b in xy_cut_order(seg)]
    if vcuts:
        segs = _bands(boxes, vcuts, key=lambda b: b.x0, reverse=False)
        if len(segs) > 1:
            return [b for seg in segs for b in xy_cut_order(seg)]
    return sorted(boxes, key=lambda b: (-b.y1, b.x0))


def analyze_page(spans) -> dict:
    """Full layout pass over one page's positioned spans.

    Returns ``{"text": str, "boxes": [{"text", "x0", "y0", "x1", "y1",
    "n_lines", "confidence"}]}`` where ``text`` is the reading-ordered
    page text: lines joined with "\\n" inside a box, boxes joined with
    "\\n" (the reference's row contract keeps one text row per line —
    ref service/pdf_processor.go:90-95 — so box breaks stay invisible
    to downstream parsers and box structure rides the boxes list).
    """
    lines = group_lines(spans)
    if not lines:
        return {"text": "", "boxes": []}
    ordered = xy_cut_order(group_boxes(lines))
    out_boxes = []
    for b in ordered:
        txt = b.text()
        out_boxes.append({
            "text": txt,
            "x0": b.x0, "y0": b.y0, "x1": b.x1, "y1": b.y1,
            "n_lines": len(b.lines),
            "confidence": min(1.0, len(txt) / CONF_SATURATION_CHARS),
        })
    return {"text": "\n".join(b["text"] for b in out_boxes),
            "boxes": out_boxes}


def page_rows(spans) -> list[str]:
    """Reading-ordered text rows of a span page — the unit that
    pdf_extract_text emits one-per-line."""
    txt = analyze_page(spans)["text"]
    return txt.split("\n") if txt else []
