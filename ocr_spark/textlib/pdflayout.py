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
    """Greedy line clustering in stream order; within-line assembly is
    geometric (sorted by x), so the input order never leaks through."""
    lines: list[_Line] = []
    for raw in spans:
        span = _as_tuple(raw)
        t, x0, y0, x1, y1 = span
        if t == "":
            continue
        best = None
        for line in lines:
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
            lines.append(_Line(span))
        else:
            best.add(span)
    return lines


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
    boxes: list[_Box] = []
    for line in sorted(lines, key=lambda l: (-l.y1, l.x0)):
        best = None
        for box in boxes:
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
            boxes.append(_Box(line))
        else:
            best.add(line)
    return boxes


def _widest_gap(ivals: list[tuple[float, float]]) -> tuple[float, float]:
    """(gap_width, cut_position) of the widest interior whitespace
    valley across a set of 1-D intervals; (0, 0) when they tile."""
    ivals = sorted(ivals)
    best_w, best_at = 0.0, 0.0
    hi = ivals[0][1]
    for lo, up in ivals[1:]:
        if lo > hi:
            w = lo - hi
            if w > best_w:
                best_w, best_at = w, (hi + lo) / 2.0
        hi = max(hi, up)
    return best_w, best_at


def xy_cut_order(boxes: list[_Box]) -> list[_Box]:
    """Recursive XY-cut reading order (Nagy & Seth 1984)."""
    if len(boxes) <= 1:
        return list(boxes)
    # Horizontal valley (split on y): top region reads first.
    hgap, hat = _widest_gap([(b.y0, b.y1) for b in boxes])
    # Vertical valley (split on x): left region reads first.
    vgap, vat = _widest_gap([(b.x0, b.x1) for b in boxes])
    if hgap >= MIN_CUT_GAP and hgap >= vgap:
        top = [b for b in boxes if b.y0 >= hat]
        bot = [b for b in boxes if b.y0 < hat]
        if top and bot:
            return xy_cut_order(top) + xy_cut_order(bot)
    if vgap >= MIN_CUT_GAP:
        left = [b for b in boxes if b.x0 < vat]
        right = [b for b in boxes if b.x0 >= vat]
        if left and right:
            return xy_cut_order(left) + xy_cut_order(right)
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
