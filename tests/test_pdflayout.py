"""pdfminer-style layout analysis (textlib/pdflayout.py): span->line
grouping, line->box grouping, XY-cut reading order, and the payload
integration (span pages through pdf_extract_text / pdf_extract_layout).

Geometry convention throughout: PDF coordinates, y grows UP.
"""

import pytest

from ocr_spark.sources import payload as pl
from ocr_spark.textlib import pdflayout


def span(t, x0, y0, w=None, h=10.0):
    w = 6.0 * len(t) if w is None else w
    return [t, x0, y0, x0 + w, y0 + h]


def col(tokens, x0, y_top=800.0, leading=12.0, h=10.0):
    """A column of one-token lines, top-down."""
    out = []
    for r, t in enumerate(tokens):
        y1 = y_top - leading * r
        out.append(span(t, x0, y1 - h, h=h))
    return out


# ---------------- line grouping ----------------

def test_single_span_line():
    res = pdflayout.analyze_page([span("hello", 10, 700)])
    assert res["text"] == "hello"
    assert len(res["boxes"]) == 1
    assert res["boxes"][0]["n_lines"] == 1


def test_inline_spans_merge_with_space():
    # gap 4 > WORD_MARGIN(0.1) * em(6) = 0.6 -> space synthesized
    res = pdflayout.analyze_page(
        [span("hello", 10, 700), span("world", 10 + 30 + 4, 700)])
    assert res["text"] == "hello world"


def test_adjacent_glyph_runs_concatenate():
    # gap 0.2 <= 0.6 -> no space (one word split across two runs)
    res = pdflayout.analyze_page(
        [span("hel", 10, 700), span("lo", 10 + 18 + 0.2, 700)])
    assert res["text"] == "hello"


def test_line_assembly_is_geometric_not_stream_order():
    # "world" arrives first in the stream but sits to the right.
    res = pdflayout.analyze_page(
        [span("world", 44, 700), span("hello", 10, 700)])
    assert res["text"] == "hello world"


def test_superscript_overlap_joins_line():
    # 60% vertical overlap >= LINE_OVERLAP -> same line.
    res = pdflayout.analyze_page(
        [span("x", 10, 700), span("2", 17, 704, h=10)])
    assert res["text"] == "x 2" or res["text"] == "x2"
    assert len(res["boxes"][0]["text"].split("\n")) == 1


def test_distant_spans_same_y_stay_separate_lines():
    # Same baseline, 190-unit gap >> CHAR_MARGIN*em: two columns must
    # not fuse into one line.
    left = span("left", 10, 700)
    right = span("right", 320, 700)
    lines = pdflayout.group_lines([left, right])
    assert len(lines) == 2


# ---------------- box grouping ----------------

def test_tight_leading_groups_one_box():
    res = pdflayout.analyze_page(col(["a", "b", "c"], 10))
    assert len(res["boxes"]) == 1
    assert res["text"] == "a\nb\nc"
    assert res["boxes"][0]["n_lines"] == 3


def test_paragraph_gap_splits_boxes():
    rows = col(["a", "b"], 10) + col(["c", "d"], 10, y_top=800 - 2 * 12 - 30)
    res = pdflayout.analyze_page(rows)
    assert len(res["boxes"]) == 2
    assert res["text"] == "a\nb\nc\nd"


def test_box_confidence_saturates():
    long = "x" * 250
    res = pdflayout.analyze_page([span(long, 10, 700)])
    assert res["boxes"][0]["confidence"] == 1.0
    short = pdflayout.analyze_page([span("tiny", 10, 700)])
    assert short["boxes"][0]["confidence"] == pytest.approx(0.04)


# ---------------- reading order (XY-cut) ----------------

def test_two_column_reading_order():
    left = col(["L0", "L1", "L2"], 10)
    right = col(["R0", "R1", "R2"], 320)
    # Stream order interleaves the columns; layout must un-interleave.
    stream = [s for pair in zip(left, right) for s in pair]
    res = pdflayout.analyze_page(stream)
    assert res["text"] == "L0\nL1\nL2\nR0\nR1\nR2"


def test_masthead_before_columns():
    head = [span("MASTHEAD", 10, 900, w=500)]
    left = col(["L0", "L1"], 10)
    right = col(["R0", "R1"], 320)
    res = pdflayout.analyze_page(right + head + left)
    assert res["text"] == "MASTHEAD\nL0\nL1\nR0\nR1"


def test_footer_reads_last():
    body_l = col(["L0", "L1"], 10)
    body_r = col(["R0", "R1"], 320)
    foot = [span("page 1 of 1", 10, 100, w=500)]
    res = pdflayout.analyze_page(foot + body_r + body_l)
    assert res["text"] == "L0\nL1\nR0\nR1\npage 1 of 1"


def test_empty_page():
    assert pdflayout.analyze_page([]) == {"text": "", "boxes": []}
    assert pdflayout.analyze_page([span("", 10, 700)]) == {"text": "", "boxes": []}


def test_dict_span_form():
    res = pdflayout.analyze_page(
        [{"t": "hi", "x0": 10, "y0": 700, "x1": 22, "y1": 710}])
    assert res["text"] == "hi"


def test_dense_page_is_not_quadratic():
    """Scale guard: the sweep-close grouping must handle a dense page
    (20k spans = 10k isolated lines AND 10k paragraph-gap boxes, the
    worst shape for naive all-pairs scans) in well under a second."""
    import time
    spans = []
    for r in range(10000):
        y = 2_000_000.0 - 40.0 * r  # gap 30 > margin: every line its own box
        spans.append(span(f"w{r}", 10, y))
        spans.append(span(f"v{r}", 24, y))  # adjacent: same line as w
    t0 = time.perf_counter()
    res = pdflayout.analyze_page(spans)
    wall = time.perf_counter() - t0
    assert len(res["boxes"]) == 10000
    assert res["boxes"][0]["text"] == "w0 v0"
    assert wall < 2.0, f"dense page took {wall:.2f}s"


# ---------------- payload integration ----------------

def _layout_pdf(password=""):
    left = col(["alpha", "beta"], 10)
    right = col(["gamma", "delta"], 320)
    stream = [s for pair in zip(left, right) for s in pair]
    return pl.make_pdf_payload([{"spans": stream}], password=password)


def test_pdf_extract_text_span_page():
    # One row per layout line, each with a trailing newline — the same
    # contract as text_rows pages (ref service/pdf_processor.go:90-95).
    assert (pl.pdf_extract_text(_layout_pdf())
            == "alpha\nbeta\ngamma\ndelta\n")


def test_pdf_extract_text_mixed_pages():
    data = pl.make_pdf_payload([
        {"text_rows": ["row one"]},
        {"spans": col(["s1", "s2"], 10)},
    ])
    assert pl.pdf_extract_text(data) == "row one\ns1\ns2\n"


def test_pdf_extract_layout_boxes():
    out = pl.pdf_extract_layout(_layout_pdf())
    assert len(out) == 1 and out[0]["page"] == 0
    assert [b["text"] for b in out[0]["boxes"]] == ["alpha\nbeta", "gamma\ndelta"]
    assert out[0]["boxes"][0]["x1"] <= out[0]["boxes"][1]["x0"]


def test_pdf_extract_layout_respects_password():
    data = _layout_pdf(password="pw")
    with pytest.raises(pl.PayloadError):
        pl.pdf_extract_layout(data, "wrong")
    assert pl.pdf_extract_layout(data, "pw")[0]["boxes"]


def test_text_rows_pages_have_no_layout_entries():
    data = pl.make_pdf_payload([{"text_rows": ["a"]}])
    assert pl.pdf_extract_layout(data) == []


def test_empty_text_rows_does_not_shadow_spans():
    # Both views of one payload must agree: extracted text and the
    # layout side table come from the same spans.
    data = pl.make_pdf_payload(
        [{"text_rows": [], "spans": [span("hello", 10, 690)]}])
    assert pl.pdf_extract_text(data) == "hello\n"
    assert pl.pdf_extract_layout(data)[0]["boxes"][0]["text"] == "hello"
