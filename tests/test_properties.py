"""Property-based tests (hypothesis): parser round-trips and algebraic
invariants that golden fixtures can't sweep.

No Spark session needed — these exercise the pure-Python textlib core
(the same code the Arrow UDF runs per row).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.textlib import goutil, htmltext, names
from ocr_spark.textlib.bank import must_parse_amount

# ---------------------------------------------------------------------------
# Date round-trip: any calendar date formatted in each of the
# reference's four layouts (utils/ocr_parser.go:365-376) parses back to
# the same date, with the Go 2-digit-year rule (69 -> 2069, 70 -> 1970)
# applied for yy layouts.

_dates = st.dates(min_value=dt.date(1970, 1, 1),
                  max_value=dt.date(2068, 12, 31))


@given(_dates)
def test_date_roundtrip_4digit(d):
    assert goutil.parse_date_smart(d.strftime("%d/%m/%Y")) == d
    assert goutil.parse_date_smart(d.strftime("%d-%m-%Y")) == d


@given(_dates)
def test_date_roundtrip_2digit_go_rule(d):
    got = goutil.parse_date_smart(d.strftime("%d/%m/%y"))
    yy = d.year % 100
    expect_year = 2000 + yy if yy <= 68 else 1900 + yy
    assert (got.day, got.month, got.year) == (d.day, d.month, expect_year)


# ---------------------------------------------------------------------------
# Amount round-trip: mustParseAmount (utils/ocr_parser.go:378-384)
# strips commas and CR/DR suffixes; formatting any 2-decimal amount
# with Indian-style grouping parses back exactly.

_amounts = st.integers(min_value=0, max_value=10**9).map(lambda p: p / 100.0)


@given(_amounts, st.sampled_from(["", " CR", " DR", "CR", "DR"]))
def test_amount_roundtrip_with_commas_and_suffix(a, suffix):
    s = f"{a:,.2f}{suffix}"
    assert must_parse_amount(s) == a


@given(st.text(alphabet="abcxyz!@# ", max_size=12))
def test_amount_garbage_is_zero(junk):
    assert must_parse_amount(junk) == 0.0


# ---------------------------------------------------------------------------
# Levenshtein (utils/ocr_parser.go:448-500): metric axioms, plus the
# similarity normalization staying in [0, 1].

_words = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                 max_size=24)


@given(_words, _words)
def test_levenshtein_symmetry_and_bounds(a, b):
    d = names.levenshtein_distance(a, b)
    assert d == names.levenshtein_distance(b, a)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@given(_words, _words, _words)
def test_levenshtein_triangle_inequality(a, b, c):
    ab = names.levenshtein_distance(a, b)
    bc = names.levenshtein_distance(b, c)
    ac = names.levenshtein_distance(a, c)
    assert ac <= ab + bc


@given(_words, _words)
def test_name_similarity_range_and_symmetry(a, b):
    s = names.calculate_name_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == names.calculate_name_similarity(b, a)


@given(_words, _words)
def test_compare_names_symmetry(a, b):
    assert names.compare_names(a, b) == names.compare_names(b, a)


@given(_words)
def test_compare_names_reflexive_on_nonempty_normalized(a):
    if names.normalize_string(a):
        assert names.compare_names(a, a)


# ---------------------------------------------------------------------------
# HTML extractor total-function + span-partition invariants: on ANY
# input string, extract_main never raises, and the spans exactly tile
# main_text split on "\n" (the contract the driver oracle relies on).

_markup_atoms = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>", "<br>",
    "<table><tr><td>", "</td></tr></table>", "<article>", "</article>",
    '<div class="sidebar">', "<nav>", "</nav>", "<h1>", "</h1>",
    "<script>var x=1;</script>", "<!-- c -->", "&amp;", "&#65;", "&",
    "<", ">", "plain words with, punctuation. ",
    "Longer sentence fragments carry enough characters to vote, "
    "like article prose does. ",
])


@given(st.lists(_markup_atoms, max_size=40).map("".join))
@settings(max_examples=200)
def test_extract_main_total_and_spans_tile(junk):
    res = htmltext.extract_main(junk)
    text = res["main_text"]
    lines = text.split("\n") if text else []
    spans = res["spans"]
    assert len(spans) == len(lines) == res["n_content_blocks"]
    off = 0
    for s, line in zip(spans, lines):
        assert s["char_start"] == off
        assert s["char_len"] == len(line)
        assert 0.0 <= s["link_density"] <= 1.0
        assert 0.0 <= s["confidence"] <= 1.0
        off += len(line) + 1


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=125,
                                      exclude_characters="<>&"),
               min_size=30, max_size=200))
def test_article_text_roundtrip(body):
    """Plain text wrapped as an article comes back whitespace-normalized."""
    page = f"<html><body><article><p>{body}</p></article></body></html>"
    res = htmltext.extract_main(page)
    assert res["main_text"] == " ".join(body.split())


# ---------------------------------------------------------------------------
# Crawl-byte totality: the byte-facing entry points added for the
# webtext tier must be TOTAL over arbitrary bytes — at 10^12 documents
# every possible garbage input eventually arrives, and one raising row
# kills a whole Arrow batch / segment task.

from ocr_spark.sources import warc as warc_mod
from ocr_spark.textlib import charset as charset_mod
from ocr_spark.textlib import pdflayout as pdflayout_mod
from ocr_spark.textlib import webmeta as webmeta_mod
from ocr_spark.textlib.urlnorm import url_normalize


@given(st.binary(max_size=2048))
@settings(max_examples=300)
def test_charset_sniff_total_on_arbitrary_bytes(data):
    text, enc = charset_mod.sniff_decode(data)
    assert isinstance(text, str) and isinstance(enc, str)


@given(st.binary(max_size=2048))
@settings(max_examples=300)
def test_warc_parse_total_on_arbitrary_bytes(data):
    rows, skipped = warc_mod.segment_rows(data)
    assert skipped >= 0
    for r in rows:
        assert r["url"]


@given(st.binary(max_size=512).map(
    lambda b: b"WARC/1.0\r\n" + b))
@settings(max_examples=200)
def test_warc_parse_total_on_header_shaped_bytes(data):
    warc_mod.segment_rows(data)


@given(st.text(max_size=300))
@settings(max_examples=300)
def test_url_normalize_total_and_idempotent(u):
    once = url_normalize(u)
    assert url_normalize(once) == once


@given(st.text(max_size=1024))
@settings(max_examples=200)
def test_webmeta_total_on_arbitrary_text(t):
    m = webmeta_mod.extract_metadata(t)
    assert set(m) == {"title", "description", "author", "published",
                      "canonical", "sitename"}


_span_vals = st.floats(min_value=-1e6, max_value=1e6,
                       allow_nan=False, allow_infinity=False)


@given(st.lists(st.tuples(st.text(max_size=8), _span_vals, _span_vals,
                          _span_vals, _span_vals), max_size=30))
@settings(max_examples=200)
def test_pdflayout_total_on_arbitrary_geometry(spans):
    res = pdflayout_mod.analyze_page([list(s) for s in spans])
    # Every non-empty span's text must appear in the assembled page.
    for t, *_ in spans:
        if t:
            assert t in res["text"]
