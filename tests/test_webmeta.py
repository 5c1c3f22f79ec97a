"""Trafilatura-style page-metadata extraction (textlib/webmeta.py):
field precedence, entity/whitespace normalization, malformed-markup
tolerance, plus the html_metadata driver query vs its DuckDB oracle.
"""

import importlib.util
import os

import duckdb
import pytest

from ocr_spark.textlib.webmeta import extract_metadata

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def page(head="", body="<h1>H1 Text</h1><p>x</p>"):
    return f"<html><head>{head}</head><body>{body}</body></html>"


def test_og_title_beats_title_tag():
    m = extract_metadata(page(
        '<meta property="og:title" content="OG"/><title>T</title>'))
    assert m["title"] == "OG"


def test_title_tag_beats_h1():
    assert extract_metadata(page("<title>T</title>"))["title"] == "T"


def test_h1_fallback_title():
    assert extract_metadata(page())["title"] == "H1 Text"


def test_only_first_h1_counts():
    m = extract_metadata(page(body="<h1>First</h1><h1>Second</h1>"))
    assert m["title"] == "First"


def test_description_precedence():
    m = extract_metadata(page(
        '<meta property="og:description" content="OGD"/>'
        '<meta name="description" content="MD"/>'))
    assert m["description"] == "OGD"
    m = extract_metadata(page('<meta name="description" content="MD"/>'))
    assert m["description"] == "MD"
    assert extract_metadata(page())["description"] is None


def test_published_precedence():
    both = ('<meta property="article:published_time" content="2026-01-02"/>'
            '<meta name="date" content="2026-02-02"/>')
    m = extract_metadata(page(both,
                              body='<time datetime="2026-03-02">x</time>'))
    assert m["published"] == "2026-01-02"
    m = extract_metadata(page('<meta name="date" content="2026-02-02"/>',
                              body='<time datetime="2026-03-02">x</time>'))
    assert m["published"] == "2026-03-02"
    m = extract_metadata(page('<meta name="date" content="2026-02-02"/>'))
    assert m["published"] == "2026-02-02"


def test_canonical_sitename_author():
    m = extract_metadata(page(
        '<link rel="canonical" href="https://a/b"/>'
        '<meta property="og:site_name" content="Site"/>'
        '<meta name="author" content="Jo Writer"/>'))
    assert m["canonical"] == "https://a/b"
    assert m["sitename"] == "Site"
    assert m["author"] == "Jo Writer"


def test_entities_and_whitespace_normalized():
    m = extract_metadata(page(
        '<meta property="og:title" content="A &amp; B&#8217;s   page"/>'))
    assert m["title"] == "A & B’s page"


def test_malformed_markup_keeps_collected_fields():
    m = extract_metadata(
        '<html><head><title>Kept</title><meta content="x" name="de')
    assert m["title"] == "Kept"


def test_empty_and_missing_are_none():
    m = extract_metadata(page('<meta name="author" content="   "/>'))
    assert m["author"] is None
    assert extract_metadata("")["title"] is None


# ---------------- driver query vs oracle ----------------

@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_webmeta_tests",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_html_metadata_matches_oracle(spark, entry):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    oracle = con.execute(entry.oracle_sql()["html_metadata"]).df()
    got = entry.q_html_metadata(spark, SF_DIR).toPandas()
    cols = sorted(oracle.columns)
    assert sorted(got.columns) == cols
    g = sorted(map(repr, got[cols].itertuples(index=False, name=None)))
    o = sorted(map(repr, oracle[cols].itertuples(index=False, name=None)))
    assert g == o
