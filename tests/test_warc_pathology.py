"""Pathology-WARC integration: the committed fixture through the full
read_warc -> extract -> curate -> write_wet -> read_warc round trip.

The sandbox has no network, so a literal Common Crawl excerpt cannot
be fetched (verified: DNS resolution fails); the committed fixture
(tests/fixtures/cc_pathology.warc.gz, ~0.9 MB compressed / ~2.5 MB of
document bytes) is the honest substitute — byte-level constructed
(NOT via this repo's own writer for the tricky parts) to carry the
pathology classes a real segment exhibits: charset lies, windows-1252
and Shift_JIS bodies, BOMs, LF-only and folded HTTP headers, chunked
transfer remnants, tag soup, mislabeled binary, mixed record types,
gzip FNAME/FEXTRA/FCOMMENT fields, inter-record garbage, a bad
Content-Length, and a truncated final member. See
tools/make_pathology_warc.py for the full inventory.
"""

import os

import pytest

from ocr_spark.sources import warc
from ocr_spark.textlib import charset

from tools.make_pathology_warc import (
    EXPECTED_ROWS, EXPECTED_SKIPS, N_BULK, PATHOLOGY_URLS, build_members,
)

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "cc_pathology.warc.gz")


@pytest.fixture(scope="module")
def fixture_bytes():
    with open(FIXTURE, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def rows_and_skips(fixture_bytes):
    return warc.segment_rows(fixture_bytes)


def test_fixture_is_reproducible(fixture_bytes):
    """The committed binary regenerates byte-identically, so every
    pathology in it is auditable from the builder source."""
    assert b"".join(build_members()) == fixture_bytes


def test_row_and_skip_bookkeeping_exact(rows_and_skips):
    rows, skipped = rows_and_skips
    assert len(rows) == EXPECTED_ROWS
    assert skipped == EXPECTED_SKIPS
    urls = {r["url"] for r in rows}
    # every addressable pathology document produced its row
    for name, url in PATHOLOGY_URLS.items():
        assert url in urls, name
    # resync recovered the records AFTER each corruption
    assert "https://news.example.com/webpage/after-garbage.html" in urls
    assert "https://news.example.com/webpage/after-bad-length.html" in urls
    # the truncated final record is a casualty, not a row
    assert "https://news.example.com/webpage/truncated.html" not in urls
    # non-document records contribute nothing
    assert None not in urls


def test_http_envelope_variants_strip_clean(rows_and_skips):
    rows, _ = rows_and_skips
    by = {r["url"]: r for r in rows}
    P = PATHOLOGY_URLS
    for key in ("baseline", "lf_only", "folded"):
        body = by[P[key]]["html"]
        assert body.startswith(b"<html>"), key          # no header residue
        assert b"HTTP/1.1" not in body, key
    # chunked remnants stay in the stored body (what CC stores is what
    # you get) — the envelope is still stripped
    chunked = by[P["chunked"]]["html"]
    assert b"HTTP/1.1" not in chunked
    assert b"<html>" in chunked


def test_charset_pathologies_decode_deterministically(rows_and_skips):
    rows, _ = rows_and_skips
    by = {r["url"]: r for r in rows}
    P = PATHOLOGY_URLS
    # true windows-1252: curly quotes and e-acute decode
    text, enc = charset.sniff_decode(by[P["win1252"]]["html"])
    assert enc == "windows-1252"
    assert "“Smart” caf\xe9" in text
    # Shift_JIS honors its declaration
    text, enc = charset.sniff_decode(by[P["shift_jis"]]["html"])
    assert enc == "shift_jis"
    assert "東京のニュース記事" in text
    # the charset LIE: UTF-8 bytes declared iso-8859-1 -> WHATWG maps
    # the label to windows-1252 and the declaration WINS, so the
    # e-acute becomes deterministic mojibake (exactly what a compliant
    # browser shows for such a page)
    text, enc = charset.sniff_decode(by[P["charset_lie"]]["html"])
    assert enc == "windows-1252"
    assert "caf\xc3\xa9" in text
    # BOMs win over everything
    assert charset.sniff_decode(by[P["bom_utf8"]]["html"])[1] == "utf-8-sig"
    assert charset.sniff_decode(
        by[P["bom_utf16le"]]["html"])[1] == "utf-16-le-bom"


def test_conversion_records_carry_language(rows_and_skips):
    rows, _ = rows_and_skips
    by = {r["url"]: r for r in rows}
    P = PATHOLOGY_URLS
    assert by[P["wet_en"]]["lang"] == "en"      # first of "en,de"
    assert by[P["wet_de"]]["lang"] == "de"
    assert by[P["wet_en"]]["text"] and by[P["wet_en"]]["html"] == b""


def test_full_pipeline_round_trip(spark, tmp_path):
    """read_warc -> real extraction -> curate -> write_wet ->
    read_warc: survivors' text is byte-identical after the round trip,
    and the lossy segment is observable, never silent."""
    from pyspark.sql import functions as F

    from ocr_spark.operators import curate as curate_ops
    from ocr_spark.plans.pipeline import run_extraction

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    with open(FIXTURE, "rb") as f:
        (seg_dir / "cc_pathology.warc.gz").write_bytes(f.read())

    raw = warc.read_warc(spark, str(seg_dir))
    docs = raw.filter("url is not null")
    assert docs.count() == EXPECTED_ROWS
    assert raw.agg(F.sum("_warc_skipped")).first()[0] == EXPECTED_SKIPS

    extracted = run_extraction(
        spark, docs.select("url", "warc_ts", "html", "text", "lang"),
        run_id="pathology", num_partitions=8)
    ex = extracted.select("url", "extracted_text", "error",
                          "doc_type").cache()
    # webpage extraction survived every markup/charset pathology
    ok = {r["url"] for r in
          ex.filter("error is null and extracted_text != ''").collect()}
    P = PATHOLOGY_URLS
    for key in ("baseline", "win1252", "shift_jis", "bom_utf8", "lf_only",
                "folded", "tag_soup", "wet_en", "wet_de"):
        assert P[key] in ok, key
    # the modeled PDF went down the PDF branch and parsed
    pdf_row = ex.filter(F.col("url") == P["pdf"]).first()
    assert pdf_row["doc_type"] == "salary_slip"
    assert "Ravi Kumar" in (pdf_row["extracted_text"] or "")
    # binary-as-html and empty pages degrade, never crash the batch
    assert ex.filter(F.col("url") == P["empty"]).count() == 1

    # curate the webpage corpus; bulk pages are sentence-shaped and
    # must survive the lang/C4 gates
    pages = ex.filter("error is null and extracted_text != ''") \
        .select("url", "extracted_text")
    res = curate_ops.curate(pages, text_col="extracted_text",
                            id_col="url", repair_lines=True)
    survivors = res["survivors"].cache()
    n_surv = survivors.count()
    assert n_surv >= N_BULK * 0.9   # the bulk corpus passes the gates

    # WET round trip: byte-identical text for every survivor
    out = str(tmp_path / "wet")
    wet_in = survivors.withColumn(
        "warc_ts", F.to_timestamp(F.lit("2026-03-01 12:00:00"))) \
        .select("url", "warc_ts",
                F.col("extracted_text").alias("text"))
    man = warc.write_wet(wet_in, out, num_segments=4)
    assert man.agg(F.sum("n_records")).first()[0] == n_surv
    back = warc.read_warc(spark, out).filter("url is not null")
    joined = (back.select("url", F.col("text").alias("rt"))
              .join(wet_in.select("url", "text"), "url"))
    assert joined.count() == n_surv
    assert joined.filter("rt != text").count() == 0


def test_native_datasource_agrees_on_pathology_fixture(spark, tmp_path):
    """spark.read.format('warc') over the pathology fixture returns
    the same documents and the same skip accounting as the
    mapInPandas reader — the native source must survive every
    transport pathology the fixture carries, not just synthetic
    segments."""
    from pyspark.sql import functions as F

    from ocr_spark.sources import warc_datasource
    warc_datasource.register(spark)
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    with open(FIXTURE, "rb") as f:
        (seg_dir / "cc_pathology.warc.gz").write_bytes(f.read())

    via_ds = spark.read.format("warc").load(str(seg_dir))
    via_mp = warc.read_warc(spark, str(seg_dir))

    def norm(df):
        # key=repr: the bookkeeping row carries NULLs that plain tuple
        # ordering cannot compare against document rows
        return sorted(
            ((r["url"], r["warc_ts"],
              bytes(r["html"]) if r["html"] is not None else None,
              r["text"], r["lang"], r["_warc_offset"],
              r["_warc_skipped"]) for r in df.collect()), key=repr)

    assert norm(via_ds) == norm(via_mp)
    assert via_ds.agg(F.sum("_warc_skipped")).first()[0] == EXPECTED_SKIPS


def test_crawl_image_payloads_featurize(spark, tmp_path):
    """The three real image records (PNG / baseline JPEG / GIF built
    by the repo's own encoders) ride the WARC rows into
    extract_pixel_features and decode with the pixel featurizer — the
    crawl -> media loop, not just the text loop."""
    import numpy as np

    from ocr_spark.operators import multimodal
    from ocr_spark.textlib import imagecodec as ic

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    with open(FIXTURE, "rb") as f:
        (seg_dir / "cc_pathology.warc.gz").write_bytes(f.read())
    P = PATHOLOGY_URLS
    img_urls = [P["img_png"], P["img_jpeg"], P["img_gif"]]
    from pyspark.sql import functions as F
    media = (warc.read_warc(spark, str(seg_dir))
             .filter(F.col("url").isin(img_urls))
             .select(F.col("url").alias("media_id"),
                     F.lit("image").alias("kind"),
                     F.col("html").alias("payload")))
    out = {r["media_id"]: r for r in
           multimodal.extract_pixel_features(media).collect()}
    assert len(out) == 3
    rows, _ = warc.segment_rows(open(FIXTURE, "rb").read())
    local = {r["url"]: r["html"] for r in rows if r["url"] in img_urls}
    for url in img_urls:
        got = out[url]
        assert got["featurizer"] == "pixel_stats_v1", url
        assert (got["width"], got["height"]) == (24, 24), url
        want = ic.pixel_features(multimodal.decode_image(local[url]))
        assert got["features"] == pytest.approx(want), url
