"""HTML main-content extraction (textlib/htmltext.py) — unit tests for
the block-tree heuristics plus the Spark Arrow-pipeline round trip.

The driver-gate twin (`html_main_text` / `html_spans` in
__spark_entry__.py) hash-checks the same operator against a DuckDB
oracle at sf0.01; these tests pin the behaviors the oracle corpus
cannot reach (malformed markup, prune classes, fallback paths).
"""

import pytest

from ocr_spark.textlib.htmltext import extract_main, parse_blocks

ARTICLE_PAGE = """<!DOCTYPE html>
<html><head><title>My Article — Site</title>
<script>var x = "<p>script junk</p>";</script>
<style>p { color: red }</style></head>
<body>
<header><h1>Site Banner</h1></header>
<nav><a href="/">Home</a> <a href="/b">Blog</a></nav>
<div class="sidebar"><a href="/1">Link one here</a>
  <a href="/2">Link two here</a> <a href="/3">Link three</a></div>
<div id="content">
  <h2>My Article</h2>
  <p>This is the first paragraph of the article, with a comma, and
     enough characters to vote.</p>
  <p>Second   paragraph with   irregular    whitespace and &amp;
     entities &lt;kept&gt; verbatim.</p>
  <p>Short line.</p>
  <p><a href="/x">Read more stuff</a> <a href="/y">Subscribe now</a></p>
</div>
<footer>© 2026 Example Corp. All rights reserved.</footer>
</body></html>"""


class TestExtractMain:
    def test_boilerplate_stripped(self):
        r = extract_main(ARTICLE_PAGE)
        for junk in ("Site Banner", "Home", "Blog", "Link one",
                     "Example Corp", "script junk", "color: red",
                     "Read more stuff"):
            assert junk not in r["main_text"], junk
        assert r["main_text"].startswith("My Article\n")
        assert "first paragraph of the article" in r["main_text"]
        assert "Short line." in r["main_text"]

    def test_title_from_title_tag(self):
        assert extract_main(ARTICLE_PAGE)["title"] == "My Article — Site"

    def test_title_falls_back_to_h1(self):
        r = extract_main("<body><h1>Only Heading</h1>"
                         "<p>Some body text here for the page.</p></body>")
        assert r["title"] == "Only Heading"

    def test_whitespace_normalized_and_entities_unescaped(self):
        r = extract_main(ARTICLE_PAGE)
        assert ("Second paragraph with irregular whitespace and & "
                "entities <kept> verbatim." in r["main_text"])

    def test_link_farm_dropped_but_counted(self):
        r = extract_main(ARTICLE_PAGE)
        # blocks: h2 + 3 paragraphs + link-farm p (sidebar/nav/footer
        # pruned before counting)
        assert r["n_blocks"] == 5
        assert r["n_content_blocks"] == 4

    def test_spans_reassemble_main_text(self):
        r = extract_main(ARTICLE_PAGE)
        assert len(r["spans"]) == r["n_content_blocks"]
        parts = []
        for i, s in enumerate(r["spans"]):
            assert s["block_idx"] == i
            seg = r["main_text"][s["char_start"]:s["char_start"] + s["char_len"]]
            assert "\n" not in seg
            assert len(seg) == s["char_len"]
            parts.append(seg)
        assert "\n".join(parts) == r["main_text"]

    def test_confidence_formula(self):
        r = extract_main("<body><div><p>word here, twelve</p>"
                         "<p>A much longer paragraph follows, easily "
                         "crossing one hundred characters of article "
                         "body text to saturate the confidence cap "
                         "entirely.</p></div></body>")
        confs = [s["confidence"] for s in r["spans"]]
        chars = [s["char_len"] for s in r["spans"]]
        assert confs[0] == min(1.0, chars[0] / 100.0)
        assert confs[1] == 1.0

    def test_prune_by_class_token(self):
        r = extract_main(
            '<body><div class="main-nav"><p>Menu items listed here for '
            'everyone</p></div><div><p>Real article body text, long '
            'enough to vote, with a comma.</p></div></body>')
        assert "Menu items" not in r["main_text"]
        assert "Real article body" in r["main_text"]

    def test_short_page_body_fallback(self):
        # No block reaches the 25-char vote threshold -> body fallback
        # still excludes pruned/link blocks.
        r = extract_main("<body><nav><a href='/'>Home page</a></nav>"
                         "<p>Tiny note.</p></body>")
        assert r["main_text"] == "Tiny note."

    def test_unclosed_tags(self):
        r = extract_main("<body><div><p>First open paragraph of text"
                         "<p>Second paragraph, never closed either"
                         "<div><p>Nested deeper text block here</body>")
        assert "First open paragraph" in r["main_text"]
        assert "Second paragraph" in r["main_text"]

    def test_stray_end_tags_ignored(self):
        r = extract_main("</div></p><body><p>Content survives stray "
                         "end tags, commas included.</p></body>")
        assert "Content survives" in r["main_text"]

    def test_empty_and_garbage_input(self):
        assert extract_main("")["main_text"] == ""
        assert extract_main("")["n_blocks"] == 0
        assert extract_main("<<<>>>&&& not html at all")["spans"] == \
            extract_main("<<<>>>&&& not html at all")["spans"]

    def test_br_splits_blocks(self):
        r = extract_main("<body><p>line one before the break<br>"
                         "line two after the break</p></body>")
        assert r["main_text"] == ("line one before the break\n"
                                  "line two after the break")

    def test_table_content_kept(self):
        r = extract_main(
            "<body><table><tr><td>Quarterly revenue figures, detailed "
            "in the annual report text.</td></tr><tr><td>Second row of "
            "the data table, also prose-like content.</td></tr>"
            "</table></body>")
        assert "Quarterly revenue" in r["main_text"]
        assert "Second row" in r["main_text"]


class TestParseBlocks:
    def test_anchor_chars_counted(self):
        p = parse_blocks("<body><p>Read <a href='/x'>the full story"
                         "</a> online today</p></body>")
        (b,) = p.blocks
        assert b.text == "Read the full story online today"
        assert b.anchor_chars == len("the full story")
        assert 0.0 < b.link_density < 0.5

    def test_pruned_subtrees_produce_no_blocks(self):
        p = parse_blocks("<body><footer><p>legal text</p></footer>"
                         "<aside><p>widget</p></aside></body>")
        assert p.blocks == []


@pytest.fixture(scope="module")
def html_extracted(spark):
    """30 python-built pages through the REAL Spark pipeline."""
    from ocr_spark import schemas
    from ocr_spark.plans.pipeline import run_extraction

    pages = []
    for i in range(30):
        body = (f"<header><h1>Crawl</h1></header>"
                f"<nav><a href='/'>Home</a></nav>"
                f"<article><p>Document {i} main body text, with a "
                f"comma, long enough to vote for its container.</p>"
                f"<p>Second paragraph of document {i}.</p></article>"
                f"<footer>footer boilerplate {i}</footer>")
        page = f"<html><head><title>Page {i}</title></head><body>{body}</body></html>"
        pages.append((f"https://t.local/d{i}/webpage/{i}.html", page))
    rows = [
        {"url": u, "warc_ts": None, "html": p.encode(), "text": "",
         "lang": "en", "meta": None}
        for u, p in pages]
    df = spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)
    out = run_extraction(spark, df, run_id="t-html", num_partitions=4)
    collected = {r["url"]: r.asDict(recursive=True) for r in out.collect()}
    return pages, collected


class TestSparkPipeline:
    def test_matches_local_extractor(self, html_extracted):
        pages, collected = html_extracted
        for url, page in pages:
            exp = extract_main(page)
            got = collected[url]
            assert got["error"] is None, url
            assert got["doc_type"] == "webpage"
            assert got["extracted_text"] == exp["main_text"], url
            wp = got["webpage"]
            assert wp["title"] == exp["title"]
            assert wp["n_blocks"] == exp["n_blocks"]
            assert wp["n_content_blocks"] == exp["n_content_blocks"]
            assert [
                (s["block_idx"], s["char_start"], s["char_len"],
                 s["link_density"], s["confidence"])
                for s in wp["spans"]
            ] == [
                (s["block_idx"], s["char_start"], s["char_len"],
                 s["link_density"], s["confidence"])
                for s in exp["spans"]]

    def test_lineage_populated(self, html_extracted):
        _, collected = html_extracted
        for got in collected.values():
            assert got["run_id"] == "t-html"
            assert got["partition_id"] >= 0
            assert got["input_bytes"] > 0

    def test_wet_text_passthrough(self, spark):
        from ocr_spark import schemas
        from ocr_spark.plans.pipeline import run_extraction
        rows = [{"url": "https://t.local/d0/webpage/0.html",
                 "warc_ts": None, "html": None,
                 "text": "pre-extracted wet text", "lang": "en",
                 "meta": None},
                {"url": "https://t.local/d1/webpage/1.html",
                 "warc_ts": None, "html": None, "text": "", "lang": "en",
                 "meta": None}]
        df = spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)
        out = {r["url"]: r.asDict(recursive=True)
               for r in run_extraction(spark, df, run_id="t-wet",
                                       num_partitions=2).collect()}
        ok = out["https://t.local/d0/webpage/0.html"]
        assert ok["extracted_text"] == "pre-extracted wet text"
        assert ok["webpage"]["spans"][0]["confidence"] == \
            min(1.0, len("pre-extracted wet text") / 100.0)
        assert out["https://t.local/d1/webpage/1.html"]["error"] == \
            "empty web page"
