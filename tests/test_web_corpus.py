"""Web corpus (synth.make_web_row) through the extraction pipeline.

Every non-malformed variant must extract EXACTLY the planted article
(headline + paragraphs, boilerplate stripped); the malformed variant
must recover via the low-yield retry (htmltext.RECOVERY_MIN_CHARS).
"""

from __future__ import annotations

import pytest

from ocr_spark.operators.cascade import extract_record
from ocr_spark.sources import synth
from ocr_spark.textlib import htmltext


def expected_main(i: int) -> str:
    paras = "\n".join(synth.web_paragraphs(i))
    if i % 7 == 2:  # WET-style row: pre-extracted text passthrough
        return paras
    return f"Article {i} from {synth._WEB_SITES[i % 5]}\n" + paras


@pytest.mark.parametrize("i", list(range(21)) + [96])
def test_web_variant_extracts_planted_article(i):
    r = synth.make_web_row(i)
    out = extract_record(r["url"], r["html"], r["text"], "webpage", "")
    assert out["error"] is None
    assert out["extracted_text"] == expected_main(i)
    w = out["webpage"]
    assert w["n_content_blocks"] == len(expected_main(i).split("\n"))
    # Span assembly reconstructs the main text exactly.
    for s in w["spans"]:
        seg = out["extracted_text"][s["char_start"]:
                                    s["char_start"] + s["char_len"]]
        assert "\n" not in seg and len(seg) == s["char_len"]


def test_giant_page_is_giant_and_extracts():
    r = synth.make_web_row(96)
    assert len(r["html"]) >= synth.CC_WEB_GIANT_BYTES
    out = extract_record(r["url"], r["html"], r["text"], "webpage", "")
    assert out["extracted_text"] == expected_main(96)


def test_unclosed_prune_div_recovers():
    """An UNCLOSED boilerplate-class div would swallow the article into
    its prune subtree (lxml-based extractors mis-nest the same way);
    the low-yield retry must recover the article."""
    paras = "".join(
        f"<p>Paragraph {j} carries enough prose, with a comma, to vote "
        f"for its container like real article text does.</p>"
        for j in range(6))
    page = ('<html><body><div class="sidebar"><a href="/x">Hot links</a>'
            f'<article><h2>The Headline Here</h2>{paras}</article>'
            '<footer>Copyright.</footer></body></html>')
    res = htmltext.extract_main(page)
    assert res["main_text"].startswith("The Headline Here")
    assert "Paragraph 5" in res["main_text"]
    assert "Hot links" not in res["main_text"]


def test_recovery_does_not_fire_on_wellformed_short_pages():
    """A well-formed page whose article is tiny must NOT change output
    under the retry rule (tie prefers the pruned parse)."""
    page = ('<html><body><nav><a href="/">Home</a></nav>'
            '<article><p>Short but valid article text here, kept.</p>'
            '</article>'
            '<div class="sidebar"><a href="/a">One</a> <a href="/b">Two'
            '</a></div>' + " " * 1200 + '</body></html>')
    res = htmltext.extract_main(page)
    assert res["main_text"] == "Short but valid article text here, kept."
    assert res["n_content_blocks"] == 1


def test_web_corpus_spark_roundtrip(spark):
    n = 40
    df = synth.web_input_df(spark, n, partitions=4)
    from ocr_spark.plans.pipeline import run_extraction
    out = run_extraction(spark, df, run_id="t-web", num_partitions=4)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == n
    for i in range(n):
        r = synth.make_web_row(i)
        got = rows[r["url"]]
        assert got["error"] is None
        assert got["extracted_text"] == expected_main(i)
        assert got["doc_type"] == "webpage"
