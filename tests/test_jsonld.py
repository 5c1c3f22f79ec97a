"""schema.org JSON-LD extraction (textlib/jsonld.py) + the
structured_data Arrow operator."""

from ocr_spark.operators import webpage
from ocr_spark.textlib.jsonld import extract_jsonld

ARTICLE = """<html><head>
<script type="application/ld+json">
{"@context": "https://schema.org", "@type": "NewsArticle",
 "headline": "Big   news\\ntoday", "author": {"name": " Jane  Doe "},
 "datePublished": "2026-02-10T08:30:00Z",
 "url": "https://ex.net/big-news"}
</script>
<script type="application/ld+json;charset=utf-8">
[{"@type": ["Product", "Thing"], "name": "Widget"},
 "stray-string",
 {"name": "typeless node"}]
</script>
<script type="application/json">{"@type": "Ignored"}</script>
<script type="application/ld+json">{broken json}</script>
<script type="application/ld+json"><!--
{"@context": "x", "@graph": [{"@type": "Organization",
  "name": "Acme & Sons"}]}
--></script>
</head><body>t</body></html>"""


class TestExtract:
    def test_nodes_and_flattening(self):
        nodes, skipped = extract_jsonld(ARTICLE)
        assert skipped == 1  # the broken block only
        assert [n["jsonld_type"] for n in nodes] == [
            "NewsArticle", "Product", None, "Organization"]
        art = nodes[0]
        assert art["headline"] == "Big news today"   # ws-normalized
        assert art["author"] == "Jane Doe"           # object -> name
        assert art["date_published"] == "2026-02-10T08:30:00Z"
        assert art["item_url"] == "https://ex.net/big-news"
        assert nodes[1]["name"] == "Widget"          # list @type -> first
        # comment-wrapped @graph envelope yields members only, raw &
        assert nodes[3]["name"] == "Acme & Sons"

    def test_author_variants(self):
        html = ('<script type="application/ld+json">'
                '{"@type":"A","author":[{"name":"First A"},'
                '{"name":"B"}]}</script>'
                '<script type="application/ld+json">'
                '{"@type":"B","author":"Plain Name"}</script>'
                '<script type="application/ld+json">'
                '{"@type":"C","author":{"noname":1}}</script>')
        nodes, skipped = extract_jsonld(html)
        assert skipped == 0
        assert [n["author"] for n in nodes] == ["First A", "Plain Name",
                                                None]

    def test_no_jsonld(self):
        assert extract_jsonld("<html><body>x</body></html>") == ([], 0)
        assert extract_jsonld("") == ([], 0)

    def test_unterminated_script_counted_or_extracted(self):
        # truncated page, cut-off JSON: counted, never silently lost
        nodes, skipped = extract_jsonld(
            '<script type="application/ld+json">{"@type":"X"')
        assert nodes == [] and skipped == 1
        # truncated page, complete JSON body: still extracts
        nodes, skipped = extract_jsonld(
            '<script type="application/ld+json">{"@type":"X"}')
        assert skipped == 0 and nodes[0]["jsonld_type"] == "X"

    def test_cdata_wrapper(self):
        html = ('<script type="application/ld+json">/*<![CDATA[*/'
                ' {"@type":"Movie","name":"M"} /*]]>*/</script>')
        nodes, skipped = extract_jsonld(html)
        assert skipped == 0 and nodes[0]["name"] == "M"


class TestOperator:
    def test_rows_and_counter(self, spark):
        rows = [("https://a.example/p", ARTICLE.encode()),
                ("https://b.example/p", b"<html>no ld</html>"),
                ("https://c.example/p", None)]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = webpage.structured_data(df).collect()
        a = [r for r in out if r["url"].startswith("https://a")]
        assert len([r for r in a if r["jsonld_type"] is not None]) == 3
        assert sum(r["_jsonld_skipped"] for r in out) == 1
        assert not [r for r in out if r["url"].startswith("https://b")]


def test_self_closing_script_not_counted_lossy():
    # A self-closing <script .../> has no body: it must produce
    # neither a node nor a skip count (review finding: the default
    # start+end dispatch appended an empty block that json.loads
    # then counted as a lossy page).
    html = ('<html><head>'
            '<script type="application/ld+json"/>'
            '<script type="application/ld+json">'
            '{"@type": "X", "name": "n"}</script>'
            '</head><body>x</body></html>')
    nodes, skipped = extract_jsonld(html)
    assert skipped == 0
    assert [n["jsonld_type"] for n in nodes] == ["X"]


def test_empty_script_body_not_counted_lossy():
    html = ('<script type="application/ld+json">  </script>'
            '<script type="application/ld+json">{"@type":"Y"}</script>')
    nodes, skipped = extract_jsonld(html)
    assert skipped == 0 and [n["jsonld_type"] for n in nodes] == ["Y"]
