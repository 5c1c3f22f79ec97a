"""Web-graph family: textlib/weblinks.py link extraction,
operators/webgraph.py outlink table + host graph + PageRank."""

import pytest

from pyspark.sql import functions as F

from ocr_spark.operators import webgraph
from ocr_spark.textlib.weblinks import extract_links

PAGE = "https://www.example.org/dir/page.html"


class TestExtractLinks:
    def test_absolute_and_relative_resolution(self):
        html = ('<a href="https://other.net/x">Abs</a>'
                '<a href="sub/b.html">Rel</a>'
                '<a href="/top/c.html">Root</a>'
                '<a href="?q=2">Query</a>')
        got = [lk["dst_url"] for lk in extract_links(html, PAGE)]
        assert got == ["https://other.net/x",
                       "https://www.example.org/dir/sub/b.html",
                       "https://www.example.org/top/c.html",
                       "https://www.example.org/dir/page.html?q=2"]

    def test_base_href_first_wins(self):
        html = ('<base href="https://cdn.example.net/b/">'
                '<base href="https://ignored.example.net/">'
                '<a href="r.html">R</a><a href="/abs.html">A</a>')
        got = [lk["dst_url"] for lk in extract_links(html, PAGE)]
        assert got == ["https://cdn.example.net/b/r.html",
                       "https://cdn.example.net/abs.html"]

    def test_relative_base_resolves_against_page(self):
        html = '<base href="../up/"><a href="x.html">X</a>'
        assert extract_links(html, PAGE)[0]["dst_url"] == \
            "https://www.example.org/up/x.html"

    def test_skips_chrome_schemes_and_fragments(self):
        html = ('<a href="#sec">Frag</a><a href="">Empty</a>'
                '<a href="mailto:a@b.c">Mail</a>'
                '<a href="javascript:void(0)">JS</a>'
                '<a href="tel:+123">Tel</a>'
                '<a href="DATA:text/plain,x">Data</a>'
                '<a href="ftp://files.example.org/f">Ftp</a>'
                '<a href="https://kept.org/">Kept</a>')
        got = extract_links(html, PAGE)
        assert [lk["dst_url"] for lk in got] == ["https://kept.org/"]

    def test_anchor_text_normalized(self):
        html = '<a href="/x"> A  <b>bold</b>\n link </a>'
        assert extract_links(html, PAGE)[0]["anchor_text"] == "A bold link"

    def test_rel_and_nofollow(self):
        html = ('<a href="/a" rel="NoFollow  Sponsored">s</a>'
                '<a href="/b" rel="noopener">o</a>'
                '<a href="/c">plain</a>'
                '<a href="/d" rel="nofollowish">trap</a>')
        got = extract_links(html, PAGE)
        assert [(lk["rel"], lk["nofollow"]) for lk in got] == [
            ("nofollow sponsored", True), ("noopener", False),
            (None, False), ("nofollowish", False)]

    def test_nested_anchor_implicitly_closes(self):
        html = '<a href="/first">one <a href="/second">two</a>'
        got = extract_links(html, PAGE)
        assert [(lk["dst_url"], lk["anchor_text"]) for lk in got] == [
            ("https://www.example.org/first", "one"),
            ("https://www.example.org/second", "two")]

    def test_unclosed_anchor_at_eof(self):
        got = extract_links('<p><a href="/tail">trailing text', PAGE)
        assert got[0]["dst_url"] == "https://www.example.org/tail"
        assert got[0]["anchor_text"] == "trailing text"

    def test_missing_href_and_empty_text(self):
        got = extract_links('<a name="x">no href</a><a href="/y"></a>',
                            PAGE)
        assert len(got) == 1
        assert got[0]["anchor_text"] is None

    def test_malformed_markup_never_raises(self):
        for junk in ("<a href='/x' <<<>>", "<a", "\x00<a href=/y>t</a>",
                     "<!----><a href= >t</a>"):
            extract_links(junk, PAGE)  # must not raise

    def test_charref_in_href_and_text(self):
        got = extract_links('<a href="/p?a=1&amp;b=2">A &amp; B</a>', PAGE)
        assert got[0]["dst_url"].endswith("/p?a=1&b=2")
        assert got[0]["anchor_text"] == "A & B"


class TestExtractOutlinksOperator:
    def test_rows_and_charset(self, spark):
        latin = ('<a href="/caf%C3%A9">caf\xe9</a>'
                 .encode("latin-1"))  # undeclared latin-1 page
        df = spark.createDataFrame(
            [("https://a.org/p", b'<a href="https://b.org/">B</a>'
              b'<a href="x.html" rel="nofollow">X</a>'),
             ("https://c.org/q", latin),
             ("https://d.org/r", None)],
            "url string, html binary")
        got = {(r["src_url"], r["dst_url"], r["anchor_text"],
                r["nofollow"])
               for r in webgraph.extract_outlinks(df, num_partitions=2)
               .collect()}
        assert got == {
            ("https://a.org/p", "https://b.org/", "B", False),
            ("https://a.org/p", "https://a.org/x.html", "X", True),
            ("https://c.org/q", "https://c.org/caf%C3%A9", "caf\xe9",
             False)}


class TestHostEdges:
    def _links(self, spark):
        rows = [
            ("https://a.org/1", "https://b.org/x", False),
            ("https://a.org/2", "https://b.org/y", False),
            ("https://a.org/1", "https://A.ORG/self", False),   # self
            ("https://a.org/1", "https://c.org/z", True),       # nofollow
            ("https://a.org/1", "relative-no-host", False),     # no host
            ("https://b.org/1", "https://a.org/w", False),
        ]
        return spark.createDataFrame(
            rows, "src_url string, dst_url string, nofollow boolean")

    def test_aggregation(self, spark):
        got = {(r["src_host"], r["dst_host"]): r["n_links"]
               for r in webgraph.host_edges(self._links(spark)).collect()}
        assert got == {("a.org", "b.org"): 2, ("b.org", "a.org"): 1}

    def test_keep_nofollow(self, spark):
        got = {(r["src_host"], r["dst_host"]): r["n_links"]
               for r in webgraph.host_edges(self._links(spark),
                                            drop_nofollow=False).collect()}
        assert got[("a.org", "c.org")] == 1


def _pagerank_ref(edges, iters, damping, weighted=True):
    """Independent plain-Python power iteration (dict math, no shared
    code with the operator) — the spec the Spark plan must match."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out = {}
    for s, d, m in edges:
        out.setdefault(s, {})
        out[s][d] = out[s].get(d, 0) + (m if weighted else 1)
    w = {s: {d: m / sum(ds.values()) for d, m in ds.items()}
         for s, ds in out.items()}
    r = {h: 1.0 / n for h in nodes}
    for _ in range(iters):
        dm = sum(r[h] for h in nodes if h not in w)
        nxt = {h: (1 - damping) / n + damping * dm / n for h in nodes}
        for s, ds in w.items():
            for d, wt in ds.items():
                nxt[d] += damping * r[s] * wt
        r = nxt
    return r


class TestHostRank:
    EDGES = [("a.org", "b.org", 3), ("b.org", "a.org", 1),
             ("a.org", "c.org", 1)]   # c.org dangles

    def _run(self, spark, iters, **kw):
        df = spark.createDataFrame(
            self.EDGES, "src_host string, dst_host string, n_links long")
        return {r["host"]: r["rank"]
                for r in webgraph.host_rank(df, iters=iters, **kw)
                .collect()}

    def test_matches_reference_weighted(self, spark):
        got = self._run(spark, iters=7)
        ref = _pagerank_ref(self.EDGES, 7, 0.85)
        assert set(got) == set(ref)
        for h in ref:
            assert got[h] == pytest.approx(ref[h], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_unweighted_variant(self, spark):
        got = self._run(spark, iters=5, weighted=False)
        ref = _pagerank_ref(self.EDGES, 5, 0.85, weighted=False)
        for h in ref:
            assert got[h] == pytest.approx(ref[h], abs=1e-12)

    def test_checkpoint_boundary_value_stable(self, spark):
        # 7 iterations with a checkpoint after 2 must equal no-checkpoint
        a = self._run(spark, iters=7, checkpoint_every=2)
        b = self._run(spark, iters=7, checkpoint_every=100)
        for h in a:
            assert a[h] == pytest.approx(b[h], abs=1e-12)

    def test_empty_graph(self, spark):
        df = spark.createDataFrame(
            [], "src_host string, dst_host string, n_links long")
        assert webgraph.host_rank(df, iters=3).count() == 0

    def test_hub_outranks_leaf(self, spark):
        edges = [("leaf%d.org" % i, "hub.org", 1) for i in range(8)]
        edges.append(("hub.org", "leaf0.org", 1))
        df = spark.createDataFrame(
            edges, "src_host string, dst_host string, n_links long")
        got = {r["host"]: r["rank"]
               for r in webgraph.host_rank(df, iters=10).collect()}
        # leaf0 receives hub's ENTIRE mass (hub's only out-edge), so it
        # legitimately outranks hub; every other leaf lives on teleport
        # and must rank far below the 8-in-edge hub.
        assert got["hub.org"] > 3 * max(
            v for h, v in got.items() if h not in ("hub.org", "leaf0.org"))


class TestAnchorStats:
    def _links(self, spark):
        rows = [
            ("https://s1.org/a", "https://t.org/p", "Click here"),
            ("https://s2.org/b", "https://t.org/p", "Click here"),
            ("https://s2.org/c", "https://t.org/p", "Docs"),
            ("https://s3.org/d", "https://t.org/p", "Apple"),
            ("https://s1.org/e", "https://t.org/p", None),
            ("https://s1.org/f", "https://u.org/q", None),
        ]
        return spark.createDataFrame(
            rows, "src_url string, dst_url string, anchor_text string")

    def test_profile_and_tiebreak(self, spark):
        got = {r["dst_url"]: r
               for r in webgraph.anchor_stats(self._links(spark), k=2)
               .collect()}
        p = got["https://t.org/p"]
        assert p["n_inlinks"] == 5
        assert p["n_src_hosts"] == 3
        # count desc then text asc: Click here (2), then Apple|Docs
        # tie at 1 -> Apple wins the k=2 cut alphabetically.
        assert p["top_anchors"] == ["Click here", "Apple"]
        q = got["https://u.org/q"]
        assert q["n_inlinks"] == 1 and q["top_anchors"] is None

    def test_min_count_prunes_tail(self, spark):
        got = {r["dst_url"]: r["top_anchors"]
               for r in webgraph.anchor_stats(self._links(spark), k=5,
                                              min_count=2).collect()}
        assert got["https://t.org/p"] == ["Click here"]


class TestRecrawlDedup:
    def test_keep_latest_then_url_asc(self, spark):
        from ocr_spark.operators import dedup
        rows = [
            ("https://Site.Example.org/a?utm_source=x&k=1", 1, "v0"),
            ("https://site.example.org:443/a?k=1", 2, "v1"),
            ("https://site.example.org/a?k=1#frag", 3, "v2"),
            ("https://site.example.org/a?k=1", 3, "v3"),
            ("https://other.org/b", 1, "w0"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts long, tag string")
        kept = dedup.recrawl_dedup(df).collect()
        got = {r["canonical_url"]: r["tag"] for r in kept}
        # all four spellings share one canonical key; ts=3 ties between
        # v2/v3 break by raw url ascending (no-#frag sorts first).
        assert got == {"https://site.example.org/a?k=1": "v3",
                       "https://other.org/b": "w0"}
        assert all(set(r.asDict()) == {"url", "warc_ts", "tag",
                                       "canonical_url"} for r in kept)

    def test_null_ts_loses(self, spark):
        from ocr_spark.operators import dedup
        df = spark.createDataFrame(
            [("https://a.org/x", None, "old"),
             ("https://a.org/x?gclid=z", 1, "new")],
            "url string, warc_ts long, tag string")
        got = [r["tag"] for r in dedup.recrawl_dedup(df).collect()]
        assert got == ["new"]
